#!/usr/bin/env python3
"""Write adversarial `documents`/`embeddings`/`events` fixtures for
oracle-parity sweeps.

The driver fixture is friendly (non-null ASCII text, populated lang/source,
well-formed JSON props, fixed-dim vectors); these exercise the shapes real
corpora contain: NULL text, empty and whitespace-only text, single-char and
multibyte tokens, regex-special characters, runs of mixed whitespace,
exact-duplicate bodies, NULL lang/source, huge ids, NULL vectors, NULL
users, NULL event types, malformed JSON, duplicate and window-boundary
timestamps, far-future outliers. Round 6's sweeps caught five real
divergences the friendly fixture could never show: q91 null-text admission
+ NULL-source join, q88 null flags, q34 null-vs-zero simhash, q38/q58
null-vector bucket 0, and a q23 ANSI-mode crash on non-numeric JSON values
(Spark 4 defaults to ANSI — plain casts of user data THROW; use try_cast).

Round 8 extended the sweep to EVERY document/embedding/event-family query
(53) plus a non-BMP emoji row, and caught three more real divergences the
friendly fixture could never show: the k-means family (q87/q92/q96)
scoring a zero-magnitude vector as cosine NaN — which Spark orders ABOVE
every real similarity and passes >= thresholds, while SQL division by
zero yields NULL (fixed: the native cosine returns NULL on zero norms) —
and both multimodal paths (q43/q59) crashing on a NULL-text document's
NULL n_chars/payload through a non-nullable encoder (fixed: Option dims /
null-histogram ledger rows, matching the oracle's formula replay).

Usage:
    python3 tools/adversarial_fixture.py [outdir=/tmp/adversarial]
    sbt -batch "runMain graft.Verify /tmp/adversarial /tmp/v_adv <family queries>"
    python3 tools/compare_oracle.py /tmp/adversarial /tmp/v_adv

Embeddings stay fixed-dim (ragged rows are out of the ingest contract; the
native hyperplane expression still maps them to the HOF form's signature 0).
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

def main(outdir: str) -> None:
    rows = [
        (1,  "the a of to and in spark scan merge key", "en", "src0"),
        (2,  None,                                      "de", "src0"),
        (3,  "",                                        "en", "src1"),
        (4,  "   ",                                     "zh", "src1"),
        (5,  "x",                                       "en", "src0"),
        (6,  "héllo wörld 你好 héllo",                  "de", "src1"),
        (7,  "a.b c*d (e) [f] {g} $h ^i",               "en", "src0"),
        (8,  "a  b\tc   d",                             "fr", "src1"),
        (9,  " ".join(f"w{i%7}" for i in range(200)),   "en", "src0"),
        (10, "dup dup dup dup dup dup dup dup",         "en", "src1"),
        (11, "dup dup dup dup dup dup dup dup",         "de", "src0"),
        (12, "the quick brown fox jumps over the lazy dog again and again",
             None, "src1"),
        (13, "tail tail tail something tail",           "en", None),
        (14, " ".join(f"u{i}" for i in range(50)),      "zh", "src0"),
        (900000001, "big id doc with some words here",  "en", "src1"),
        # non-BMP code points (UTF-16 surrogate pairs): a UTF-16-unit
        # symbol split (q97 BPE) or char count would diverge from SQL
        # character semantics here
        (16, "\U0001F600\U0001F600\U0001F600 cafés \U0001F600café", "en", "src0"),
    ]
    cols = list(zip(*rows))
    t = pa.table({
        "doc_id": pa.array(cols[0], pa.int64()),
        "text":   pa.array(cols[1], pa.string()),
        "lang":   pa.array(cols[2], pa.string()),
        "source": pa.array(cols[3], pa.string()),
        "n_chars": pa.array(
            [len(x) if x is not None else None for x in cols[1]], pa.int64()),
    })
    pq.write_table(t, f"{outdir}/documents.parquet")
    print(f"wrote {t.num_rows} rows to {outdir}/documents.parquet")

    def vec(seed, dim=8):
        return [((seed * 31 + i * 7) % 13 - 6) / 6.0 for i in range(dim)]
    ids = list(range(1, 13)) + [13, 15]
    vecs = [vec(i) for i in range(1, 13)] + [None, [0.0] * 8]
    labs = [i % 4 for i in range(1, 13)] + [0, 2]
    e = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [[float(x) for x in v] if v is not None else None for v in vecs],
            pa.list_(pa.float32())),
        "label": pa.array(labs, pa.int64()),
    })
    pq.write_table(e, f"{outdir}/embeddings.parquet")
    print(f"wrote {e.num_rows} rows to {outdir}/embeddings.parquet")

    import datetime
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    def ts(m):
        return base + datetime.timedelta(minutes=m)
    erows = [
        (1, ts(0), 7, "click", 1.5, '{"k":"v"}'),
        (2, ts(1), 7, "view", 2.0, '{"k":"w"}'),
        (3, ts(90), 7, "click", 0.5, '{"k":"x"}'),
        (4, ts(2), None, "click", 1.0, '{"k":"7"}'),
        (5, ts(3), None, "view", None, None),
        (6, ts(5), 8, "click", 3.0, '{"a":1}'),
        (7, ts(5), 8, "click", 3.0, '{"a":1}'),
        (8, ts(6), 9, None, 4.0, "not json"),
        (9, ts(7), 9, "buy", -1.0, '{"nested":{"x":2}}'),
        (10, ts(60), 10, "click", 1.0, "{}"),
        (11, ts(60 * 24 * 400), 11, "view", 9.9, '{"z":0}'),
    ]
    ec = list(zip(*erows))
    ev = pa.table({
        "event_id": pa.array(ec[0], pa.int64()),
        "ts": pa.array(ec[1], pa.timestamp("ns")),
        "user_id": pa.array(ec[2], pa.int64()),
        "event_type": pa.array(ec[3], pa.string()),
        "value": pa.array(ec[4], pa.float64()),
        "props": pa.array(ec[5], pa.string()),
    })
    pq.write_table(ev, f"{outdir}/events.parquet")
    print(f"wrote {ev.num_rows} rows to {outdir}/events.parquet")

if __name__ == "__main__":
    import os
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/adversarial"
    os.makedirs(outdir, exist_ok=True)
    main(outdir)
