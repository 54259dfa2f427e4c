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

Round 8 also added HOSTILE RELATIONAL tables (the whole star schema, this
file's `relational()`) and swept the 40 relational-family queries,
catching five more: Spark's NULL-propagating concat vs DuckDB's
NULL-skipping concat (q21 — pinned via the SQL-standard `||`), the asof
union+window formulation matching NULL keys to each other where SQL join
semantics never match NULL=NULL (q48 — null keys/timestamps now routed
around the window), DuckDB ERRORING on sqrt(negative) where Spark yields
NaN (q62 — domain-guarded to NULL on both sides), and plain equi-joins
silently dropping the NULL-returnflag group that GROUP BY keeps (q63/q73
— null-safe joins; q63's rank bounds also switched to per-measure
non-null counts, and q73 takes count(*) from the source, not the
null-filtered percentile pass).

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

    relational(outdir)


def relational(outdir: str) -> None:
    """Hostile variants of the TPC-H-ish star schema (round 8): PKs stay
    unique and non-null (the warehouse contract), but attributes go NULL,
    FKs dangle or go NULL, strings carry multibyte + regex specials, money
    goes negative/huge, dates hit epoch boundaries and far-future. Sweeps
    the relational families for cross-engine null semantics (e.g. Spark
    windows default NULLS FIRST where DuckDB defaults NULLS LAST — any
    nullable sort key must pin its null order explicitly)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime

    def w(name, cols):
        t = pa.table(cols)
        pq.write_table(t, f"{outdir}/{name}.parquet")
        print(f"wrote {t.num_rows} rows to {outdir}/{name}.parquet")

    w("region", {
        "r_regionkey": pa.array([0, 1, 2], pa.int32()),
        "r_name": pa.array(["AMERICA", None, "EMPTY (no nations)"]),
    })
    w("nation", {
        "n_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
        "n_name": pa.array(["BRAZIL", "日本", None, "a.b*c"]),
        # 1 -> NULL region, 3 -> dangling region 9
        "n_regionkey": pa.array([0, None, 0, 9], pa.int32()),
    })
    w("customer", {
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "c_name": pa.array(["Customer#1", None, "", "Ç川 Müller",
                            "O'Brien (x*y)", "c6 no orders"]),
        "c_nationkey": pa.array([0, 1, None, 9, 2, 3], pa.int32()),
        "c_acctbal": pa.array([100.5, None, -999.99, 0.0, 1e7, 3.25],
                              pa.float64()),
        "c_mktsegment": pa.array(["BUILDING", None, "BUILDING", "AUTO",
                                  "", "MACHINERY"]),
    })
    w("supplier", {
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array([None, "Süpplier#2"]),
        "s_nationkey": pa.array([0, None], pa.int32()),
        "s_acctbal": pa.array([None, -5.5], pa.float64()),
    })
    w("part", {
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["green part", None, "part [3]"]),
        "p_brand": pa.array(["B#1", "B#1", None]),
        "p_type": pa.array([None, "SMALL PLATED", "SMALL PLATED"]),
        "p_size": pa.array([1, None, 50], pa.int32()),
        "p_retailprice": pa.array([9.99, 0.0, None], pa.float64()),
    })
    epoch = datetime.datetime(1970, 1, 1)
    d = datetime.datetime
    w("orders", {
        "o_orderkey": pa.array([10, 11, 12, 13, 14, 15, 16], pa.int64()),
        # 12 -> NULL cust, 13 -> dangling cust 99
        "o_custkey": pa.array([1, 1, None, 99, 2, 4, 5], pa.int64()),
        "o_orderstatus": pa.array(["F", "O", None, "F", "P", "O", "F"]),
        "o_totalprice": pa.array([100.0, None, 50.5, -10.0, 1e9, 0.0, 77.7],
                                 pa.float64()),
        "o_orderdate": pa.array(
            [d(1995, 3, 1), d(1995, 3, 1), None, epoch,
             d(2099, 12, 31), d(1995, 3, 2), d(1995, 3, 1)],
            pa.timestamp("ms")),
        "o_orderpriority": pa.array(
            ["1-URGENT", None, "2-HIGH", "1-URGENT", "", "3-MEDIUM",
             "2-HIGH"]),
    })
    w("lineitem", {
        "l_orderkey": pa.array([10, 10, 11, 12, 13, 14, 15, 16, 99],
                               pa.int64()),
        # 99 -> dangling order; part/supp FKs NULL or dangling
        "l_partkey": pa.array([1, 2, None, 3, 9, 1, 2, 3, 1], pa.int64()),
        "l_suppkey": pa.array([1, None, 2, 9, 1, 2, 1, 2, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1, 1, 1, 1, 1, 1], pa.int32()),
        "l_quantity": pa.array([5.0, None, 3.0, 0.0, -2.0, 1e6, 7.0, 2.0,
                                4.0], pa.float64()),
        "l_extendedprice": pa.array([50.0, 20.0, None, 0.0, -10.0, 1e8,
                                     70.0, 20.0, 40.0], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, None, 1.0, 0.5, 0.0, 0.05, 0.0,
                                0.0], pa.float64()),
        "l_tax": pa.array([0.02, None, 0.0, 0.0, 0.0, 0.08, 0.0, 0.0, 0.0],
                          pa.float64()),
        "l_returnflag": pa.array(["A", "A", None, "R", "N", "A", "N", "R",
                                  "A"]),
        "l_linestatus": pa.array(["F", None, "O", "F", "O", "F", "O", "F",
                                  "F"]),
        "l_shipdate": pa.array(
            [d(1995, 3, 5), None, d(1995, 3, 6), epoch, d(2099, 1, 1),
             d(1995, 3, 7), d(1995, 3, 8), d(1995, 3, 9), d(1995, 3, 10)],
            pa.timestamp("ms")),
    })

if __name__ == "__main__":
    import os
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/adversarial"
    os.makedirs(outdir, exist_ok=True)
    main(outdir)
