#!/usr/bin/env python3
"""Write an adversarial `documents` fixture for oracle-parity sweeps.

The driver fixture is friendly (non-null ASCII text, populated lang/source);
this one exercises the shapes real corpora contain: NULL text, empty and
whitespace-only text, single-char and multibyte tokens, regex-special
characters, runs of mixed whitespace, exact-duplicate bodies, NULL lang and
NULL source, and a large doc_id. Round 6's sweep over it caught three real
divergences (q91 null-text admission + NULL-source join, q88 null flags,
q34 null-vs-zero simhash) that the friendly fixture could never show.

Usage:
    python3 tools/adversarial_fixture.py [outdir=/tmp/adversarial]
    sbt -batch "runMain graft.Verify /tmp/adversarial /tmp/v_adv <doc-family queries>"
    python3 tools/compare_oracle.py /tmp/adversarial /tmp/v_adv

Only the documents-family queries apply (no embeddings/events tables here).
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

if __name__ == "__main__":
    import os
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/adversarial"
    os.makedirs(outdir, exist_ok=True)
    main(outdir)
