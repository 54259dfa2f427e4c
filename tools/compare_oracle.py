#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sf_dir> <verify_out_dir>

For each query output parquet under <verify_out_dir>/<name>/, runs the
matching oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB (tables
registered as views over <sf_dir>/*.parquet), canonicalizes both sides
(columns sorted by name, doubles rounded, rows sorted), and reports
match/mismatch per query.  Dev tool only — not part of the shipped library.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql, label):
    df = con.sql(rel_sql).df()
    cols = sorted(df.columns)
    df = df[cols]
    for c in cols:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.sort_values(by=cols, ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"!! {name}: NO OUTPUT FILES")
            n_bad += 1
            continue
        spark_sql = f"SELECT * FROM read_parquet({files!r})"
        if name not in oracle:
            n = con.sql(spark_sql).df().shape[0]
            status = "rows-only" if n > 0 else "ROWS-ONLY EMPTY (!)"
            print(f"-- {name}: {status} ({n} rows)")
            n_rowsonly += 1
            continue
        try:
            a = canon(con, spark_sql, "spark")
            b = canon(con, oracle[name], "oracle")
        except Exception as e:
            print(f"!! {name}: ERROR {e}")
            n_bad += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"!! {name}: COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1
            continue
        if a.shape != b.shape:
            print(f"!! {name}: SHAPE MISMATCH spark={a.shape} oracle={b.shape}")
            n_bad += 1
            continue
        if a.equals(b):
            print(f"ok {name}: {a.shape[0]} rows")
            n_ok += 1
        else:
            diff = (a != b) & ~(a.isna() & b.isna())
            ndiff = int(diff.any(axis=1).sum())
            print(f"!! {name}: VALUE MISMATCH in {ndiff}/{a.shape[0]} rows, "
                  f"cols={list(diff.any()[diff.any()].index)}")
            idx = diff.any(axis=1)
            print("   spark:", a[idx].head(3).to_dict("records"))
            print("   oracle:", b[idx].head(3).to_dict("records"))
            n_bad += 1
    print(f"\n== {n_ok} ok, {n_bad} bad, {n_rowsonly} rows-only ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
