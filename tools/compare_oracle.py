#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sf_dir> <verify_out_dir>

For each query output parquet under <verify_out_dir>/<name>/, runs the
matching oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB (tables
registered as views over <sf_dir>/*.parquet) and compares.

DRIVER-FAITHFUL READERS (the round-6/7 q91 lesson): the driver reads the
Spark parquet and the DuckDB result through DIFFERENT bridges, so this tool
does too — the Spark side via pandas/pyarrow (parquet DECIMAL -> exact
`Decimal` objects) and the oracle via duckdb's pandas bridge (DECIMAL(38) ->
float64).  Comparison is cell-by-cell on canonical STRING forms (floats
rounded to 6dp, Decimal/int collapsed to a common integral spelling), so a
column whose two sides decode to different Python types but equal values is
reported as REPRESENTATION-UNSTABLE — a gate failure here even though the
values match, because the driver's hash may diverge on exactly that.
Dev tool only — not part of the shipped library.
"""
import sys, os, json, glob
from decimal import Decimal
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Canonical string form of one value (and its representation class)."""
    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return "NULL", "null"
    if isinstance(v, bool):
        return str(bool(v)), "bool"
    if isinstance(v, float):
        r = round(v, 6)
        if r == int(r) and abs(r) < 2**53:
            return str(int(r)), "float"
        return repr(r), "float"
    if isinstance(v, Decimal):
        if v == v.to_integral_value():
            return str(int(v)), "decimal"
        return str(v.normalize()), "decimal"
    if isinstance(v, int):
        return str(v), "int"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        parts = [cell(x)[0] for x in v]
        return "[" + ",".join(parts) + "]", "list"
    return str(v), type(v).__name__


def canon(df):
    """(sorted rows of canonical strings, per-column representation kinds)."""
    cols = sorted(df.columns)
    kinds = {c: set() for c in cols}
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        row = []
        for c, v in zip(cols, rec):
            s, k = cell(v)
            if k != "null":
                kinds[c].add(k)
            row.append(s)
        rows.append(tuple(row))
    rows.sort()
    return cols, rows, kinds


def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table: a directory of part files (the sf1 soak
            # fixture) rather than the driver's single-file layout
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = n_rowsonly = 0
    report = {}

    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"!! {name}: NO OUTPUT FILES")
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, err="no output files")
            n_bad += 1
            continue
        # Spark side through pyarrow — the exact-Decimal reader.
        spark_df = pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True)
        if name not in oracle:
            n = spark_df.shape[0]
            status = "rows-only" if n > 0 else "ROWS-ONLY EMPTY (!)"
            print(f"-- {name}: {status} ({n} rows)")
            record(name, rows_match=n > 0, spark_rows=n, err="no oracle sql")
            n_rowsonly += 1
            continue
        try:
            # Oracle side through duckdb's pandas bridge — the lossy reader.
            a_cols, a_rows, a_kinds = canon(spark_df)
            b_cols, b_rows, b_kinds = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"!! {name}: ERROR {e}")
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, err=str(e)[:300])
            n_bad += 1
            continue
        if a_cols != b_cols:
            print(f"!! {name}: COLUMN MISMATCH spark={a_cols} oracle={b_cols}")
            record(name, rows_match=len(a_rows) == len(b_rows),
                   schema_match=False, hash_match=False,
                   spark_rows=len(a_rows), oracle_rows=len(b_rows))
            n_bad += 1
            continue
        if len(a_rows) != len(b_rows):
            print(f"!! {name}: SHAPE MISMATCH spark={len(a_rows)} "
                  f"oracle={len(b_rows)}")
            record(name, rows_match=False, schema_match=True,
                   hash_match=False,
                   spark_rows=len(a_rows), oracle_rows=len(b_rows))
            n_bad += 1
            continue
        # Representation stability: a column that decodes as Decimal on one
        # side and float on the other hashes differently at the driver even
        # when every value is equal.  (q91 round-6/7 failure mode.)
        unstable = [c for c in a_cols
                    if a_kinds[c] and b_kinds[c]
                    and "decimal" in (a_kinds[c] | b_kinds[c])
                    and a_kinds[c] != b_kinds[c]]
        if a_rows == b_rows:
            if unstable:
                print(f"!! {name}: values equal but REPRESENTATION-UNSTABLE "
                      f"cols={unstable} "
                      f"(spark={[sorted(a_kinds[c]) for c in unstable]} "
                      f"oracle={[sorted(b_kinds[c]) for c in unstable]})")
                record(name, rows_match=True, schema_match=True,
                       hash_match=False,
                       spark_rows=len(a_rows), oracle_rows=len(b_rows),
                       err=f"representation-unstable cols={unstable}")
                n_bad += 1
            else:
                print(f"ok {name}: {len(a_rows)} rows")
                record(name, rows_match=True, schema_match=True,
                       hash_match=True,
                       spark_rows=len(a_rows), oracle_rows=len(b_rows))
                n_ok += 1
        else:
            bad = [i for i, (x, y) in enumerate(zip(a_rows, b_rows)) if x != y]
            print(f"!! {name}: VALUE MISMATCH in {len(bad)}/{len(a_rows)} rows")
            for i in bad[:3]:
                print("   spark:", dict(zip(a_cols, a_rows[i])))
                print("   oracle:", dict(zip(b_cols, b_rows[i])))
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(a_rows), oracle_rows=len(b_rows),
                   err=f"value mismatch in {len(bad)} rows")
            n_bad += 1
    print(f"\n== {n_ok} ok, {n_bad} bad, {n_rowsonly} rows-only ==")
    if json_out:
        # Same per-query shape as the driver's CORRECTNESS_r{N}.json, so a
        # hostile-fixture sweep is a diffable committed artifact
        # (HOSTILE_r{N}.json) instead of prose.
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
