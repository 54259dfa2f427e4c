#!/usr/bin/env python3
"""Full-50k cross-engine validation for the recursive-CTE oracle family.

The q74-family oracles (q74/q130/q145/q159/q163/q169) spell connected
components as a DuckDB recursive CTE (`reach`): the transitive closure
materializes (node, every-reachable-label) — O(sum cluster_size^2) rows,
re-deduplicated against the whole accumulated set every iteration — which
stops terminating around 10k docs (round-17 probe: ~20 min at 5k docs,
unfinished at 10k). The ENGINES' answer is scale-invariant; only the
oracle's SPELLING is the ceiling. This tool re-spells exactly that
fragment iteratively and leaves everything else untouched — fingerprints,
pair predicate, final aggregation SQL, and the driver-faithful comparison
(compare_oracle.canon over the same two parquet bridges):

1. split the oracle SQL at the `reach AS (...), clusters AS (...)` block
   (one shared builder text — SparkEntry.dupClustersCte and the
   knnGraphCte caller emit the identical shape),
2. materialize the edge-CTE prefix into a temp table,
3. min-label propagation with pointer jumping (lbl := min over self,
   neighbors' lbl, and lbl(lbl)) to a fixpoint — the same
   component-minimum labeling the recursive CTE defines, but in
   O(log n) rounds of hash joins instead of a transitive closure,
4. substitute `clusters AS (SELECT doc_id, cluster_id FROM cc_clusters)`
   into the original SQL and run the tail unchanged (the now-unreferenced
   pair CTEs are pruned by DuckDB's planner).

Usage:
  python3 tools/iterative_cc_oracle.py <sf_dir> <verify_out_dir> [names...]

<verify_out_dir> must hold graft.Verify outputs (per-query parquet dirs +
oracle_sql.json) for the requested names. Run ONE query per process when
validating at sf1 — the round-17 lesson: a long-lived DuckDB connection
accretes unattributed state that degrades later queries by orders of
magnitude. Dev tool only — not part of the shipped library.
"""
import sys, os, re, json, glob, time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_oracle import TABLES, canon

FAMILY = [
    "q74_dup_clusters",
    "q130_image_dhash_clusters",
    "q145_knn_cluster_purity",
    "q159_soft_dedup",
    "q163_effective_data",
    "q169_cluster_chain_audit",
    "q172_audio_fp_clusters",
    # no recursion, but its two pair stages are OR-of-band nested-loop
    # joins (quadratic at 50k) — band-split surgery below turns each into
    # a UNION ALL of hash equi-joins + DISTINCT, mathematically identical
    "q127_dedup_agreement",
]

# the exact builder shape: reach seeds (src, src), propagates labels along
# edges, clusters takes the min reachable label per node
REACH_RE = re.compile(r"reach AS \(\s*SELECT src AS node.*?GROUP BY node\)",
                      re.S)
ETAB_RE = re.compile(r"FROM \(SELECT DISTINCT src FROM (\w+)\)")

# OR-of-band pair stages (quadratic nested-loop joins at 50k docs) — each
# is rewritten as a UNION ALL of per-band hash equi-joins + DISTINCT,
# which is set-identical to the OR predicate.
P_SIMHASH_RE = re.compile(
    r"p AS \(\s*SELECT a\.doc_id AS doc_a, b\.doc_id AS doc_b\s*"
    r"FROM fp a JOIN fp b ON a\.doc_id < b\.doc_id\s*"
    r"WHERE \(\(\(a\.simhash.*?<= 6\)", re.S)
CAND_RE = re.compile(
    r"cand AS \(.*?WHERE a\.band_0 = b2\.band_0 OR a\.band_1 = b2\.band_1 "
    r"OR a\.band_2 = b2\.band_2 OR a\.band_3 = b2\.band_3\)", re.S)
SH_RE = re.compile(
    r"(?<!\w)sh AS \(\s*SELECT coalesce\(CAST\(count\(\*\) AS BIGINT\), 0\)"
    r" AS n_sh,.*?<= 6\)", re.S)


def _simhash_band_union(tab):
    return "\n  UNION ALL ".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        f" bit_count(xor(a.simhash, b.simhash)) AS ham"
        f"\n  FROM {tab} a JOIN {tab} b ON a.doc_id < b.doc_id"
        f" AND ((a.simhash >> {k}) & 32767) = ((b.simhash >> {k}) & 32767)"
        for k in (0, 15, 30, 45))


P_SIMHASH_SPLIT = ("p AS (\n SELECT DISTINCT doc_a, doc_b FROM (\n  "
                   + _simhash_band_union("fp")
                   + ") u WHERE ham <= 6)")

CAND_SPLIT = """cpair AS (
 SELECT DISTINCT doc_a, doc_b FROM (
  """ + "\n  UNION ALL ".join(
    f"SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b"
    f"\n  FROM b a JOIN b b2 ON a.doc_id < b2.doc_id"
    f" AND a.band_{k} = b2.band_{k}" for k in range(4)) + """) u),
cand AS (
 SELECT p.doc_a, p.doc_b,
  CAST(len(list_intersect(list_distinct(ba.ws), list_distinct(bb.ws))) AS DOUBLE) /
   len(list_distinct(list_concat(ba.ws, bb.ws))) AS jac
 FROM cpair p JOIN b ba ON ba.doc_id = p.doc_a
      JOIN b bb ON bb.doc_id = p.doc_b)"""

SH_SPLIT = ("""shp AS (
 SELECT DISTINCT doc_a, doc_b, ham FROM (
  """ + _simhash_band_union("fp") + """) u WHERE ham <= 6),
sh AS (
 SELECT coalesce(CAST(count(*) AS BIGINT), 0) AS n_sh,
  coalesce(CAST(sum(ham) AS BIGINT), 0) AS hsum_sh FROM shp)""")


def band_split(sql):
    """Rewrite every OR-of-band nested-loop pair stage as banded hash
    equi-joins. Returns (sql, n_rewrites)."""
    n = 0
    for pat, rep in ((P_SIMHASH_RE, P_SIMHASH_SPLIT),
                     (CAND_RE, CAND_SPLIT), (SH_RE, SH_SPLIT)):
        sql, k = pat.subn(rep.replace("\\", "\\\\"), sql)
        n += k
    return sql, n


def iterative_components(con, edges_sql):
    """cc_clusters(doc_id, cluster_id) = component-min labeling of the
    symmetric edge set produced by edges_sql, via min-label propagation
    with pointer jumping. Returns (n_edges, rounds)."""
    t0 = time.time()
    con.sql(f"CREATE OR REPLACE TEMP TABLE cc_edges AS {edges_sql}")
    n_edges = con.sql("SELECT count(*) FROM cc_edges").fetchone()[0]
    print(f"  [edges] {n_edges} rows in {time.time() - t0:.1f}s", flush=True)
    # seed exactly like the CTE: every endpoint (the edge set is symmetric,
    # so DISTINCT src covers both sides), label = own id
    con.sql("CREATE OR REPLACE TEMP TABLE cc_lbl AS "
            "SELECT DISTINCT src AS node, src AS lbl FROM cc_edges")
    rounds = 0
    while True:
        rounds += 1
        # neighbor step: labels flow along edges (dst -> src, symmetric)
        con.sql("""CREATE OR REPLACE TEMP TABLE cc_n1 AS
            SELECT node, min(lbl) AS lbl FROM (
              SELECT node, lbl FROM cc_lbl
              UNION ALL
              SELECT e.src AS node, l.lbl
              FROM cc_edges e JOIN cc_lbl l ON l.node = e.dst
            ) GROUP BY node""")
        # pointer jumping: lbl := min(lbl, lbl(lbl)) — halves chain depth
        con.sql("""CREATE OR REPLACE TEMP TABLE cc_n2 AS
            SELECT a.node, least(a.lbl, coalesce(b.lbl, a.lbl)) AS lbl
            FROM cc_n1 a LEFT JOIN cc_n1 b ON b.node = a.lbl""")
        changed = con.sql(
            "SELECT count(*) FROM cc_n2 n JOIN cc_lbl o USING (node) "
            "WHERE n.lbl <> o.lbl").fetchone()[0]
        con.sql("CREATE OR REPLACE TEMP TABLE cc_lbl AS "
                "SELECT node, lbl FROM cc_n2")
        if changed == 0:
            break
        if rounds > 200:
            raise RuntimeError("label propagation failed to converge")
    con.sql("CREATE OR REPLACE TEMP TABLE cc_clusters AS "
            "SELECT node AS doc_id, lbl AS cluster_id FROM cc_lbl")
    return n_edges, rounds


def run_one(con, name, sql, out_dir):
    sql, n_splits = band_split(sql)
    t0 = time.time()
    m = REACH_RE.search(sql)
    if m:
        etab_m = ETAB_RE.search(m.group(0))
        if not etab_m:
            print(f"!! {name}: edge table not found in reach block")
            return False
        etab = etab_m.group(1)
        prefix = sql[:m.start()].rstrip().rstrip(",")
        edges_sql = (prefix.replace("WITH RECURSIVE", "WITH")
                     + f"\nSELECT src, dst FROM {etab}")
        n_edges, rounds = iterative_components(con, edges_sql)
        final_sql = (sql[:m.start()]
                     + "clusters AS (SELECT doc_id, cluster_id FROM cc_clusters)"
                     + sql[m.end():]).replace("WITH RECURSIVE", "WITH")
        t1 = time.time()
        oracle_df = con.sql(final_sql).df()
        t2 = time.time()
        print(f"  [cc] splits={n_splits} rounds={rounds} edges={n_edges} "
              f"cc={t1 - t0:.1f}s tail={t2 - t1:.1f}s", flush=True)
    elif n_splits > 0:
        # q127's class: no recursion, just the band-split pair stages
        oracle_df = con.sql(sql).df()
        print(f"  [split-only] splits={n_splits} "
              f"{time.time() - t0:.1f}s", flush=True)
    else:
        print(f"!! {name}: neither reach/clusters nor a band-split "
              f"pattern found — nothing this tool can validate")
        return False

    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        print(f"!! {name}: no Spark output under {out_dir}/{name}")
        return False
    spark_df = pd.concat([pd.read_parquet(f) for f in files],
                         ignore_index=True)
    a_cols, a_rows, a_kinds = canon(spark_df)
    b_cols, b_rows, b_kinds = canon(oracle_df)
    if a_cols != b_cols:
        print(f"!! {name}: COLUMN MISMATCH spark={a_cols} oracle={b_cols}")
        return False
    if len(a_rows) != len(b_rows):
        print(f"!! {name}: SHAPE MISMATCH spark={len(a_rows)} "
              f"oracle={len(b_rows)}")
        return False
    unstable = [c for c in a_cols
                if a_kinds[c] and b_kinds[c]
                and "decimal" in (a_kinds[c] | b_kinds[c])
                and a_kinds[c] != b_kinds[c]]
    if a_rows != b_rows:
        bad = [i for i, (x, y) in enumerate(zip(a_rows, b_rows)) if x != y]
        print(f"!! {name}: {len(bad)} mismatched rows "
              f"(first: spark={a_rows[bad[0]]} oracle={b_rows[bad[0]]})")
        return False
    if unstable:
        print(f"!! {name}: REPRESENTATION-UNSTABLE cols={unstable}")
        return False
    print(f"ok {name}: {len(a_rows)} rows ({time.time() - t0:.1f}s total)")
    return True


def fresh_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main(sf_dir, out_dir, names):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    todo = names or [n for n in FAMILY if n in oracle]
    n_ok = 0
    for name in todo:
        if name not in oracle:
            print(f"!! {name}: no oracle sql")
            continue
        # One FRESH connection per query — a long-lived DuckDB connection
        # accretes temp-table/catalog state that degrades later queries by
        # orders of magnitude at sf1 (the round-17 lesson in the module
        # docstring). close() also releases each query's temp tables.
        con = fresh_con(sf_dir)
        try:
            if run_one(con, name, oracle[name], out_dir):
                n_ok += 1
        finally:
            con.close()
    print(f"== {n_ok} ok, {len(todo) - n_ok} bad ==")
    return 0 if n_ok == len(todo) else 1


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
