#!/usr/bin/env python3
"""Large-SF oracle replay for the CC-fixpoint queries (dev tool).

The five cluster-family oracles close the duplicate-pair relation with
a recursive CTE (`reach` = full transitive reachability, then per-node
min). That closure is quadratic in component size and does not converge
in DuckDB at sf1+ (r9 finding) — but the RELATION it closes and every
aggregation on top are plain SQL. So this replay keeps the committed
oracle text verbatim EXCEPT the reach/lab pair, which it replaces with
an ITERATIVE min-label propagation executed as a DuckDB loop:

    lab0(v)  = min(v, min of v's neighbors)
    lab_i(v) = min(lab_{i-1}(v), min over neighbors of lab_{i-1})
    ... until no label changes (diameter-bounded rounds)

At the fixpoint every node carries its component minimum — exactly what
`lab AS (SELECT a, LEAST(a, MIN(b)) FROM reach GROUP BY a)` denotes —
so the replay checks the same semantics with a closure DuckDB can
actually run. Everything else (pair generation, corpus CTEs, final
aggregations, the cell-exact compare) is the committed oracle verbatim.

Usage: replay_cc.py <sfDir> <outDir> [query,query,...]
after `graft.Verify <sfDir> <outDir> <queries>`.
"""
import sys, json, glob, os, re, time
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
if os.environ.get("COMPARE_DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['COMPARE_DUCKDB_MEM']}'")
if os.environ.get("COMPARE_MAX_TEMP"):
    con.execute(f"SET max_temp_directory_size='{os.environ['COMPARE_MAX_TEMP']}'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    if os.path.exists(f"{sf_dir}/{t}.parquet"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

# the reach/lab block is byte-identical across the text-family oracles
# and differs only in join alias + id column for the embedding one
REACH_RE = re.compile(
    r"reach\(a, b\) AS \(\n"
    r"  SELECT a, b FROM edges\n"
    r"  UNION\n"
    r"  SELECT r\.a, e2?\.b FROM reach r JOIN edges e2? ON r\.b = e2?\.a\n"
    r"\),\n"
    r"lab AS \(SELECT a AS (doc_id|vec_id), LEAST\(a, MIN\(b\)\) AS cluster_id FROM reach GROUP BY a\)")


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


results, fails = {}, 0
for name in sorted(oracles):
    if only and name not in only:
        continue
    sql = oracles[name]
    m = REACH_RE.search(sql)
    if not m:
        results[name] = "SKIP: no reach/lab block (use compare.py)"
        continue
    id_col = m.group(1)
    t0 = time.time()
    # 1) materialize the bidirectional edge relation from the committed
    #    prefix CTEs, verbatim (unused CTEs are pruned by the planner)
    prefix = sql[:m.start()].rstrip()
    assert prefix.endswith(","), f"{name}: unexpected CTE prefix shape"
    con.execute("DROP TABLE IF EXISTS edges_mat")
    con.execute(f"CREATE TABLE edges_mat AS {prefix[:-1]}\nSELECT a, b FROM edges")
    n_edges = con.execute("SELECT COUNT(*) FROM edges_mat").fetchone()[0]
    # 2) iterative min-label propagation to the fixpoint
    con.execute("DROP TABLE IF EXISTS lab_mat")
    con.execute("""CREATE TABLE lab_mat AS
        SELECT a AS id, LEAST(a, MIN(b)) AS cluster_id
        FROM edges_mat GROUP BY a""")
    rounds = 0
    while True:
        rounds += 1
        con.execute("DROP TABLE IF EXISTS nl")
        con.execute("""CREATE TABLE nl AS
            SELECT l.id, LEAST(l.cluster_id, MIN(lb.cluster_id)) AS cluster_id
            FROM lab_mat l
            JOIN edges_mat e ON e.a = l.id
            JOIN lab_mat lb ON lb.id = e.b
            GROUP BY l.id, l.cluster_id""")
        changed = con.execute("""SELECT COUNT(*) FROM nl
            JOIN lab_mat USING (id)
            WHERE nl.cluster_id <> lab_mat.cluster_id""").fetchone()[0]
        con.execute("DROP TABLE lab_mat")
        con.execute("ALTER TABLE nl RENAME TO lab_mat")
        if changed == 0:
            break
        if rounds > 200:
            raise RuntimeError(f"{name}: label propagation did not converge")
    # 3) the committed oracle with reach/lab swapped for the fixpoint table
    final_sql = (sql[:m.start()]
                 + f"lab AS (SELECT id AS {id_col}, cluster_id FROM lab_mat)"
                 + sql[m.end():]).replace("WITH RECURSIVE", "WITH", 1)
    exp = con.execute(final_sql).fetchdf()
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet"); fails += 1; continue
    got = pd.concat([pd.read_parquet(fp) for fp in files], ignore_index=True)
    g, e = canon(got), canon(exp)
    status = None
    if list(g.columns) != list(e.columns):
        status = f"FAIL: columns {list(g.columns)} vs {list(e.columns)}"
    elif len(g) != len(e):
        status = f"FAIL: rows {len(g)} vs {len(e)}"
    else:
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                eq = (gv == ev) | (gv.isna() & ev.isna())
            except Exception:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                i = int(eq.idxmin())
                status = f"FAIL: col {c} row {i}: spark={gv.iloc[i]!r} duckdb={ev.iloc[i]!r}"
                break
    if status is None:
        status = (f"OK {len(g)} rows cell-exact (edges {n_edges}, "
                  f"{rounds} propagation rounds, {time.time()-t0:.1f}s)")
    else:
        fails += 1
    results[name] = status
    print(f"{name}: {status}", flush=True)

print(json.dumps(results, indent=1))
sys.exit(1 if fails else 0)
