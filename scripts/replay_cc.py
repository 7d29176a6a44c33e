#!/usr/bin/env python3
"""Large-SF oracle replay for the CC-fixpoint queries (dev tool).

The five cluster-family oracles close the duplicate-pair relation with
a recursive CTE (`reach` = full transitive reachability, then per-node
min). That closure is quadratic in component size and does not converge
in DuckDB at sf1+ (r9 finding) — but the RELATION it closes and every
aggregation on top are plain SQL. So this replay keeps the committed
oracle text EXCEPT the reach/lab pair, which it replaces with an
ITERATIVE min-label propagation executed as a DuckDB loop:

    lab0(v)  = min(v, min of v's neighbors)
    lab_i(v) = min(lab_{i-1}(v), min over neighbors of lab_{i-1})
    ... until no label changes (diameter-bounded rounds)

At the fixpoint every node carries its component minimum — exactly what
`lab AS (SELECT a, LEAST(a, MIN(b)) FROM reach GROUP BY a)` denotes.

Two mechanical accommodations for sf10 scale, both semantics-preserving:
 - the text family's shingle-intersection self-join (rsh x rsh on h) is
   computed in hash-bucketed parts with a final SUM re-aggregation (an
   associative COUNT decomposed by shingle hash; single-shot it spills
   past the 60 GB temp cap) — the CTE bodies are EXTRACTED from the
   committed SQL by exact-shape regexes that fail loudly on drift, with
   only materialized-table names and the bucket predicate substituted;
 - queries sharing a pair relation (the four text-family ones) share
   one materialized edges/labels pair.

One observed engine quirk, harmless to the check: DuckDB 1.0.0 treats
`UNION` between NON-recursive CTEs inside a WITH RECURSIVE block as
UNION ALL (verified minimally: WITH RECURSIVE a(1), b(1) → a UNION b
counts 2). The committed oracles' `pairs`/`edges` CTEs therefore carry
duplicate rows that the recursive `reach` immediately dedups; this
replay materializes the DISTINCT edge set, whose closure fixpoint is
identical — proven cell-exact against the Spark side at sf0.01 for all
five queries in both forms.

Usage: replay_cc.py <sfDir> <outDir> [query,query,...]
after `graft.Verify <sfDir> <outDir> <queries>`.
"""
import sys, json, glob, os, re, time, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
NB = int(os.environ.get("REPLAY_CC_BUCKETS", "32"))

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

REACH_RE = re.compile(
    r"reach\(a, b\) AS \(\n"
    r"  SELECT a, b FROM edges\n"
    r"  UNION\n"
    r"  SELECT r\.a, e2?\.b FROM reach r JOIN edges e2? ON r\.b = e2?\.a\n"
    r"\),\n"
    r"lab AS \(SELECT a AS (doc_id|vec_id), LEAST\(a, MIN\(b\)\) AS cluster_id FROM reach GROUP BY a\)")

# exact shapes of the committed text-family pair CTEs (Dedup.scala
# clusterLabCtes); any drift in the committed SQL breaks these regexes
# and the replay fails loudly instead of checking something else
INTER_RE = re.compile(
    r"inter AS \(\n"
    r"  SELECT a\.doc_id AS doc_a, b\.doc_id AS doc_b, COUNT\(\*\) AS inter\n"
    r"  FROM rsh a JOIN rsh b ON a\.h = b\.h AND a\.doc_id < b\.doc_id\n"
    r"  GROUP BY 1, 2\n\),")
NEARP_RE = re.compile(
    r"nearp AS \(\n"
    r"  SELECT doc_a, doc_b FROM inter\n"
    r"  JOIN sizes sa ON sa\.doc_id = doc_a\n"
    r"  JOIN sizes sb ON sb\.doc_id = doc_b\n"
    r"  WHERE (CAST\(inter AS DOUBLE\) / \(sa\.n_sh \+ sb\.n_sh - inter\) >= [0-9.]+)\n\),")
FPS_RE = re.compile(r"fps AS \((SELECT doc_id, md5\(.*?\) AS fp) FROM corpus\),")


def build_edges_text(sql):
    """Materialize the text-family edge relation at scale: committed
    CTE chain with rsh/corpus materialized once and the intersection
    join bucketed by shingle hash."""
    i = sql.find("sizes AS")
    assert i > 0, "no sizes CTE"
    chain = sql[:i].rstrip().rstrip(",").replace("WITH RECURSIVE", "WITH", 1)
    nearp_m = NEARP_RE.search(sql)
    fps_m = FPS_RE.search(sql)
    assert INTER_RE.search(sql) and nearp_m and fps_m, "committed CTE shape drift"
    jacc_pred = nearp_m.group(1)
    for t in ["rsh_mat", "corpus_mat", "sizes_mat", "inter_parts",
              "inter_mat", "edges_mat"]:
        con.execute(f"DROP TABLE IF EXISTS {t}")
    con.execute(f"CREATE TABLE corpus_mat AS {chain} SELECT * FROM corpus")
    con.execute(f"CREATE TABLE rsh_mat AS {chain} SELECT * FROM rsh")
    con.execute("""CREATE TABLE sizes_mat AS
        SELECT doc_id, COUNT(*) AS n_sh FROM rsh_mat GROUP BY doc_id""")
    con.execute("""CREATE TABLE inter_parts
        (doc_a BIGINT, doc_b BIGINT, c BIGINT)""")
    for b in range(NB):
        con.execute(f"""INSERT INTO inter_parts
            SELECT a.doc_id, b.doc_id, COUNT(*)
            FROM rsh_mat a JOIN rsh_mat b
              ON a.h = b.h AND a.doc_id < b.doc_id
            WHERE a.h % {NB} = {b}
            GROUP BY 1, 2""")
    con.execute("""CREATE TABLE inter_mat AS
        SELECT doc_a, doc_b, SUM(c) AS inter
        FROM inter_parts GROUP BY 1, 2""")
    con.execute("DROP TABLE inter_parts")
    fps_sel = fps_m.group(1) + " FROM corpus_mat"
    con.execute(f"""CREATE TABLE edges_mat AS
        WITH nearp AS (
          SELECT doc_a, doc_b FROM inter_mat AS i
          JOIN sizes_mat sa ON sa.doc_id = doc_a
          JOIN sizes_mat sb ON sb.doc_id = doc_b
          WHERE {jacc_pred.replace('inter', 'i.inter')}
        ),
        fps AS ({fps_sel}),
        exactp AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        ),
        pairs AS (SELECT * FROM exactp UNION SELECT * FROM nearp)
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs""")


def build_edges_generic(sql, reach_start):
    prefix = sql[:reach_start].rstrip()
    assert prefix.endswith(","), "unexpected CTE prefix shape"
    con.execute("DROP TABLE IF EXISTS edges_mat")
    # WITH RECURSIVE -> WITH (the UNION-as-UNION-ALL quirk applies only
    # inside a RECURSIVE block) plus an explicit DISTINCT, so edges_mat
    # really is the distinct edge set the docstring promises — without
    # it the logged n_edges is inflated and every propagate round joins
    # the duplicated relation
    con.execute(
        "CREATE TABLE edges_mat AS "
        + prefix[:-1].replace("WITH RECURSIVE", "WITH", 1)
        + "\nSELECT DISTINCT a, b FROM edges")


def propagate():
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
            return rounds
        if rounds > 200:
            raise RuntimeError("label propagation did not converge")


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


results, fails = {}, 0
edge_cache_key = None  # pair-relation prefix currently materialized
for name in sorted(oracles):
    if only and name not in only:
        continue
    sql = oracles[name]
    m = REACH_RE.search(sql)
    if not m:
        if only:
            # the caller asked for this query BY NAME: a drifted oracle
            # shape must fail loudly, not report success while checking
            # nothing
            results[name] = "FAIL: no reach/lab block (committed CTE drift?)"
            print(f"{name}: {results[name]}", flush=True)
            fails += 1
        else:
            results[name] = "SKIP: no reach/lab block (use compare.py)"
        continue
    id_col = m.group(1)
    t0 = time.time()
    try:
        key = sql[:m.start()]
        if key != edge_cache_key:
            if INTER_RE.search(sql):
                build_edges_text(sql)
            else:
                build_edges_generic(sql, m.start())
            n_edges = con.execute(
                "SELECT COUNT(*) FROM edges_mat").fetchone()[0]
            rounds = propagate()
            edge_cache_key = key
            # md5, not Python's per-process-salted str hash: the key
            # must be stable so JSON outputs diff across runs
            results["_edges_" + hashlib.md5(key.encode()).hexdigest()[:6]] = \
                f"{n_edges} edges, {rounds} propagation rounds"
        final_sql = (sql[:m.start()]
                     + f"lab AS (SELECT id AS {id_col}, cluster_id FROM lab_mat)"
                     + sql[m.end():]).replace("WITH RECURSIVE", "WITH", 1)
        exp = con.execute(final_sql).fetchdf()
    except Exception as exc:
        results[name] = f"FAIL: oracle error: {exc}"
        print(f"{name}: {results[name]}", flush=True)
        fails += 1
        edge_cache_key = None
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        results[name] = "FAIL: no spark result parquet"
        print(f"{name}: {results[name]}", flush=True)
        fails += 1
        continue
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
                status = (f"FAIL: col {c} row {i}: "
                          f"spark={gv.iloc[i]!r} duckdb={ev.iloc[i]!r}")
                break
    if status is None:
        status = f"OK {len(g)} rows cell-exact ({time.time()-t0:.1f}s)"
    else:
        fails += 1
    results[name] = status
    print(f"{name}: {status}", flush=True)

print(json.dumps(results, indent=1))
sys.exit(1 if fails else 0)
