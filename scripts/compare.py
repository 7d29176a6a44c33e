#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library has no Python dependency).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, registers the sf tables in DuckDB,
runs the oracle SQL from oracle_sql.json, sorts columns by name, sorts
rows, and compares cell values exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
# Fail-fast resource caps for large-SF replays: an oracle that exceeds
# these should error, not fill the VM (a runaway sf1 ADC replay was
# measured at 109 GB RAM + 75 GB temp spill before being killed).
if os.environ.get("COMPARE_DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['COMPARE_DUCKDB_MEM']}'")
if os.environ.get("COMPARE_MAX_TEMP"):
    con.execute(f"SET max_temp_directory_size='{os.environ['COMPARE_MAX_TEMP']}'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table: a directory of part files
        p = f"{p}/*.parquet"
    if os.path.exists(f"{sf_dir}/{t}.parquet"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

only = set(os.environ.get("COMPARE_ONLY", "").split(",")) - {""}
skip = set(os.environ.get("COMPARE_SKIP", "").split(",")) - {""}

fails = 0
for name in sorted(oracles):
    if (only and name not in only) or name in skip:
        continue
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet"); fails += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        exp = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    # int-vs-float is the one dtype drift the driver's hash is known to
    # reject (round-4 lesson: DuckDB's windowed SUM promotes to HUGEINT,
    # fetched as float64, vs Spark's int64 — identical values, red row);
    # int widths and date/datetime representation differences have
    # always hashed equal, so only flag a numeric-kind flip.
    def kind(d):
        k = d.kind
        return "int" if k in "iu" else ("float" if k == "f" else "other")
    dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
          if kind(g[c].dtype) != kind(e[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtype drift {dt}"); fails += 1; continue
    mismatch = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            eq = (gv == ev) | (gv.isna() & ev.isna())
        except Exception:
            eq = gv.astype(str) == ev.astype(str)
        if not eq.all():
            i = int(eq.idxmin())
            mismatch = (c, i, gv.iloc[i], ev.iloc[i]); break
    if mismatch:
        c, i, a, b = mismatch
        print(f"FAIL {name}: col {c} row {i}: spark={a!r} duckdb={b!r} (dtypes {g[c].dtype}/{e[c].dtype})")
        fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows")

# rows-only queries (no oracle)
for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name in oracles:
        continue
    files = glob.glob(f"{res_dir}/*.parquet")
    n = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
    print(f"{'OK  ' if n > 0 else 'FAIL'} {name}: rows-only, {n} rows")
    if n == 0: fails += 1

sys.exit(1 if fails else 0)
