#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracle SQL on the same parquet tables and diff."""
import sys, json, glob, os
import duckdb, pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if not os.path.isdir(p): continue
    files = glob.glob(p + "/*.parquet")
    if not files:
        results[name] = "NO_OUTPUT"; continue
    got = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        results[name] = f"ROWS_ONLY rows={len(got)}"; continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)
    try:
        g, e = norm(got), norm(exp)
    except Exception as ex:
        results[name] = f"NORM_ERROR: {ex}"; continue
    if list(g.columns) != list(e.columns):
        results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        continue
    if len(g) != len(e):
        results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"; continue
    bad = None
    for c in g.columns:
        gc, ec = g[c], e[c]
        if gc.dtype != ec.dtype:
            try:
                gc = gc.astype(ec.dtype)
            except Exception:
                bad = f"DTYPE {c}: {g[c].dtype} vs {e[c].dtype}"; break
        eq = (gc == ec) | (gc.isna() & ec.isna())
        if not eq.all():
            i = (~eq).idxmax()
            bad = f"VALUE {c} row{i}: got={gc[i]!r} exp={ec[i]!r} ({int((~eq).sum())} diffs)"
            break
    results[name] = "OK rows=%d" % len(g) if bad is None else "MISMATCH " + bad

npass = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in results.items(): print(f"{k:28s} {v}")
print(f"--- {npass}/{len(results)} OK")
