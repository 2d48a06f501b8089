#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: tools/check.py [sfDir] [outDir] [--json resultFile]
  1. expects graft.Verify to have dumped <outDir>/<query>/ parquet + oracle_sql.json
  2. registers each /root/testdata table as a DuckDB view
  3. runs each oracle SQL, compares to the Spark parquet (columns sorted by
     name, rows sorted by all columns, exact value compare)
Driver-side tooling only — not part of the shipped library.
"""
import json, sys, math
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--json")]
json_out = None
for i, a in enumerate(sys.argv):
    if a == "--json" and i + 1 < len(sys.argv):
        json_out = sys.argv[i + 1]
        if json_out in args: args.remove(json_out)
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
out = args[1] if len(args) > 1 else "/tmp/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
results = {}  # driver-format per-query record (CORRECTNESS_r*.json)
def record(name, rows=True, schema=True, hash_=True, sr=None, orr=None, err=None):
    results[name] = {"rows_match": rows, "schema_match": schema,
                     "hash_match": hash_, "spark_rows": sr, "oracle_rows": orr,
                     "err": err}
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {e}")
        record(name, False, False, False, err=str(e)[:200]); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append(name); print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}")
        record(name, True, False, False, len(got), len(exp)); continue
    # dtype KIND drift (e.g. DuckDB HUGEINT -> pandas object, vs Spark
    # BIGINT -> int64) fails the driver's hash compare even when values
    # stringify equal. Width-only drift (int32 vs int64, rank/ntile) is
    # fine — round-1 driver results confirm it hash-matches.
    dbad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
            if got[c].dtype.kind != exp[c].dtype.kind]
    if dbad:
        fails.append(name); print(f"FAIL {name}: dtype kinds (col, spark, duck) {dbad}")
        record(name, True, False, False, len(got), len(exp)); continue
    if len(got) != len(exp):
        fails.append(name); print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
        record(name, False, True, False, len(got), len(exp)); continue
    # array-typed cells (numpy arrays / lists) are unhashable: sort on a
    # stringified copy, compare the original values
    def sortable(df):
        return df.map(lambda v: str(v.tolist()) if hasattr(v, "tolist") else str(v))
    g = got.loc[sortable(got).sort_values(by=list(got.columns)).index].reset_index(drop=True)
    e = exp.loc[sortable(exp).sort_values(by=list(exp.columns)).index].reset_index(drop=True)
    bad = None
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            eq = (a == b) or (a is None and b is None)
            try:
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (math.isnan(a) and math.isnan(b)) or a == b
            except Exception:
                pass
            if not eq and str(a) == str(b):
                eq = True
            if not eq:
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        fails.append(name)
        print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r}")
        record(name, True, True, False, len(got), len(exp))
    else:
        print(f"PASS {name} ({len(got)} rows)")
        record(name, True, True, True, len(got), len(exp))

if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=0)
    print(f"wrote {json_out}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
