#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query declared by
SparkEntry (queries.json written by graft.Verify), load the result parquet,
run the corresponding oracle SQL in DuckDB over the same sf tables and
compare values (columns sorted by name, rows sorted, exact equality; floats
compared exactly to catch nondeterminism early).

Failure conditions: a declared query with no output dir (it threw inside
Verify), an empty rows-only result, any schema/rowcount/value mismatch, or
oracle SQL that errors."""
import json, sys, os
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
qpath = f"{out_dir}/queries.json"
if os.path.exists(qpath):
    names = json.load(open(qpath))
else:  # fall back to whatever dirs exist
    names = sorted(n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n)))

results = {}
for name in sorted(names):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        results[name] = "MISSING OUTPUT (query threw in Verify)"
        continue
    spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        empty = " EMPTY!" if len(spark_df) == 0 else ""
        results[name] = f"rows-only ({len(spark_df)} rows){empty}"
        continue
    try:
        ora_df = con.sql(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {str(e)[:200]}"
        continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = ora_df.reindex(sorted(ora_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        results[name] = f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"
        continue
    if len(a) == 0:
        results[name] = "EMPTY RESULT (matches oracle, but vacuous)"
        continue
    try:
        eq = a.equals(b)
        if not eq:
            # find first differing cell
            diff = None
            for c in a.columns:
                ne = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                if ne.any():
                    i = ne.idxmax()
                    diff = f"col={c} row={i} spark={a[c][i]!r} oracle={b[c][i]!r}"
                    break
            results[name] = f"VALUE MISMATCH {diff}"
        else:
            results[name] = f"OK ({len(a)} rows)"
    except Exception as e:
        results[name] = f"COMPARE ERROR: {str(e)[:200]}"

fails = 0
for k, v in results.items():
    ok = v.startswith("OK") or (v.startswith("rows-only") and "EMPTY" not in v)
    flag = "  " if ok else "X "
    if flag == "X ":
        fails += 1
    print(f"{flag}{k}: {v}")
print(f"\n{len(results)} queries, {fails} failures")
sys.exit(1 if fails else 0)
