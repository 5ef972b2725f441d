#!/usr/bin/env python3
"""Mimic the driver's CORRECTNESS compare: for each query with an
oracle, run the SQL in DuckDB over the sf tables, load the Spark
parquet, sort columns by name, sort rows, and compare row count,
schema (names+types), and a value hash."""
import duckdb, json, sys, hashlib, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ['lineitem','orders','customer','nation','region','part','supplier',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        o = con.sql(sql).df()
        s = duckdb.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        o = o.reindex(sorted(o.columns), axis=1)
        s = s.reindex(sorted(s.columns), axis=1)
        schema_o = [(c, str(o[c].dtype)) for c in o.columns]
        schema_s = [(c, str(s[c].dtype)) for c in s.columns]
        o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        def h(df):
            return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()
        ok_rows = len(o) == len(s)
        ok_schema = schema_o == schema_s
        ok_hash = h(o) == h(s)
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{status} {name}: rows {len(s)}/{len(o)} schema_ok={ok_schema} hash_ok={ok_hash}")
            if not ok_schema:
                print(f"   spark  {schema_s}")
                print(f"   oracle {schema_o}")
            if ok_schema and not ok_hash and len(o) == len(s):
                diff = (o != s).any(axis=1)
                print("   first diffs:")
                print(o[diff].head(3))
                print(s[diff].head(3))
        else:
            print(f"{status} {name} ({len(s)} rows)")
    except Exception as e:
        fails += 1
        print(f"ERR  {name}: {e}")
print(f"\n{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
