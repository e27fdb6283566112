"""Simulate the driver: plain SparkSession (no custom conf), import the
contract module, run entry() + every queries() entry vs oracle_sql() via
DuckDB at sf0.01. Run with a hostile TZ to probe timezone sensitivity."""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
print("session tz conf:", spark.conf.get("spark.sql.session.timeZone"))

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

import duckdb
import math

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, sqls = e.queries(), e.oracle_sql()
bad = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF).toPandas()
    if name not in sqls:
        print(f"  {name}: rows-only, {len(sdf)} rows")
        continue
    odf = con.execute(sqls[name]).df()
    s = sdf[sorted(sdf.columns)].sort_values(by=sorted(sdf.columns), kind="mergesort").reset_index(drop=True)
    o = odf[sorted(odf.columns)].sort_values(by=sorted(odf.columns), kind="mergesort").reset_index(drop=True)
    ok = list(s.columns) == list(o.columns) and len(s) == len(o)
    if ok:
        for c in s.columns:
            for a, b in zip(s[c].tolist(), o[c].tolist()):
                if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    ok = False
                    bad.append((name, c, a, b))
                    break
            if not ok:
                break
    else:
        bad.append((name, "shape", (list(s.columns), len(s)), (list(o.columns), len(o))))
    print(f"  {name}: {'OK' if ok else 'MISMATCH'} ({len(s)} rows)")
print("RESULT:", "ALL OK" if not bad else f"MISMATCHES: {bad[:5]}")
sys.exit(0 if not bad else 1)
