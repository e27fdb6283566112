"""Targeted oracle-parity check: `python tools/parity_check.py q1 q2 ...`
Runs only the named catalog queries vs their DuckDB oracle at sf0.01 —
the fast inner loop for oracle edits (full sweep = tests/driver_sim.py).
"""
import math
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("parity-check")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb

from politicamente_etl_spark.plans.catalog import CATALOG

args = sys.argv[1:]
SF = next((a for a in args if a.startswith("/")), "/root/testdata/sf0.01")
names = [a for a in args if not a.startswith("/")]
if not names:
    print("usage: python tools/parity_check.py [<sf_dir>] <query> [<query> ...]")
    sys.exit(2)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

bad = []
for name in names:
    q = CATALOG[name]
    sdf = q.fn(spark, SF).toPandas()
    if q.sql is None:
        print(f"  {name}: rows-only, {len(sdf)} rows")
        continue
    odf = con.execute(q.sql).df()
    s = (
        sdf[sorted(sdf.columns)]
        .sort_values(by=sorted(sdf.columns), kind="mergesort")
        .reset_index(drop=True)
    )
    o = (
        odf[sorted(odf.columns)]
        .sort_values(by=sorted(odf.columns), kind="mergesort")
        .reset_index(drop=True)
    )
    ok = list(s.columns) == list(o.columns) and len(s) == len(o)
    if ok:
        for c in s.columns:
            for a, b in zip(s[c].tolist(), o[c].tolist()):
                if (
                    isinstance(a, float) and isinstance(b, float)
                    and math.isnan(a) and math.isnan(b)
                ):
                    continue
                if a != b:
                    ok = False
                    bad.append((name, c, a, b))
                    break
            if not ok:
                break
    else:
        bad.append(
            (name, "shape", (list(s.columns), len(s)), (list(o.columns), len(o)))
        )
    print(f"  {name}: {'OK' if ok else 'MISMATCH'} ({len(s)} rows)")
print("RESULT:", "ALL OK" if not bad else f"MISMATCHES: {bad[:5]}")
sys.exit(0 if not bad else 1)
