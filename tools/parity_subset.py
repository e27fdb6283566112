"""Targeted driver-sim: run a SUBSET of catalog queries against the
DuckDB oracle exactly the way tests/driver_sim.py does — for fast
re-verification after a module refactor (pass names or substring
filters as argv). Exit 0 only if every compared query matches."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    pats = sys.argv[1:]
    if not pats:
        print("usage: parity_subset.py <name-or-substring> [...]")
        return 2
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity-subset")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    import __spark_entry__ as e

    sf = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    qs, sqls = e.queries(), e.oracle_sql()
    names = [
        n for n in qs if any(p == n or p in n for p in pats)
    ]
    print(f"comparing {len(names)} queries")
    bad = []
    for name in sorted(names):
        sdf = qs[name](spark, sf).toPandas()
        if name not in sqls:
            print(f"  {name}: rows-only, {len(sdf)} rows")
            continue
        odf = con.execute(sqls[name]).df()
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
                        isinstance(a, float)
                        and isinstance(b, float)
                        and math.isnan(a)
                        and math.isnan(b)
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
    return 0 if not bad else 1


if __name__ == "__main__":
    raise SystemExit(main())
