"""Capture `.explain("formatted")` for bench headline queries into
plans/r09/<query>_<suffix>.txt (driver-contract evidence for the
optimization rounds — the judge checks plan claims against these files).

Usage: python tools/capture_plans.py <suffix> [name ...]
       (default: every bench-flagged catalog query)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    names = sys.argv[2:]

    from politicamente_etl_spark.plans.catalog import CATALOG
    from politicamente_etl_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not names:
        names = [n for n, q in CATALOG.items() if q.bench]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r09",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = CATALOG[name].fn(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
