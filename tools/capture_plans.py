"""Capture `.explain("formatted")` for bench headline queries into
plans/<round>/<query>_<suffix>.txt (driver-contract evidence for the
optimization rounds — the judge checks plan claims against these files).

Usage: python tools/capture_plans.py [--round rNN] [--final] <suffix> [name ...]
       (default round: r10; default names: every bench-flagged catalog query)

--final executes the query (collect) BEFORE explaining, so the captured
plan is the AQE FINAL plan (isFinalPlan=true) including runtime
ReusedExchange / AQEShuffleRead nodes — the initial plan prints both
sides of a self-join even when one shuffle stage is reused at runtime,
so single-derivation claims are only checkable on the final plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    rnd = "r10"
    final = False
    while args and args[0].startswith("--"):
        if args[0] == "--round":
            rnd = args[1]
            args = args[2:]
        elif args[0] == "--final":
            final = True
            args = args[1:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    suffix = args[0] if args else "after"
    names = args[1:]

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
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = CATALOG[name].fn(spark, sf_dir)
        if final:
            df.collect()
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
