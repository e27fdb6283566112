"""Per-slot A/B probe: bench.py's exact per-slot methodology (isolate →
warm → best-of-3 → reclaim) for a SUBSET of queries, so optimization
candidates can be measured without a full 20-slot run.

Usage: python tools/bench_slots.py [-n TRIALS] name [name ...]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    trials = 3
    if args and args[0] == "-n":
        trials = int(args[1])
        args = args[2:]
    names = args

    from politicamente_etl_spark.plans.catalog import CATALOG
    from politicamente_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench-slots", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import shutil
    import tempfile

    scratch_root = tempfile.mkdtemp(prefix="bench-scratch-")
    tempfile.tempdir = scratch_root

    def run_once(name: str) -> None:
        spark.sparkContext.setJobDescription(f"slot:{name}")
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    alls: dict[str, list[float]] = {}
    for name in names:
        before = set(os.listdir(scratch_root))
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        run_once(name)  # warm
        best = float("inf")
        alls[name] = []
        for _ in range(trials):
            t0 = time.perf_counter()
            run_once(name)
            dt = time.perf_counter() - t0
            alls[name].append(round(dt, 4))
            best = min(best, dt)
        timings[name] = round(best, 4)
        for e in set(os.listdir(scratch_root)) - before:
            p = os.path.join(scratch_root, e)
            shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else os.unlink(p)

    print(json.dumps({"best": timings, "trials": alls}))
    shutil.rmtree(scratch_root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
