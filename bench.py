#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from the catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing is end-to-end per query: plan construction + execution + a count-style
materialization (collect of aggregates / count of row-level outputs), after a
JVM+IO warmup pass so we measure the engine, not first-touch costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from politicamente_etl_spark.plans.catalog import CATALOG  # noqa: E402
from politicamente_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    headline = [name for name, q in CATALOG.items() if q.bench]

    def calibrate() -> float:
        """Fixed-cost reference work (VERDICT r6 item 5): a deterministic
        CPU-bound aggregate over a generated range — no I/O, no data
        dependence — timed best-of-3. Identical code has measured 12-23 s
        headline totals across VM states; dividing per-query times by
        this constant separates engine regressions from environment
        drift in round-over-round comparisons."""
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(1 << 22).selectExpr(
                "sum(id * 3 + 1) as s", "count(*) as n"
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    # Fault isolation (r1 verdict item 3): one broken query must never
    # nullify the whole artifact — wrap warmup and timing per query and
    # emit partial results with an errors map.
    errors: dict[str, str] = {}

    def run_once(name: str) -> None:
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warmup: JVM JIT, parquet footer cache, codegen.
    for name in headline:
        try:
            run_once(name)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    # Best-of-3 per query: the box this runs on is a shared VM — identical
    # code has measured 8.9 s and 16.9 s totals in adjacent runs, so a
    # single trial is noise, not signal. The min of three trials is the
    # steady-state engine time (warmup above already paid JIT/footer/
    # Python-worker cold starts).
    timings: dict[str, float] = {}
    for name in headline:
        if name in errors:
            continue
        best = float("inf")
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                run_once(name)
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    def stream_calibrate() -> float:
        """Fixed-cost micro-batch machinery reference (VERDICT r6 watch
        item): a 4-file → 4-micro-batch no-op stream, best-of-3. The
        streaming headliner (streaming_alert_ttl) measured 3.6-5.3 s
        across r6 runs purely from micro-batch scheduling variance;
        this constant lets that slot's drift be attributed to the
        machinery rather than read as an engine regression."""
        import shutil
        import tempfile
        import uuid as _uuid

        d = tempfile.mkdtemp(prefix="bench_scal_")
        src = os.path.join(d, "src")
        for i in range(4):
            spark.range(i * 10, i * 10 + 10).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q = (
                spark.readStream.schema("id long")
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
                .writeStream.format("noop")
                .trigger(availableNow=True)
                .option(
                    "checkpointLocation",
                    os.path.join(d, f"ck-{_uuid.uuid4().hex}"),
                )
                .start()
            )
            q.awaitTermination()
            best = min(best, time.perf_counter() - t0)
        shutil.rmtree(d, ignore_errors=True)
        return best

    calibration = round(calibrate(), 4)
    stream_calibration = round(stream_calibrate(), 4)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        # drift normalization: query_sec / calibration_sec is unitless
        # and survives VM-state changes the raw seconds don't
        "calibration_sec": calibration,
        "stream_calibration_sec": stream_calibration,
        "queries_normalized": {
            name: round(t / calibration, 2) for name, t in timings.items()
        },
        "value_normalized": round(total / calibration, 2),
    }
    if errors:
        # Mark the headline total as incomplete: it sums only surviving
        # queries, so without this flag a crashed query reads as a speedup
        # in round-over-round comparisons.
        out["partial"] = True
        out["n_errors"] = len(errors)
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
