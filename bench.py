#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from the catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing is end-to-end per query: plan construction + execution + a count-style
materialization (collect of aggregates / count of row-level outputs), after a
per-slot warmup pass so we measure the engine, not first-touch costs.

Scaling probes (r10, VERDICT r9 item 6): two additive `scaleprobe_*`
entries time the fan-out-dependent operators over an 8x-replicated input
so the driver's low-core re-run can falsify parallelism claims; their
seconds are reported separately in `scale_probe_total_sec` for
round-over-round total comparisons on the original slots.

Slot isolation (VERDICT r8 item 2): round 8's artifact drifted 21.8 s →
35.2 s while standalone warm probes of the same queries stayed flat — the
inflation was in-session accumulation across 20 sequential slots (txlog
tempdir churn, cached-plan/catalog state, GC pressure), which made the
headline unable to detect a real regression in its own slots. Each slot now
runs as warm → best-of-3 → reclaim: the slot's /tmp dirs are deleted, the
Spark cache is cleared, and a GC hint runs before the next slot, so every
query is timed against the same session state a standalone warm probe sees.
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
    # Scaling probes (r10, VERDICT r9 item 6): two labeled extra entries
    # that run the fan-out-dependent operators over an 8x-replicated
    # input so the driver's 8-core vs 32-core comparison can actually
    # falsify the §2 parallelism claims (at sf0.1 the catalog slots are
    # fixed-overhead-bound and their core ratios sit at ~1.0). Additive
    # only — existing entries unchanged (contract: entries may be ADDED,
    # never removed/renamed); the probe seconds are included in `value`
    # like every other entry and reported separately in
    # `scale_probe_total_sec` so round-over-round totals can be compared
    # on the original slots alone.
    from politicamente_etl_spark.plans.scaleprobes import SCALE_PROBES

    def run_query(name: str) -> None:
        fn = SCALE_PROBES.get(name) or CATALOG[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    headline = headline + list(SCALE_PROBES)

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
        run_query(name)

    import shutil
    import tempfile

    # Route every tempfile.mkdtemp the QUERY CODE makes (txlog tables,
    # stream checkpoints, roundtrip scratch) into a bench-owned scratch
    # root, so per-slot reclaim can only ever delete what this process
    # created — never a concurrent process's /tmp state (review r9,
    # first pass: a listdir diff of the shared /tmp would). Spark's own
    # dirs don't go through Python tempfile and are untouched.
    scratch_root = tempfile.mkdtemp(prefix="bench-scratch-")
    tempfile.tempdir = scratch_root
    import atexit

    atexit.register(
        lambda: (
            tempfile.__setattr__("tempdir", None),
            shutil.rmtree(scratch_root, ignore_errors=True),
        )
    )

    def _tmp_snapshot() -> set[str]:
        try:
            return set(os.listdir(scratch_root))
        except OSError:
            return set()

    def _reclaim_slot_tmp(before: set[str]) -> None:
        """Delete the scratch dirs THIS slot created so their
        accumulated I/O never bleeds into later slots."""
        try:
            new = set(os.listdir(scratch_root)) - before
        except OSError:
            return
        for e in new:
            p = os.path.join(scratch_root, e)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.unlink(p)  # mkstemp-style plain files too
                except OSError:
                    pass

    def _isolate_session() -> None:
        """Reset the session state a previous slot may have mutated:
        cached plans/tables and accumulated garbage. Temp views are NOT
        dropped (each query creates its own) and bucketed tables in the
        warehouse survive (their slot rebuilds on cache miss)."""
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 — isolation is best-effort
            pass
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    # Per-slot: isolate → warm once (JIT, parquet footers, codegen,
    # Python workers) → best-of-3 → reclaim the slot's tempdirs. Best-of-3
    # because the box is a shared VM — identical code has measured 8.9 s
    # and 16.9 s totals in adjacent runs, so a single trial is noise; the
    # min of three is the steady-state engine time. The isolation makes
    # each slot's number comparable to a standalone warm probe of the same
    # query, which is what makes a round-over-round drift attributable.
    timings: dict[str, float] = {}
    for name in headline:
        before = _tmp_snapshot()
        _isolate_session()
        try:
            run_once(name)  # per-slot warmup
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run_once(name)
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        finally:
            _reclaim_slot_tmp(before)

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
        # r9: slots run isolated (per-slot warm, clearCache + GC + tempdir
        # reclaim between slots), so per-query times track standalone warm
        # probes instead of in-session accumulation
        "slot_isolation": "per_slot_warm_cache_clear_tmp_reclaim",
        # r10: seconds contributed by the scaleprobe_* entries (VERDICT
        # r9 item 6) — subtract from `value` to compare totals against
        # rounds that predate the probes
        "scale_probe_total_sec": round(
            sum(t for n, t in timings.items() if n.startswith("scaleprobe_")),
            4,
        ),
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
