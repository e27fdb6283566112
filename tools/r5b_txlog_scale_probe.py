#!/usr/bin/env python
"""Round-5 lakehouse/txlog + basket-floor scale probe (VERDICT r4 #2/#5):
same K×-replicated sf0.1 corpus as tools/r4_scale_probe.py (imported),
covering the commit-log family end-to-end plus the relative-support
market-basket fix.

Timed catalog queries at 1× vs K× (time + result rows):

- txlog_right_to_erasure     — compliance delete through the commit log;
  cost ∝ files containing the erased keys, not table size.
- txlog_cdf_changes          — change-data-feed read over the log;
  cost ∝ changed files per version, not table size.
- streaming_txlog_exactly_once — micro-batched txn-idempotent appends;
  staging IO ~linear in rows, the duplicate offers stay no-ops.
- streaming_cdc_changelog    — the r5 rework (view state in a txlog
  table, per VERDICT r4 #3): per-batch cost = one distributed agg over
  the table's parquet + two txn appends; no driver-held state.
- basket_lift_pairs_rel      — RELATIVE (ppm-of-orders) support floor:
  survivor growth must be ~linear at K×, versus the measured ×598k
  blow-up of the absolute floor (r4 probe). Both variants timed so the
  table shows the fix, not asserts it.

File-count signal (bytes rewritten is the at-scale cost, per the merge
probe): a direct erasure run on the K× documents table reports files
rewritten / preserved / zonemap-skipped from the commit manifest.

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r5b_txlog_scale_probe.py [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.plans.catalog import CATALOG  # noqa: E402
from politicamente_etl_spark.session import get_spark  # noqa: E402
from politicamente_etl_spark.sources.txlog import TxLogTable  # noqa: E402
from tools.r4_scale_probe import SRC, replicate  # noqa: E402

PROBE_QUERIES = [
    "txlog_right_to_erasure",
    "txlog_cdf_changes",
    "streaming_txlog_exactly_once",
    "streaming_cdc_changelog",
    "basket_lift_pairs",
    "basket_lift_pairs_rel",
]


def time_one(fn) -> tuple[float, int]:
    fn().write.format("noop").mode("overwrite").save()  # warm
    t0 = time.monotonic()
    n = fn().count()
    return (time.monotonic() - t0, n)


def erasure_file_counts(spark, sf_dir: str, n_files: int = 64) -> dict:
    """Direct right-to-erasure on a range-clustered documents table:
    delete ~1% of the doc_id key space and report the manifest's
    delete_stats — files rewritten vs preserved vs zonemap-skipped is
    THE 100 TB cost model (a delete that rewrites every file does not
    scale; one that rewrites only key-overlapping files does)."""
    base = tempfile.mkdtemp(prefix="erasureprobe_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        clustered = docs.repartitionByRange(n_files, "doc_id")
        t = TxLogTable.create(spark, os.path.join(base, "t"), clustered)
        bounds = docs.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).first()
        span = bounds["hi"] - bounds["lo"]
        lo = bounds["lo"] + span // 2
        hi = lo + max(span // 100, 1)
        keys = docs.filter(F.col("doc_id").between(lo, hi)).select("doc_id")
        t0 = time.monotonic()
        m = t.delete_keys(keys, ["doc_id"])
        dt = time.monotonic() - t0
        out = dict(m["delete_stats"])
        out["sec"] = dt
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="r5b-txlog-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r5bprobe_")
    try:
        replicate(spark, k, big)
        # replicate() writes the fact tables; dimension tables stay 1x
        # (the right probe semantics — dims don't grow with volume)
        for name in os.listdir(SRC):
            if name.endswith(".parquet") and not os.path.exists(
                os.path.join(big, name)
            ):
                os.symlink(os.path.join(SRC, name), os.path.join(big, name))
        print(f"\n== r5b txlog scale probe: 1x vs {k}x (sf0.1 base) ==")
        for name in PROBE_QUERIES:
            t1, n1 = time_one(lambda: CATALOG[name].fn(spark, SRC))
            tk, nk = time_one(lambda: CATALOG[name].fn(spark, big))
            print(
                f"{name:30s} 1x {t1:6.2f}s ({n1:>8} rows)   "
                f"{k}x {tk:6.2f}s ({nk:>8} rows)   "
                f"time x{tk / t1:5.1f}  rows x{nk / max(n1, 1):7.1f}"
            )
        for label, d in (("1x", SRC), (f"{k}x", big)):
            st = erasure_file_counts(spark, d)
            print(
                f"{'erasure file counts':30s} {label} {st['sec']:6.2f}s  "
                f"rewrote {st['files_rewritten']} / preserved "
                f"{st['files_preserved']} / zonemap-skipped "
                f"{st['files_skipped_by_stats']}  "
                f"(rows removed {st['rows_removed']})"
            )
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
