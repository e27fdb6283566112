#!/usr/bin/env python
"""Round-5 batches D-G scale probe: K×-replicated sf0.1 corpus (same
replicate() as tools/r4_scale_probe.py), timing the remaining new
operator families at 1× vs K×. Expected shapes:

- streaming_alert_ttl — scan-filter + per-user keyed state ⇒ ~linear in
  events; state is one long per user.
- functional_dependency_audit / ri_orphan_report /
  column_cardinality_profile — one narrow aggregate per FD/FK/column ⇒
  ~linear, bounded output.
- revenue_recognition_schedule — explode bounded by months-per-order ⇒
  ~linear; output month-grain (constant rows).
- decile_migration_matrix — per-half rank windows ⇒ ~linear in
  customers; output ≤ 100 rows.
- open_orders_depth_profile / weekly_decomposition_profile /
  seasonal_naive_backtest — daily aggregate is the data pass; all
  later windows run on the calendar-bounded series ⇒ ~linear with
  CONSTANT output rows.
- growth_accounting_weekly / markov_entropy_rate — distinct/lead
  windows keyed by user ⇒ ~linear.
- pps_horvitz_thompson — scan + broadcast total ⇒ ~linear; the HT
  estimate tracks the grown total.

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r10b_scale_probe.py [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from politicamente_etl_spark.plans.catalog import CATALOG  # noqa: E402
from politicamente_etl_spark.session import get_spark  # noqa: E402
from tools.r4_scale_probe import SRC, replicate  # noqa: E402

PROBE_QUERIES = [
    "streaming_alert_ttl",
    "functional_dependency_audit",
    "ri_orphan_report",
    "column_cardinality_profile",
    "revenue_recognition_schedule",
    "decile_migration_matrix",
    "open_orders_depth_profile",
    "weekly_decomposition_profile",
    "seasonal_naive_backtest",
    "growth_accounting_weekly",
    "markov_entropy_rate",
    "pps_horvitz_thompson",
]


def time_one(fn) -> tuple[float, int]:
    fn().write.format("noop").mode("overwrite").save()  # warm
    t0 = time.monotonic()
    n = fn().count()
    return (time.monotonic() - t0, n)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="r10b-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r10bprobe_")
    try:
        replicate(spark, k, big)
        for name in os.listdir(SRC):
            if name.endswith(".parquet") and not os.path.exists(
                os.path.join(big, name)
            ):
                os.symlink(os.path.join(SRC, name), os.path.join(big, name))
        print(f"\n== r10b scale probe: 1x vs {k}x (sf0.1 base) ==")
        for name in PROBE_QUERIES:
            t1, n1 = time_one(lambda: CATALOG[name].fn(spark, SRC))
            tk, nk = time_one(lambda: CATALOG[name].fn(spark, big))
            print(
                f"{name:30s} 1x {t1:6.2f}s ({n1:>8} rows)   "
                f"{k}x {tk:6.2f}s ({nk:>8} rows)   "
                f"time x{tk / t1:5.1f}  rows x{nk / max(n1, 1):5.1f}"
            )
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
