#!/usr/bin/env python
"""Round-5 batches A-C scale probe: K×-replicated sf0.1 corpus (same
replicate() as tools/r4_scale_probe.py), timing the new operator
families at 1× vs K×. Expected shapes:

- lpa_communities / clustering_coefficient_parts — replicas form
  disjoint co-purchase subgraphs (shifted part keys), so edges grow ~K×
  and every round/wedge pass is an equi-join ⇒ ~linear in edges (wedges
  are Σdeg², but the support floor bounds degree).
- ngram_novelty_by_source — explode + distinct + min-agg on md5 keys ⇒
  ~linear; replicated docs REUSE perturbed text, so novelty_ppm should
  DROP at K× (the metric detecting duplication — that is the point).
- hhi_supplier_revenue / topk_plus_other_suppliers — one fact
  aggregate + broadcast dims ⇒ ~linear; supplier count fixed (dims stay
  1×), so output rows constant.
- km_survival_order_gaps / spearman_orders_spend — per-customer windows
  then bounded-domain stats ⇒ ~linear in orders.
- alert_ttl_suppression / weekly_last_value_rollup — scan-filter +
  per-user windows ⇒ ~linear in events.
- int8_quantization_report — posexplode + fixed 640 groups ⇒ ~linear.
- pps_systematic_sample — scan + broadcast total ⇒ ~linear; sample size
  stays ~1000 BY DESIGN (inclusion ∝ cents/total and total grows K×) —
  constant output at growing input is the PPS contract.

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r10_scale_probe.py [K]
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
    "lpa_communities",
    "clustering_coefficient_parts",
    "ngram_novelty_by_source",
    "hhi_supplier_revenue",
    "topk_plus_other_suppliers",
    "km_survival_order_gaps",
    "spearman_orders_spend",
    "alert_ttl_suppression",
    "weekly_last_value_rollup",
    "int8_quantization_report",
    "pps_systematic_sample",
]


def time_one(fn) -> tuple[float, int]:
    fn().write.format("noop").mode("overwrite").save()  # warm
    t0 = time.monotonic()
    n = fn().count()
    return (time.monotonic() - t0, n)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="r10-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r10probe_")
    try:
        replicate(spark, k, big)
        for name in os.listdir(SRC):
            if name.endswith(".parquet") and not os.path.exists(
                os.path.join(big, name)
            ):
                os.symlink(os.path.join(SRC, name), os.path.join(big, name))
        print(f"\n== r10 scale probe: 1x vs {k}x (sf0.1 base) ==")
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
