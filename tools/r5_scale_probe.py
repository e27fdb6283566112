#!/usr/bin/env python
"""Round-5-prep operator scale probe: same K×-replicated sf0.1 corpus as
tools/r4_scale_probe.py (imported), timing the NEW operator families:

- bloom_prefiltered_join — bloom build is one partial-agg pass over the
  build side; probe test is per-row constant work against a fixed 128 KB
  array ⇒ ~linear. Also reports the plain-join time for the same
  aggregate so the prune benefit/overhead is measured, not asserted.
- copurchase_pagerank    — replicas form disjoint subgraphs (shifted
  keys), so edges grow ~K× and each BSP sweep is an equi-join ⇒ ~linear.
- ivf_pq_topk            — corpus AND query set grow K×; per-query work
  is bounded by probed cells; codebook joins broadcast ⇒ ~linear in
  corpus (plus K× more queries ⇒ ~K× total).
- per_source_doc_cap     — per-source hash-order window; sources are
  constant so output is CONSTANT while input grows ⇒ window cost linear,
  result size flat (the cap doing its job).
- txlog_merge_report     — create+merge+snapshot end-to-end through the
  commit log; staging IO dominates and is ⇒ ~linear in rows.

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r5_scale_probe.py [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.functions.scalar import money_sum  # noqa: E402
from politicamente_etl_spark.plans.catalog import CATALOG  # noqa: E402
from politicamente_etl_spark.session import get_spark  # noqa: E402
from tools.r4_scale_probe import SRC, replicate  # noqa: E402

PROBE_QUERIES = [
    "bloom_prefiltered_join",
    "copurchase_pagerank",
    "ivf_pq_topk",
    "per_source_doc_cap",
    "txlog_merge_report",
]


def plain_join_baseline(spark, sf_dir: str):
    """The bloom query's aggregate WITHOUT the prefilter — the
    measured-not-asserted comparison point."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
    )


def time_one(fn) -> tuple[float, int]:
    fn().write.format("noop").mode("overwrite").save()  # warm
    t0 = time.monotonic()
    n = fn().count()
    return (time.monotonic() - t0, n)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="r5-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r5probe_")
    try:
        replicate(spark, k, big)
        print(f"\n== r5 scale probe: 1x vs {k}x (sf0.1 base) ==")
        for name in PROBE_QUERIES:
            t1, n1 = time_one(lambda: CATALOG[name].fn(spark, SRC))
            tk, nk = time_one(lambda: CATALOG[name].fn(spark, big))
            print(
                f"{name:28s} 1x {t1:6.2f}s ({n1:>8} rows)   "
                f"{k}x {tk:6.2f}s ({nk:>8} rows)   "
                f"time x{tk / t1:5.1f}  rows x{nk / max(n1, 1):5.1f}"
            )
        for label, d in (("1x", SRC), (f"{k}x", big)):
            t, _ = time_one(lambda: plain_join_baseline(spark, d))
            print(f"{'plain join (no bloom)':28s} {label} {t:6.2f}s")
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
