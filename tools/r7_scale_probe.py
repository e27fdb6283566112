#!/usr/bin/env python
"""Round-6-prep batch-2+ operator scale probe: K×-replicated sf0.1 corpus
(reuses tools/r4_scale_probe.replicate), timing the NEW operator
families added in the round-4 fourth session:

- mmr_diverse_topk        — candidate prune touches the corpus (~linear);
  the greedy fold is per-query constant work ⇒ output flat.
- cosine_topk_lsh_multiprobe — bucketed equi-join; probes multiply only
  the query side ⇒ ~linear in corpus, output flat.
- kcore_peeling_rounds    — per-round degree agg + semi-joins over the
  support-2 co-purchase edges; replicas shift order keys (part ids
  shared), so edges GROW faster than K — the probe reports the realized
  edge count next to the time so super-linearity attributes to the
  graph, not the plan.
- source_unigram_kl       — two token aggregates + vocab join ⇒ ~linear.
- weighted_sample_topk    — TakeOrdered ⇒ ~linear scan, output flat (k).
- kaplan_meier_retention  — per-customer rollup ⇒ ~linear; curve rows
  grow only with the duration axis.
- hll_register_merge      — map-side-combined register agg ⇒ ~linear,
  output flat (≤ 2·64 register rows).

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r7_scale_probe.py [K]
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
    "mmr_diverse_topk",
    "cosine_topk_lsh_multiprobe",
    "kcore_peeling_rounds",
    "source_unigram_kl",
    "weighted_sample_topk",
    "kaplan_meier_retention",
    "hll_register_merge",
]


def time_queries(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    out = {}
    for name in PROBE_QUERIES:
        df = CATALOG[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.monotonic()
        n = CATALOG[name].fn(spark, sf_dir).count()
        out[name] = (time.monotonic() - t0, n)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="r7-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r7probe_")
    try:
        replicate(spark, k, big)
        base = time_queries(spark, SRC)
        scaled = time_queries(spark, big)
        print(f"\n== r7 scale probe: 1x vs {k}x (sf0.1 base, src {SRC}) ==")
        for name in PROBE_QUERIES:
            t1, n1 = base[name]
            tk, nk = scaled[name]
            print(
                f"{name:28s} 1x {t1:6.2f}s ({n1:>8} rows)   "
                f"{k}x {tk:6.2f}s ({nk:>8} rows)   "
                f"time x{tk / t1:5.1f}  rows x{nk / max(n1, 1):5.1f}"
            )
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
