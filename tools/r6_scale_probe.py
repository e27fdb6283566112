#!/usr/bin/env python
"""Round-6-prep operator scale probe: K×-replicated sf0.1 corpus (reuses
tools/r4_scale_probe.replicate), timing the NEW operator families:

- bm25_topk_docs         — postings filtered to |Q| terms before the tf
  agg; corpus stats broadcast; TakeOrdered top-k ⇒ ~linear, result flat.
- dup_ngram_costing      — groupBy(gram, source) + window(gram) +
  per-source rollup ⇒ ~linear; replicas append a distinct tail token so
  gram counts grow honestly, not as pure copies.
- epoch_shuffle_shards   — narrow explode ×3 epochs, one groupBy ⇒
  ~linear, output CONSTANT (epochs × shards).
- hashed_classifier_gate — two explodes + broadcast weight join + one
  groupBy(doc) ⇒ ~linear in tokens.
- token_budget_selection — per-source window cumsum; sources constant,
  docs per source ×K, budget fixed ⇒ sort cost ~K·logK per source but
  OUTPUT flat (the budget's job); the probe shows result-size saturation.

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r6_scale_probe.py [K]
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
    "bm25_topk_docs",
    "dup_ngram_costing",
    "epoch_shuffle_shards",
    "hashed_classifier_gate",
    "token_budget_selection",
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
    spark = get_spark(app_name="r6-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r6probe_")
    try:
        replicate(spark, k, big)
        base = time_queries(spark, SRC)
        scaled = time_queries(spark, big)
        print(f"\n== r6 scale probe: 1x vs {k}x (sf0.1 base, src {SRC}) ==")
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
