#!/usr/bin/env python
"""Round-9-prep operator scale probe: K×-replicated sf0.1 corpus
(reuses tools/r4_scale_probe.replicate), timing this session's
operator families:

- langid_kappa_agreement / segment_nation_association — corpus
  collapses to a bounded contingency table ⇒ ~linear, 1-row output.
- supplier_hhi_by_region — one (region, supplier) rollup ⇒ ~linear.
- price_psi_by_year — one conditional-aggregation pass ⇒ ~linear.
- doc_length_ks_by_source — (source, length) grid + grid windows;
  replicas grow counts, not the grid ⇒ ~linear.
- logrank_building_vs_rest — per-customer rollup ⇒ ~linear; windows
  on the bounded duration grid.
- kmv_set_ops_users — one distinct + k-row sketches; the exact audit
  join grows with distinct (type, user) pairs ⇒ ~linear (replicas
  multiply event rows, user ids are shared, so the distinct is flat —
  the probe pins that the sketch work does NOT grow).
- retrieval_mrr_report / brier_decomposition_gate — embedding /
  binned-summary shapes; corpus-sized work is one pass.
- dau_mau_stickiness — two distinct aggregates ⇒ ~linear.
- neyman_allocation_plan — one stats pass ⇒ ~linear.
- lang_char_js_divergence — (lang, bigram) aggregate; replicas grow
  counts, the bigram vocabulary saturates ⇒ ~linear.
- sssp_weighted_histogram / hits_order_part_scores — graph sweeps:
  SSSP joins the (densifying) co-purchase edge list like BFS; HITS
  walks the bipartite order-part list, which replicas grow linearly
  (new order keys) ⇒ ~linear with edge growth.

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r9_scale_probe.py [K]
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
    "langid_kappa_agreement",
    "segment_nation_association",
    "supplier_hhi_by_region",
    "price_psi_by_year",
    "doc_length_ks_by_source",
    "logrank_building_vs_rest",
    "kmv_set_ops_users",
    "brier_decomposition_gate",
    "dau_mau_stickiness",
    "neyman_allocation_plan",
    "lang_char_js_divergence",
    "sssp_weighted_histogram",
    "hits_order_part_scores",
    # second/third-wave additions
    "kruskal_wallis_segments",
    "variance_equality_brownforsythe",
    "source_logodds_keywords",
    "kendall_tau_quality_vs_logit",
    "sprt_signup_monitor",
    "shapley_channel_attribution",
    "interval_union_coverage",
    "shingle_containment_pairs",
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
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="r9-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r9probe_")
    try:
        replicate(spark, k, big)
        for dim in ("part", "customer", "nation", "supplier", "region"):
            shutil.copy(
                os.path.join(SRC, f"{dim}.parquet"),
                os.path.join(big, f"{dim}.parquet"),
            )
        base = time_queries(spark, SRC)
        scaled = time_queries(spark, big)
        print(f"\n== r9 scale probe: 1x vs {k}x (sf0.1 base, src {SRC}) ==")
        for name in PROBE_QUERIES:
            t1, n1 = base[name]
            tk, nk = scaled[name]
            print(
                f"{name:30s} 1x {t1:6.2f}s ({n1:>8} rows)   "
                f"{k}x {tk:6.2f}s ({nk:>8} rows)   "
                f"time x{tk / t1:5.1f}  rows x{nk / max(n1, 1):5.1f}"
            )
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
