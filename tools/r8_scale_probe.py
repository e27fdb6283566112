#!/usr/bin/env python
"""Round-8-prep operator scale probe: K×-replicated sf0.1 corpus
(reuses tools/r4_scale_probe.replicate), timing the operator families
added in this session:

- adamic_adar_link_pred   — wedge self-join costs Σ_w deg(w)²; replicas
  shift order keys but share part ids, so degrees GROW with K and the
  wedge count grows super-linearly. The probe prints the realized edge
  count so super-linearity attributes to the densifying graph, not the
  plan; the max_degree cap is the production control.
- label_propagation_parts — per-round vote join + argmax over the same
  densifying edge list ⇒ expect the edge-growth profile.
- bfs_hop_histogram       — frontier joins bounded by node count
  (parts), which replicas do NOT grow ⇒ time tracks edges, output flat.
- hbos_event_outliers     — three bounded histograms + broadcast-back
  scoring ⇒ ~linear, output flat (top-k).
- holt_winters_daily_revenue — daily rollup ~linear; fold runs on
  calendar-bounded arrays ⇒ output flat (25 nations).
- loo_target_encoding_segment — one aggregate + broadcast-back ⇒
  ~linear; output grows with the emitted slice.
- domain_weights_mw_update — token/vocab join + per-source agg ⇒
  ~linear, output flat (20 sources).
- classifier_auc_report   — corpus-sized scoring, then the rank window
  runs on the bucketed-score summary ⇒ ~linear, output 1 row.
- t_closeness_report      — (QI, bucket) cells bounded by the grid ⇒
  ~linear, output flat (~class count).
- mutual_knn_pairs        — the exact all-pairs AUDIT twin (quadratic
  in the 500-vector embeddings table, which replicate() does not grow);
  listed to pin that its cost does not move with the relational corpus.

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r8_scale_probe.py [K]
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
    "adamic_adar_link_pred",
    "label_propagation_parts",
    "bfs_hop_histogram",
    "hbos_event_outliers",
    "holt_winters_daily_revenue",
    "loo_target_encoding_segment",
    "domain_weights_mw_update",
    "classifier_auc_report",
    "t_closeness_report",
    "mutual_knn_pairs",
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
    spark = get_spark(app_name="r8-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r8probe_")
    try:
        replicate(spark, k, big)
        # replicate() grows only the fact-ish tables; this round's probe
        # queries also read the dimensions (part/customer/nation) —
        # carry them over unscaled, which is exactly the 100 TB shape
        # (dims grow far slower than facts).
        for dim in ("part", "customer", "nation", "supplier", "region"):
            shutil.copy(
                os.path.join(SRC, f"{dim}.parquet"),
                os.path.join(big, f"{dim}.parquet"),
            )
        base = time_queries(spark, SRC)
        scaled = time_queries(spark, big)
        print(f"\n== r8 scale probe: 1x vs {k}x (sf0.1 base, src {SRC}) ==")
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
