#!/usr/bin/env python
"""Round-4 operator scale probe: replicate the sf0.1 tables K× (documents
with fresh ids + perturbed text, lineitem/orders with shifted keys,
embeddings with jittered vectors), then time the new operator families at
1× vs K×:

- chunk_dedup_report       — span-grain dedup (hash window; ~linear)
- basket_lift_pairs        — inverted-index pair join (Σ k² per order,
                             k constant ⇒ ~linear in orders)
- pq_code_assignment       — broadcast codebook join (~linear in vectors)
- rolling_zscore_events    — bounded-frame window (~linear in events)
- pareto_frontier_orders   — two-level sweep (local pass parallel;
                             global pass over survivors only)

What this demonstrates for 100 TB design: none of these plans contain an
unbounded self-product or a corpus-sized global sort, so runtime should
scale ~linearly with input. The one quadratic audit query
(knn_graph_degree_hist) is deliberately EXCLUDED — its own docstring
routes the scale path to the LSH pair generator.

Writes nothing to the repo; probe data lands in /tmp. Results recorded in
SURVEY.md (run manually, not in CI).

Usage: python tools/r4_scale_probe.py [K]
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

PROBE_QUERIES = [
    "chunk_dedup_report",
    "basket_lift_pairs",
    "pq_code_assignment",
    "rolling_zscore_events",
    "pareto_frontier_orders",
]

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(spark, k: int, out_dir: str) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.count()
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0]
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0]
    max_eid = ev.agg(F.max("event_id")).collect()[0][0]

    def times(df, fn):
        parts = [fn(df, i) for i in range(k)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    times(
        docs,
        lambda d, i: d.select(
            (F.col("doc_id") + i * n_docs).alias("doc_id"),
            # perturb a token per replica so replicas aren't pure dups
            F.concat(F.col("text"), F.lit(f" replica{i}tail")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 12).alias("n_chars"),
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    times(
        li,
        lambda d, i: d.withColumn(
            "l_orderkey", F.col("l_orderkey") + i * (max_ok + 1)
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    times(
        orders,
        lambda d, i: d.withColumn(
            "o_orderkey", F.col("o_orderkey") + i * (max_ok + 1)
        ).withColumn("o_totalprice", F.col("o_totalprice") + i * 0.01),
    ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    times(
        emb,
        lambda d, i: d.withColumn(
            "vec_id", F.col("vec_id") + i * (max_vec + 1)
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    times(
        ev,
        lambda d, i: d.withColumn(
            "event_id", F.col("event_id") + i * (max_eid + 1)
        ).withColumn("user_id", F.col("user_id") + i * 1_000_000),
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


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
    spark = get_spark(app_name="r4-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="r4probe_")
    try:
        replicate(spark, k, big)
        base = time_queries(spark, SRC)
        scaled = time_queries(spark, big)
        print(f"\n== r4 scale probe: 1x vs {k}x (sf0.1 base) ==")
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
