"""Approximate-similarity quality checks: the ANN paths (LSH, IVF) are
rows-only for the driver, so pin their semantics here — returned scores
must be EXACT cosines (approximation may only drop candidates, never
mis-score them) and recall against the exact top-k must be non-trivial.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from politicamente_etl_spark.plans.catalog import CATALOG
from politicamente_etl_spark.sources.readers import load_table
from politicamente_etl_spark.operators import sim


def _exact_sims(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = sim.cosine_topk(emb, q, k=10)
    return {(r.query_id, r.vec_id): r.cos_sim for r in exact.collect()}


def test_ivf_scores_are_exact_cosines(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    full = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in sim.cosine_topk(emb, q, k=10_000).collect()
    }
    ivf = sim.cosine_topk_ivf(emb, q, k=10, n_cells=8, n_probe=3).collect()
    assert ivf, "IVF returned nothing"
    for r in ivf:
        assert full[(r.query_id, r.vec_id)] == r.cos_sim


def test_ivf_recall_nontrivial(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = set(_exact_sims(spark, sf_dir))
    ivf = {
        (r.query_id, r.vec_id)
        for r in sim.cosine_topk_ivf(emb, q, k=10, n_cells=8, n_probe=3).collect()
    }
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_ivf_respects_k_per_query(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = sim.cosine_topk_ivf(emb, q, k=10, n_cells=8, n_probe=3)
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] <= 10 for r in per_q)
