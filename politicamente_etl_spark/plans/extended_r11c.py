"""Round-6 batch C: benchmark decontamination — the eval-overlap gate
every LLM training pipeline runs before a data release (Brown et al.
2020 appendix C; the n-gram-overlap half of contamination auditing —
`train_test_contamination` is the exact-duplicate half).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from politicamente_etl_spark.operators import dedup


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "eval_ngram_decontamination",
        sql="""
        WITH d AS (
            SELECT doc_id, source, doc_id % 97 = 0 AS is_eval,
                   string_split(text, ' ') AS a
            FROM documents
        ), grams AS (
            SELECT DISTINCT doc_id, source, is_eval,
                   array_to_string(a[i:i+3], ' ') AS g
            FROM d, UNNEST(generate_series(1, len(a) - 3)) AS u(i)
        ), evalg AS (
            SELECT DISTINCT g FROM grams WHERE is_eval
        ), per AS (
            SELECT doc_id, source,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN g IN (SELECT g FROM evalg)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
            FROM grams WHERE NOT is_eval GROUP BY 1, 2
        )
        SELECT doc_id, source, n_grams, n_hit,
               CAST((n_hit * 1000000) // n_grams AS BIGINT)
                   AS contamination_ppm
        FROM per WHERE n_hit > 0
        """,
        tags=("ext-dedup", "ext-docs", "ext-text"),
    )
    def q_eval_ngram_decontamination(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Benchmark decontamination drop-list: training docs sharing
        token n-grams with the eval slice (doc_id % 97 — the stand-in
        benchmark table), scored by distinct-gram overlap ppm. Gram
        width 4 is tuned to the synthetic corpus's duplication profile
        so the check is non-trivial at test scale (8 contaminated docs
        at sf0.01); production runs 8-13-grams against the real
        benchmark relation with the identical plan. Scale shape: the
        corpus gram stream stays map-side (array_distinct + explode +
        broadcast-hash probe against the tiny eval gram set) and only
        per-doc rollups shuffle — the eval set, not the corpus, is the
        broadcast payload. Oracle slices a[i:i+3] == the 4-token
        regex-sweep shingle on the single-space-normalized corpus."""
        docs = T(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        return dedup.eval_ngram_contamination(docs, n=4, eval_mod=97)


_register()
