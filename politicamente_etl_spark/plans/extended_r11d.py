"""Round-6 batch D: canonical selection for near-dup clusters — the
keep-BEST policy production dedup uses (keep the longest / highest-
quality copy) instead of near_dup_clusters' keep-first (min id), plus
the delta between the two policies. Shares the Jaccard pair graph and
the transitive-closure oracle with the existing cluster queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politicamente_etl_spark.operators import dedup


# Same candidate CTE as plans/extended.py's cluster queries (defined
# function-locally there, so restated verbatim here): word-3-gram
# Jaccard >= 0.4 pairs.
_JACCARD_PAIRS_CTES = """
    t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               unnest([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                       for i in range(1, len(toks) - 1)]) AS sh
        FROM t
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes na ON inter.doc_a = na.doc_id
        JOIN sizes nb ON inter.doc_b = nb.doc_id
        WHERE CAST(n_common AS DOUBLE)
                  / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) >= 0.4
    )
"""


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "canonical_keep_best_report",
        sql=f"""
        WITH RECURSIVE {_JACCARD_PAIRS_CTES},
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, label) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
        ),
        clusters AS (
            SELECT node AS doc_id, MIN(label) AS cluster_id
            FROM reach GROUP BY node
        ),
        sized AS (
            SELECT c.cluster_id, c.doc_id, length(d.text) AS n_chars,
                   ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                       ORDER BY length(d.text) DESC, c.doc_id) AS rk
            FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
        )
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT)
                   AS canonical_doc_id,
               CAST(MAX(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT)
                   AS canonical_chars,
               CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
                   AS chars_dropped,
               CAST(CASE WHEN MAX(CASE WHEN rk = 1 THEN doc_id END)
                              != cluster_id
                    THEN 1 ELSE 0 END AS BIGINT) AS differs_from_keep_first
        FROM sized GROUP BY cluster_id HAVING COUNT(*) >= 2
        """,
        tags=("ext-dedup", "ext-quality"),
    )
    def q_canonical_keep_best_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Keep-BEST canonical selection: near-dup clusters (same
        Jaccard-0.4 pair graph + min-label propagation as
        near_dup_clusters) re-pick their survivor by quality — longest
        text, doc_id tiebreak — the policy real dedup pipelines use
        (the lowest-id copy is often the truncated one). Per multi-doc
        cluster: the chosen canonical, its size, bytes dropped, and
        whether the choice DIFFERS from keep-first (the audit column
        that justifies the policy). One rank window over cluster-sized
        groups after the clustering join; the window partitions by
        cluster_id, so no global sort exists.

        100 TB: clustering dominates (measured in the minhash/cc
        probes); this selection pass is one |docs|-row window. The
        quality key is pluggable (Gopher score, classifier logit) —
        length is the deterministic stand-in the oracle can mirror."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.4)
        clusters = dedup.near_dup_clusters(docs, pairs).select(
            "doc_id", "cluster_id"
        )
        sized = clusters.join(
            docs.select("doc_id", F.length("text").alias("n_chars")),
            "doc_id",
        ).withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.col("n_chars").desc(), "doc_id"
                )
            ),
        )
        best = F.when(F.col("rk") == 1, F.col("doc_id"))
        return (
            sized.groupBy("cluster_id")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.max(best).cast("long").alias("canonical_doc_id"),
                F.max(F.when(F.col("rk") == 1, F.col("n_chars")))
                .cast("long")
                .alias("canonical_chars"),
                F.sum(F.when(F.col("rk") > 1, F.col("n_chars")).otherwise(0))
                .cast("long")
                .alias("chars_dropped"),
            )
            .filter(F.col("n_docs") >= 2)
            .withColumn(
                "differs_from_keep_first",
                (F.col("canonical_doc_id") != F.col("cluster_id"))
                .cast("long"),
            )
            .select(
                "cluster_id",
                "n_docs",
                "canonical_doc_id",
                "canonical_chars",
                "chars_dropped",
                "differs_from_keep_first",
            )
        )


_register()
