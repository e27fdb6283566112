"""Round-6 prep batch 5: multi-probe LSH retrieval, per-dimension
mutual-information feature relevance, and Kaplan-Meier retention — an
ANN recall upgrade that reuses the existing index, the filter-method
feature selector over the embedding space, and the censoring-correct
churn estimator.

Parity rules as earlier extended modules: hyperplane literals shared by
seed regeneration (seed 42, same as extended.py / extended_r6b), all
logs micro-nat-snapped per integer count, survival carried in log space
so the cumulative operator is an integer sum.
"""

from __future__ import annotations

import random as _random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_DOT_DD = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, v) -> acc + v)"
)
_NORM_DD = (
    "sqrt(list_reduce(list_transform({a},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
)

_rnd = _random.Random(42)
_TOPK_PLANES = [[_rnd.gauss(0, 1) for _ in range(64)] for _ in range(4)]


def _sql_plane_lit(plane):
    return "[" + ", ".join(str(float(x)) for x in plane) + "]"


def _sql_bucket(vec, planes):
    bits = " || ".join(
        f"(CASE WHEN {_DOT_DD.format(a=vec, b=_sql_plane_lit(p))} >= 0"
        " THEN '1' ELSE '0' END)"
        for p in planes
    )
    return f"({bits})"


def _sql_flip(b: str, i: int, nb: int) -> str:
    return (
        f"substring({b}, 1, {i - 1})"
        f" || (CASE WHEN substring({b}, {i}, 1) = '1' THEN '0' ELSE '1' END)"
        f" || substring({b}, {i + 1}, {nb - i})"
    )


_SQL_LNM = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1e6) AS BIGINT)"


def _register():
    from politicamente_etl_spark.operators import sim, stats, temporal
    from politicamente_etl_spark.plans.catalog import T, register

    # -- multi-probe LSH ----------------------------------------------------

    _probe_list = ", ".join(
        [
            "bucket",
            *[_sql_flip("bucket", i, len(_TOPK_PLANES))
              for i in range(1, len(_TOPK_PLANES) + 1)],
        ]
    )

    @register(
        "cosine_topk_lsh_multiprobe",
        sql=f"""
        WITH sigc AS (
            SELECT vec_id, embedding,
                   {_sql_bucket('embedding', _TOPK_PLANES)} AS bucket,
                   {_NORM_DD.format(a='embedding')} AS nrm
            FROM embeddings
        ), sigq AS (
            SELECT vec_id AS query_id, embedding AS q_vec, bucket,
                   nrm AS q_nrm
            FROM sigc WHERE vec_id < 6
        ), probes AS (
            SELECT query_id, q_vec, q_nrm,
                   unnest([{_probe_list}]) AS bucket
            FROM sigq
        ), cand AS (
            SELECT DISTINCT q.query_id, c.vec_id, c.embedding, q.q_vec,
                   c.nrm, q.q_nrm
            FROM sigc c JOIN probes q USING (bucket)
        ), scored AS (
            SELECT query_id, vec_id,
                   {_DOT_DD.format(a='embedding', b='q_vec')}
                       / (nrm * q_nrm) AS cos_sim
            FROM cand
        )
        SELECT query_id, vec_id, cos_sim,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, vec_id) <= 10
        """,
        tags=("ext-sim",),
    )
    def q_cosine_topk_lsh_multiprobe(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Multi-probe LSH top-10 (own bucket + every one-bit-flip
        neighbor): recall recovered at bucket boundaries for |planes|
        extra probes per query, same corpus index as cosine_topk_lsh.
        Probe fan-out multiplies only the broadcast query side;
        candidates dedupe before scoring."""
        emb = T(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 6)
        return sim.cosine_topk_lsh_multiprobe(
            emb, queries, _TOPK_PLANES, k=10
        )

    # -- per-dimension mutual information -----------------------------------

    @register(
        "dim_label_mutual_info",
        sql=f"""
        WITH m AS (
            SELECT label AS l, i AS dim,
                   CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0
                        THEN 1 ELSE 0 END AS s
            FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
        ), joint AS (
            SELECT dim, s, l, CAST(COUNT(*) AS BIGINT) AS n_sl
            FROM m GROUP BY 1, 2, 3
        ), ns AS (
            SELECT dim, s, CAST(SUM(n_sl) AS BIGINT) AS n_s
            FROM joint GROUP BY 1, 2
        ), nl AS (
            SELECT l, CAST(SUM(n_sl) AS BIGINT) AS n_l FROM joint GROUP BY 1
        ), nt AS (
            SELECT CAST(SUM(n_sl) AS BIGINT) AS n_tot FROM joint
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(SUM(n_sl) AS BIGINT) AS n_rows,
               CAST(SUM(n_sl * ({_SQL_LNM.format(x='n_sl')}
                                + {_SQL_LNM.format(x='n_tot')}
                                - {_SQL_LNM.format(x='n_s')}
                                - {_SQL_LNM.format(x='n_l')}))
                    AS BIGINT) AS mi_micro_n
        FROM joint
        JOIN ns USING (dim, s)
        JOIN nl USING (l)
        CROSS JOIN nt
        GROUP BY dim
        ORDER BY mi_micro_n DESC, dim
        LIMIT 16
        """,
        tags=("ext-sim", "ext-stats", "ext-profile"),
    )
    def q_dim_label_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Top-16 embedding dimensions by mutual information between the
        dimension's sign and the class label — exact-integer micro-nat
        MI numerators; the filter-method feature selector complementing
        embedding_dim_variance_rank (spread vs class alignment)."""
        emb = T(spark, sf_dir, "embeddings")
        return stats.dim_label_mutual_info(emb)

    # -- Kaplan-Meier retention ---------------------------------------------

    @register(
        "kaplan_meier_retention",
        sql=f"""
        WITH o AS (
            SELECT o_custkey,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS d
            FROM orders
        ), cust AS (
            SELECT o_custkey, MIN(d) AS fd, MAX(d) AS ld FROM o GROUP BY 1
        ), mx AS (
            SELECT MAX(ld) AS m FROM cust
        ), dur AS (
            SELECT (ld - fd) // 30 AS t,
                   CASE WHEN ld > m - 90 THEN 0 ELSE 1 END AS churn
            FROM cust CROSS JOIN mx
        ), steps AS (
            SELECT t, CAST(SUM(churn) AS BIGINT) AS d,
                   CAST(SUM(1 - churn) AS BIGINT) AS c
            FROM dur GROUP BY t
        ), risk AS (
            SELECT t, d, c,
                   CAST(SUM(d + c) OVER (ORDER BY t
                        ROWS BETWEEN CURRENT ROW
                        AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
            FROM steps
        ), lp AS (
            SELECT t, d, c, n_risk,
                   CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                              / CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT)
                       AS step_lp
            FROM risk WHERE d < n_risk
        )
        SELECT t, d, c, n_risk,
               CAST(SUM(step_lp) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS surv_lp_micro
        FROM lp
        """,
        tags=("ext-temporal", "ext-stats"),
    )
    def q_kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Customer-retention Kaplan-Meier curve: duration = months from
        first to last order, censored if the last order falls within 90
        days of the dataset horizon (still-active customers must NOT
        count as churned — the bias naive retention curves carry).
        Product-limit estimator in log space: per-step micro-nat ln
        terms, cumulative integer sum; steps after survival hits zero
        (d = n_risk) are dropped on both engines."""
        o = T(spark, sf_dir, "orders").select(
            "o_custkey", F.unix_date(F.to_date("o_orderdate")).alias("d")
        )
        cust = o.groupBy("o_custkey").agg(
            F.min("d").alias("fd"), F.max("d").alias("ld")
        )
        mx = cust.agg(F.max("ld").alias("m"))
        dur = cust.crossJoin(F.broadcast(mx)).select(
            F.expr("(ld - fd) div 30").alias("t"),
            F.when(F.col("ld") > F.col("m") - 90, F.lit(0))
            .otherwise(F.lit(1))
            .alias("churn"),
        )
        steps = dur.groupBy("t").agg(
            F.sum("churn").cast("long").alias("d"),
            F.sum(F.lit(1) - F.col("churn")).cast("long").alias("c"),
        )
        km = temporal.kaplan_meier_terms(steps, "t", "d", "c")
        return km.filter(F.col("d") < F.col("n_risk")).select(
            "t", "d", "c", "n_risk", "surv_lp_micro"
        )


_register()
