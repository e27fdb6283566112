"""Round-6 prep batch 6: CUSUM change-point detection and rank-biased
overlap — the mean-shift locator for revenue/traffic series and the
top-weighted ranking-agreement metric that quantifies, in one number
per query, how much recall the multi-probe LSH upgrade buys over
single-probe against the exact ranking.

Parity rules as earlier extended modules; RBO regroups the per-depth
overlap sum as one suffix-weight lookup per common doc (see
sim.rbo_suffix_weights), so the metric is exact integer micro-units.
"""

from __future__ import annotations

import random as _random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.operators.sim import rbo_suffix_weights

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


def _register():
    from politicamente_etl_spark.operators import sim, stats
    from politicamente_etl_spark.plans.catalog import T, register

    # -- CUSUM change point -------------------------------------------------

    @register(
        "revenue_changepoint_cusum",
        sql="""
        WITH daily AS (
            SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS t,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) // 100000 AS x
            FROM orders GROUP BY 1
        ), st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM daily
        ), cum AS (
            SELECT t, x, n, s,
                   CAST(SUM(n * x - s) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cusum,
                   CAST(SUM(x) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS sum_le,
                   CAST(COUNT(*) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n_le
            FROM daily CROSS JOIN st
        )
        SELECT t AS change_t, cusum,
               n_le AS n_before, sum_le AS sum_before,
               CAST(n - n_le AS BIGINT) AS n_after,
               CAST(s - sum_le AS BIGINT) AS sum_after
        FROM cum
        ORDER BY abs(cusum) DESC, t
        LIMIT 1
        """,
        tags=("ext-stats", "ext-temporal"),
    )
    def q_revenue_changepoint_cusum(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Most likely mean-shift day in daily revenue via the integer
        CUSUM peak, with exact before/after sums as evidence — the
        monitoring primitive behind 'did the pipeline/mix change on day
        X'. Aggregate-sized windows (one row per day) after the one
        corpus-sized daily rollup."""
        o = T(spark, sf_dir, "orders").select(
            F.unix_date(F.to_date("o_orderdate")).alias("day"),
            "o_totalprice",
        )
        daily = o.groupBy("day").agg(
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT) div 100000"
            ).alias("x")
        )
        return stats.cusum_changepoint(daily, "day", "x")

    # -- rank-biased overlap ------------------------------------------------

    _K = 10
    _CW = rbo_suffix_weights(_K, 0.9)
    _cw_lit = "[" + ", ".join(str(w) for w in _CW) + "]"
    _probe_list = ", ".join(
        [
            "bucket",
            *[_sql_flip("bucket", i, len(_TOPK_PLANES))
              for i in range(1, len(_TOPK_PLANES) + 1)],
        ]
    )

    @register(
        "rbo_ann_comparison",
        sql=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS q_vec
            FROM embeddings WHERE vec_id < 6
        ), ex_scored AS (
            SELECT q.query_id, e.vec_id,
                   {_DOT_DD.format(a='e.embedding', b='q.q_vec')}
                   / ({_NORM_DD.format(a='e.embedding')}
                      * {_NORM_DD.format(a='q.q_vec')}) AS cos_sim
            FROM embeddings e CROSS JOIN q
        ), exact AS (
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, vec_id) AS INT) AS re
            FROM ex_scored
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) <= {_K}
        ), sigc AS (
            SELECT vec_id, embedding,
                   {_sql_bucket('embedding', _TOPK_PLANES)} AS bucket,
                   {_NORM_DD.format(a='embedding')} AS nrm
            FROM embeddings
        ), sigq AS (
            SELECT vec_id AS query_id, embedding AS q_vec, bucket,
                   nrm AS q_nrm
            FROM sigc WHERE vec_id < 6
        ), lsh_scored AS (
            SELECT q.query_id, c.vec_id,
                   {_DOT_DD.format(a='c.embedding', b='q.q_vec')}
                       / (c.nrm * q.q_nrm) AS cos_sim
            FROM sigc c JOIN sigq q USING (bucket)
        ), lsh AS (
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, vec_id) AS INT) AS ra
            FROM lsh_scored
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) <= {_K}
        ), probes AS (
            SELECT query_id, q_vec, q_nrm,
                   unnest([{_probe_list}]) AS bucket
            FROM sigq
        ), mp_cand AS (
            SELECT DISTINCT q.query_id, c.vec_id, c.embedding, q.q_vec,
                   c.nrm, q.q_nrm
            FROM sigc c JOIN probes q USING (bucket)
        ), mp AS (
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY {_DOT_DD.format(a='embedding', b='q_vec')}
                            / (nrm * q_nrm) DESC, vec_id) AS INT) AS ra
            FROM mp_cand
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY {_DOT_DD.format(a='embedding', b='q_vec')}
                        / (nrm * q_nrm) DESC, vec_id) <= {_K}
        ), paired AS (
            SELECT 'lsh' AS method, e.query_id,
                   CASE WHEN a.ra IS NULL THEN NULL ELSE a.ra END AS ra,
                   e.re
            FROM exact e LEFT JOIN lsh a
              ON e.query_id = a.query_id AND e.vec_id = a.vec_id
            UNION ALL
            SELECT 'multiprobe', e.query_id, a.ra, e.re
            FROM exact e LEFT JOIN mp a
              ON e.query_id = a.query_id AND e.vec_id = a.vec_id
        )
        SELECT method, query_id,
               CAST(COUNT(ra) AS BIGINT) AS n_overlap,
               CAST(COALESCE(SUM(CASE WHEN ra IS NULL THEN 0
                    ELSE {_cw_lit}[greatest(re, ra)] END), 0) AS BIGINT)
                   AS rbo_micro
        FROM paired GROUP BY method, query_id
        """,
        tags=("ext-sim", "ext-quality"),
    )
    def q_rbo_ann_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Rank-biased overlap (p=0.9, k=10) of single-probe AND
        multi-probe LSH against the exact cosine ranking, per query —
        the top-weighted agreement number that shows what the extra
        probes buy. One join + literal suffix-weight lookup per method;
        exact integer micro-units."""
        emb = T(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 6)
        exact = sim.cosine_topk(emb, queries, k=_K).select(
            "query_id", "vec_id", "rank"
        )
        lsh = sim.cosine_topk_lsh(emb, queries, _TOPK_PLANES, k=_K).select(
            "query_id", "vec_id", "rank"
        )
        mp = sim.cosine_topk_lsh_multiprobe(
            emb, queries, _TOPK_PLANES, k=_K
        ).select("query_id", "vec_id", "rank")
        out_lsh = sim.rbo_compare(exact, lsh, k=_K, p=0.9).withColumn(
            "method", F.lit("lsh")
        )
        out_mp = sim.rbo_compare(exact, mp, k=_K, p=0.9).withColumn(
            "method", F.lit("multiprobe")
        )
        return out_lsh.unionByName(out_mp).select(
            "method", "query_id", "n_overlap", "rbo_micro"
        )


_register()
