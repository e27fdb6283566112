"""Round-6 prep batch 4: weighted sampling without replacement (A-ES
priorities) and per-group OLS trend terms — the quality-weighted
subsampling primitive and the classical trend estimator in mergeable
sufficient-statistics form.

Parity rules as the earlier extended modules; the A-ES key reuses the
proven snap-after-transcendental idiom (round(ln(u)/w * 1e9)) with u
derived from the 60-bit md5 hash, so even the RANDOMNESS is
engine-exact and append-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.operators import sampling, stats
    from politicamente_etl_spark.plans.catalog import T, register

    # -- weighted sampling --------------------------------------------------

    @register(
        "weighted_sample_topk",
        sql="""
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               CAST(round(
                   ln((CAST(('0x' || substring(md5('aes-v1:'
                           || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       + 1) / 1152921504606846976.0)
                   / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
        FROM documents
        WHERE n_chars > 0
        ORDER BY key_nano DESC, doc_id
        LIMIT 50
        """,
        tags=("ext-sample", "ext-docs"),
    )
    def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Top-50 weighted sample of the document corpus (weight =
        n_chars) via deterministic Efraimidis-Spirakis priorities — the
        without-replacement weighted sampler whose candidate sets merge
        across partitions (union, re-rank, cut), planned as TakeOrdered
        so only k rows per partition move."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
        return sampling.weighted_priority_sample(
            docs, weight_col="n_chars", k=50
        )

    # -- per-nation OLS trend -----------------------------------------------

    @register(
        "ols_revenue_trend_by_nation",
        sql="""
        WITH monthly AS (
            SELECT n.n_name,
                   CAST(date_part('year', CAST(o.o_orderdate AS DATE)) * 12
                        + date_part('month', CAST(o.o_orderdate AS DATE))
                        AS BIGINT) AS mx,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) // 100000 AS y
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ), g AS (
            SELECT n_name,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(mx) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(mx * y) AS BIGINT) AS sxy,
                   CAST(SUM(mx * mx) AS BIGINT) AS sxx
            FROM monthly GROUP BY 1
        )
        SELECT n_name,
               n AS n_points,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS den,
               CAST(sy * sxx - sx * sxy AS BIGINT) AS intercept_num
        FROM g
        """,
        tags=("ext-stats", "ext-temporal", "ext-rel"),
    )
    def q_ols_revenue_trend_by_nation(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-nation monthly-revenue OLS trend as exact integer
        sufficient-statistic terms (slope/intercept = num/den at read
        time) — kilodollar-snapped monthly totals, month index
        year*12+month. The classical complement of the robust
        theil_sen_revenue_trend; the whole fit is two partial-agg'd
        groupBys and two broadcast dimension joins."""
        o = T(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderdate", "o_totalprice"
        )
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        joined = o.join(
            F.broadcast(c.join(F.broadcast(n),
                               c.c_nationkey == n.n_nationkey)),
            o.o_custkey == F.col("c_custkey"),
        )
        monthly = joined.groupBy(
            "n_name",
            (
                F.year(F.to_date("o_orderdate")) * 12
                + F.month(F.to_date("o_orderdate"))
            )
            .cast("long")
            .alias("mx"),
        ).agg(
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT) div 100000"
            ).alias("y")
        )
        return stats.grouped_ols_terms(monthly, "n_name", "mx", "y")


_register()


def _register_streaming():
    from politicamente_etl_spark.plans.catalog import register

    _HLL_FIELD = 1 << 54

    @register(
        "streaming_hll_merge",
        sql=f"""
        WITH hashed AS (
            SELECT CAST(h // {_HLL_FIELD} AS BIGINT) AS bucket,
                   CAST(CASE WHEN h % {_HLL_FIELD} = 0 THEN 55
                        ELSE 55 - length(bin(h % {_HLL_FIELD}))
                        END AS INT) AS rho
            FROM (SELECT CAST(('0x' || substring(md5('hll-v1:'
                          || CAST(user_id AS VARCHAR)), 1, 15))
                          AS BIGINT) AS h
                  FROM events)
        )
        SELECT bucket, CAST(MAX(rho) AS INT) AS max_rho
        FROM hashed GROUP BY bucket
        """,
        tags=("ext-stream", "ext-sketch"),
    )
    def q_streaming_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
        """HLL registers maintained INCREMENTALLY through the streaming
        engine (two micro-batches, foreachBatch max-merge) and proven
        equal to the batch sketch over the whole feed — max-merge is
        idempotent + commutative, so the sink is exactly-once without
        txn ids: the cheapest streaming state there is. The oracle is
        the plain batch register derivation."""
        from politicamente_etl_spark.streaming import windows as W

        return W.stream_hll_register_merge(spark, sf_dir)


_register_streaming()
