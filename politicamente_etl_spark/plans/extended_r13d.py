"""Round-8 batch D: SQL-surface and array-pipeline coverage —
IDENTIFIER clause (injection-safe dynamic table names), ANSI try_*
arithmetic (NULL-on-error instead of job-kill), per-segment cume_dist,
regexp_extract_all numeric-mention mining, and per-order array metrics
(collect → sort → slice/aggregate, the higher-order-function pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "identifier_clause_scan",
        sql="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
        """,
        tags=("ext-sql",),
    )
    def q_identifier_clause_scan(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """IDENTIFIER clause (Spark 3.5, SPARK-43205): the table NAME
        binds as a parameter — `FROM IDENTIFIER(:tbl)` — so multi-tenant
        / per-vintage table routing needs no string-spliced SQL (names,
        like values, become un-injectable). Resolution happens at
        analysis time; the resolved plan is identical to the literal
        reference (the oracle), so pushdown/pruning are unaffected. The
        value parameter rides the same `args=` binding — the two
        parameterization axes (names via IDENTIFIER, values via typed
        literals) compose in one statement."""
        T(spark, sf_dir, "orders").createOrReplaceTempView("ident_orders_v")
        return spark.sql(
            """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM IDENTIFIER(:tbl)
            WHERE o_orderstatus = :status
            GROUP BY o_orderpriority
            """,
            args={"tbl": "ident_orders_v", "status": "O"},
        )

    @register(
        "try_arithmetic_audit",
        sql="""
        WITH x AS (
            SELECT l_linestatus,
                   CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
                   CAST(l_quantity AS BIGINT) - 25 AS divisor
            FROM lineitem
        )
        SELECT l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN divisor = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_div,
               CAST(SUM(CASE WHEN divisor = 0 THEN NULL
                             ELSE CAST(floor(CAST(cents AS DOUBLE)
                                  / CAST(divisor AS DOUBLE)) AS BIGINT)
                        END) AS BIGINT) AS floored_ratio_sum
        FROM x GROUP BY l_linestatus
        """,
        tags=("ext-sql", "ext-quality"),
    )
    def q_try_arithmetic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ANSI-safe try_* arithmetic (Spark 3.2+/4 ANSI mode
        companions): `try_divide` yields NULL on the zero-divisor rows
        instead of either killing the job (ANSI on) or silently
        producing Inf that poisons downstream sums (ANSI off) — the
        per-row error-quarantine analogue of the CSV/JSONL PERMISSIVE
        reports, for arithmetic. The audit pins the null count (exactly
        the qty=25 rows) AND that the surviving ratios aggregate
        uncontaminated (floored to integers so the sum is exact on both
        engines; the oracle spells try_divide as CASE/NULL). At 100 TB
        a single bad row must never cost a 6-hour job — try_* is how
        expression-level failures become data, not crashes."""
        x = T(spark, sf_dir, "lineitem").select(
            "l_linestatus",
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
            (F.col("l_quantity").cast("long") - 25).alias("divisor"),
        )
        ratio = F.try_divide(
            F.col("cents").cast("double"), F.col("divisor").cast("double")
        )
        return x.groupBy("l_linestatus").agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum((F.col("divisor") == 0).cast("long"))
            .cast("long")
            .alias("n_null_div"),
            F.sum(F.floor(ratio).cast("long"))
            .cast("long")
            .alias("floored_ratio_sum"),
        )

    @register(
        "price_cume_dist_by_segment",
        sql="""
        WITH x AS (
            SELECT o_orderkey, c_mktsegment AS seg,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT o_orderkey, seg, cents,
               cume_dist() OVER (PARTITION BY seg ORDER BY cents)
                   AS cume
        FROM x
        QUALIFY o_orderkey % 997 = 0
        """,
        tags=("ext-olap", "ext-stats"),
    )
    def q_price_cume_dist_by_segment(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-segment empirical CDF position (cume_dist) — "this order
        is more expensive than X% of its segment", the percentile-rank
        feature scoring and pricing dashboards want. cume_dist is
        tie-stable (equal prices share the value, so no tiebreak
        nondeterminism) and its double is count≤/n — one division,
        engine-identical. The window partitions by segment (parallel
        partitioned sorts, never a global order); the % 997 sample
        keeps the compared output small while every row's rank is
        computed — sampling the OUTPUT, not the window input, so the
        oracle sees identical ranks."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        x = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey",
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        w = Window.partitionBy("seg").orderBy("cents")
        return x.select(
            "o_orderkey",
            "seg",
            "cents",
            F.cume_dist().over(w).alias("cume"),
        ).filter(F.col("o_orderkey") % 997 == 0)

    @register(
        "numeric_mentions_stats",
        sql=r"""
        WITH m AS (
            SELECT source,
                   list_filter(regexp_extract_all(text, '\d+'),
                               x -> len(x) <= 9) AS nums
            FROM documents
        )
        SELECT source,
               CAST(SUM(len(nums)) AS BIGINT) AS n_mentions,
               -- COALESCE both layers: DuckDB's list_sum([]) is NULL
               -- while the Spark fold's init is 0 — a source with zero
               -- mentions must compare as 0 on both engines
               CAST(COALESCE(SUM(COALESCE(list_sum(list_transform(
                        nums, x -> CAST(x AS BIGINT))), 0)), 0) AS BIGINT)
                   AS value_sum,
               CAST(MAX(len(nums)) AS BIGINT) AS max_per_doc
        FROM m GROUP BY source
        """,
        tags=("ext-text",),
    )
    def q_numeric_mentions_stats(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Numeric-mention mining over the corpus: regexp_extract_all
        pulls every digit run, a length cap (≤9) keeps casts in int
        range, and per-source rollups count/sum the mentions — the
        PII-screening / quantity-extraction primitive (phone-number and
        ID detectors start exactly here, with a stricter pattern).
        Pure higher-order expression work (extract_all → filter →
        transform → aggregate), whole-stage-codegen'd, zero UDF, zero
        shuffle beyond the final source rollup."""
        d = T(spark, sf_dir, "documents").select("source", "text")
        nums = F.filter(
            F.regexp_extract_all(F.col("text"), F.lit(r"\d+"), F.lit(0)),
            lambda x: F.length(x) <= 9,
        )
        m = d.select("source", nums.alias("nums"))
        return m.groupBy("source").agg(
            F.sum(F.size("nums")).cast("long").alias("n_mentions"),
            F.sum(
                F.aggregate(
                    F.transform(F.col("nums"), lambda x: x.cast("long")),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
            )
            .cast("long")
            .alias("value_sum"),
            F.max(F.size("nums")).cast("long").alias("max_per_doc"),
        )

    @register(
        "order_line_array_metrics",
        sql="""
        WITH per_order AS (
            SELECT l_orderkey,
                   list_sort(list(CAST(floor(l_extendedprice * 100)
                                       AS BIGINT))) AS cents_arr
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               CAST(len(cents_arr) AS INT) AS n_items,
               cents_arr[(len(cents_arr) + 1) // 2] AS median_cents,
               CAST(list_sum(list_reverse_sort(cents_arr)[1:2])
                    AS BIGINT) AS top2_cents,
               CAST(list_sum(cents_arr) AS BIGINT) AS total_cents
        FROM per_order
        WHERE len(cents_arr) >= 3 AND l_orderkey % 101 = 0
        """,
        tags=("ext-olap",),
    )
    def q_order_line_array_metrics(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-order ARRAY pipeline: line prices collect into a sorted
        array, then pure array expressions compute the per-basket
        metrics (lower median by index, top-2 concentration, total) —
        the collect→sort→slice→aggregate shape that replaces a window
        cascade when the per-key group is small and several
        order-statistics are needed at once (ONE shuffle builds the
        array; every metric after is expression work — a rank-window
        formulation would re-sort per metric). Arrays stay
        basket-sized (≤7 items), so memory is bounded; the % 101
        output sample bounds the comparison, not the computation."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        per = li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_list("cents")).alias("cents_arr")
        )
        n = F.size("cents_arr")
        top2 = F.aggregate(
            F.slice(F.reverse(F.col("cents_arr")), 1, 2),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        total = F.aggregate(
            F.col("cents_arr"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return (
            per.filter((n >= 3) & (F.col("l_orderkey") % 101 == 0))
            .select(
                "l_orderkey",
                n.cast("int").alias("n_items"),
                F.element_at(
                    F.col("cents_arr"), ((n + 1) / 2).cast("int")
                ).alias("median_cents"),
                top2.alias("top2_cents"),
                total.alias("total_cents"),
            )
        )


_register()
