"""Round-5 prep batch F: open-interval depth profiling (the classic
sweep-line +1/−1 trick), seasonal-naive forecast backtesting, and a
categorical column-profiling pass (cardinality / top-share / entropy).

Registers beyond the round-5 driver window; parity-checked locally and
rotated into later windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    # -- concurrency: open-orders depth --------------------------------------

    @register(
        "open_orders_depth_profile",
        sql="""
        WITH iv AS (
            SELECT o.o_orderkey,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o.o_orderdate AS DATE)) AS s,
                   greatest(MAX(date_diff('day', DATE '1970-01-01',
                                CAST(l.l_shipdate AS DATE))),
                            date_diff('day', DATE '1970-01-01',
                                      CAST(o.o_orderdate AS DATE))) AS e
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        ), deltas AS (
            SELECT day, SUM(d) AS delta,
                   SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n_starts,
                   SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS n_ends
            FROM (
                SELECT s AS day, 1 AS d FROM iv
                UNION ALL
                SELECT e + 1 AS day, -1 AS d FROM iv
            ) GROUP BY day
        )
        SELECT CAST(day AS BIGINT) AS day,
               CAST(n_starts AS BIGINT) AS n_starts,
               CAST(n_ends AS BIGINT) AS n_ends,
               CAST(SUM(delta) OVER (ORDER BY day) AS BIGINT) AS depth
        FROM deltas
        """,
        tags=("ext-temporal", "ext-window"),
    )
    def q_open_orders_depth_profile(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Concurrent-open-orders depth over time via the sweep-line
        trick: each fulfillment interval [order day, last ship day]
        contributes +1 at its start and −1 the day after it closes;
        the running sum of per-day deltas IS the depth — O(n) instead
        of the O(n·days) interval-stabbing join. The
        warehouse-capacity / WIP profile every ops dashboard needs.

        Scale shape: one orders⋈lineitem aggregate, a per-day delta
        rollup (bounded by the calendar), one bounded-series cumsum
        window. Row count is day-grain — SF-independent."""
        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
        li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
        iv = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy(
                "o_orderkey",
                F.unix_date(F.to_date("o_orderdate")).alias("s"),
            )
            .agg(
                F.max(F.unix_date(F.to_date("l_shipdate"))).alias("e_raw")
            )
            # clamp: intervals never end before they start
            .withColumn("e", F.greatest("e_raw", "s"))
        )
        deltas = (
            iv.select(F.col("s").alias("day"), F.lit(1).alias("d"))
            .unionByName(
                iv.select((F.col("e") + 1).alias("day"), F.lit(-1).alias("d"))
            )
            .groupBy("day")
            .agg(
                F.sum("d").alias("delta"),
                F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias(
                    "n_starts"
                ),
                F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias(
                    "n_ends"
                ),
            )
        )
        w = Window.orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return deltas.select(
            F.col("day").cast("long").alias("day"),
            F.col("n_starts").cast("long").alias("n_starts"),
            F.col("n_ends").cast("long").alias("n_ends"),
            F.sum("delta").over(w).cast("long").alias("depth"),
        )

    # -- forecasting: seasonal-naive backtest ---------------------------------

    @register(
        "seasonal_naive_backtest",
        sql="""
        WITH d AS (
            SELECT date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), scored AS (
            SELECT a.day, a.cents, b.cents AS forecast,
                   abs(a.cents - b.cents) AS err
            FROM d a JOIN d b ON a.day = b.day + 7
            WHERE a.cents > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
               CAST(SUM(err) AS BIGINT) AS total_err_cents,
               CAST(SUM(err) // COUNT(*) AS BIGINT) AS mae_cents,
               CAST(SUM(err * 1000000 // cents) // COUNT(*) AS BIGINT)
                   AS mape_ppm
        FROM scored
        """,
        tags=("ext-temporal", "ext-stats"),
    )
    def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Backtest of the seasonal-naive forecast (predict each day's
        revenue with the same weekday one week earlier): MAE and MAPE
        over every day whose lag-7 day exists — THE baseline every
        fancier forecaster (the catalog's Holt, autocorrelation,
        seasonality queries) must beat before it ships. The lag joins
        on day = day−7 (an equi-join on the bounded day series), not by
        row offset, so calendar gaps never misalign the pairing; errors
        are integer cents, MAPE is per-day integer ppm then floored
        mean.

        Scale shape: the daily aggregate is the data pass; the
        self-join runs on the calendar-bounded series."""
        o = T(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
        d = (
            o.groupBy(F.unix_date(F.to_date("o_orderdate")).alias("day"))
            .agg(
                (F.sum(F.col("o_totalprice").cast("decimal(27,2)")) * 100)
                .cast("long")
                .alias("cents")
            )
        )
        a, b = d.alias("a"), d.alias("b")
        scored = (
            a.join(b, F.col("a.day") == F.col("b.day") + 7)
            .filter(F.col("a.cents") > 0)
            .select(
                F.col("a.cents").alias("cents"),
                F.abs(F.col("a.cents") - F.col("b.cents")).alias("err"),
            )
        )
        return scored.agg(
            F.count("*").cast("long").alias("n_days_scored"),
            F.sum("err").cast("long").alias("total_err_cents"),
            F.expr("sum(err) DIV count(*)").cast("long").alias("mae_cents"),
            F.expr("sum(err * 1000000 DIV cents) DIV count(*)")
            .cast("long")
            .alias("mape_ppm"),
        )

    # -- profiling: categorical column census ---------------------------------

    @register(
        "column_cardinality_profile",
        sql=f"""
        WITH cols AS (
            SELECT 'orders.o_orderstatus' AS col, o_orderstatus AS v
            FROM orders
            UNION ALL
            SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
            UNION ALL
            SELECT 'lineitem.l_returnflag', l_returnflag FROM lineitem
            UNION ALL
            SELECT 'customer.c_mktsegment', c_mktsegment FROM customer
        ), vc AS (
            SELECT col, v, COUNT(*) AS c FROM cols GROUP BY 1, 2
        ), tot AS (
            SELECT col, SUM(c) AS n, COUNT(*) AS k, MAX(c) AS top_c
            FROM vc GROUP BY col
        ), ent AS (
            SELECT vc.col,
                   SUM(vc.c * CAST(round(ln(CAST(vc.c AS DOUBLE) / tot.n)
                       * {MICRO}, 0) AS BIGINT)) AS ent_num
            FROM vc JOIN tot ON vc.col = tot.col
            GROUP BY vc.col
        )
        SELECT t.col,
               CAST(t.n AS BIGINT) AS n_rows,
               CAST(t.k AS BIGINT) AS n_distinct,
               CAST(t.top_c * 1000000 // t.n AS BIGINT) AS top_share_ppm,
               CAST(-e.ent_num // t.n AS BIGINT) AS entropy_micro
        FROM tot t JOIN ent e ON t.col = e.col
        """,
        tags=("ext-profile", "ext-quality"),
    )
    def q_column_cardinality_profile(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Categorical column census across tables: cardinality, modal
        share, and Shannon entropy (micro-nats, snapped per category at
        birth) for four representative low-cardinality columns — the
        profiling pass that feeds dictionary-encoding, skew-handling
        and FD-candidate decisions. Each column costs one value-count
        aggregate; the union is a single plan.

        Scale shape: per column one narrow (col, value) count; value
        domains are bounded, so everything after the first aggregate is
        tiny."""
        o = T(spark, sf_dir, "orders")
        li = T(spark, sf_dir, "lineitem")
        c = T(spark, sf_dir, "customer")
        cols = (
            o.select(
                F.lit("orders.o_orderstatus").alias("col"),
                F.col("o_orderstatus").alias("v"),
            )
            .unionByName(
                o.select(
                    F.lit("orders.o_orderpriority").alias("col"),
                    F.col("o_orderpriority").alias("v"),
                )
            )
            .unionByName(
                li.select(
                    F.lit("lineitem.l_returnflag").alias("col"),
                    F.col("l_returnflag").alias("v"),
                )
            )
            .unionByName(
                c.select(
                    F.lit("customer.c_mktsegment").alias("col"),
                    F.col("c_mktsegment").alias("v"),
                )
            )
        )
        vc = cols.groupBy("col", "v").agg(F.count("*").alias("c"))
        tot = vc.groupBy("col").agg(
            F.sum("c").alias("n"),
            F.count("*").alias("k"),
            F.max("c").alias("top_c"),
        )
        lp = F.round(
            F.log(F.col("c").cast("double") / F.col("n")) * MICRO, 0
        ).cast("long")
        ent = (
            vc.join(tot.select("col", "n"), "col")
            .groupBy("col")
            .agg(F.sum(F.col("c") * lp).alias("ent_num"))
        )
        return (
            tot.join(ent, "col")
            .select(
                "col",
                F.col("n").cast("long").alias("n_rows"),
                F.col("k").cast("long").alias("n_distinct"),
                F.expr("top_c * 1000000 DIV n").cast("long").alias(
                    "top_share_ppm"
                ),
                F.expr("-ent_num DIV n").cast("long").alias("entropy_micro"),
            )
        )


_register()
