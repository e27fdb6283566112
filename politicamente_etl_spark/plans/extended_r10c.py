"""Round-5 prep batch C: BI top-k-plus-OTHER rollups, semi-additive
LAST-value aggregation, hapax-legomena vocabulary profiling, exact
two-sample Kolmogorov-Smirnov, Spearman rank-correlation sufficient
statistics (tie-aware), and TTL-based alert suppression.

Registers beyond the round-5 driver window; parity-checked locally and
rotated into later windows. House rules apply (integer ppm/micro
snapping, deterministic tie-breaks, cumulative counts instead of float
ECDFs, doubled ranks so tied average ranks stay integral)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _register():
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    # -- BI: top-k with OTHER bucket ----------------------------------------

    @register(
        "topk_plus_other_suppliers",
        sql="""
        WITH rev AS (
            SELECT s.s_nationkey, l.l_suppkey,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(27,4))) * 10000 AS BIGINT)
                       AS units
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
        ), ranked AS (
            SELECT s_nationkey, l_suppkey, units,
                   ROW_NUMBER() OVER (PARTITION BY s_nationkey
                       ORDER BY units DESC, l_suppkey) AS rnk
            FROM rev
        ), shaped AS (
            SELECT s_nationkey,
                   CASE WHEN rnk <= 3 THEN CAST(l_suppkey AS VARCHAR)
                        ELSE 'OTHER' END AS entity,
                   CASE WHEN rnk <= 3 THEN rnk ELSE 4 END AS rnk,
                   units
            FROM ranked
        )
        SELECT n.n_name AS nation, sh.entity,
               CAST(sh.rnk AS BIGINT) AS rnk,
               CAST(SUM(sh.units) AS BIGINT) AS revenue_units,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM shaped sh JOIN nation n ON sh.s_nationkey = n.n_nationkey
        GROUP BY 1, 2, 3
        """,
        tags=("ext-olap", "ext-rel"),
    )
    def q_topk_plus_other_suppliers(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The BI staple: top-3 suppliers by revenue within each nation
        as named rows, everyone else folded into one 'OTHER' bucket per
        nation — bounded report cardinality no matter how many
        suppliers exist. Revenue ranks and sums in exact integer 1e-4
        units (rank ties broken by suppkey).

        Scale shape: one lineitem aggregate, one per-nation window over
        supplier-sized groups, broadcast nation join; output is
        4 rows/nation max."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_suppkey", "l_extendedprice", "l_discount"
        )
        s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        rev = (
            li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .groupBy("s_nationkey", "l_suppkey")
            .agg(
                (
                    F.sum(
                        (
                            F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))
                        ).cast("decimal(27,4)")
                    )
                    * 10000
                )
                .cast("long")
                .alias("units")
            )
        )
        w = Window.partitionBy("s_nationkey").orderBy(
            F.col("units").desc(), "l_suppkey"
        )
        shaped = rev.withColumn("rnk0", F.row_number().over(w)).select(
            "s_nationkey",
            F.when(
                F.col("rnk0") <= 3, F.col("l_suppkey").cast("string")
            )
            .otherwise(F.lit("OTHER"))
            .alias("entity"),
            F.when(F.col("rnk0") <= 3, F.col("rnk0"))
            .otherwise(F.lit(4))
            .alias("rnk"),
            "units",
        )
        return (
            shaped.join(
                F.broadcast(n), shaped.s_nationkey == n.n_nationkey
            )
            .groupBy(F.col("n_name").alias("nation"), "entity", "rnk")
            .agg(
                F.sum("units").cast("long").alias("revenue_units"),
                F.count("*").cast("long").alias("n_suppliers"),
            )
            .select(
                "nation",
                "entity",
                F.col("rnk").cast("long").alias("rnk"),
                "revenue_units",
                "n_suppliers",
            )
        )

    # -- semi-additive LAST aggregation -------------------------------------

    @register(
        "weekly_last_value_rollup",
        sql="""
        WITH e AS (
            SELECT user_id,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                       AS week,
                   CAST(round(value * 1000000, 0) AS BIGINT) AS v_micro,
                   ts, event_id
            FROM events
        ), lastv AS (
            SELECT week, user_id, v_micro FROM (
                SELECT week, user_id, v_micro,
                       ROW_NUMBER() OVER (PARTITION BY week, user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM e
            ) WHERE rn = 1
        )
        SELECT CAST(week AS BIGINT) AS week,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(v_micro) AS BIGINT) AS total_last_micro
        FROM lastv GROUP BY week
        """,
        tags=("ext-temporal", "ext-olap"),
    )
    def q_weekly_last_value_rollup(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Semi-additive measure aggregation — the balance-sheet rule:
        within each (epoch-week, user), take the LAST observed value
        (by ts then event_id), then SUM across users per week. Additive
        across users, last-value across time — the pattern every
        finance/inventory mart needs and naive SUM gets wrong. Values
        snap to integer micros at birth; weeks are epoch-day DIV 7
        (locale-free).

        Scale shape: one row_number window partitioned by (week, user)
        — the key carries the scale — then a narrow weekly rollup."""
        ev = load_events(spark, sf_dir)
        e = ev.select(
            "user_id",
            F.expr("unix_date(to_date(ts)) DIV 7").alias("week"),
            F.round(F.col("value") * MICRO, 0).cast("long").alias("v_micro"),
            "ts",
            "event_id",
        )
        w = Window.partitionBy("week", "user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        lastv = (
            e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("week", "user_id", "v_micro")
        )
        return lastv.groupBy("week").agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("v_micro").cast("long").alias("total_last_micro"),
        ).select(
            F.col("week").cast("long").alias("week"),
            "n_users",
            "total_last_micro",
        )

    # -- vocabulary: hapax legomena -----------------------------------------

    @register(
        "hapax_rate_by_source",
        sql="""
        WITH tc AS (
            SELECT source, t, COUNT(*) AS c FROM (
                SELECT source, unnest(string_split(text, ' ')) AS t
                FROM documents
            ) GROUP BY 1, 2
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS hapax_ppm,
               CAST(SUM(c) AS BIGINT) AS n_tokens
        FROM tc GROUP BY source
        """,
        tags=("ext-text",),
    )
    def q_hapax_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Hapax-legomena rate per source: the share of each source's
        vocabulary that occurs exactly once — the lexical-richness /
        noise axis (OCR junk and boilerplate sit at the two extremes;
        pairs with the Zipf and vocab-growth profiles already in the
        catalog). Two narrow shuffles: (source, token) count then a
        per-source rollup; tokens never leave the first aggregate."""
        docs = T(spark, sf_dir, "documents").select("source", "text")
        tc = (
            docs.select(
                "source", F.explode(F.split("text", " ")).alias("t")
            )
            .groupBy("source", "t")
            .agg(F.count("*").alias("c"))
        )
        hap = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        return tc.groupBy("source").agg(
            F.count("*").cast("long").alias("vocab"),
            hap.cast("long").alias("hapax"),
            F.expr(
                "sum(case when c = 1 then 1 else 0 end) * 1000000"
                " DIV count(*)"
            )
            .cast("long")
            .alias("hapax_ppm"),
            F.sum("c").cast("long").alias("n_tokens"),
        )

    # -- two-sample Kolmogorov-Smirnov --------------------------------------

    @register(
        "ks_doclen_two_sources",
        sql="""
        WITH lens AS (
            SELECT source, len(string_split(text, ' ')) AS n_tokens
            FROM documents WHERE source IN ('src0', 'src9')
        ), counts AS (
            SELECT n_tokens,
                   SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
                   SUM(CASE WHEN source = 'src9' THEN 1 ELSE 0 END) AS c2
            FROM lens GROUP BY 1
        ), tots AS (
            SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM counts
        ), ecdf AS (
            SELECT n_tokens,
                   SUM(c1) OVER (ORDER BY n_tokens) AS cum1,
                   SUM(c2) OVER (ORDER BY n_tokens) AS cum2
            FROM counts
        ), gaps AS (
            SELECT e.n_tokens,
                   abs(e.cum1 * t.n2 - e.cum2 * t.n1) AS num,
                   t.n1, t.n2
            FROM ecdf e CROSS JOIN tots t
        ), dmax AS (
            SELECT MAX(num) AS m FROM gaps
        )
        SELECT CAST(g.n1 AS BIGINT) AS n_a,
               CAST(g.n2 AS BIGINT) AS n_b,
               CAST(d.m * 1000000 // (g.n1 * g.n2) AS BIGINT) AS d_ppm,
               CAST(MIN(g.n_tokens) AS BIGINT) AS argmax_len
        FROM gaps g CROSS JOIN dmax d
        WHERE g.num = d.m
        GROUP BY g.n1, g.n2, d.m
        """,
        tags=("ext-stats", "ext-text"),
    )
    def q_ks_doclen_two_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact two-sample Kolmogorov-Smirnov D between the
        token-length distributions of two sources: the
        distribution-shift gate a pipeline runs before admitting a new
        crawl batch (pairs with the unigram-KL and char-JS divergences
        in the catalog, which compare content — this compares shape).
        D surfaces as its exact integer cross-multiplied numerator
        max|cum1·n2 − cum2·n1| over the merged support, in ppm; the
        argmax length (ties → smallest) localizes WHERE the
        distributions split.

        Scale shape: one (length, source) count — lengths bounded by
        the doc-length domain — then windows over that bounded support;
        the data pass never shuffles more than (length, two counts)."""
        docs = T(spark, sf_dir, "documents").select("source", "text")
        lens = docs.filter(F.col("source").isin("src0", "src9")).select(
            "source", F.size(F.split("text", " ")).alias("n_tokens")
        )
        counts = lens.groupBy("n_tokens").agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias(
                "c1"
            ),
            F.sum(F.when(F.col("source") == "src9", 1).otherwise(0)).alias(
                "c2"
            ),
        )
        tots = counts.agg(
            F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
        )
        wc = Window.orderBy("n_tokens").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ecdf = counts.select(
            "n_tokens",
            F.sum("c1").over(wc).alias("cum1"),
            F.sum("c2").over(wc).alias("cum2"),
        )
        gaps = ecdf.join(F.broadcast(tots)).select(
            "n_tokens",
            F.abs(
                F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
            ).alias("num"),
            "n1",
            "n2",
        )
        dmax = gaps.agg(F.max("num").alias("m"))
        return (
            gaps.join(F.broadcast(dmax))
            .filter(F.col("num") == F.col("m"))
            .groupBy("n1", "n2", "m")
            .agg(F.min("n_tokens").cast("long").alias("argmax_len"))
            .select(
                F.col("n1").cast("long").alias("n_a"),
                F.col("n2").cast("long").alias("n_b"),
                F.expr("m * 1000000 DIV (n1 * n2)").cast("long").alias(
                    "d_ppm"
                ),
                "argmax_len",
            )
        )

    # -- Spearman rank correlation (tie-aware sufficient stats) -------------

    @register(
        "spearman_orders_spend",
        sql="""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) * 100
                        AS BIGINT) AS y
            FROM orders GROUP BY 1
        ), rx AS (
            SELECT x, COUNT(*) AS t,
                   COALESCE(SUM(COUNT(*)) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS below
            FROM cust GROUP BY x
        ), ry AS (
            SELECT y, COUNT(*) AS t,
                   COALESCE(SUM(COUNT(*)) OVER (ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS below
            FROM cust GROUP BY y
        ), ranked AS (
            SELECT 2 * rx.below + rx.t + 1 AS r2x,
                   2 * ry.below + ry.t + 1 AS r2y
            FROM cust
            JOIN rx ON cust.x = rx.x
            JOIN ry ON cust.y = ry.y
        )
        SELECT CAST((SELECT COUNT(*) FROM cust) AS BIGINT) AS n,
               CAST(SUM((r2x - r2y) * (r2x - r2y)) AS BIGINT) AS sum_d2_x4,
               CAST((SELECT SUM(t * t * t - t) FROM rx) AS BIGINT)
                   AS tie_x,
               CAST((SELECT SUM(t * t * t - t) FROM ry) AS BIGINT)
                   AS tie_y
        FROM ranked
        """,
        tags=("ext-stats",),
    )
    def q_spearman_orders_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Spearman rank correlation between a customer's order count
        and total spend, as exact tie-aware sufficient statistics:
        DOUBLED average ranks (2·avg-rank = 2·below + t + 1 is always
        integral — the house trick for tied midranks), Σd² at 4×
        scale, and the Σ(t³−t) tie corrections for both variables —
        everything the caller needs for the tie-corrected ρ without a
        single float. Complements the Kendall τ-b already in the
        catalog (τ counts concordances; ρ measures rank distance).

        Scale shape: one orders aggregate, two bounded-domain rank
        tables (distinct counts / distinct cents), two broadcast-able
        joins back, one rollup. Σd² ~ 4n³: past ~1e6 customers emit
        per-n scaled stats per the house DIV-overflow rule (documented,
        BIGINT-exact at driver scale)."""
        o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        cust = o.groupBy("o_custkey").agg(
            F.count("*").cast("long").alias("x"),
            (F.sum(F.col("o_totalprice").cast("decimal(27,2)")) * 100)
            .cast("long")
            .alias("y"),
        )

        def rank_table(col: str):
            wp = Window.orderBy(col).rowsBetween(
                Window.unboundedPreceding, -1
            )
            return (
                cust.groupBy(col)
                .agg(F.count("*").alias("t"))
                .withColumn(
                    "below", F.coalesce(F.sum("t").over(wp), F.lit(0))
                )
            )

        rx = rank_table("x").withColumnRenamed("t", "tx")
        ry = rank_table("y").withColumnRenamed("t", "ty")
        ranked = (
            cust.join(rx.withColumnRenamed("below", "bx"), "x")
            .join(ry.withColumnRenamed("below", "by"), "y")
            .select(
                (2 * F.col("bx") + F.col("tx") + 1).alias("r2x"),
                (2 * F.col("by") + F.col("ty") + 1).alias("r2y"),
            )
        )
        n = cust.agg(F.count("*").alias("n"))
        tie_x = rx.agg(
            F.sum(F.col("tx") * F.col("tx") * F.col("tx") - F.col("tx")).alias(
                "tie_x"
            )
        )
        tie_y = ry.agg(
            F.sum(F.col("ty") * F.col("ty") * F.col("ty") - F.col("ty")).alias(
                "tie_y"
            )
        )
        d2 = ranked.agg(
            F.sum(
                (F.col("r2x") - F.col("r2y")) * (F.col("r2x") - F.col("r2y"))
            )
            .cast("long")
            .alias("sum_d2_x4")
        )
        return (
            d2.join(F.broadcast(n))
            .join(F.broadcast(tie_x))
            .join(F.broadcast(tie_y))
            .select(
                F.col("n").cast("long").alias("n"),
                "sum_d2_x4",
                F.col("tie_x").cast("long").alias("tie_x"),
                F.col("tie_y").cast("long").alias("tie_y"),
            )
        )

    # -- alerting: TTL suppression ------------------------------------------

    @register(
        "alert_ttl_suppression",
        sql="""
        WITH alerts AS (
            SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
            FROM events WHERE value >= 100.0
        ), seq AS (
            SELECT event_type, event_id, ts_us,
                   LAG(ts_us) OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) AS prev_us
            FROM alerts
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_alerts,
               CAST(SUM(CASE WHEN prev_us IS NULL
                             OR ts_us - prev_us >= 3600000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_fired,
               CAST(SUM(CASE WHEN prev_us IS NOT NULL
                             AND ts_us - prev_us < 3600000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
               CAST(SUM(CASE WHEN prev_us IS NULL
                             OR ts_us - prev_us >= 3600000000
                        THEN event_id ELSE 0 END) AS BIGINT)
                   AS fired_checksum
        FROM seq GROUP BY event_type
        """,
        tags=("ext-events", "ext-temporal"),
    )
    def q_alert_ttl_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TTL-based alert dedup: an event with value ≥ 100 raises an
        alert only if the user's PREVIOUS qualifying event is ≥ 1 h
        older (otherwise suppressed) — the notification-fatigue rule
        every alerting pipeline implements. Note the per-PREVIOUS-alert
        semantics (sliding, not tumbling): a steady drip where each gap
        is < 1 h suppresses everything after the first. Integer
        microsecond arithmetic end-to-end.

        Scale shape: a scan-level filter (≥100 prunes ~90% before any
        shuffle), one lag window partitioned by user, bounded rollup.
        The same rule runs incrementally in the streaming layer via
        per-user keyed state holding one timestamp."""
        ev = load_events(spark, sf_dir)
        alerts = ev.filter(F.col("value") >= 100.0).select(
            "user_id",
            "event_type",
            "event_id",
            F.expr("unix_micros(ts)").alias("ts_us"),
        )
        w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        seq = alerts.withColumn("prev_us", F.lag("ts_us").over(w))
        fired = F.col("prev_us").isNull() | (
            F.col("ts_us") - F.col("prev_us") >= 3_600_000_000
        )
        return seq.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n_alerts"),
            F.sum(F.when(fired, 1).otherwise(0)).cast("long").alias(
                "n_fired"
            ),
            F.sum(F.when(~fired, 1).otherwise(0)).cast("long").alias(
                "n_suppressed"
            ),
            F.sum(F.when(fired, F.col("event_id")).otherwise(0))
            .cast("long")
            .alias("fired_checksum"),
        )


_register()
