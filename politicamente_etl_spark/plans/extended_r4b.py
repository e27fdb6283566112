"""Round-4 catalog batch 2: warehouse analytics (Q21-shape audits,
weighted medians, modes, Benford profiling, bit-packed flags, CDC
changesets, deterministic Poisson-bootstrap CIs), event-stream session
analytics (first-seen curves, rolling outliers, streaks, lift tables),
integer-exact embedding infrastructure (product quantization, norm
outliers, ε-NN graph degrees, centroid drift), and two more Structured
Streaming output shapes (windowed top-k, complete-mode totals).

Engine-parity techniques (same rules as extended_r4.py):
- deterministic "randomness" = ('0x' || md5-hex-prefix)::BIGINT — the
  Poisson bootstrap inverts the CDF against 60-bit integer thresholds
  precomputed in exact Python floats, so both engines draw identical
  weights without any RNG;
- float embeddings snap to integer millis (floor(x*1000) of the same
  IEEE double → identical on both engines), making every distance/dot
  an exact integer sum — immune to accumulation order;
- rolling z-scores use the integer inequality (v·n − s)² > k²(n·ss − s²)
  instead of dividing — no float σ ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politicamente_etl_spark.functions.scalar import sql_money_sum
from politicamente_etl_spark.operators import cdc

# Poisson(1) CDF thresholds scaled to the 60-bit md5 hash space:
# P(k≤0)=e⁻¹, P(k≤1)=2e⁻¹, P(k≤2)=2.5e⁻¹, P(k≤3)=8e⁻¹/3. Computed once
# in Python so both engines compare against the same integer literals.
_POIS_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
)
N_REPLICATES = 32

# integer-milli component snap shared by the embedding queries
_M_SQL = "CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)"
_M_CTE = f"""
        WITH m AS (
            SELECT vec_id, label, i, {_M_SQL} AS mv
            FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
        )"""


def _emb_milli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, pos 1-based, mv) — posexploded integer-milli
    embedding components, the shared front of the embedding queries."""
    from politicamente_etl_spark.operators.core import spread
    from politicamente_etl_spark.plans.catalog import T

    # r9 opt: fan the one-split bench scan out before the 64-way
    # posexplode + downstream per-component work (single-core otherwise;
    # no-op at production split counts).
    emb = spread(T(spark, sf_dir, "embeddings"), "vec_id")
    return emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("i0", "e"),
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("e").cast("double") * 1000).cast("long").alias("mv"),
    )


def _register():
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    # -- warehouse audits ---------------------------------------------------

    @register(
        "waiting_supplier_audit",
        sql="""
        WITH per AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                       AS has_open
            FROM lineitem GROUP BY 1, 2
        ), o AS (
            SELECT l_orderkey,
                   COUNT(*) AS n_supp,
                   SUM(has_open) AS n_open_supp
            FROM per GROUP BY 1
        )
        SELECT p.l_suppkey AS s_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_blocking_orders
        FROM per p JOIN o USING (l_orderkey)
        WHERE p.has_open = 1 AND o.n_supp >= 2 AND o.n_open_supp = 1
        GROUP BY 1
        ORDER BY n_blocking_orders DESC, s_suppkey
        LIMIT 20
        """,
        tags=("ext-rel", "ext-subquery"),
    )
    def q_waiting_supplier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q21 shape — suppliers who are the SOLE open-line supplier
        on multi-supplier orders (everyone else fulfilled): the
        bottleneck-vendor audit. Instead of Q21's EXISTS/NOT-EXISTS
        chains, both sides decorrelate to two stacked aggregates (per
        (order, supplier) → per order) and one re-join — two shuffles on
        the natural keys, no correlated subquery, no row explosion."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_linestatus"
        )
        per = li.groupBy("l_orderkey", "l_suppkey").agg(
            F.max(
                F.when(F.col("l_linestatus") == "O", 1).otherwise(0)
            ).alias("has_open")
        )
        o = per.groupBy("l_orderkey").agg(
            F.count("*").alias("n_supp"),
            F.sum("has_open").alias("n_open_supp"),
        )
        return (
            per.join(o, "l_orderkey")
            .filter(
                (F.col("has_open") == 1)
                & (F.col("n_supp") >= 2)
                & (F.col("n_open_supp") == 1)
            )
            .groupBy(F.col("l_suppkey").alias("s_suppkey"))
            .agg(F.count("*").cast("long").alias("n_blocking_orders"))
            .orderBy(F.col("n_blocking_orders").desc(), "s_suppkey")
            .limit(20)
        )

    @register(
        "weighted_median_freight",
        sql="""
        WITH r AS (
            SELECT l_returnflag, l_extendedprice,
                   CAST(l_quantity AS BIGINT) AS w,
                   SUM(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cw,
                   SUM(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_returnflag) AS tw
            FROM lineitem
        )
        SELECT l_returnflag,
               MIN(l_extendedprice) AS weighted_median_price,
               CAST(MIN(tw) AS BIGINT) AS total_quantity
        FROM r WHERE cw * 2 >= tw
        GROUP BY l_returnflag
        """,
        tags=("ext-agg", "ext-window"),
    )
    def q_weighted_median_freight(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Quantity-weighted median line price per return flag — the
        robust price-level statistic (plain medians over-count bulk
        lines; weighting by quantity is the unit-level median). Exact via
        the cumulative-weight window: first row whose running weight
        crosses half the total. Quantities are integral, so the running
        sums are exact integers; the median itself is a PICKED value
        (MIN over qualifying rows), never arithmetic on floats. One
        shuffle on the (3-value) flag; at scale the same shape runs per
        finer partition key or falls back to approx_percentile."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_extendedprice",
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("w"),
        )
        wc = (
            Window.partitionBy("l_returnflag")
            .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy("l_returnflag")
        return (
            li.withColumn("cw", F.sum("w").over(wc))
            .withColumn("tw", F.sum("w").over(wt))
            .filter(F.col("cw") * 2 >= F.col("tw"))
            .groupBy("l_returnflag")
            .agg(
                F.min("l_extendedprice").alias("weighted_median_price"),
                F.min("tw").cast("long").alias("total_quantity"),
            )
        )

    @register(
        "priority_mode_by_segment",
        sql="""
        WITH c AS (
            SELECT c_mktsegment AS segment, o_orderpriority AS priority,
                   COUNT(*) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        )
        SELECT segment, priority AS mode_priority,
               CAST(n AS BIGINT) AS n_orders
        FROM c
        QUALIFY row_number() OVER (PARTITION BY segment
                ORDER BY n DESC, priority) = 1
        """,
        tags=("ext-agg",),
    )
    def q_priority_mode_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-segment MODE of order priority (most frequent value, ties
        to the lexicographically smaller) — the categorical analog of
        median, via count-then-argmax: one partial-agg shuffle on the
        (segment, priority) pair and a 25-row window. Never a
        collect_list."""
        o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        counts = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy(
                F.col("c_mktsegment").alias("segment"),
                F.col("o_orderpriority").alias("priority"),
            )
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("segment").orderBy(F.col("n").desc(), "priority")
        return (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "segment",
                F.col("priority").alias("mode_priority"),
                F.col("n").cast("long").alias("n_orders"),
            )
        )

    @register(
        "benford_first_digit",
        sql="""
        WITH d AS (
            SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders
        ), t AS (SELECT COUNT(*) AS total FROM d)
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(*) * 1000000 // t.total AS BIGINT) AS ppm
        FROM d CROSS JOIN t
        GROUP BY digit, t.total
        """,
        tags=("ext-agg", "ext-quality"),
    )
    def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Benford first-digit profile of order totals — the classic
        fraud/synthetic-data screen (organic monetary amounts follow
        log-uniform leading digits; generated ones usually don't). The
        digit comes from the INTEGER part's decimal string, so no float
        formatting is involved. One 9-group partial agg + a broadcast
        1-row total."""
        o = T(spark, sf_dir, "orders").select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        t = o.agg(F.count("*").alias("total"))
        return (
            o.groupBy("digit")
            .agg(F.count("*").cast("long").alias("n_orders"))
            .join(F.broadcast(t))
            .select(
                "digit",
                "n_orders",
                F.expr("n_orders * 1000000 DIV total").cast("long").alias("ppm"),
            )
        )

    @register(
        "bitflag_order_profile",
        sql="""
        WITH f AS (
            SELECT c_mktsegment AS segment,
                   (CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                    + CASE WHEN o_totalprice > 100000 THEN 2 ELSE 0 END
                    + CASE WHEN o_orderstatus = 'O' THEN 4 ELSE 0 END)
                       AS mask
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT segment,
               CAST(bit_or(mask) AS BIGINT) AS any_flags,
               CAST(bit_and(mask) AS BIGINT) AS all_flags,
               CAST(SUM(mask) AS BIGINT) AS mask_total,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM f GROUP BY segment
        """,
        tags=("ext-agg",),
    )
    def q_bitflag_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Bit-packed boolean profiling: three order predicates packed
        into one integer mask, aggregated with bitwise OR/AND — the
        compact encoding for flag sets (one column, k predicates) that
        at scale replaces k boolean columns in both storage and shuffle.
        bit_or/bit_and are order-insensitive integer aggs: engine-exact
        by construction."""
        o = T(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderpriority", "o_totalprice", "o_orderstatus"
        )
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        mask = (
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            + F.when(F.col("o_totalprice") > 100000, 2).otherwise(0)
            + F.when(F.col("o_orderstatus") == "O", 4).otherwise(0)
        )
        return (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select(F.col("c_mktsegment").alias("segment"), mask.alias("mask"))
            .groupBy("segment")
            .agg(
                F.expr("bit_or(mask)").cast("long").alias("any_flags"),
                F.expr("bit_and(mask)").cast("long").alias("all_flags"),
                F.sum("mask").cast("long").alias("mask_total"),
                F.count("*").cast("long").alias("n_orders"),
            )
        )

    @register(
        "bootstrap_replicate_totals",
        sql=f"""
        WITH reps AS (
            SELECT unnest(generate_series(0, {N_REPLICATES - 1})) AS rep
        ), u AS (
            SELECT reps.rep AS rep,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                   CAST(('0x' || substring(md5(concat_ws(':', 'boot-v1',
                            CAST(o_orderkey AS VARCHAR),
                            CAST(reps.rep AS VARCHAR))), 1, 15))
                        AS BIGINT) AS uh
            FROM orders CROSS JOIN reps
        ), w AS (
            SELECT rep, cents,
                   CASE
                     WHEN uh < {_POIS_T[0]} THEN 0
                     WHEN uh < {_POIS_T[1]} THEN 1
                     WHEN uh < {_POIS_T[2]} THEN 2
                     WHEN uh < {_POIS_T[3]} THEN 3
                     ELSE 4 END AS wt
            FROM u
        )
        SELECT rep,
               CAST(SUM(wt * cents) AS BIGINT) AS total_cents,
               CAST(SUM(wt) AS BIGINT) AS n_sampled
        FROM w GROUP BY rep
        """,
        tags=("ext-agg", "ext-sampling"),
    )
    def q_bootstrap_replicate_totals(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Deterministic Poisson bootstrap of total revenue: 32 replicate
        estimates, each row's replicate weight drawn as Poisson(1) by
        inverting the CDF against md5(seed, key, replicate) — the
        distributed bootstrap (Chamandy et al.'s online shape) with NO
        RNG: weights are a pure function of (key, rep), so replicas are
        reproducible across engines, runs, and partitionings. One narrow
        32× fan-out + one 32-group partial agg; downstream reads CI
        bounds off the replicate spread."""
        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        reps = spark.range(N_REPLICATES).select(F.col("id").alias("rep"))
        u = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("boot-v1"),
                        F.col("o_orderkey").cast("string"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        wt = (
            F.when(F.col("u") < _POIS_T[0], 0)
            .when(F.col("u") < _POIS_T[1], 1)
            .when(F.col("u") < _POIS_T[2], 2)
            .when(F.col("u") < _POIS_T[3], 3)
            .otherwise(4)
        )
        return (
            o.crossJoin(F.broadcast(reps))
            .withColumn("u", u)
            .withColumn("wt", wt)
            .withColumn(
                "cents", F.floor(F.col("o_totalprice") * 100).cast("long")
            )
            .groupBy("rep")
            .agg(
                F.sum(F.col("wt") * F.col("cents"))
                .cast("long")
                .alias("total_cents"),
                F.sum("wt").cast("long").alias("n_sampled"),
            )
        )

    @register(
        "snapshot_diff_cdc",
        sql="""
        WITH old AS (
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_orderkey % 97 <> 0
        ), new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 89 = 0
                        THEN CAST(floor(o_totalprice * 100) AS BIGINT) + 500
                        ELSE CAST(floor(o_totalprice * 100) AS BIGINT) END
                       AS cents
            FROM orders WHERE o_orderkey % 83 <> 0
        ), d AS (
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
                   CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                        WHEN n.o_orderkey IS NULL THEN 'delete'
                        WHEN o.cents IS DISTINCT FROM n.cents THEN 'update'
                        END AS change_type
            FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        )
        SELECT change_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(k) AS BIGINT) AS key_checksum
        FROM d WHERE change_type IS NOT NULL
        GROUP BY change_type
        """,
        tags=("ext-rel", "ext-cdc"),
    )
    def q_snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Snapshot CDC (`cdc.snapshot_diff`): the insert/update/delete
        changeset between two simulated nightly snapshots of orders
        (synthetic drift: ~1% missing on each side, ~1% price-bumped).
        The operator is one NULL-safe full-outer join on the key with
        early unchanged-row pruning — the incremental feed downstream
        MERGE sinks consume instead of re-reading full snapshots.
        Compared values are integer cents, so update detection is exact."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        old = o.filter(F.col("o_orderkey") % 97 != 0)
        new = o.filter(F.col("o_orderkey") % 83 != 0).withColumn(
            "cents",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.col("cents") + 500
            ).otherwise(F.col("cents")),
        )
        changes = cdc.snapshot_diff(old, new, ["o_orderkey"], ["cents"])
        return changes.groupBy("change_type").agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_checksum"),
        )

    # -- event-stream analytics ---------------------------------------------

    @register(
        "running_distinct_users",
        sql="""
        WITH fs AS (
            SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
            FROM events GROUP BY user_id
        ), per AS (
            SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day
        )
        SELECT day, CAST(new_users AS BIGINT) AS new_users,
               CAST(SUM(new_users) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_users
        FROM per
        """,
        tags=("ext-events", "ext-window"),
    )
    def q_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Cumulative-distinct-user curve (the growth chart): running
        COUNT(DISTINCT) is not windowable directly, so it decomposes into
        first-seen-day per user + a running sum over days — turning an
        O(n·days) distinct problem into one user-key agg, one tiny
        per-day agg, and a window over ~hundreds of day rows (the only
        unpartitioned window, on a day-grain table that stays tiny at
        any scale)."""
        ev = load_events(spark, sf_dir)
        fs = ev.groupBy("user_id").agg(
            F.min(F.date_format("ts", "yyyy-MM-dd")).alias("day")
        )
        per = fs.groupBy("day").agg(F.count("*").alias("new_users"))
        w = Window.orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return per.select(
            "day",
            F.col("new_users").cast("long").alias("new_users"),
            F.sum("new_users").over(w).cast("long").alias("cum_users"),
        )

    @register(
        "rolling_zscore_events",
        sql="""
        WITH v AS (
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(floor(value * 1000) AS BIGINT) AS vm
            FROM events
        ), r AS (
            SELECT event_id, user_id, vm,
                   COUNT(*) OVER w AS n,
                   SUM(vm) OVER w AS s,
                   SUM(vm * vm) OVER w AS ss
            FROM v
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, CAST(vm AS BIGINT) AS value_milli,
               CAST(n AS BIGINT) AS n_window
        FROM r
        WHERE n >= 10
          AND (vm * n - s) * (vm * n - s) > 9 * (n * ss - s * s)
        """,
        tags=("ext-events", "ext-window", "ext-quality"),
    )
    def q_rolling_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-user rolling anomaly detection: an event is an outlier when
        its value sits >3σ from the mean of that user's PREVIOUS ≤20
        events (self-excluded frame — no target leakage). The z-test is
        the cross-multiplied integer inequality (v·n−s)² > 9(n·ss−s²) on
        milli-snapped values: no division, no float σ, engine-exact.
        One shuffle on user_id; window frames are bounded (21 rows), so
        state per key is O(1)."""
        ev = load_events(spark, sf_dir)
        v = ev.select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.floor(F.col("value") * 1000).cast("long").alias("vm"),
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(-20, -1)
        )
        r = (
            v.withColumn("n", F.count("*").over(w))
            .withColumn("s", F.sum("vm").over(w))
            .withColumn("ss", F.sum(F.col("vm") * F.col("vm")).over(w))
        )
        lhs = (F.col("vm") * F.col("n") - F.col("s")) ** 2
        rhs = 9 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        return (
            r.filter((F.col("n") >= 10) & (lhs > rhs))
            .select(
                "event_id",
                "user_id",
                F.col("vm").cast("long").alias("value_milli"),
                F.col("n").cast("long").alias("n_window"),
            )
        )

    @register(
        "user_activity_streaks",
        sql="""
        WITH d AS (
            SELECT DISTINCT user_id,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS day
            FROM events
        ), g AS (
            SELECT user_id, day,
                   day - ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY day) AS grp
            FROM d
        ), s AS (
            SELECT user_id, COUNT(*) AS streak FROM g
            GROUP BY user_id, grp
        )
        SELECT user_id,
               CAST(MAX(streak) AS BIGINT) AS best_streak,
               CAST(SUM(streak) AS BIGINT) AS n_active_days
        FROM s GROUP BY user_id
        ORDER BY best_streak DESC, user_id
        LIMIT 20
        """,
        tags=("ext-events", "ext-window"),
    )
    def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Longest consecutive-active-day streak per user — the classic
        gaps-and-islands: day − row_number is constant within each
        consecutive run, so runs fall out of one per-user window plus two
        aggregates. Days are epoch-day INTEGERS (no date columns cross
        the engine boundary). Everything happens inside one user_id
        partitioning: window and both aggs reuse the same shuffle."""
        ev = load_events(spark, sf_dir)
        d = ev.select(
            "user_id", F.unix_date(F.to_date("ts")).alias("day")
        ).distinct()
        w = Window.partitionBy("user_id").orderBy("day")
        g = d.withColumn("grp", F.col("day") - F.row_number().over(w))
        s = g.groupBy("user_id", "grp").agg(F.count("*").alias("streak"))
        return (
            s.groupBy("user_id")
            .agg(
                F.max("streak").cast("long").alias("best_streak"),
                F.sum("streak").cast("long").alias("n_active_days"),
            )
            .orderBy(F.col("best_streak").desc(), "user_id")
            .limit(20)
        )

    @register(
        "decile_lift_table",
        sql="""
        WITH per AS (
            SELECT user_id,
                   SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(floor(value * 100) AS BIGINT)
                            ELSE 0 END) AS spend_cents,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS clicks,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS purchases
            FROM events GROUP BY user_id
        ), dec AS (
            SELECT *, ntile(10) OVER (ORDER BY spend_cents DESC, user_id)
                       AS decile
            FROM per
        )
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(spend_cents) AS BIGINT) AS spend_cents,
               CAST(SUM(clicks) AS BIGINT) AS clicks,
               CAST(SUM(purchases) AS BIGINT) AS purchases,
               CAST(SUM(purchases) * 1000000
                    // greatest(SUM(clicks), 1) AS BIGINT)
                   AS purchases_per_click_ppm
        FROM dec GROUP BY decile
        """,
        tags=("ext-events", "ext-window", "ext-agg"),
    )
    def q_decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Spend-decile lift table: users ranked into 10 equal bins by
        purchase spend, each bin reporting engagement and conversion —
        the marketing/value-segmentation standard report. Bucketing is
        `stats.ntile_buckets` in its EXACT mode (global ntile over the
        already user-aggregated table — |users| rows, not |events|);
        the operator's exact=False mode is the implemented 100 TB path
        (approx_percentile edges + broadcast comparison, no global
        sort). All integer cents/ppm."""
        ev = load_events(spark, sf_dir)
        per = ev.groupBy("user_id").agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("spend_cents"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "clicks"
            ),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchases"),
        )
        from politicamente_etl_spark.operators import stats

        return (
            stats.ntile_buckets(
                per, "spend_cents", 10, order_cols=["user_id"],
                exact=True, out_col="decile",
            )
            .groupBy("decile")
            .agg(
                F.count("*").cast("long").alias("n_users"),
                F.sum("spend_cents").cast("long").alias("spend_cents"),
                F.sum("clicks").cast("long").alias("clicks"),
                F.sum("purchases").cast("long").alias("purchases"),
            )
            .withColumn(
                "purchases_per_click_ppm",
                F.expr("purchases * 1000000 DIV greatest(clicks, 1)").cast(
                    "long"
                ),
            )
        )

    # -- embedding infrastructure -------------------------------------------

    @register(
        "pq_code_assignment",
        bench=True,
        sql=_M_CTE
        + """, sub AS (
            SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS subspace,
                   i, mv
            FROM m
        ), cb AS (
            SELECT vec_id AS cid, subspace, i, mv AS cm
            FROM sub WHERE vec_id < 8
        ), dist AS (
            SELECT s.vec_id, s.subspace, c.cid,
                   SUM((s.mv - c.cm) * (s.mv - c.cm)) AS d2
            FROM sub s JOIN cb c ON s.i = c.i AND s.subspace = c.subspace
            GROUP BY 1, 2, 3
        )
        SELECT vec_id, subspace, CAST(cid AS BIGINT) AS code,
               CAST(d2 AS BIGINT) AS dist_sq
        FROM dist
        QUALIFY row_number() OVER (PARTITION BY vec_id, subspace
                ORDER BY d2, cid) = 1
        """,
        tags=("ext-sim",),
    )
    def q_pq_code_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Product-quantization encoding (Jégou et al.): each 64-d vector
        splits into 4×16-d subvectors, each assigned to its nearest of 8
        codebook centroids (deterministically the first 8 corpus vectors
        here; k-means-refined in production — kmeans_refined_centroids is
        that step) — compressing vectors to 4 small codes for
        memory-resident ANN. Distances are exact integer sums over
        milli-snapped components; the codebook join is a broadcast
        (codebook is tiny BY DESIGN — that's the entire point of PQ), and
        the argmin is a per-(vec, subspace) window over 8 rows."""
        sub = _emb_milli(spark, sf_dir).select(
            "vec_id",
            ((F.col("i") - 1) / 16).cast("long").alias("subspace"),
            "i",
            "mv",
        )
        cb = sub.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cid"),
            F.col("subspace").alias("c_sub"),
            F.col("i").alias("ci"),
            F.col("mv").alias("cm"),
        )
        dist = (
            sub.join(
                F.broadcast(cb),
                (F.col("i") == F.col("ci"))
                & (F.col("subspace") == F.col("c_sub")),
            )
            .groupBy("vec_id", "subspace", "cid")
            .agg(
                F.sum(
                    (F.col("mv") - F.col("cm")) * (F.col("mv") - F.col("cm"))
                ).alias("d2")
            )
        )
        w = Window.partitionBy("vec_id", "subspace").orderBy("d2", "cid")
        return (
            dist.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "vec_id",
                "subspace",
                F.col("cid").cast("long").alias("code"),
                F.col("d2").cast("long").alias("dist_sq"),
            )
        )

    @register(
        "embedding_norm_outliers",
        sql=_M_CTE
        + """, nk AS (
            SELECT vec_id, CAST(SUM(mv * mv) // 1000 AS BIGINT) AS normk
            FROM m GROUP BY vec_id
        ), st AS (
            SELECT COUNT(*) AS n, SUM(normk) AS s,
                   SUM(normk * normk) AS ss
            FROM nk
        )
        SELECT vec_id, normk
        FROM nk CROSS JOIN st
        WHERE (normk * n - s) * (normk * n - s) > 4 * (n * ss - s * s)
        """,
        tags=("ext-sim", "ext-quality"),
    )
    def q_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Embedding-norm sanity screen: vectors whose squared-norm sits
        >2σ from the corpus mean — the cheap detector for broken encoder
        outputs (zero vectors, un-normalized batches, fp overflows)
        before they pollute ANN indexes. Same integer cross-multiplied
        z-test as rolling_zscore_events, over a 1-row broadcast of
        global moments; single scan, no window."""
        nk = (
            _emb_milli(spark, sf_dir)
            .groupBy("vec_id")
            .agg(
                F.expr("sum(mv * mv) DIV 1000").cast("long").alias("normk")
            )
        )
        st = nk.agg(
            F.count("*").alias("n"),
            F.sum("normk").alias("s"),
            F.sum(F.col("normk") * F.col("normk")).alias("ss"),
        )
        lhs = (F.col("normk") * F.col("n") - F.col("s")) ** 2
        rhs = 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        return (
            nk.join(F.broadcast(st))
            .filter(lhs > rhs)
            .select("vec_id", "normk")
        )

    @register(
        "knn_graph_degree_hist",
        sql=_M_CTE
        + """, dots AS (
            SELECT a.vec_id AS va, b.vec_id AS vb
            FROM m a JOIN m b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
            HAVING SUM(a.mv * b.mv) >= 250000
        ), deg AS (
            SELECT v, COUNT(*) AS degree FROM (
                SELECT va AS v FROM dots
                UNION ALL SELECT vb AS v FROM dots
            ) GROUP BY v
        )
        SELECT CAST(degree AS BIGINT) AS degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY degree
        """,
        tags=("ext-sim",),
    )
    def q_knn_graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ε-similarity-graph degree histogram: edges where the integer
        dot product clears ~cos 0.25, then the node-degree distribution —
        the connectivity profile that decides semantic-dedup clustering
        parameters (a heavy tail ⇒ hub vectors ⇒ cap or raise ε). This
        exact form is the audit/oracle twin: its self-join is quadratic
        and stays behind the small-corpus gate; the production path is
        the LSH-bucketed pair generator (cosine_near_dup_pairs_lsh) whose
        candidate pairs feed the SAME degree aggregation."""
        m = _emb_milli(spark, sf_dir)
        a, b = m.alias("a"), m.alias("b")
        dots = (
            a.join(
                b,
                (F.col("a.i") == F.col("b.i"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .groupBy(
                F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb")
            )
            .agg(F.sum(F.col("a.mv") * F.col("b.mv")).alias("dot"))
            .filter(F.col("dot") >= 250000)
        )
        deg = (
            dots.select(F.col("va").alias("v"))
            .unionAll(dots.select(F.col("vb").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("degree"))
        )
        return deg.groupBy("degree").agg(
            F.count("*").cast("long").alias("n_nodes")
        ).select(F.col("degree").cast("long").alias("degree"), "n_nodes")

    @register(
        "centroid_drift_by_label",
        sql=_M_CTE
        + """, halves AS (
            SELECT label, CAST(vec_id < 250 AS INT) AS is_a, i, mv
            FROM m
        ), means AS (
            -- the group is per DIMENSION: one row per vector, so
            -- COUNT(*) is the half's vector count directly
            SELECT label, is_a, i,
                   CAST(SUM(mv) // COUNT(*) AS BIGINT) AS mean_m,
                   COUNT(*) AS n_vecs
            FROM halves GROUP BY 1, 2, 3
        )
        SELECT a.label,
               CAST(MIN(a.n_vecs) AS BIGINT) AS n_a,
               CAST(MIN(b.n_vecs) AS BIGINT) AS n_b,
               CAST(SUM((a.mean_m - b.mean_m) * (a.mean_m - b.mean_m))
                    AS BIGINT) AS drift_sq
        FROM means a JOIN means b
          ON a.label = b.label AND a.i = b.i AND a.is_a = 1 AND b.is_a = 0
        GROUP BY a.label
        """,
        tags=("ext-sim", "ext-quality"),
    )
    def q_centroid_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-label centroid drift between two corpus halves (old vs new
        vintage, proxied by vec_id split) — the embedding-drift monitor
        that flags encoder version skew / distribution shift per class
        before it degrades retrieval. Mean components are integer-milli
        (floor-div by count — deterministic), drift is the exact integer
        squared distance between the two mean vectors. Two partial aggs
        + a 64-row-per-label self-join; at scale the halves come from a
        partition predicate (date), so each side is one pruned scan."""
        m = _emb_milli(spark, sf_dir).select(
            "label",
            (F.col("vec_id") < 250).cast("int").alias("is_a"),
            "i",
            "mv",
        )
        means = m.groupBy("label", "is_a", "i").agg(
            F.expr("sum(mv) DIV count(*)").cast("long").alias("mean_m"),
            F.count("*").alias("n_vecs"),
        )
        a = means.filter(F.col("is_a") == 1).alias("a")
        b = means.filter(F.col("is_a") == 0).alias("b")
        return (
            a.join(
                b,
                (F.col("a.label") == F.col("b.label"))
                & (F.col("a.i") == F.col("b.i")),
            )
            .groupBy(F.col("a.label").alias("label"))
            .agg(
                F.min("a.n_vecs").cast("long").alias("n_a"),
                F.min("b.n_vecs").cast("long").alias("n_b"),
                F.sum(
                    (F.col("a.mean_m") - F.col("b.mean_m"))
                    * (F.col("a.mean_m") - F.col("b.mean_m"))
                )
                .cast("long")
                .alias("drift_sq"),
            )
        )

    # -- streaming output shapes --------------------------------------------

    def _stream(spark, sf_dir):
        from politicamente_etl_spark.streaming import windows as W

        return W.stream_events(spark, sf_dir)

    @register(
        "streaming_windowed_topk",
        sql="""
        WITH c AS (
            SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts))
                        AS BIGINT) AS window_start_epoch,
                   event_type, COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT window_start_epoch, event_type,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(row_number() OVER (PARTITION BY window_start_epoch
                    ORDER BY n_events DESC, event_type) AS BIGINT) AS rk
        FROM c
        QUALIFY rk <= 3
        """,
        tags=("ext-stream", "ext-window"),
    )
    def q_streaming_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Trending-now: top-3 event types per 10-minute window. The
        windowed counts run INSIDE the streaming engine (same micro-batch
        plan as streaming_tumbling_window); the per-window rank runs
        batch-side on the materialized (already window-grain, tiny)
        table — the standard split, since rank-over-updating-aggregates
        isn't incrementally maintainable and the post-aggregation table
        is window-count-sized, not event-sized."""
        from politicamente_etl_spark.streaming import windows as W

        counts = W.run_stream_to_table(
            W.tumbling_agg(_stream(spark, sf_dir))
        ).select("window_start_epoch", "event_type", "n_events")
        w = Window.partitionBy("window_start_epoch").orderBy(
            F.col("n_events").desc(), "event_type"
        )
        return (
            counts.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 3)
            .select(
                "window_start_epoch",
                "event_type",
                F.col("n_events").cast("long").alias("n_events"),
                "rk",
            )
        )

    @register(
        "streaming_complete_totals",
        sql=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS min_cents,
               CAST(MAX(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS max_cents,
               {sql_money_sum("value", "total_value")}
        FROM events GROUP BY event_type
        """,
        tags=("ext-stream",),
    )
    def q_streaming_complete_totals(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Global (unwindowed) running totals per event type through the
        streaming engine in COMPLETE output mode — the live-dashboard
        aggregate whose state is one row per group (bounded by event-type
        cardinality, no watermark needed; every trigger re-emits the full
        5-row table, which is exactly what complete mode is for).
        Finite replay ≡ batch, so the same SQL is the oracle; the money
        sum decimal-snaps and min/max are picked integer cents — all
        engine-exact."""
        from politicamente_etl_spark.streaming import windows as W

        ev = _stream(spark, sf_dir)
        agg = ev.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(F.floor(F.col("value") * 100).cast("long")).alias(
                "min_cents"
            ),
            F.max(F.floor(F.col("value") * 100).cast("long")).alias(
                "max_cents"
            ),
            F.sum(F.col("value").cast("decimal(27,4)"))
            .cast("double")
            .alias("total_value"),
        )
        return W.run_stream_to_table(agg, mode="complete")


_register()


def _register_calibration():
    from politicamente_etl_spark.operators import dedup
    from politicamente_etl_spark.plans.catalog import CATALOG as _CAT
    from politicamente_etl_spark.plans.catalog import T, register

    _minhash_pairs_sql = _CAT["minhash_near_dup_pairs"].sql

    @register(
        "minhash_calibration_report",
        sql=f"""
        WITH cand AS ({_minhash_pairs_sql}
        ), t2 AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), sh2 AS (
            SELECT DISTINCT doc_id,
                   unnest([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                           for i in range(1, len(toks) - 1)]) AS sh
            FROM t2
        ), sz AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), exact AS (
            SELECT doc_a, doc_b,
                   CAST(floor(CAST(n_common AS DOUBLE)
                        / (sa.n_sh + sb.n_sh - n_common) * 1000000)
                        AS BIGINT) AS exact_ppm
            FROM inter
            JOIN sz sa ON inter.doc_a = sa.doc_id
            JOIN sz sb ON inter.doc_b = sb.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST(floor(c.est_jaccard * 1000000) AS BIGINT) AS est_ppm,
               COALESCE(e.exact_ppm, 0) AS exact_ppm,
               abs(CAST(floor(c.est_jaccard * 1000000) AS BIGINT)
                   - COALESCE(e.exact_ppm, 0)) AS abs_err_ppm
        FROM cand c LEFT JOIN exact e USING (doc_a, doc_b)
        """,
        tags=("ext-dedup", "ext-approx"),
    )
    def q_minhash_calibration_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Sketch calibration: every MinHash-LSH candidate pair audited
        against its EXACT 3-gram Jaccard — the per-pair estimation error
        the banding parameters (4×2 here) must be tuned against before
        trusting est_jaccard thresholds at scale ('measure, don't
        guess' applied to the dedup operator itself). The exact side
        reuses the inverted-index join, restricted by the left join to
        candidate pairs; both similarity values surface as floor-ppm
        integers so the comparison is engine-exact."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        cand = dedup.minhash_near_dup_pairs(docs)
        exact = dedup.ngram_jaccard_pairs(docs, threshold=0.0).select(
            "doc_a",
            "doc_b",
            F.floor(F.col("jaccard") * 1000000).cast("long").alias("exact_ppm"),
        )
        est_ppm = F.floor(F.col("est_jaccard") * 1000000).cast("long")
        return (
            cand.join(exact, ["doc_a", "doc_b"], "left")
            .select(
                "doc_a",
                "doc_b",
                est_ppm.alias("est_ppm"),
                F.coalesce("exact_ppm", F.lit(0)).alias("exact_ppm"),
                F.abs(est_ppm - F.coalesce("exact_ppm", F.lit(0))).alias(
                    "abs_err_ppm"
                ),
            )
        )

    @register(
        "gini_spend_by_nation",
        sql="""
        WITH spend AS (
            SELECT c_nationkey,
                   o_custkey,
                   SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ), ranked AS (
            SELECT c_nationkey, o_custkey, cents,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY cents, o_custkey) AS i
            FROM spend
        )
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents)
                    AS DOUBLE)
                   / CAST(COUNT(*) * SUM(cents) AS DOUBLE) AS gini
        FROM ranked GROUP BY c_nationkey
        """,
        tags=("ext-agg", "ext-window"),
    )
    def q_gini_spend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Gini coefficient of customer spend per nation — the
        concentration/inequality metric (is revenue driven by a few whale
        customers?). Computed by the rank formula G = (2Σi·xᵢ −
        (n+1)Σxᵢ)/(nΣxᵢ) over integer cents with a deterministic
        (cents, custkey) rank order: both sums are exact integers and the
        single final division is the only float op. One shuffle for the
        per-customer rollup, reused by the per-nation window + agg."""
        o = T(spark, sf_dir, "orders").select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        spend = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_nationkey", "o_custkey")
            .agg(F.sum("cents").alias("cents"))
        )
        w = Window.partitionBy("c_nationkey").orderBy("cents", "o_custkey")
        ranked = spend.withColumn("i", F.row_number().over(w))
        return (
            ranked.groupBy("c_nationkey")
            .agg(
                F.count("*").cast("long").alias("n_customers"),
                F.sum("cents").cast("long").alias("total_cents"),
                F.sum(F.col("i") * F.col("cents")).alias("__six"),
            )
            .select(
                "c_nationkey",
                "n_customers",
                "total_cents",
                (
                    (
                        2 * F.col("__six")
                        - (F.col("n_customers") + 1) * F.col("total_cents")
                    ).cast("double")
                    / (F.col("n_customers") * F.col("total_cents")).cast(
                        "double"
                    )
                ).alias("gini"),
            )
        )


_register_calibration()
