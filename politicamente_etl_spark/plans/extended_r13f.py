"""Round-8 batch F: time-weighted averaging (TWAP), quantile-forecast
evaluation (pinball loss), and decision-tree split scoring (Gini gain)
— three more aggregate-only primitives with exact-integer cores."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    @register(
        "twap_daily_value",
        sql="""
        WITH e AS (
            SELECT event_type,
                   -- floor, not CAST: epoch() is DOUBLE with fractional
                   -- seconds and DuckDB's double->int cast ROUNDS while
                   -- Spark's unix_timestamp FLOORS (off-by-one found on
                   -- first parity run)
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                   CAST(floor("value" * 1000) AS BIGINT) AS milli,
                   event_id
            FROM events
        ), w AS (
            SELECT event_type, day, milli,
                   lead(sec) OVER (PARTITION BY event_type, day
                        ORDER BY sec, event_id) - sec AS dur
            FROM e
        )
        SELECT event_type, day,
               CAST(COUNT(dur) AS BIGINT) AS n_intervals,
               CAST(SUM(dur) AS BIGINT) AS total_sec,
               CAST(SUM(milli * dur) AS BIGINT) AS weighted_milli_sec,
               -- one double division (not integer //: DuckDB floors,
               -- Spark DIV truncates — they diverge on negative sums)
               CAST(SUM(milli * dur) AS DOUBLE)
                   / CAST(SUM(dur) AS DOUBLE) AS twap_milli
        FROM w
        WHERE dur IS NOT NULL
        GROUP BY event_type, day
        HAVING SUM(dur) > 0
        """,
        tags=("ext-events", "ext-stats"),
    )
    def q_twap_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Time-weighted average value per (event type, day) — TWAP, the
        irregular-sampling mean every metrics/pricing pipeline needs
        (an arithmetic mean over irregular events overweights bursts;
        weighting each reading by how long it was CURRENT fixes that).
        Each reading's weight is the gap to the next event in its
        day-partition (lead window with (ts, id) tiebreak; the day's
        last reading carries no forward interval and drops on both
        engines). Integer core: epoch seconds × milli-snapped values,
        floor-div for the final TWAP — no float ever aggregates. The
        window partitions by (type, day): parallel partitioned sorts,
        bounded state, the at-scale shape."""
        e = load_events(spark, sf_dir).select(
            "event_type",
            F.unix_timestamp("ts").cast("long").alias("sec"),
            (F.unix_timestamp("ts").cast("long") / 86400)
            .cast("long")
            .alias("day"),
            F.floor(F.col("value") * 1000).cast("long").alias("milli"),
            "event_id",
        )
        w = Window.partitionBy("event_type", "day").orderBy(
            "sec", "event_id"
        )
        dur = (F.lead("sec").over(w) - F.col("sec")).alias("dur")
        x = e.select("event_type", "day", "milli", dur).filter(
            F.col("dur").isNotNull()
        )
        return (
            x.groupBy("event_type", "day")
            .agg(
                F.count("dur").cast("long").alias("n_intervals"),
                F.sum("dur").cast("long").alias("total_sec"),
                F.sum(F.col("milli") * F.col("dur"))
                .cast("long")
                .alias("weighted_milli_sec"),
                (
                    F.sum(F.col("milli") * F.col("dur")).cast("double")
                    / F.sum("dur").cast("double")
                ).alias("twap_milli"),
            )
            .filter(F.col("total_sec") > 0)
        )

    @register(
        "pinball_loss_eval",
        sql="""
        WITH x AS (
            SELECT c_mktsegment AS seg, o_orderkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), train AS (
            SELECT seg, cents FROM x WHERE o_orderkey % 2 = 0
        ), pred AS (
            SELECT seg, cents AS yhat
            FROM (
                SELECT seg, cents,
                       row_number() OVER (PARTITION BY seg
                            ORDER BY cents) AS rn,
                       COUNT(*) OVER (PARTITION BY seg) AS n
                FROM train
            ) WHERE rn = (9 * n + 9) // 10
        ), test AS (
            SELECT seg, cents FROM x WHERE o_orderkey % 2 = 1
        )
        SELECT t.seg,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(MAX(p.yhat) AS BIGINT) AS predictor_cents,
               CAST(SUM(CASE WHEN t.cents >= p.yhat
                             THEN 9 * (t.cents - p.yhat)
                             ELSE (p.yhat - t.cents) END) AS BIGINT)
                   AS pinball_x10_sum
        FROM test t JOIN pred p USING (seg)
        GROUP BY t.seg
        """,
        tags=("ext-stats", "ext-eval"),
    )
    def q_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Pinball (quantile) loss at q=0.9 — THE proper scoring rule
        for quantile forecasts (SLO latency targets, demand upper
        bounds): under-prediction of a 0.9-quantile costs 9× what
        over-prediction does, which is exactly what makes the true
        quantile the loss minimizer. Train/test split by key parity
        (even keys fit the per-segment 0.9 empirical quantile via
        deterministic rank — no quantile interpolation ambiguity), odd
        keys evaluate. Loss stays ×10-scaled integer cents end-to-end;
        the 5-row predictor table broadcasts back onto the test scan."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        x = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            F.col("c_mktsegment").alias("seg"),
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        train = x.filter(F.col("o_orderkey") % 2 == 0)
        wq = Window.partitionBy("seg").orderBy("cents")
        pred = (
            train.withColumn("rn", F.row_number().over(wq))
            .withColumn("n", F.count("*").over(Window.partitionBy("seg")))
            .filter(F.col("rn") == F.expr("(9 * n + 9) DIV 10"))
            .select("seg", F.col("cents").alias("yhat"))
        )
        test = x.filter(F.col("o_orderkey") % 2 == 1)
        j = test.join(F.broadcast(pred), "seg")
        loss = F.when(
            F.col("cents") >= F.col("yhat"),
            9 * (F.col("cents") - F.col("yhat")),
        ).otherwise(F.col("yhat") - F.col("cents"))
        return j.groupBy("seg").agg(
            F.count("*").cast("long").alias("n_test"),
            F.max("yhat").cast("long").alias("predictor_cents"),
            F.sum(loss).cast("long").alias("pinball_x10_sum"),
        )

    @register(
        "split_gain_candidates",
        sql="""
        WITH x AS (
            SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos
            FROM x
        ), cand AS (
            SELECT unnest([2000000, 5000000, 10000000,
                           15000000, 25000000]) AS thr
        ), split AS (
            SELECT thr,
                   CAST(SUM(CASE WHEN cents < thr THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_l,
                   CAST(SUM(CASE WHEN cents < thr THEN y ELSE 0 END)
                        AS BIGINT) AS pos_l
            FROM x CROSS JOIN cand
            GROUP BY thr
        )
        SELECT thr, n_l, pos_l,
               n - n_l AS n_r, pos - pos_l AS pos_r,
               (2.0 * CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
                    * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)))
               - CAST(n_l AS DOUBLE) / CAST(n AS DOUBLE)
                 * (2.0 * CAST(pos_l AS DOUBLE) / CAST(n_l AS DOUBLE)
                    * (1.0 - CAST(pos_l AS DOUBLE) / CAST(n_l AS DOUBLE)))
               - CAST(n - n_l AS DOUBLE) / CAST(n AS DOUBLE)
                 * (2.0 * CAST(pos - pos_l AS DOUBLE)
                        / CAST(n - n_l AS DOUBLE)
                    * (1.0 - CAST(pos - pos_l AS DOUBLE)
                           / CAST(n - n_l AS DOUBLE)))
                   AS gini_gain
        FROM split, tot
        """,
        tags=("ext-stats", "ext-ml"),
    )
    def q_split_gain_candidates(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Decision-tree split scoring: Gini impurity decrease of
        "cents < threshold" for five candidate thresholds against the
        order-status label — the inner loop of distributed tree
        learning (XGBoost/LightGBM histogram builders compute exactly
        these per-bin class counts). One pass over the facts computes
        every candidate's (n_left, pos_left) via conditional sums (the
        5-row candidate table is a broadcast cross join — each row
        scores all candidates map-side); the gain arithmetic is a
        fixed per-row IEEE sequence from exact counts, no cross-row
        float sums. Binary Gini 2p(1-p) throughout."""
        x = T(spark, sf_dir, "orders").select(
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            (F.col("o_orderstatus") == "F").cast("long").alias("y"),
        )
        cand = spark.createDataFrame(
            [(t,) for t in (2000000, 5000000, 10000000, 15000000, 25000000)],
            "thr long",
        )
        split = (
            x.crossJoin(F.broadcast(cand))
            .groupBy("thr")
            .agg(
                F.sum((F.col("cents") < F.col("thr")).cast("long"))
                .cast("long")
                .alias("n_l"),
                F.sum(
                    F.when(F.col("cents") < F.col("thr"), F.col("y"))
                    .otherwise(F.lit(0))
                )
                .cast("long")
                .alias("pos_l"),
            )
        )
        tot = x.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        j = split.crossJoin(F.broadcast(tot))

        def gini(p_num, p_den):
            p = p_num.cast("double") / p_den.cast("double")
            return 2.0 * p * (1.0 - p)

        n, pos = F.col("n"), F.col("pos")
        n_l, pos_l = F.col("n_l"), F.col("pos_l")
        n_r, pos_r = n - n_l, pos - pos_l
        gain = (
            gini(pos, n)
            - n_l.cast("double") / n.cast("double") * gini(pos_l, n_l)
            - n_r.cast("double") / n.cast("double") * gini(pos_r, n_r)
        )
        return j.select(
            "thr",
            "n_l",
            "pos_l",
            n_r.cast("long").alias("n_r"),
            pos_r.cast("long").alias("pos_r"),
            gain.alias("gini_gain"),
        )


_register()
