"""Round-5 prep batch D: the streaming twin of the TTL alert rule
(batch-equivalence proof), data-governance audits (functional
dependencies, referential integrity), IVF cell-balance reporting (the
hot-partition early warning for ANN layouts), revenue-recognition
scheduling (even monthly spread with integer remainders), and the
Horvitz-Thompson estimator over the deterministic PPS sample.

Registers beyond the round-5 driver window; parity-checked locally and
rotated into later windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000


def _register():
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    # -- streaming twin of the TTL alert rule --------------------------------

    @register(
        "streaming_alert_ttl",
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
        bench=True,  # r6 headline: the stateful-streaming layer
        # (applyInPandasWithState TTL state) the bench couldn't see
        tags=("ext-stream", "ext-events"),
    )
    def q_streaming_alert_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The TTL alert rule THROUGH the streaming engine: per-user
        keyed state (one timestamp — the last qualifying event) via
        applyInPandasWithState over event-time-ordered micro-batches,
        then a batch-side event_type rollup of the event-grain
        emissions. The oracle is the BATCH window query
        (alert_ttl_suppression's SQL verbatim), so a green row IS the
        batch-equivalence proof: state hand-off across micro-batch
        boundaries reproduces lag() over the full ordered stream."""
        from politicamente_etl_spark.streaming import windows as W

        # Stage only qualifying events (r9 opt, guide §2.3): the stateful
        # op re-applies value >= 100 before its state fold, so rows below
        # threshold never reach state either way — staging them only cost
        # write+read+stream bytes (86.6% of events at bench SF). Emission
        # set, and hence the rollup, is bit-identical (parity re-proven).
        fired = W.run_stream_to_table(
            W.stateful_alert_ttl(
                W.stream_events_time_halves(
                    spark, sf_dir, predicate=F.col("value") >= 100.0
                )
            ),
            mode="append",
        )
        ev = load_events(spark, sf_dir).select("event_id", "event_type")
        j = fired.join(ev, "event_id")
        return j.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n_alerts"),
            F.sum("fired").cast("long").alias("n_fired"),
            F.sum(1 - F.col("fired")).cast("long").alias("n_suppressed"),
            F.sum(F.col("fired") * F.col("event_id"))
            .cast("long")
            .alias("fired_checksum"),
        )

    # -- governance: functional-dependency audit -----------------------------

    @register(
        "functional_dependency_audit",
        sql="""
        WITH fd1 AS (
            SELECT source AS det, COUNT(DISTINCT lang) AS k
            FROM documents GROUP BY source
        ), fd2 AS (
            SELECT o_custkey AS det, COUNT(DISTINCT o_orderpriority) AS k
            FROM orders GROUP BY o_custkey
        )
        SELECT 'documents.source->lang' AS fd,
               CAST(COUNT(*) AS BIGINT) AS n_determinants,
               CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS violation_ppm,
               CAST(MAX(k) AS BIGINT) AS max_distinct
        FROM fd1
        UNION ALL
        SELECT 'orders.custkey->priority',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT),
               CAST(MAX(k) AS BIGINT)
        FROM fd2
        """,
        tags=("ext-quality", "ext-profile"),
    )
    def q_functional_dependency_audit(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Functional-dependency audit: does determinant → dependent
        hold? Reports, per candidate FD, how many determinant values map
        to >1 dependent (the violating keys a schema-inference or
        normalization pass needs before promoting a column to a dim
        table). One COUNT DISTINCT aggregate per FD — the exact shape a
        profiler runs over every column pair, here pinned to two
        representative FDs.

        Scale shape: per-FD one (det) aggregate with a distinct-count —
        narrow shuffle on the determinant; output is FD-count bounded."""

        def audit(df: DataFrame, det: str, dep: str, name: str) -> DataFrame:
            g = df.groupBy(F.col(det).alias("det")).agg(
                F.countDistinct(dep).alias("k")
            )
            viol = F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            return g.agg(
                F.lit(name).alias("fd"),
                F.count("*").cast("long").alias("n_determinants"),
                viol.cast("long").alias("n_violating"),
                F.expr(
                    "sum(case when k > 1 then 1 else 0 end) * 1000000"
                    " DIV count(*)"
                )
                .cast("long")
                .alias("violation_ppm"),
                F.max("k").cast("long").alias("max_distinct"),
            )

        docs = T(spark, sf_dir, "documents").select("source", "lang")
        o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
        return audit(
            docs, "source", "lang", "documents.source->lang"
        ).unionByName(
            audit(o, "o_custkey", "o_orderpriority", "orders.custkey->priority")
        )

    # -- governance: referential integrity ------------------------------------

    @register(
        "ri_orphan_report",
        sql="""
        SELECT 'lineitem.orderkey->orders' AS fk,
               CAST(COUNT(*) AS BIGINT) AS n_child_keys,
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'orders.custkey->customer',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM (SELECT DISTINCT o_custkey FROM orders) o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'events.user_id->customer',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM (SELECT DISTINCT user_id FROM events) e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        """,
        tags=("ext-quality", "ext-profile"),
    )
    def q_ri_orphan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Referential-integrity audit: distinct child keys with no
        parent row, per FK edge — the load-order / partial-ingest
        detector every warehouse runs after a backfill (an orphan count
        that moves between runs means a dangling partition). Child keys
        deduplicate BEFORE the join, so each probe is
        distinct-key-sized, and dimension parents broadcast.

        Scale shape: per FK one distinct + one broadcast-able left
        join; bounded 3-row output."""

        def probe(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, name: str):
            ck = child.select(F.col(ckey).alias("k")).distinct()
            pk = parent.select(F.col(pkey).alias("k")).distinct()
            j = ck.join(pk.withColumn("__hit", F.lit(1)), "k", "left")
            return j.agg(
                F.lit(name).alias("fk"),
                F.count("*").cast("long").alias("n_child_keys"),
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )

        li = T(spark, sf_dir, "lineitem").select("l_orderkey")
        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        c = T(spark, sf_dir, "customer").select("c_custkey")
        ev = T(spark, sf_dir, "events").select("user_id")
        return (
            probe(li, "l_orderkey", o, "o_orderkey", "lineitem.orderkey->orders")
            .unionByName(
                probe(o, "o_custkey", c, "c_custkey", "orders.custkey->customer")
            )
            .unionByName(
                probe(ev, "user_id", c, "c_custkey", "events.user_id->customer")
            )
        )

    # -- ANN: IVF cell balance ------------------------------------------------

    @register(
        "ivf_cell_balance_report",
        sql="""
        WITH cent AS (
            SELECT vec_id AS cell,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS centroid
            FROM embeddings WHERE vec_id % 125 = 0
        ), ass AS (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                       list_reduce(list_transform(
                           list_zip(e.embedding, c.centroid),
                           s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))
                                * (CAST(s[1] AS DOUBLE)
                                   - CAST(s[2] AS DOUBLE))),
                           (acc, v) -> acc + v),
                       c.cell) AS rn
            FROM embeddings e CROSS JOIN cent c
        ), assigned AS (
            SELECT vec_id, cell FROM ass WHERE rn = 1
        ), sizes AS (
            SELECT cell, COUNT(*) AS n_vecs FROM assigned GROUP BY cell
        ), tot AS (
            SELECT SUM(n_vecs) AS n, COUNT(*) AS k FROM sizes
        )
        SELECT s.cell, CAST(s.n_vecs AS BIGINT) AS n_vecs,
               CAST(s.n_vecs * 1000000 // t.n AS BIGINT) AS share_ppm,
               CAST(s.n_vecs * t.k * 1000000 // t.n AS BIGINT)
                   AS load_factor_ppm
        FROM sizes s CROSS JOIN tot t
        """,
        tags=("ext-sim", "ext-profile"),
    )
    def q_ivf_cell_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """IVF cell-balance report over the same deterministic
        hash-sample quantizer the catalog's IVF queries use: per cell,
        its vector count, corpus share, and load factor (share × cells,
        1e6 = perfectly balanced). THE health metric for a
        cell-partitioned ANN layout at scale — a cell with load factor
        10× becomes the straggler partition and the n_probe latency
        tail; this report is what triggers re-training the quantizer.

        Scale shape: assignment is the broadcast argmin aggregate
        (assign_cells); sizes/totals are cell-count bounded."""
        from politicamente_etl_spark.operators import sim

        emb = T(spark, sf_dir, "embeddings")
        cent = (
            emb.filter(F.col("vec_id") % 125 == 0)
            .select(
                F.col("vec_id").alias("cell"),
                F.col("embedding").cast("array<double>").alias("centroid"),
            )
        )
        assigned = sim.assign_cells(emb, cent, "vec_id", "embedding")
        sizes = assigned.groupBy("cell").agg(F.count("*").alias("n_vecs"))
        tot = sizes.agg(
            F.sum("n_vecs").alias("n"), F.count("*").alias("k")
        )
        return sizes.join(F.broadcast(tot)).select(
            "cell",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.expr("n_vecs * 1000000 DIV n").cast("long").alias("share_ppm"),
            F.expr("n_vecs * k * 1000000 DIV n")
            .cast("long")
            .alias("load_factor_ppm"),
        )

    # -- finance: revenue recognition schedule --------------------------------

    @register(
        "revenue_recognition_schedule",
        sql="""
        WITH iv AS (
            SELECT o.o_orderkey,
                   CAST(CAST(o.o_totalprice AS DECIMAL(27,2)) * 100
                        AS BIGINT) AS cents,
                   year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                       AS m0,
                   greatest(MAX(year(l.l_shipdate) * 12
                                + month(l.l_shipdate) - 1),
                            year(o.o_orderdate) * 12
                            + month(o.o_orderdate) - 1) AS m1
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2, 3
        ), spread AS (
            SELECT o_orderkey, cents, m0 + i AS m, m1 - m0 + 1 AS n,
                   CASE WHEN i = 0 THEN cents // (m1 - m0 + 1)
                             + cents % (m1 - m0 + 1)
                        ELSE cents // (m1 - m0 + 1) END AS rec
            FROM iv, unnest(generate_series(0, m1 - m0)) AS t(i)
        )
        SELECT CAST(m AS BIGINT) AS month_idx,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(rec) AS BIGINT) AS recognized_cents
        FROM spread GROUP BY m
        """,
        tags=("ext-temporal", "ext-olap"),
    )
    def q_revenue_recognition_schedule(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Revenue recognition: each order's price spreads EVENLY over
        the months from order to last shipment (deferred-revenue
        accounting), with the integer floor remainder recognized in the
        first month so every order's schedule sums exactly to its price
        — cents never appear or vanish. Months are epoch-month integers
        (y·12+m−1, locale-free).

        Scale shape: one orders⋈lineitem aggregate, then a bounded
        explode (months per order ≤ calendar span) and a month-grain
        rollup."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderdate"
        )
        li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
        iv = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy(
                "o_orderkey",
                (F.col("o_totalprice").cast("decimal(27,2)") * 100)
                .cast("long")
                .alias("cents"),
                (
                    F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
                ).alias("m0"),
            )
            .agg(
                F.max(
                    F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1
                ).alias("m1_raw")
            )
            # clamp: a ship month before the order month (possible in
            # the synthetic data) recognizes everything in month m0
            .withColumn("m1", F.greatest("m1_raw", "m0"))
        )
        spread = iv.select(
            "o_orderkey",
            "cents",
            F.explode(F.sequence(F.lit(0), F.col("m1") - F.col("m0"))).alias(
                "i"
            ),
            (F.col("m1") - F.col("m0") + 1).alias("n"),
            "m0",
        ).select(
            (F.col("m0") + F.col("i")).alias("m"),
            F.when(
                F.col("i") == 0,
                F.expr("cents DIV n + pmod(cents, n)"),
            )
            .otherwise(F.expr("cents DIV n"))
            .alias("rec"),
        )
        return spread.groupBy(F.col("m").alias("month_idx")).agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("rec").cast("long").alias("recognized_cents"),
        )

    # -- sampling: Horvitz-Thompson estimate over the PPS sample -------------

    @register(
        "pps_horvitz_thompson",
        sql="""
        WITH o AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)
                       AS cents,
                   CAST(('0x' || substring(md5(concat_ws(':', 'pps-v1',
                        CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)
                       % 1000000 AS u_ppm
            FROM orders
        ), tot AS (
            SELECT SUM(cents) AS total_cents, COUNT(*) AS n FROM o
        ), kept AS (
            SELECT o.cents,
                   CASE WHEN CAST(1000 AS HUGEINT) * o.cents
                             >= tot.total_cents THEN o.cents
                        ELSE tot.total_cents // 1000 END AS ht_term
            FROM o CROSS JOIN tot
            WHERE CAST(o.u_ppm AS HUGEINT) * tot.total_cents
                  < CAST(1000 AS HUGEINT) * o.cents * 1000000
        )
        SELECT CAST(t.total_cents AS BIGINT) AS true_total_cents,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(k.ht_term) AS BIGINT) AS ht_total_cents,
               CAST(abs(SUM(k.ht_term) - t.total_cents) * 1000000
                    // t.total_cents AS BIGINT) AS err_ppm
        FROM kept k CROSS JOIN tot t
        GROUP BY t.total_cents
        """,
        tags=("ext-sampling", "ext-stats"),
    )
    def q_pps_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Horvitz-Thompson total estimator over the deterministic PPS
        sample: each sampled row contributes value/π (π = min(1,
        T·cents/total) — so a non-certainty row's term collapses to
        total/T exactly, and certainty rows contribute themselves).
        Demonstrates the estimator the PPS sample exists FOR: an
        unbiased total from ~1000 rows instead of the full table, with
        the realized error reported in ppm. Same md5 draw as
        pps_systematic_sample — re-running reproduces the estimate
        bit-for-bit.

        Scale shape: one scan + 1-row broadcast total + bounded rollup;
        the estimator never shuffles the fact table."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(27,2)") * 100)
            .cast("long")
            .alias("cents"),
        ).withColumn(
            "u_ppm",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit("pps-v1"),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % MICRO,
        )
        tot = o.agg(
            F.sum("cents").alias("total_cents"), F.count("*").alias("n")
        )
        kept = (
            o.join(F.broadcast(tot))
            .filter(
                F.col("u_ppm").cast("decimal(38,0)") * F.col("total_cents")
                < F.lit(1000).cast("decimal(38,0)") * F.col("cents") * MICRO
            )
            .select(
                "total_cents",
                F.when(
                    F.lit(1000).cast("decimal(38,0)") * F.col("cents")
                    >= F.col("total_cents"),
                    F.col("cents"),
                )
                .otherwise(F.expr("total_cents DIV 1000"))
                .alias("ht_term"),
            )
        )
        return kept.groupBy("total_cents").agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum("ht_term").cast("long").alias("ht_total_cents"),
            F.expr(
                "abs(sum(ht_term) - total_cents) * 1000000 DIV total_cents"
            )
            .cast("long")
            .alias("err_ppm"),
        ).select(
            F.col("total_cents").cast("long").alias("true_total_cents"),
            "n_sampled",
            "ht_total_cents",
            "err_ppm",
        )


_register()
