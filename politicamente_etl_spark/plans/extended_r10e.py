"""Round-5 prep batch E: one-row graph profile, normalization dedup
gain, customer decile-migration matrix, Lorenz decile shares, and a
Poisson overdispersion test on daily event counts.

Registers beyond the round-5 driver window; parity-checked locally and
rotated into later windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000


def _register():
    from politicamente_etl_spark.plans.catalog import T, register
    from politicamente_etl_spark.plans.extended_r10 import _copurchase_edges

    # -- graph one-row profile ------------------------------------------------

    @register(
        "graph_summary_stats",
        sql="""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), e0 AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ), nodes AS (
            SELECT pa AS v FROM e0 UNION SELECT pb FROM e0
        ), n AS (
            SELECT COUNT(*) AS n_nodes FROM nodes
        ), m AS (
            SELECT COUNT(*) AS n_edges FROM e0
        )
        SELECT CAST(n.n_nodes AS BIGINT) AS n_nodes,
               CAST(m.n_edges AS BIGINT) AS n_edges,
               CAST(2 * m.n_edges * 1000000
                    // (n.n_nodes * (n.n_nodes - 1)) AS BIGINT)
                   AS density_ppm,
               CAST(2 * m.n_edges * 1000 // n.n_nodes AS BIGINT)
                   AS avg_degree_milli
        FROM n CROSS JOIN m
        """,
        tags=("ext-graph", "ext-profile"),
    )
    def q_graph_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """One-row profile of the co-purchase graph: node/edge counts,
        density 2m/(n(n−1)) ppm, mean degree in milli — the first
        number any graph pipeline logs per ingest (density drift means
        the support threshold or the upstream join changed). Two
        bounded aggregates over the shared edge builder.

        Scale shape: the edge aggregate is the data pass; everything
        after is two 1-row broadcasts."""
        e0, _ = _copurchase_edges(spark, sf_dir)
        nodes = (
            e0.select(F.col("pa").alias("v"))
            .unionByName(e0.select(F.col("pb").alias("v")))
            .distinct()
        )
        n = nodes.agg(F.count("*").alias("n_nodes"))
        m = e0.agg(F.count("*").alias("n_edges"))
        return (
            n.join(F.broadcast(m))
            .select(
                F.col("n_nodes").cast("long").alias("n_nodes"),
                F.col("n_edges").cast("long").alias("n_edges"),
                F.expr(
                    "2 * n_edges * 1000000 DIV (n_nodes * (n_nodes - 1))"
                )
                .cast("long")
                .alias("density_ppm"),
                F.expr("2 * n_edges * 1000 DIV n_nodes")
                .cast("long")
                .alias("avg_degree_milli"),
            )
        )

    # -- dedup: normalization gain --------------------------------------------

    @register(
        "normalized_dedup_gain",
        sql="""
        WITH raw AS (
            SELECT COUNT(*) AS n_docs,
                   COUNT(DISTINCT md5(text)) AS uniq_raw
            FROM documents
        ), norm AS (
            SELECT COUNT(DISTINCT md5(trim(regexp_replace(lower(text),
                        ' +', ' ', 'g')))) AS uniq_norm
            FROM documents
        )
        SELECT CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_docs - uniq_raw AS BIGINT) AS dups_raw,
               CAST(n_docs - uniq_norm AS BIGINT) AS dups_normalized,
               CAST(uniq_raw - uniq_norm AS BIGINT) AS gain_docs,
               CAST((uniq_raw - uniq_norm) * 1000000 // n_docs AS BIGINT)
                   AS gain_ppm
        FROM raw CROSS JOIN norm
        """,
        tags=("ext-dedup", "ext-text"),
    )
    def q_normalized_dedup_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
        """How many EXTRA duplicates does text normalization expose?
        Exact-dup counts on raw md5 vs normalized md5 (lowercase,
        whitespace-collapsed, trimmed) — the measurement that justifies
        (or kills) adding a normalize pass before exact dedup at scale:
        gain_ppm is the marginal yield per corpus pass. Digests only —
        text never shuffles.

        Scale shape: two distinct-counts over md5 digests; at 100 TB
        each is one hash-partitioned distinct, and the two passes fuse
        into the same scan."""
        docs = T(spark, sf_dir, "documents").select("text")
        raw = docs.agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("uniq_raw"),
        )
        norm = docs.agg(
            F.countDistinct(
                F.md5(
                    F.trim(
                        F.regexp_replace(F.lower(F.col("text")), " +", " ")
                    )
                )
            ).alias("uniq_norm")
        )
        return raw.join(F.broadcast(norm)).select(
            F.col("n_docs").cast("long").alias("n_docs"),
            (F.col("n_docs") - F.col("uniq_raw")).cast("long").alias(
                "dups_raw"
            ),
            (F.col("n_docs") - F.col("uniq_norm")).cast("long").alias(
                "dups_normalized"
            ),
            (F.col("uniq_raw") - F.col("uniq_norm")).cast("long").alias(
                "gain_docs"
            ),
            F.expr("(uniq_raw - uniq_norm) * 1000000 DIV n_docs")
            .cast("long")
            .alias("gain_ppm"),
        )

    # -- BI: decile migration matrix -------------------------------------------

    @register(
        "decile_migration_matrix",
        sql="""
        WITH mid AS (
            SELECT CAST(floor(quantile_cont(date_diff('day',
                        DATE '1970-01-01', CAST(o_orderdate AS DATE)), 0.5))
                        AS BIGINT) AS mid_day
            FROM orders
        ), half AS (
            SELECT o_custkey,
                   CASE WHEN date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) < mid.mid_day
                        THEN 0 ELSE 1 END AS h,
                   CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)
                       AS cents
            FROM orders CROSS JOIN mid
        ), spend AS (
            SELECT o_custkey, h, SUM(cents) AS cents
            FROM half GROUP BY 1, 2
        ), ranked AS (
            SELECT o_custkey, h,
                   (ROW_NUMBER() OVER (PARTITION BY h
                        ORDER BY cents, o_custkey) - 1) * 10
                   // COUNT(*) OVER (PARTITION BY h) AS decile
            FROM spend
        )
        SELECT a.decile AS decile_h1, b.decile AS decile_h2,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM ranked a JOIN ranked b
          ON a.o_custkey = b.o_custkey AND a.h = 0 AND b.h = 1
        GROUP BY 1, 2
        """,
        tags=("ext-olap", "ext-rel"),
    )
    def q_decile_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Customer spend-decile migration between the first and second
        half of the order history (split at the median order
        timestamp): the 10×10 transition matrix behind every
        churn/upsell deck. Deciles assign by exact rank
        (rn−1)·10 // n with custkey tie-break — integer, no ntile
        boundary ambiguity between engines; only customers active in
        BOTH halves migrate.

        Scale shape: one per-(half, customer) aggregate, one rank
        window per half (shuffle keyed by half), a self-equi-join on
        custkey, bounded ≤100-row output."""
        o = T(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderdate", "o_totalprice"
        )
        mid = o.agg(
            F.floor(
                F.expr("percentile(unix_date(to_date(o_orderdate)), 0.5)")
            )
            .cast("long")
            .alias("mid_day")
        )
        half = o.join(F.broadcast(mid)).select(
            "o_custkey",
            F.when(
                F.unix_date(F.to_date("o_orderdate")) < F.col("mid_day"), 0
            )
            .otherwise(1)
            .alias("h"),
            (F.col("o_totalprice").cast("decimal(27,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        spend = half.groupBy("o_custkey", "h").agg(
            F.sum("cents").alias("cents")
        )
        ranked = spend.select(
            "o_custkey",
            "h",
            F.expr(
                "(row_number() OVER (PARTITION BY h ORDER BY cents,"
                " o_custkey) - 1) * 10 DIV count(*) OVER (PARTITION BY h)"
            ).alias("decile"),
        )
        a = ranked.filter(F.col("h") == 0).select(
            "o_custkey", F.col("decile").alias("decile_h1")
        )
        b = ranked.filter(F.col("h") == 1).select(
            "o_custkey", F.col("decile").alias("decile_h2")
        )
        return (
            a.join(b, "o_custkey")
            .groupBy("decile_h1", "decile_h2")
            .agg(F.count("*").cast("long").alias("n_customers"))
        )

    # -- inequality: Lorenz decile shares --------------------------------------

    @register(
        "lorenz_decile_shares",
        sql="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), ranked AS (
            SELECT cents,
                   (ROW_NUMBER() OVER (ORDER BY cents, o_custkey) - 1) * 10
                   // COUNT(*) OVER () AS decile
            FROM spend
        ), tot AS (
            SELECT SUM(cents) AS total FROM spend
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS cents,
               CAST(SUM(cents) * 1000000 // tot.total AS BIGINT)
                   AS share_ppm
        FROM ranked CROSS JOIN tot
        GROUP BY decile, tot.total
        """,
        tags=("ext-stats", "ext-olap"),
    )
    def q_lorenz_decile_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Lorenz curve at decile grain: customers sorted by spend, each
        decile's share of total revenue in ppm — the concentration
        curve underlying the catalog's Gini and MLD scalars ('the top
        decile carries X% of revenue'). Exact rank deciles with custkey
        tie-break; shares integer ppm.

        Scale shape: one customer aggregate, one global rank window
        (the documented exact-decile sort, same as
        customer_value_deciles — swap to the approx sketch twin past
        ~1e8 customers), bounded 10-row output."""
        o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        spend = o.groupBy("o_custkey").agg(
            (F.sum(F.col("o_totalprice").cast("decimal(27,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        ranked = spend.select(
            "cents",
            F.expr(
                "(row_number() OVER (ORDER BY cents, o_custkey) - 1) * 10"
                " DIV count(*) OVER ()"
            ).alias("decile"),
        )
        tot = spend.agg(F.sum("cents").alias("total"))
        return (
            ranked.join(F.broadcast(tot))
            .groupBy("decile", "total")
            .agg(
                F.count("*").cast("long").alias("n_customers"),
                F.sum("cents").cast("long").alias("cents"),
            )
            .select(
                F.col("decile").cast("long").alias("decile"),
                "n_customers",
                "cents",
                F.expr("cents * 1000000 DIV total").cast("long").alias(
                    "share_ppm"
                ),
            )
        )

    # -- events: Poisson overdispersion ----------------------------------------

    @register(
        "poisson_dispersion_daily_events",
        sql="""
        WITH d AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS day,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS BIGINT)
                   AS var_num,
               CAST((COUNT(*) * SUM(c * c) - SUM(c) * SUM(c)) * 1000000
                    // (SUM(c) * (COUNT(*) - 1)) AS BIGINT)
                   AS dispersion_ppm
        FROM d GROUP BY event_type
        """,
        tags=("ext-events", "ext-stats"),
    )
    def q_poisson_dispersion_daily_events(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Index of dispersion (variance/mean) of DAILY event counts per
        type, in ppm: 1e6 = Poisson arrivals; above = bursty/clustered
        traffic, below = rate-limited — the arrivals sanity check
        before any rate-based alerting. Variance enters as its exact
        integer numerator n·Σc² − (Σc)²; the single division is the
        final integer ppm (dispersion = var_num / (n·(n−1)) ÷ (Σc/n) =
        var_num / (Σc·(n−1))).

        Scale shape: one (type, day) count, one per-type rollup over
        the bounded calendar domain."""
        ev = T(spark, sf_dir, "events").select("event_type", "ts")
        d = ev.groupBy(
            "event_type", F.unix_date(F.to_date("ts")).alias("day")
        ).agg(F.count("*").alias("c"))
        return d.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("c").cast("long").alias("n_events"),
            (
                F.count("*") * F.sum(F.col("c") * F.col("c"))
                - F.sum("c") * F.sum("c")
            )
            .cast("long")
            .alias("var_num"),
            F.expr(
                "(count(*) * sum(c * c) - sum(c) * sum(c)) * 1000000"
                " DIV (sum(c) * (count(*) - 1))"
            )
            .cast("long")
            .alias("dispersion_ppm"),
        )


_register()
