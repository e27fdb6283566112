"""Round-5 prep batch A: graph community structure (label propagation,
local clustering coefficients), market concentration (HHI), inequality
decomposition (mean log deviation / Theil L), sequential drift detection (Page-Hinkley),
temporal interval algebra (Allen relations), DP pre-processing
(contribution bounding), mixture allocation (UniMax capped
waterfilling), and survival analysis (Kaplan-Meier over order gaps).

These register beyond the round-5 driver window; they are parity-checked
locally this round and rotate into later windows. Same engine-parity
rules as the earlier extended modules: integer ppm/micro-nat snapping at
birth, picked-not-computed floats, epoch-day integers, deterministic
tie-breaks, sign-safe integer division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MICRO = 1_000_000

# Shared co-purchase edge SQL (same graph as extended_r5's triangle /
# community queries): part pairs bought together in >= 2 orders,
# undirected (both directions) for neighborhood queries.
_EDGE_SQL = """
        li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), e0 AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ), e AS (
            SELECT pa AS src, pb AS dst FROM e0
            UNION ALL SELECT pb AS src, pa AS dst FROM e0
        )
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str):
    """(e0 ordered pairs, e undirected) co-purchase edges, support >= 2.

    r9 opt: edge construction now runs through the one-shuffle
    cooccurrence_pairs builder (see operators/graph.py) instead of the
    distinct → self-equi-join → groupBy chain; the support-2 edge set is
    identical."""
    from politicamente_etl_spark.operators.graph import cooccurrence_pairs
    from politicamente_etl_spark.plans.catalog import T

    e0 = (
        cooccurrence_pairs(
            T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            "l_orderkey",
            "l_partkey",
        )
        .filter(F.col("cnt") >= 2)
        .select("pa", "pb")
    )
    e = e0.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(e0.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    return e0, e


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    # -- graph: label propagation -------------------------------------------

    _LPA_ROUND = """
        l{n} AS (
            SELECT src AS node, label FROM (
                SELECT e.src, l.label,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.src
                           ORDER BY COUNT(*) DESC, l.label) AS rn
                FROM e JOIN l{p} l ON e.dst = l.node
                GROUP BY e.src, l.label
            ) WHERE rn = 1
        )"""

    @register(
        "lpa_communities",
        sql="WITH "
        + _EDGE_SQL
        + """, l0 AS (
            SELECT DISTINCT src AS node, src AS label FROM e
        ), """
        + ",".join(_LPA_ROUND.format(n=i, p=i - 1) for i in (1, 2, 3))
        + """
        SELECT label AS community,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(node) AS BIGINT) AS node_checksum
        FROM l3 GROUP BY label
        ORDER BY n_nodes DESC, community
        LIMIT 20
        """,
        tags=("ext-graph",),
    )
    def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Label propagation communities on the co-purchase graph: 3
        SYNCHRONOUS rounds, each node adopting its neighbors' most
        frequent label (ties -> smallest label — the determinism LPA
        normally lacks). Complements the connected-components query
        (copurchase_communities): LPA splits dense components into
        communities instead of merging everything reachable.

        Scale shape: each round is one edge⋈label equi-join plus a
        per-(node,label) count and a per-node argmax — all narrow
        shuffles on the node key, O(rounds × |E|) total, no global
        state. At 100 TB the label table is hash-partitioned by node and
        each round reuses that partitioning; lineage per round is one
        join+agg (checkpoint every ~10 rounds if iterating further —
        fixed at 3 here so the plan stays closed-form)."""
        _, e = _copurchase_edges(spark, sf_dir)
        lbl = e.select(F.col("src").alias("node")).distinct().select(
            "node", F.col("node").alias("label")
        )
        for _ in range(3):
            w = Window.partitionBy("src").orderBy(
                F.col("c").desc(), F.col("label")
            )
            lbl = (
                e.join(lbl, e.dst == lbl.node)
                .groupBy("src", "label")
                .agg(F.count("*").alias("c"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select(F.col("src").alias("node"), "label")
            )
        return (
            lbl.groupBy(F.col("label").alias("community"))
            .agg(
                F.count("*").cast("long").alias("n_nodes"),
                F.sum("node").cast("long").alias("node_checksum"),
            )
            .orderBy(F.col("n_nodes").desc(), "community")
            .limit(20)
        )

    # -- graph: local clustering coefficient --------------------------------

    @register(
        "clustering_coefficient_parts",
        sql="WITH "
        + _EDGE_SQL
        + """, d AS (
            SELECT src AS v, COUNT(*) AS deg FROM e GROUP BY src
        ), w AS (
            SELECT n1.src AS v, n1.dst AS a, n2.dst AS b
            FROM e n1
            JOIN d dc ON n1.src = dc.v AND dc.deg <= 64
            JOIN e n2 ON n1.src = n2.src AND n1.dst < n2.dst
        ), t AS (
            SELECT v, COUNT(*) AS tri
            FROM w JOIN e0 ON w.a = e0.pa AND w.b = e0.pb
            GROUP BY v
        )
        SELECT d.v AS part,
               CAST(d.deg AS BIGINT) AS degree,
               CAST(COALESCE(t.tri, 0) AS BIGINT) AS n_triangles,
               CAST(COALESCE(t.tri, 0) * 2000000
                    // (d.deg * (d.deg - 1)) AS BIGINT) AS lcc_ppm
        FROM d LEFT JOIN t ON d.v = t.v
        WHERE d.deg BETWEEN 2 AND 64
        ORDER BY lcc_ppm DESC, part
        LIMIT 50
        """,
        tags=("ext-graph", "ext-stats"),
    )
    def q_clustering_coefficient_parts(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Local clustering coefficient per part on the co-purchase
        graph: closed wedges / possible wedges, C_v = 2·T_v /
        (deg·(deg−1)) in integer ppm — the node-level community-density
        score (triangle counts alone conflate density with degree).

        Scale shape: the wedge join is Σ_v deg(v)², so the production
        control is a DEGREE CAP of 64 applied before wedge enumeration
        (hub nodes above the cap are excluded — their coefficient needs
        the sampled estimator, not exact wedges; the r10 probe measured
        ×7.4 time at ×4 replica-densified edges WITHOUT the cap, which
        is exactly the blow-up the cap bounds). The cap is inert at
        oracle scales (max observed degree 13 at sf0.01, 6 at sf0.1) so
        the pinned output is the exact coefficient set; the closure
        join against the edge list is an equi-join, never a cartesian.
        Output is top-50 bounded."""
        e0, e = _copurchase_edges(spark, sf_dir)
        d = e.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
        capped = d.filter(F.col("deg") <= 64).select("v")
        n1, n2 = e.alias("n1"), e.alias("n2")
        w = (
            n1.join(capped, F.col("n1.src") == F.col("v"))
            .join(
                n2,
                (F.col("n1.src") == F.col("n2.src"))
                & (F.col("n1.dst") < F.col("n2.dst")),
            )
            .select(
                F.col("n1.src").alias("v"),
                F.col("n1.dst").alias("a"),
                F.col("n2.dst").alias("b"),
            )
        )
        t = (
            w.join(
                e0, (F.col("a") == F.col("pa")) & (F.col("b") == F.col("pb"))
            )
            .groupBy("v")
            .agg(F.count("*").alias("tri"))
        )
        return (
            d.join(t, "v", "left")
            .filter((F.col("deg") >= 2) & (F.col("deg") <= 64))
            .select(
                F.col("v").alias("part"),
                F.col("deg").cast("long").alias("degree"),
                F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias(
                    "n_triangles"
                ),
                F.expr(
                    "coalesce(tri, 0) * 2000000 DIV (deg * (deg - 1))"
                )
                .cast("long")
                .alias("lcc_ppm"),
            )
            .orderBy(F.col("lcc_ppm").desc(), "part")
            .limit(50)
        )

    # -- market concentration: Herfindahl index -----------------------------

    @register(
        "hhi_supplier_revenue",
        sql="""
        WITH su AS (
            SELECT s.s_nationkey, l.l_suppkey,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(27,4))) * 10000 AS BIGINT)
                       AS units
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
        ), nat AS (
            SELECT s_nationkey, SUM(units) AS nat_units,
                   COUNT(*) AS n_suppliers
            FROM su GROUP BY 1
        ), shares AS (
            SELECT su.s_nationkey,
                   su.units * 1000000 // nat.nat_units AS share_ppm
            FROM su JOIN nat ON su.s_nationkey = nat.s_nationkey
        )
        SELECT n.n_name AS nation,
               CAST(nat.n_suppliers AS BIGINT) AS n_suppliers,
               CAST(SUM(s.share_ppm * s.share_ppm) // 1000000 AS BIGINT)
                   AS hhi_ppm,
               CAST(MAX(s.share_ppm) AS BIGINT) AS top_share_ppm
        FROM shares s
        JOIN nat ON s.s_nationkey = nat.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
        """,
        tags=("ext-stats", "ext-rel"),
    )
    def q_hhi_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Herfindahl-Hirschman concentration of supplier revenue within
        each nation: HHI = Σ share² in ppm (10 000 ≈ 'unconcentrated',
        1 000 000 = monopoly) — the assortment/antitrust concentration
        primitive, plus the top supplier's share. Revenue snaps to exact
        decimal then integer 1e-4 units at birth; shares are integer ppm
        (su·1e6 DIV total), so the squared sum is exact on both engines.

        Scale shape: one lineitem aggregate on l_suppkey (the only
        data-sized shuffle; supplier/nation joins broadcast), then
        nation-sized tables. share_ppm ≤ 1e6 so Σ share² ≤ n·1e12 —
        BIGINT-safe for any real supplier count; the su·1e6 numerator is
        the one to watch at extreme totals (emit per-n scaled units if a
        nation's 1e-4-unit revenue approaches 9.2e12, per the house
        DIV-overflow rule)."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_suppkey", "l_extendedprice", "l_discount"
        )
        s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        su = (
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
        nat = su.groupBy("s_nationkey").agg(
            F.sum("units").alias("nat_units"),
            F.count("*").alias("n_suppliers"),
        )
        shares = su.join(F.broadcast(nat), "s_nationkey").select(
            "s_nationkey",
            "n_suppliers",
            F.expr("units * 1000000 DIV nat_units").alias("share_ppm"),
        )
        return (
            shares.join(
                F.broadcast(n), shares.s_nationkey == n.n_nationkey
            )
            .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
            .agg(
                F.expr("sum(share_ppm * share_ppm) DIV 1000000")
                .cast("long")
                .alias("hhi_ppm"),
                F.max("share_ppm").cast("long").alias("top_share_ppm"),
            )
            .select(
                "nation",
                F.col("n_suppliers").cast("long").alias("n_suppliers"),
                "hhi_ppm",
                "top_share_ppm",
            )
        )

    # -- inequality: mean log deviation (Theil L) ---------------------------

    @register(
        "mld_spend_by_nation",
        sql=f"""
        WITH cs AS (
            SELECT c.c_nationkey,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey, o.o_custkey
        ), agg AS (
            SELECT c_nationkey,
                   COUNT(*) AS n_customers,
                   SUM(cents) AS total_cents,
                   SUM(CAST(round(ln(CAST(cents AS DOUBLE)) * {MICRO}, 0)
                       AS BIGINT)) AS sum_ln_micro
            FROM cs GROUP BY 1
        )
        SELECT n.n_name AS nation,
               CAST(a.n_customers AS BIGINT) AS n_customers,
               CAST(a.total_cents AS BIGINT) AS total_cents,
               CAST(a.sum_ln_micro AS BIGINT) AS sum_ln_micro,
               CAST(round(ln(CAST(a.total_cents AS DOUBLE) / a.n_customers)
                          * {MICRO}, 0) AS BIGINT) AS ln_mean_micro,
               CAST(CAST(round(ln(CAST(a.total_cents AS DOUBLE)
                                  / a.n_customers) * {MICRO}, 0) AS BIGINT)
                    - a.sum_ln_micro // a.n_customers AS BIGINT)
                   AS mld_micro
        FROM agg a JOIN nation n ON a.c_nationkey = n.n_nationkey
        """,
        tags=("ext-stats",),
    )
    def q_mld_spend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Mean log deviation (Theil L) of customer spend within each
        nation: MLD = ln(mean) − mean(ln) ≥ 0, the decomposable
        inequality index (complements the Gini query — MLD splits
        additively into within/between-group terms, Gini does not).
        Spend is exact integer cents; each ln is micro-nat snapped at
        birth (house invariant), so the per-nation sums are exact
        integer arithmetic and mld_micro derives by integer floor
        division only.

        Scale shape: one orders aggregate on (nation, custkey), one
        nation rollup, broadcast nation names — two narrow shuffles, no
        windows, no sorts."""
        o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        cs = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_nationkey", "o_custkey")
            .agg(
                (F.sum(F.col("o_totalprice").cast("decimal(27,2)")) * 100)
                .cast("long")
                .alias("cents")
            )
        )
        agg = cs.groupBy("c_nationkey").agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("total_cents"),
            F.sum(
                F.round(F.log(F.col("cents").cast("double")) * MICRO, 0).cast(
                    "long"
                )
            ).alias("sum_ln_micro"),
        )
        ln_mean = F.round(
            F.log(F.col("total_cents").cast("double") / F.col("n_customers"))
            * MICRO,
            0,
        ).cast("long")
        return (
            agg.join(F.broadcast(n), agg.c_nationkey == n.n_nationkey)
            .select(
                F.col("n_name").alias("nation"),
                F.col("n_customers").cast("long").alias("n_customers"),
                F.col("total_cents").cast("long").alias("total_cents"),
                F.col("sum_ln_micro").cast("long").alias("sum_ln_micro"),
                ln_mean.alias("ln_mean_micro"),
                (ln_mean - F.expr("sum_ln_micro DIV n_customers"))
                .cast("long")
                .alias("mld_micro"),
            )
        )

    # -- drift: Page-Hinkley ------------------------------------------------

    @register(
        "page_hinkley_daily",
        sql="""
        WITH d AS (
            SELECT date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), pre AS (
            SELECT day, cents,
                   SUM(cents) OVER (ORDER BY day) AS prefix,
                   ROW_NUMBER() OVER (ORDER BY day) AS t
            FROM d
        ), dev AS (
            SELECT day, cents,
                   CAST(round((CAST(cents AS DOUBLE)
                               - CAST(prefix AS DOUBLE) / t) * 100, 0)
                        AS BIGINT) AS dev_c100
            FROM pre
        ), m AS (
            SELECT day, cents, dev_c100,
                   SUM(dev_c100) OVER (ORDER BY day) AS m_c100
            FROM dev
        )
        SELECT CAST(day AS BIGINT) AS day, cents,
               CAST(m_c100 AS BIGINT) AS m_c100,
               CAST(m_c100 - MIN(m_c100) OVER (ORDER BY day) AS BIGINT)
                   AS ph_c100
        FROM m
        """,
        tags=("ext-stats", "ext-temporal"),
    )
    def q_page_hinkley_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Page-Hinkley mean-shift detector over the daily-revenue
        series: cumulative deviation from the running mean
        m_t = Σ(x_i − x̄_i), alarm statistic PH_t = m_t − min_{s≤t} m_s
        (caller thresholds at λ). The sequential-drift complement to
        the stateful CUSUM stream operator — this is the batch,
        backtest-over-history form. Deviations snap to integer
        centi-cents at birth; the running mean is the one double
        division (of two exact integers — identical on both engines).

        Scale shape: the daily aggregate is the data-sized pass; the
        prefix windows run over the bounded calendar series (~2.4k
        rows, single partition by design — document, don't shard, a
        series that small)."""
        o = T(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
        d = (
            o.groupBy(
                F.unix_date(F.to_date("o_orderdate")).alias("day")
            )
            .agg(
                (F.sum(F.col("o_totalprice").cast("decimal(27,2)")) * 100)
                .cast("long")
                .alias("cents")
            )
        )
        w = Window.orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        pre = d.select(
            "day",
            "cents",
            F.sum("cents").over(w).alias("prefix"),
            F.row_number().over(Window.orderBy("day")).alias("t"),
        )
        dev = pre.select(
            "day",
            "cents",
            F.round(
                (
                    F.col("cents").cast("double")
                    - F.col("prefix").cast("double") / F.col("t")
                )
                * 100,
                0,
            )
            .cast("long")
            .alias("dev_c100"),
        )
        m = dev.select(
            "day", "cents", "dev_c100", F.sum("dev_c100").over(w).alias("m_c100")
        )
        return m.select(
            F.col("day").cast("long").alias("day"),
            "cents",
            "m_c100",
            (F.col("m_c100") - F.min("m_c100").over(w))
            .cast("long")
            .alias("ph_c100"),
        )

    # -- temporal: Allen interval algebra -----------------------------------

    @register(
        "allen_interval_profile",
        sql="""
        WITH iv AS (
            SELECT o.o_orderkey, o.o_custkey,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o.o_orderdate AS DATE)) AS s,
                   MAX(date_diff('day', DATE '1970-01-01',
                                 CAST(l.l_shipdate AS DATE))) AS e
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2, 3
        ), seq AS (
            SELECT s AS s2, e AS e2,
                   LAG(s) OVER (PARTITION BY o_custkey
                                ORDER BY s, o_orderkey) AS s1,
                   LAG(e) OVER (PARTITION BY o_custkey
                                ORDER BY s, o_orderkey) AS e1
            FROM iv
        )
        SELECT CASE
                 WHEN s1 = s2 AND e1 = e2 THEN 'equals'
                 WHEN s1 = s2 AND e1 < e2 THEN 'starts'
                 WHEN s1 = s2 THEN 'started_by'
                 WHEN e1 < s2 THEN 'before'
                 WHEN e1 = s2 THEN 'meets'
                 WHEN e2 > e1 THEN 'overlaps'
                 WHEN e2 = e1 THEN 'finished_by'
                 ELSE 'contains'
               END AS relation,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM seq WHERE s1 IS NOT NULL
        GROUP BY 1
        """,
        tags=("ext-temporal",),
    )
    def q_allen_interval_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Allen interval-algebra profile of consecutive fulfillment
        windows per customer: each order spans [order day, last ship
        day]; successive intervals (ordered by start, orderkey) classify
        into the 8 reachable Allen relations (the ordering fixes
        start1 ≤ start2, so 'after'/'during'/'met-by' etc. fold into
        their inverses) — the overlap-structure census that drives
        temporal-join cardinality estimates. Pure integer epoch-day
        comparisons; the CASE chain is identical on both engines.

        Scale shape: one orders⋈lineitem aggregate (shuffle on
        orderkey), one lag window partitioned by customer (shuffle on
        custkey), then a bounded 8-row rollup."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        )
        li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
        iv = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy(
                "o_orderkey",
                "o_custkey",
                F.unix_date(F.to_date("o_orderdate")).alias("s"),
            )
            .agg(F.max(F.unix_date(F.to_date("l_shipdate"))).alias("e"))
        )
        w = Window.partitionBy("o_custkey").orderBy("s", "o_orderkey")
        seq = iv.select(
            F.col("s").alias("s2"),
            F.col("e").alias("e2"),
            F.lag("s").over(w).alias("s1"),
            F.lag("e").over(w).alias("e1"),
        ).filter(F.col("s1").isNotNull())
        rel = (
            F.when(
                (F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")),
                F.lit("equals"),
            )
            .when(
                (F.col("s1") == F.col("s2")) & (F.col("e1") < F.col("e2")),
                F.lit("starts"),
            )
            .when(F.col("s1") == F.col("s2"), F.lit("started_by"))
            .when(F.col("e1") < F.col("s2"), F.lit("before"))
            .when(F.col("e1") == F.col("s2"), F.lit("meets"))
            .when(F.col("e2") > F.col("e1"), F.lit("overlaps"))
            .when(F.col("e2") == F.col("e1"), F.lit("finished_by"))
            .otherwise(F.lit("contains"))
        )
        return seq.groupBy(rel.alias("relation")).agg(
            F.count("*").cast("long").alias("n_pairs")
        )

    # -- privacy: DP contribution bounding ----------------------------------

    @register(
        "dp_contribution_bounds",
        sql="""
        WITH uc AS (
            SELECT event_type, user_id, COUNT(*) AS c
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(c) AS BIGINT) AS rows_total,
               CAST(SUM(LEAST(c, 10)) AS BIGINT) AS rows_kept,
               CAST(SUM(c - LEAST(c, 10)) AS BIGINT) AS rows_clipped,
               CAST(SUM(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_users_clipped,
               CAST(MAX(c) AS BIGINT) AS max_contribution
        FROM uc GROUP BY 1
        """,
        tags=("ext-privacy", "ext-quality"),
    )
    def q_dp_contribution_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Differential-privacy pre-processing report: per-user
        contribution bounding at cap C=10 per (user, event_type) — rows
        kept/clipped, users affected, worst contributor. After this
        clip, a per-type count query has user-level L1 sensitivity ≤ C,
        which is what calibrates the DP noise scale; the clip itself is
        the data-pipeline step, the (non-deterministic) noise draw is
        the caller's. Joins the k-anonymity/l-diversity family as the
        third governance primitive.

        Scale shape: one (type, user) count then one per-type rollup —
        two narrow shuffles, bounded output."""
        ev = T(spark, sf_dir, "events").select("event_type", "user_id")
        uc = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("c"))
        kept = F.least(F.col("c"), F.lit(10))
        return uc.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("c").cast("long").alias("rows_total"),
            F.sum(kept).cast("long").alias("rows_kept"),
            F.sum(F.col("c") - kept).cast("long").alias("rows_clipped"),
            F.sum(F.when(F.col("c") > 10, 1).otherwise(0))
            .cast("long")
            .alias("n_users_clipped"),
            F.max("c").cast("long").alias("max_contribution"),
        )

    # -- mixing: UniMax capped waterfilling ---------------------------------

    @register(
        "unimax_language_budgets",
        sql="""
        WITH lt AS (
            SELECT lang,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS tokens
            FROM documents GROUP BY 1
        ), tot AS (
            SELECT SUM(tokens) AS total, COUNT(*) AS k FROM lt
        ), ranked AS (
            SELECT lang, tokens, 2 * tokens AS cap,
                   ROW_NUMBER() OVER (ORDER BY 2 * tokens, lang) AS i,
                   COALESCE(SUM(2 * tokens) OVER (
                       ORDER BY 2 * tokens, lang
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS prefix_cap
            FROM lt
        ), cand AS (
            SELECT r.i, r.cap,
                   (tot.total // 2 - r.prefix_cap) // (tot.k - r.i + 1) AS r
            FROM ranked r CROSS JOIN tot
        ), thr AS (
            SELECT COALESCE(
                (SELECT arg_min(r, i) FROM cand WHERE cap > r),
                (SELECT MAX(cap) FROM ranked)) AS t
        )
        SELECT r.lang, r.tokens, CAST(r.cap AS BIGINT) AS cap,
               CAST(LEAST(r.cap, thr.t) AS BIGINT) AS alloc,
               CAST(LEAST(r.cap, thr.t) * 1000000 // (tot.total // 2)
                    AS BIGINT) AS alloc_ppm
        FROM ranked r CROSS JOIN thr CROSS JOIN tot
        """,
        tags=("ext-sampling",),
    )
    def q_unimax_language_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
        """UniMax mixture allocation (Chung et al. 2023): spread a token
        budget (half the corpus here) across languages as uniformly as
        possible subject to a per-language epoch cap (2 epochs of its
        tokens) — low-resource languages saturate their cap,
        high-resource ones split the remainder equally. Solved in
        closed form as capped waterfilling: sort caps ascending, the
        water level t is the candidate remainder-share at the FIRST
        rank whose cap exceeds it (arg_min by rank, not min — later
        ranks also violate with meaningless levels); alloc = min(cap,
        t). All integer floor division; the ≤k-token floor remainder
        stays unallocated by design.

        Scale shape: one documents aggregate (the data pass); the
        waterfilling runs on the LANGUAGE table (bounded, ~10 rows) via
        one window + one scalar threshold — trivially broadcastable."""
        docs = T(spark, sf_dir, "documents").select("lang", "text")
        lt = docs.groupBy("lang").agg(
            F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
        )
        tot = lt.agg(
            F.sum("tokens").alias("total"), F.count("*").alias("k")
        )
        wo = Window.orderBy(F.col("cap"), F.col("lang"))
        ranked = (
            lt.withColumn("cap", 2 * F.col("tokens"))
            .withColumn("i", F.row_number().over(wo))
            .withColumn(
                "prefix_cap",
                F.coalesce(
                    F.sum("cap").over(
                        wo.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
        )
        cand = ranked.join(F.broadcast(tot)).withColumn(
            "r",
            F.expr("(total DIV 2 - prefix_cap) DIV (k - i + 1)"),
        )
        viol = cand.filter(F.col("cap") > F.col("r")).agg(
            F.expr("min_by(r, i)").alias("tv")
        )
        thr = viol.join(F.broadcast(ranked.agg(F.max("cap").alias("cmax")))).select(
            F.coalesce(F.col("tv"), F.col("cmax")).alias("t")
        )
        return (
            ranked.join(F.broadcast(thr))
            .join(F.broadcast(tot))
            .select(
                "lang",
                "tokens",
                F.col("cap").cast("long").alias("cap"),
                F.least(F.col("cap"), F.col("t")).cast("long").alias("alloc"),
                F.expr(
                    "least(cap, t) * 1000000 DIV (total DIV 2)"
                )
                .cast("long")
                .alias("alloc_ppm"),
            )
        )

    # -- survival: Kaplan-Meier over order gaps -----------------------------

    @register(
        "km_survival_order_gaps",
        sql=f"""
        WITH od AS (
            SELECT o_custkey,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS day
            FROM orders
        ), horizon AS (
            SELECT MAX(day) AS h FROM od
        ), gaps AS (
            SELECT day - LAG(day) OVER (PARTITION BY o_custkey
                                        ORDER BY day) AS dur,
                   0 AS censored
            FROM od
        ), last AS (
            SELECT horizon.h - MAX(od.day) AS dur, 1 AS censored
            FROM od CROSS JOIN horizon
            GROUP BY o_custkey, horizon.h
        ), all_obs AS (
            SELECT dur, censored FROM gaps WHERE dur IS NOT NULL
            UNION ALL SELECT dur, censored FROM last
        ), by_dur AS (
            SELECT dur,
                   SUM(1 - censored) AS d,
                   SUM(censored) AS c
            FROM all_obs GROUP BY dur
        ), risk AS (
            SELECT dur, d, c,
                   SUM(d + c) OVER (ORDER BY dur DESC) AS n_risk
            FROM by_dur
        )
        SELECT CAST(dur AS BIGINT) AS duration_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               CAST(c AS BIGINT) AS n_censored,
               CAST(SUM(CASE WHEN d > 0 AND d < n_risk THEN
                       CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                                  * {MICRO}, 0) AS BIGINT)
                     ELSE 0 END)
                   OVER (ORDER BY dur) AS BIGINT) AS cum_ln_surv_micro
        FROM risk
        """,
        tags=("ext-stats", "ext-temporal"),
    )
    def q_km_survival_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Kaplan-Meier survival curve over customer inter-order gaps
        with right-censoring: uncensored observations are consecutive
        order gaps (days), censored ones are each customer's open gap
        from last order to the global horizon. At each distinct
        duration: at-risk count (reverse cumulative), events, censored,
        and the running log-survival Σ ln(1 − d/n) in micro-nats —
        integer-snapped per term, so the curve is exact integer
        arithmetic (exp is the caller's; a terminal d == n_risk point
        would be ln 0 and contributes a documented 0 sentinel term).

        Scale shape: the lag window shuffles on custkey (the data
        pass); everything after runs on the DURATION domain, bounded by
        the calendar span, with two bounded-domain windows."""
        od = T(spark, sf_dir, "orders").select(
            "o_custkey", F.unix_date(F.to_date("o_orderdate")).alias("day")
        )
        horizon = od.agg(F.max("day").alias("h"))
        wlag = Window.partitionBy("o_custkey").orderBy("day")
        gaps = od.select(
            (F.col("day") - F.lag("day").over(wlag)).alias("dur"),
            F.lit(0).alias("censored"),
        ).filter(F.col("dur").isNotNull())
        last = (
            od.groupBy("o_custkey")
            .agg(F.max("day").alias("last_day"))
            .join(F.broadcast(horizon))
            .select(
                (F.col("h") - F.col("last_day")).alias("dur"),
                F.lit(1).alias("censored"),
            )
        )
        by_dur = (
            gaps.unionByName(last)
            .groupBy("dur")
            .agg(
                F.sum(1 - F.col("censored")).alias("d"),
                F.sum("censored").alias("c"),
            )
        )
        wdesc = Window.orderBy(F.col("dur").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        risk = by_dur.withColumn(
            "n_risk", F.sum(F.col("d") + F.col("c")).over(wdesc)
        )
        term = F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk")
                )
                * MICRO,
                0,
            ).cast("long"),
        ).otherwise(F.lit(0))
        wasc = Window.orderBy("dur").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return risk.select(
            F.col("dur").cast("long").alias("duration_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.col("c").cast("long").alias("n_censored"),
            F.sum(term).over(wasc).cast("long").alias("cum_ln_surv_micro"),
        )


_register()
