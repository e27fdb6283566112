"""Round-9 prep batch 1: association & agreement statistics (Cohen's κ
for the langid heuristic, Cramér's V between customer dimensions,
McNemar's paired test between two quality gates), market-concentration
HHI per region, and PSI distribution drift between order-price years —
the model-monitoring / release-audit family next to the χ² and
mutual-information queries.

Engine-parity rules as extended_r4*..r8: integer micro/milli/ppm snaps
at expression birth, sign-safe pmod floor division for signed
quantities, squared statistics in DECIMAL(38,0)/HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.plans.extended_r8 import _fd_sql


def _fd_col_sql(x: str, d: str) -> str:
    """DuckDB sign-safe exact floor division by a positive COLUMN
    denominator (twin of stats._floordiv_col)."""
    return f"((({x}) - ((({x}) % ({d})) + ({d})) % ({d})) // ({d}))"


def _register_batch1():
    from politicamente_etl_spark.operators import stats, text
    from politicamente_etl_spark.plans.catalog import T, register

    # shared langid scoring CTE (same fixture heuristic as
    # langid_confusion_matrix, extended_r3)
    _LANGID_PRED = """
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(string_split(text, ' '),
                        t -> t IN ('the', 'a'))) AS BIGINT) AS score_en,
                   CAST(len(list_filter(string_split(text, ' '),
                        t -> t IN ('row', 'column'))) AS BIGINT) AS score_es,
                   CAST(len(list_filter(string_split(text, ' '),
                        t -> t IN ('data', 'table'))) AS BIGINT) AS score_pt
            FROM documents
        ), pred AS (
            SELECT lang,
                   CASE WHEN score_en >= score_es AND score_en >= score_pt
                        THEN 'en'
                        WHEN score_es >= score_pt THEN 'es'
                        ELSE 'pt' END AS pred_lang
            FROM scored
        )"""

    @register(
        "langid_kappa_agreement",
        sql=_LANGID_PRED
        + f""", cells AS (
            SELECT lang AS a, pred_lang AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM pred GROUP BY 1, 2
        ), ra AS (
            SELECT a, CAST(SUM(n_ab) AS BIGINT) AS r FROM cells GROUP BY 1
        ), cb AS (
            SELECT b, CAST(SUM(n_ab) AS BIGINT) AS c FROM cells GROUP BY 1
        ), pe AS (
            SELECT CAST(COALESCE(SUM(CAST(r AS HUGEINT) * c), 0)
                        AS HUGEINT) AS pe_x_n
            FROM ra JOIN cb ON ra.a = cb.b
        ), po AS (
            SELECT CAST(SUM(n_ab) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN a = b THEN n_ab ELSE 0 END)
                        AS BIGINT) AS n_agree
            FROM cells
        )
        SELECT n, n_agree,
               CAST(pe_x_n AS BIGINT) AS pe_x_n,
               CAST(CAST(n AS HUGEINT) * n_agree - pe_x_n AS BIGINT)
                   AS kappa_num,
               CAST(CAST(n AS HUGEINT) * n - pe_x_n AS BIGINT) AS kappa_den,
               CAST(CASE WHEN CAST(n AS HUGEINT) * n - pe_x_n = 0 THEN 0
                    ELSE {_fd_col_sql(
                   "(CAST(n AS HUGEINT) * n_agree - pe_x_n) * 1000000",
                   "CAST(n AS HUGEINT) * n - pe_x_n")} END AS BIGINT)
                   AS kappa_ppm
        FROM po, pe
        """,
        tags=("ext-text", "ext-stats"),
    )
    def q_langid_kappa_agreement(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Cohen's κ of the marker-based langid heuristic against the
        labeled lang column — the chance-corrected summary of
        langid_confusion_matrix (raw accuracy over-credits a skewed
        label mix; κ subtracts the marginal-product agreement). Exact
        integer (num, den) pair + sign-safe floored ppm; the corpus
        collapses to the 3×3 confusion cells in one shuffle."""
        scored = text.with_lang_id(T(spark, sf_dir, "documents"))
        return stats.cohens_kappa(scored, "lang", "pred_lang")

    @register(
        "segment_nation_association",
        sql="""
        WITH cells AS (
            SELECT c_mktsegment AS a, c_nationkey AS b,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM customer GROUP BY 1, 2
        ), ra AS (
            SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1
        ), cb AS (
            SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(o) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT a) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT b) AS BIGINT) AS n_cols
            FROM cells
        ), terms AS (
            SELECT CAST(SUM(CAST(tot.n AS HUGEINT) * o * o * 1000000
                             // (CAST(r AS HUGEINT) * c)) AS HUGEINT)
                       AS s_micro
            FROM cells
            JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
        )
        SELECT n, n_rows, n_cols,
               CAST(s_micro - CAST(n AS HUGEINT) * 1000000 AS BIGINT)
                   AS chi2_micro,
               CAST(CASE WHEN least(n_rows, n_cols) = 1 THEN 0
                    ELSE (s_micro - CAST(n AS HUGEINT) * 1000000)
                    // (CAST(n AS HUGEINT) * (least(n_rows, n_cols) - 1))
                    END AS BIGINT) AS v2_ppm
        FROM tot, terms
        """,
        tags=("ext-stats",),
    )
    def q_segment_nation_association(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Cramér's V between market segment and nation — 'is the
        segment mix geographically skewed?' as one normalized number
        next to dim_label_mutual_info's nat-denominated answer. χ² via
        per-cell micro-snapped n·o²/(r·c) terms with the −n fold;
        everything after the 5×25-cell contingency aggregate is
        grid-sized."""
        cust = T(spark, sf_dir, "customer")
        return stats.cramers_v(cust, "c_mktsegment", "c_nationkey")

    @register(
        "supplier_hhi_by_region",
        sql="""
        WITH rev AS (
            SELECT r.r_name AS g, l.l_suppkey AS e,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(27,2))
                                 * CAST(1 - l.l_discount AS DECIMAL(27,2))
                                 * 10000 AS BIGINT)) AS BIGINT) AS x
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        ), tot AS (
            SELECT g, CAST(SUM(x) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_entities,
                   CAST(MAX(x) AS BIGINT) AS x_top
            FROM rev GROUP BY 1
        )
        SELECT rev.g AS region, tot.n_entities, tot.total,
               CAST(SUM(CAST(x AS HUGEINT) * x * 1000000
                        // (CAST(total AS HUGEINT) * total)) AS BIGINT)
                   AS hhi_ppm,
               CAST(MAX(x_top * 1000000 // total) AS BIGINT)
                   AS top_share_ppm
        FROM rev JOIN tot USING (g)
        GROUP BY 1, 2, 3
        """,
        tags=("ext-agg", "ext-stats"),
    )
    def q_supplier_hhi_by_region(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Herfindahl-Hirschman concentration of supplier revenue per
        region — the antitrust-style 'is this market a monopoly?'
        number (1e6/n = even, 1e6 = single supplier), next to the Gini
        the customer side already has. Revenue exact in 10⁻⁴ dollars
        (2-dec × 2-dec product is exact 4-dec); squares in
        DECIMAL(38,0). One (region, supplier) rollup shuffle, then
        group-level arithmetic; dims broadcast onto the fact scan."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_suppkey",
            F.expr(
                "CAST(CAST(l_extendedprice AS decimal(27,2))"
                " * CAST(1 - l_discount AS decimal(27,2))"
                " * 10000 AS BIGINT)"
            ).alias("x4"),
        )
        sup = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        nat = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
        reg = T(spark, sf_dir, "region").select("r_regionkey", "r_name")
        joined = (
            li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
            .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        )
        return stats.concentration_report(
            joined, "r_name", "l_suppkey", "x4"
        ).select(
            F.col("g").alias("region"),
            "n_entities",
            "total",
            "hhi_ppm",
            "top_share_ppm",
        )

    @register(
        "price_psi_by_year",
        sql=f"""
        WITH b AS (
            SELECT CAST(floor(o_totalprice * 100) AS BIGINT) // 5000000
                       AS bin,
                   CAST(year(o_orderdate) AS BIGINT) AS y
            FROM orders
            WHERE year(o_orderdate) IN (1995, 1996)
        ), binned AS (
            SELECT bin,
                   CAST(SUM(CASE WHEN y = 1995 THEN 1 ELSE 0 END)
                        AS BIGINT) + 1 AS cr,
                   CAST(SUM(CASE WHEN y = 1996 THEN 1 ELSE 0 END)
                        AS BIGINT) + 1 AS cc
            FROM b GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(cr) AS BIGINT) AS nr,
                   CAST(SUM(cc) AS BIGINT) AS nc
            FROM binned
        ), j AS (
            SELECT bin, cr - 1 AS c_ref, cc - 1 AS c_cur,
                   CAST(cr * 1000000 // nr AS BIGINT) AS p_ppm,
                   CAST(cc * 1000000 // nc AS BIGINT) AS q_ppm,
                   CAST(round(ln(CAST(cr AS DOUBLE) * CAST(nc AS DOUBLE))
                              * 1e6) AS BIGINT)
                   - CAST(round(ln(CAST(cc AS DOUBLE) * CAST(nr AS DOUBLE))
                                * 1e6) AS BIGINT) AS ln_diff_micro
            FROM binned, tot
        )
        SELECT bin, c_ref, c_cur, p_ppm, q_ppm,
               CAST({_fd_sql("(p_ppm - q_ppm) * ln_diff_micro", 1_000_000)}
                    AS BIGINT) AS contrib_micro
        FROM j
        """,
        tags=("ext-stats",),
    )
    def q_price_psi_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Population Stability Index of the order-price distribution,
        1995 (reference) vs 1996 (current), over fixed $50k bins — the
        standard model-monitoring drift score (PSI > 0.2 = retrain).
        Per-bin contributions in micro-nats with add-one smoothing and
        micro-nat-snapped ratio logs; the corpus collapses to the bin
        grid in one conditional-aggregation pass (no second scan, no
        self-join of years)."""
        o = T(spark, sf_dir, "orders").select(
            F.expr(
                "CAST(floor(o_totalprice * 100) AS BIGINT) DIV 5000000"
            ).alias("bin"),
            F.year("o_orderdate").cast("long").alias("y"),
        )
        binned = (
            o.filter(F.col("y").isin(1995, 1996))
            .groupBy("bin")
            .agg(
                F.sum(F.when(F.col("y") == 1995, 1).otherwise(0))
                .cast("long")
                .alias("c_ref"),
                F.sum(F.when(F.col("y") == 1996, 1).otherwise(0))
                .cast("long")
                .alias("c_cur"),
            )
        )
        return stats.psi_report(binned)

    from politicamente_etl_spark.plans.extended_r8 import (
        _classifier_scored_cte,
    )

    @register(
        "gate_vs_length_mcnemar",
        sql=_classifier_scored_cte()
        + """, heur AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) >= 60 AS INT)
                       AS heur_pred
            FROM documents
        ), j AS (
            SELECT CAST(logits.logit >= 0 AS INT) AS gate_pred,
                   truth.label, heur.heur_pred
            FROM logits JOIN truth USING (doc_id)
            JOIN heur USING (doc_id)
        ), m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN gate_pred = label
                                  AND heur_pred = label
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
                   CAST(SUM(CASE WHEN gate_pred = label
                                  AND heur_pred <> label
                             THEN 1 ELSE 0 END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN gate_pred <> label
                                  AND heur_pred = label
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM j
        )
        SELECT n, n_both, b, c,
               CAST(CASE WHEN b + c = 0 THEN 0
                         ELSE (b - c) * (b - c) * 1000 // (b + c) END
                    AS BIGINT) AS mcnemar_milli
        FROM m
        """,
        tags=("ext-text", "ext-stats", "ext-docs"),
    )
    def q_gate_vs_length_mcnemar(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """McNemar's paired test: does the hashed quality gate beat the
        crude ≥60-words length heuristic ON THE SAME documents? Paired
        discordant counts b (gate right, heuristic wrong) and c
        (reverse) with the χ²₁ statistic (b−c)²/(b+c) in milli —
        the right test when both classifiers score one corpus (an
        unpaired comparison wastes the pairing). One scan builds both
        predictions + truth; everything collapses to one row."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        w = text.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
        logit = text.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        ).select("doc_id", "logit_micro")
        truth = docs.select(
            "doc_id",
            (
                F.expr(
                    "(size(array_distinct(split(text, ' '))) * 1000)"
                    " div size(split(text, ' '))"
                )
                >= 800
            )
            .cast("int")
            .alias("label"),
            (F.expr("size(split(text, ' '))") >= 60)
            .cast("int")
            .alias("heur_pred"),
        )
        j = logit.join(truth, "doc_id").select(
            (F.col("logit_micro") >= 0).cast("int").alias("gate_pred"),
            "label",
            "heur_pred",
        )
        m = j.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                (
                    (F.col("gate_pred") == F.col("label"))
                    & (F.col("heur_pred") == F.col("label"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_both"),
            F.sum(
                (
                    (F.col("gate_pred") == F.col("label"))
                    & (F.col("heur_pred") != F.col("label"))
                ).cast("long")
            )
            .cast("long")
            .alias("b"),
            F.sum(
                (
                    (F.col("gate_pred") != F.col("label"))
                    & (F.col("heur_pred") == F.col("label"))
                ).cast("long")
            )
            .cast("long")
            .alias("c"),
        )
        return m.select(
            "n",
            "n_both",
            "b",
            "c",
            F.expr(
                "CAST(CASE WHEN b + c = 0 THEN 0"
                " ELSE (b - c) * (b - c) * 1000 DIV (b + c) END AS BIGINT)"
            ).alias("mcnemar_milli"),
        )


_register_batch1()


def _register_batch2():
    """Batch 2: distribution drift (two-sample KS, one-vs-rest per
    source) and the log-rank survival comparison between customer
    segments — the hypothesis-testing siblings of PSI and Kaplan-Meier."""
    from politicamente_etl_spark.operators import stats, temporal
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "doc_length_ks_by_source",
        sql="""
        WITH base AS (
            SELECT source AS g,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS v
            FROM documents
        ), gv AS (
            SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2
        ), pv AS (
            SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM gv GROUP BY 1
        ), vals AS (
            SELECT v, CAST(SUM(cv) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS ct
            FROM pv
        ), grps AS (
            SELECT g, CAST(SUM(c) AS BIGINT) AS n1 FROM gv GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(n1) AS BIGINT) AS n FROM grps
        ), cum AS (
            SELECT grps.g, grps.n1, tot.n, vals.v, vals.ct,
                   CAST(SUM(COALESCE(gv.c, 0)) OVER (
                        PARTITION BY grps.g ORDER BY vals.v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS c1
            FROM grps CROSS JOIN vals CROSS JOIN tot
            LEFT JOIN gv ON grps.g = gv.g AND vals.v = gv.v
        ), diffs AS (
            SELECT g, n1, n - n1 AS n2,
                   abs(CAST(c1 AS HUGEINT) * (n - n1)
                       - CAST(ct - c1 AS HUGEINT) * n1) AS diff
            FROM cum
        )
        SELECT g AS source, n1, n2,
               CAST(MAX(diff) AS BIGINT) AS d_num,
               CAST(MAX(diff) * 1000000 // (CAST(n1 AS HUGEINT) * n2)
                    AS BIGINT) AS d_ppm,
               CAST(MAX(diff) * MAX(diff) * 1000000 >
                    1844440 * (CAST(n1 AS HUGEINT) + n2) * n1 * n2
                    AS INT) AS reject_05
        FROM diffs GROUP BY 1, 2, 3
        """,
        tags=("ext-text", "ext-stats", "ext-docs"),
    )
    def q_doc_length_ks_by_source(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Two-sample KS test of each source's token-count distribution
        against the rest of the corpus — the nonparametric drift gate
        next to PSI (no binning choice) and the KL score (a max-gap, not
        an average). Exact cross-multiplied ECDF gaps over the bounded
        (source, length) grid; the α=0.05 verdict is a pure-integer
        squared compare. One corpus-sized shuffle, then grid work."""
        docs = T(spark, sf_dir, "documents").select(
            "source",
            F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_tok"),
        )
        return stats.ks_one_vs_rest(docs, "source", "n_tok").select(
            F.col("g").alias("source"),
            "n1",
            "n2",
            "d_num",
            "d_ppm",
            "reject_05",
        )

    @register(
        "logrank_building_vs_rest",
        sql="""
        WITH o AS (
            SELECT o_custkey,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS d
            FROM orders
        ), cust AS (
            SELECT o_custkey, MIN(d) AS fd, MAX(d) AS ld FROM o GROUP BY 1
        ), mx AS (
            SELECT MAX(ld) AS m FROM cust
        ), seg AS (
            SELECT cust.o_custkey, (ld - fd) // 30 AS t,
                   CASE WHEN ld > m - 90 THEN 0 ELSE 1 END AS churn,
                   CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                       AS g1
            FROM cust CROSS JOIN mx
            JOIN customer c ON cust.o_custkey = c.c_custkey
        ), steps AS (
            SELECT t,
                   CAST(SUM(g1 * churn) AS BIGINT) AS d1,
                   CAST(SUM(g1 * (1 - churn)) AS BIGINT) AS c1,
                   CAST(SUM((1 - g1) * churn) AS BIGINT) AS d2,
                   CAST(SUM((1 - g1) * (1 - churn)) AS BIGINT) AS c2
            FROM seg GROUP BY 1
        ), risk AS (
            SELECT t, d1, d1 + d2 AS d,
                   CAST(SUM(d1 + c1) OVER (ORDER BY t
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS BIGINT) AS n1,
                   CAST(SUM(d1 + c1 + d2 + c2) OVER (ORDER BY t
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS BIGINT) AS n
            FROM steps
        ), terms AS (
            SELECT d1,
                   CAST(d AS HUGEINT) * n1 * 1000000 // n AS e1_micro,
                   CASE WHEN n <= 1 THEN CAST(0 AS HUGEINT)
                        ELSE CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d)
                             * 1000000 // (CAST(n AS HUGEINT) * n * (n - 1))
                        END AS v_micro
            FROM risk
        ), agg AS (
            SELECT CAST(SUM(d1) AS BIGINT) AS o1,
                   CAST(SUM(e1_micro) AS HUGEINT) AS e1_micro,
                   CAST(SUM(v_micro) AS HUGEINT) AS v_micro
            FROM terms
        )
        SELECT o1,
               CAST(e1_micro AS BIGINT) AS e1_micro,
               CAST(v_micro AS BIGINT) AS v_micro,
               CAST(CASE WHEN v_micro = 0 THEN 0 ELSE
                    (CAST(o1 AS HUGEINT) * 1000000 - e1_micro)
                    * (CAST(o1 AS HUGEINT) * 1000000 - e1_micro)
                    * 1000 // (v_micro * CAST(1000000 AS HUGEINT))
                    END AS BIGINT) AS chi2_milli
        FROM agg
        """,
        tags=("ext-temporal", "ext-stats"),
    )
    def q_logrank_building_vs_rest(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Log-rank test: do BUILDING-segment customers churn at a
        different hazard than everyone else? Same censoring-aware
        duration frame as kaplan_meier_retention (still-active
        customers censor, not churn), per-step expected-event and
        variance terms micro-snapped, χ²₁ in milli (≥ 3841 rejects at
        p < 0.05). The windows walk the bounded duration grid; the
        corpus-sized work is the one per-customer rollup."""
        o = T(spark, sf_dir, "orders").select(
            "o_custkey", F.unix_date(F.to_date("o_orderdate")).alias("d")
        )
        cust = o.groupBy("o_custkey").agg(
            F.min("d").alias("fd"), F.max("d").alias("ld")
        )
        mx = cust.agg(F.max("ld").alias("m"))
        seg_dim = T(spark, sf_dir, "customer").select(
            "c_custkey",
            (F.col("c_mktsegment") == "BUILDING").cast("int").alias("g1"),
        )
        seg = (
            cust.crossJoin(F.broadcast(mx))
            .join(F.broadcast(seg_dim), cust.o_custkey == seg_dim.c_custkey)
            .select(
                F.expr("(ld - fd) div 30").alias("t"),
                F.when(F.col("ld") > F.col("m") - 90, F.lit(0))
                .otherwise(F.lit(1))
                .alias("churn"),
                "g1",
            )
        )
        steps = seg.groupBy("t").agg(
            F.sum(F.col("g1") * F.col("churn")).cast("long").alias("d1"),
            F.sum(F.col("g1") * (1 - F.col("churn")))
            .cast("long")
            .alias("c1"),
            F.sum((1 - F.col("g1")) * F.col("churn"))
            .cast("long")
            .alias("d2"),
            F.sum((1 - F.col("g1")) * (1 - F.col("churn")))
            .cast("long")
            .alias("c2"),
        )
        return temporal.logrank_test(steps)


_register_batch2()


def _register_batch3():
    """Batch 3: KMV sketch set operations — the mergeable-summary
    answer to 'how many users do these two event streams share?'
    without an exact distinct-set join, audited in-plan against the
    exact counts."""
    from politicamente_etl_spark.operators import agg
    from politicamente_etl_spark.plans.catalog import load_events, register

    @register(
        "kmv_set_ops_users",
        sql="""
        WITH h AS (
            SELECT DISTINCT event_type AS g,
                   CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
                        AS BIGINT) AS hv
            FROM events
        ), sk AS (
            SELECT g, hv FROM (
                SELECT g, hv,
                       row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
                FROM h
            ) WHERE rn <= 64
        ), pairs AS (
            SELECT a.g AS g_a, b.g AS g_b
            FROM (SELECT DISTINCT g FROM sk) a,
                 (SELECT DISTINCT g FROM sk) b
            WHERE a.g < b.g
        ), u AS (
            SELECT g_a, g_b, hv,
                   MAX(in_a) AS in_a, MAX(in_b) AS in_b
            FROM (
                SELECT p.g_a, p.g_b, s.hv, 1 AS in_a, 0 AS in_b
                FROM pairs p JOIN sk s ON s.g = p.g_a
                UNION ALL
                SELECT p.g_a, p.g_b, s.hv, 0 AS in_a, 1 AS in_b
                FROM pairs p JOIN sk s ON s.g = p.g_b
            ) GROUP BY 1, 2, 3
        ), kept AS (
            SELECT g_a, g_b, hv, in_a, in_b FROM (
                SELECT *, row_number() OVER (PARTITION BY g_a, g_b
                                             ORDER BY hv) AS rn
                FROM u
            ) WHERE rn <= 64
        ), est AS (
            SELECT g_a, g_b,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(MAX(hv) AS BIGINT) AS kth_hash,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS k_inter
            FROM kept GROUP BY 1, 2
        ), est2 AS (
            SELECT g_a, g_b, n_kept, kth_hash, k_inter,
                   CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                        ELSE CAST(63 AS DOUBLE)
                             * CAST(281474976710656 AS DOUBLE)
                             / CAST(kth_hash AS DOUBLE)
                   END AS est_union
            FROM est
        ), e AS (
            SELECT DISTINCT event_type AS g, user_id FROM events
        ), cnt AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1
        ), tin AS (
            SELECT x.g AS g_a, y.g AS g_b, CAST(COUNT(*) AS BIGINT)
                       AS true_inter
            FROM e x JOIN e y ON x.user_id = y.user_id AND x.g < y.g
            GROUP BY 1, 2
        )
        SELECT est2.g_a, est2.g_b, n_kept, kth_hash, k_inter, est_union,
               CAST(k_inter AS DOUBLE) * est_union
                   / CAST(n_kept AS DOUBLE) AS est_inter,
               CAST(ca.n + cb.n - COALESCE(tin.true_inter, 0) AS BIGINT)
                   AS true_union,
               CAST(COALESCE(tin.true_inter, 0) AS BIGINT) AS true_inter
        FROM est2
        JOIN cnt ca ON ca.g = est2.g_a
        JOIN cnt cb ON cb.g = est2.g_b
        LEFT JOIN tin ON tin.g_a = est2.g_a AND tin.g_b = est2.g_b
        """,
        tags=("ext-approx", "ext-stats", "ext-events"),
    )
    def q_kmv_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Union/intersection cardinality estimates between every pair
        of event types' distinct-user sets from k=64 KMV sketches
        (`agg.kmv_set_ops`) — sketch merge + re-rank + cut, so each
        pairwise estimate is arithmetic over ≤ 2k rows instead of a
        distinct-set join; audited in-plan against exact
        COUNT(DISTINCT) truth (the per-user type fan-out is bounded by
        the type vocabulary, so the exact audit join is linear too)."""
        ev = load_events(spark, sf_dir)
        ops = agg.kmv_set_ops(ev, "event_type", "user_id", k=64)
        e = ev.select(F.col("event_type").alias("g"), "user_id").distinct()
        cnt = e.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
        ex = e.select(F.col("g").alias("xg"), "user_id")
        ey = e.select(F.col("g").alias("yg"), "user_id")
        tin = (
            ex.join(ey, "user_id")
            .filter(F.col("xg") < F.col("yg"))
            .groupBy(F.col("xg").alias("g_a"), F.col("yg").alias("g_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("true_inter"))
        )
        ca = cnt.select(F.col("g").alias("g_a"), F.col("n").alias("n_a"))
        cb = cnt.select(F.col("g").alias("g_b"), F.col("n").alias("n_b"))
        return (
            ops.join(F.broadcast(ca), "g_a")
            .join(F.broadcast(cb), "g_b")
            .join(F.broadcast(tin), ["g_a", "g_b"], "left")
            .select(
                "g_a",
                "g_b",
                "n_kept",
                "kth_hash",
                "k_inter",
                "est_union",
                "est_inter",
                (
                    F.col("n_a")
                    + F.col("n_b")
                    - F.coalesce(F.col("true_inter"), F.lit(0))
                )
                .cast("long")
                .alias("true_union"),
                F.coalesce(F.col("true_inter"), F.lit(0))
                .cast("long")
                .alias("true_inter"),
            )
        )


_register_batch3()


def _register_batch4():
    """Batch 4: flat retrieval-eval report — MRR + precision@k +
    recall@k of the hyperplane-LSH index against the exact-cosine
    relevant set, completing the graded NDCG / RBO evals with the
    binary-relevance classics."""
    from politicamente_etl_spark.operators import sim
    from politicamente_etl_spark.plans.catalog import T, register
    from politicamente_etl_spark.plans.extended_r6b import (
        _DOT_DD,
        _NORM_DD,
        _sql_bucket,
        _TOPK_PLANES,
    )

    _REL_K = 5  # relevant set = exact top-5
    _RET_K = 10  # retrieved list = approx top-10

    @register(
        "retrieval_mrr_report",
        sql=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS q_vec
            FROM embeddings WHERE vec_id < 8
        ), ex_scored AS (
            SELECT q.query_id, e.vec_id,
                   {_DOT_DD.format(a='e.embedding', b='q.q_vec')}
                   / ({_NORM_DD.format(a='e.embedding')}
                      * {_NORM_DD.format(a='q.q_vec')}) AS cos_sim
            FROM embeddings e CROSS JOIN q
        ), rel AS (
            SELECT query_id, vec_id
            FROM ex_scored
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) <= {_REL_K}
        ), sigc AS (
            SELECT vec_id, embedding,
                   {_sql_bucket('embedding', _TOPK_PLANES)} AS bucket,
                   {_NORM_DD.format(a='embedding')} AS nrm
            FROM embeddings
        ), sigq AS (
            SELECT vec_id AS query_id, embedding AS q_vec, bucket,
                   nrm AS q_nrm
            FROM sigc WHERE vec_id < 8
        ), l_scored AS (
            SELECT q.query_id, c.vec_id,
                   {_DOT_DD.format(a='c.embedding', b='q.q_vec')}
                       / (c.nrm * q.q_nrm) AS cos_sim
            FROM sigc c JOIN sigq q USING (bucket)
        ), approx AS (
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
            FROM l_scored
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) <= {_RET_K}
        )
        SELECT a.query_id,
               CAST({_REL_K} AS BIGINT) AS n_rel,
               CAST(COUNT(rel.vec_id) AS BIGINT) AS n_hits,
               CAST(COUNT(rel.vec_id) * 1000 // {_RET_K} AS BIGINT)
                   AS p_at_k_milli,
               CAST(COUNT(rel.vec_id) * 1000 // {_REL_K} AS BIGINT)
                   AS r_at_k_milli,
               CAST(COALESCE(MIN(CASE WHEN rel.vec_id IS NOT NULL
                                       THEN a.rank END), 0) AS BIGINT)
                   AS first_rank,
               CAST(COALESCE(1000 // MIN(CASE WHEN rel.vec_id IS NOT NULL
                                              THEN a.rank END), 0)
                    AS BIGINT) AS rr_milli
        FROM approx a
        LEFT JOIN rel
          ON rel.query_id = a.query_id AND rel.vec_id = a.vec_id
        GROUP BY a.query_id
        """,
        tags=("ext-sim", "ext-quality"),
    )
    def q_retrieval_mrr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Binary-relevance retrieval eval of the LSH index: per query,
        hits of the exact-cosine top-5 relevant set inside the approx
        top-10, precision@10, recall@5 and the reciprocal rank of the
        FIRST relevant hit (all floored milli — MRR is the mean of
        rr_milli downstream). Same shared seeded-hyperplane index as
        ndcg_ann_eval; both sides of every metric are integer counts
        over the ≤ k·|queries| joined lists, so the eval is exact and
        corpus-size-independent once the two top-k's are built."""
        emb = T(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 8)
        rel = sim.cosine_topk(emb, queries, k=_REL_K).select(
            "query_id", "vec_id", F.lit(1).alias("is_rel")
        )
        approx = sim.cosine_topk_lsh(
            emb, queries, _TOPK_PLANES, k=_RET_K
        ).select("query_id", "vec_id", "rank")
        return (
            approx.join(rel, ["query_id", "vec_id"], "left")
            .groupBy("query_id")
            .agg(
                F.lit(_REL_K).cast("long").alias("n_rel"),
                F.count("is_rel").cast("long").alias("n_hits"),
                F.expr(f"CAST(count(is_rel) * 1000 DIV {_RET_K} AS BIGINT)")
                .alias("p_at_k_milli"),
                F.expr(f"CAST(count(is_rel) * 1000 DIV {_REL_K} AS BIGINT)")
                .alias("r_at_k_milli"),
                F.coalesce(
                    F.min(F.when(F.col("is_rel") == 1, F.col("rank"))),
                    F.lit(0),
                )
                .cast("long")
                .alias("first_rank"),
                F.coalesce(
                    F.expr(
                        "1000 DIV min(CASE WHEN is_rel = 1 THEN rank END)"
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("rr_milli"),
            )
        )


_register_batch4()


def _register_batch5():
    """Batch 5: streaming two-sided CUSUM — the online anomaly detector
    maintained in GroupState across time-ordered micro-batches, proven
    equal to the batch fold by a recursive-CTE oracle."""
    from politicamente_etl_spark.plans.catalog import register

    _NH = "greatest(0, r.s_hi + s.v - r.base - 50000)"
    _NL = "greatest(0, r.s_lo + r.base - 50000 - s.v)"

    @register(
        "streaming_cusum_user_alerts",
        sql=f"""
        WITH RECURSIVE s AS (
            SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS v,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_obs
            FROM events
        ), rec AS (
            SELECT user_id, n_obs, 1 AS i, v AS base,
                   CAST(0 AS BIGINT) AS s_hi, CAST(0 AS BIGINT) AS s_lo,
                   CAST(0 AS BIGINT) AS alarms
            FROM s WHERE rn = 1
            UNION ALL
            SELECT r.user_id, r.n_obs, r.i + 1, r.base,
                   CAST(CASE WHEN {_NH} > 400000 THEN 0
                             ELSE {_NH} END AS BIGINT),
                   CAST(CASE WHEN {_NL} > 400000 THEN 0
                             ELSE {_NL} END AS BIGINT),
                   CAST(r.alarms
                        + CASE WHEN {_NH} > 400000 THEN 1 ELSE 0 END
                        + CASE WHEN {_NL} > 400000 THEN 1 ELSE 0 END
                        AS BIGINT)
            FROM rec r JOIN s ON s.user_id = r.user_id AND s.rn = r.i + 1
        )
        SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs,
               CAST(base AS BIGINT) AS base,
               CAST(s_hi AS BIGINT) AS s_hi, CAST(s_lo AS BIGINT) AS s_lo,
               CAST(alarms AS BIGINT) AS n_alarms
        FROM rec WHERE i = n_obs
        """,
        tags=("ext-stream", "ext-stats", "ext-temporal"),
    )
    def q_streaming_cusum_user_alerts(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-user two-sided CUSUM drift detector maintained INSIDE
        the stream (`streaming.windows.stateful_cusum_user_value`,
        slack 50 in milli-value units, threshold 400,
        restart-after-signal): accumulators and the alarm count ride
        explicit GroupState across two time-ordered micro-batches, and
        the final state per user (max n_obs over update emissions) must
        equal the batch fold the recursive oracle replays — the online
        complement of revenue_changepoint_cusum's offline argmax."""
        from politicamente_etl_spark.streaming import windows as W

        out = W.run_stream_to_table(
            W.stateful_cusum_user_value(
                W.stream_events_time_halves(spark, sf_dir)
            ),
            mode="update",
        )
        return (
            out.groupBy("user_id")
            .agg(
                F.max(
                    F.struct("n_obs", "base", "s_hi", "s_lo", "n_alarms")
                ).alias("m")
            )
            .select(
                "user_id",
                F.col("m.n_obs").alias("n_obs"),
                F.col("m.base").alias("base"),
                F.col("m.s_hi").alias("s_hi"),
                F.col("m.s_lo").alias("s_lo"),
                F.col("m.n_alarms").alias("n_alarms"),
            )
        )


_register_batch5()


def _register_batch6():
    """Batch 6: optimistic-concurrency conflict detection on the txlog
    table format — two writers race a merge, the stale one gets
    CommitConflict (NOT a silent lost update), retries against the new
    head, and both updates survive."""
    import os
    import tempfile

    from politicamente_etl_spark.functions.scalar import (
        money_sum,
        sql_money_sum,
    )
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_concurrent_writers_audit",
        sql=f"""
        WITH sub AS (
            SELECT * FROM orders WHERE o_orderkey % 97 = 0
        ), fin AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus
                        WHEN o_orderkey % 2 = 0 THEN 'XX'
                        ELSE o_orderstatus END AS status,
                   CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                        ELSE o_totalprice END AS price
            FROM sub
        )
        SELECT CAST(3 AS BIGINT) AS final_version,
               CAST(1 AS BIGINT) AS conflicts_seen,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN status = 'XX' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_status_a,
               {sql_money_sum('price', 'total_price')}
        FROM fin
        """,
        tags=("ext-sink",),
    )
    def q_txlog_concurrent_writers_audit(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Two-writer OCC race on one txlog table, deterministically
        interleaved via merge's explicit transaction read version:
        writer A merges a status update (keys % 2 == 0) against v1 and
        commits v2; writer B prepared its price-bump merge (keys
        % 3 == 0) against the SAME v1 — its commit claim on v2 MUST
        fail with CommitConflict (the lost-update guard: without it,
        B's rewrite of A's files would silently erase A's update).
        B retries against the new head and lands v3. The oracle derives
        the final table from the race semantics: B's whole-row upsert
        wins overlapping keys (% 6 == 0) because its batch was built
        from the original rows — so a green row proves conflict
        detection fired exactly once AND both surviving updates read
        back. The audit emits (final_version, conflicts_seen) from
        actual behavior; any silent-clobber regression hash-mismatches."""
        from politicamente_etl_spark.sources.txlog import (
            CommitConflict,
            TxLogTable,
        )

        o = T(spark, sf_dir, "orders")
        sub = o.filter(F.col("o_orderkey") % 97 == 0)
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_occ_"), "t")
        t_a = TxLogTable.create(spark, path, sub)  # v1
        t_b = TxLogTable(spark, path)  # second writer handle
        batch_a = sub.filter(F.col("o_orderkey") % 2 == 0).withColumn(
            "o_orderstatus", F.lit("XX")
        )
        batch_b = sub.filter(F.col("o_orderkey") % 3 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
        )
        t_a.merge(batch_a, ["o_orderkey"])  # v2, read from v1
        conflicts = 0
        try:
            # B planned against v1 — stale by the time it commits
            t_b.merge(batch_b, ["o_orderkey"], read_version=1)
        except CommitConflict:
            conflicts += 1
            t_b.merge(batch_b, ["o_orderkey"])  # rebase on v2 → v3
        final = TxLogTable(spark, path)
        snap = final.snapshot()
        return snap.agg(
            F.lit(final.latest_version()).cast("long").alias("final_version"),
            F.lit(conflicts).cast("long").alias("conflicts_seen"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum((F.col("o_orderstatus") == "XX").cast("long"))
            .cast("long")
            .alias("n_status_a"),
            money_sum("o_totalprice", "total_price"),
        )


_register_batch6()


def _register_batch7():
    """Batch 7: product-analytics stickiness (DAU/MAU) and
    Neyman-optimal stratified sample allocation (exact integer
    square roots via the float-sqrt ±1 fixup)."""
    from politicamente_etl_spark.plans.catalog import (
        T,
        load_events,
        register,
    )

    @register(
        "dau_mau_stickiness",
        sql="""
        WITH d AS (
            SELECT CAST(strftime(ts, '%Y%m') AS BIGINT) AS ym,
                   CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   user_id
            FROM events
        ), dau AS (
            SELECT ym, day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
            FROM d GROUP BY 1, 2
        ), mau AS (
            SELECT ym, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
            FROM d GROUP BY 1
        ), s AS (
            SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(dau) AS BIGINT) AS dau_sum
            FROM dau GROUP BY 1
        )
        SELECT s.ym, s.n_days, s.dau_sum, mau.mau,
               CAST(s.dau_sum * 1000000 // (s.n_days * mau.mau) AS BIGINT)
                   AS stickiness_ppm
        FROM s JOIN mau USING (ym)
        """,
        tags=("ext-events", "ext-temporal"),
    )
    def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
        """DAU/MAU stickiness per calendar month — mean daily active
        over monthly active in ppm, the engagement ratio product teams
        track (1e6 = every monthly user active every observed day).
        Two distinct-aggregates; the day axis is bounded by the
        calendar so everything after the (month, day, user) distinct
        is grid-sized. UTC day/month boundaries on both engines."""
        ev = load_events(spark, sf_dir)
        d = ev.select(
            F.date_format("ts", "yyyyMM").cast("long").alias("ym"),
            F.expr("unix_micros(ts) div 86400000000")
            .cast("long")
            .alias("day"),
            "user_id",
        )
        dau = d.groupBy("ym", "day").agg(
            F.count_distinct("user_id").cast("long").alias("dau")
        )
        mau = d.groupBy("ym").agg(
            F.count_distinct("user_id").cast("long").alias("mau")
        )
        s = dau.groupBy("ym").agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("dau").cast("long").alias("dau_sum"),
        )
        return s.join(F.broadcast(mau), "ym").select(
            "ym",
            "n_days",
            "dau_sum",
            "mau",
            F.expr("dau_sum * 1000000 DIV (n_days * mau)")
            .cast("long")
            .alias("stickiness_ppm"),
        )

    # exact integer square root: float sqrt then a ±1 fixup — exact
    # while the float sqrt lands within ±1 of the truth (x ≲ 2⁵²;
    # document-count variance numerators are far inside that)
    _ISQRT = (
        "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        " - CASE WHEN CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          > ({x}) THEN 1 ELSE 0 END"
        " + CASE WHEN (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          <= ({x}) THEN 1 ELSE 0 END)"
    )

    @register(
        "neyman_allocation_plan",
        sql=f"""
        WITH x AS (
            SELECT source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS v
            FROM documents
        ), st AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_h,
                   CAST(SUM(v) AS BIGINT) AS sx,
                   CAST(SUM(v * v) AS BIGINT) AS sxx
            FROM x GROUP BY 1
        ), w AS (
            SELECT source, n_h,
                   CAST(n_h * sxx - sx * sx AS BIGINT) AS var_num,
                   {_ISQRT.format(x="n_h * sxx - sx * sx")} AS w_h
            FROM st
        ), tot AS (
            SELECT CAST(SUM(w_h) AS BIGINT) AS w_sum FROM w
        )
        SELECT w.source, w.n_h, w.var_num, CAST(w.w_h AS BIGINT) AS w_h,
               CAST(w.w_h * 1000000 // tot.w_sum AS BIGINT) AS alloc_ppm,
               CAST(w.w_h * 1000 // tot.w_sum AS BIGINT) AS n_alloc_of_1000
        FROM w, tot
        """,
        tags=("ext-sampling", "ext-stats", "ext-docs"),
    )
    def q_neyman_allocation_plan(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Neyman-optimal stratified sampling allocation over sources:
        n_h ∝ N_h·S_h minimizes the stratified estimator's variance at
        fixed budget (Neyman 1934). N_h·S_h = √(N_h·Σx² − (Σx)²)
        exactly — the integer variance NUMERATOR under the radical, so
        one exact isqrt (float sqrt + ±1 fixup, identical on both
        engines) replaces any floating σ chain; shares and a
        1000-sample plan in floored ppm/counts. One stats pass over the
        corpus, then arithmetic on the |sources| summary."""
        docs = T(spark, sf_dir, "documents").select(
            "source",
            F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("v"),
        )
        st = docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            F.sum("v").cast("long").alias("sx"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("sxx"),
        )
        isqrt = _ISQRT.replace("//", "DIV")
        w = st.select(
            "source",
            "n_h",
            F.expr("CAST(n_h * sxx - sx * sx AS BIGINT)").alias("var_num"),
            F.expr(isqrt.format(x="n_h * sxx - sx * sx"))
            .cast("long")
            .alias("w_h"),
        )
        tot = w.agg(F.sum("w_h").cast("long").alias("w_sum"))
        return w.join(F.broadcast(tot)).select(
            "source",
            "n_h",
            "var_num",
            "w_h",
            F.expr("w_h * 1000000 DIV w_sum").cast("long").alias("alloc_ppm"),
            F.expr("w_h * 1000 DIV w_sum")
            .cast("long")
            .alias("n_alloc_of_1000"),
        )


_register_batch7()


def _register_batch8():
    """Batch 8: Murphy decomposition of the Brier score for the
    isotonic-calibrated gate — REL/RES/UNC plus the direct Brier and
    the in-plan identity-gap audit."""
    from politicamente_etl_spark.operators import stats, text
    from politicamente_etl_spark.plans.catalog import T, register
    from politicamente_etl_spark.plans.extended_r8 import (
        _classifier_scored_cte,
    )

    @register(
        "brier_decomposition_gate",
        sql=_classifier_scored_cte()
        + """, j AS (
            SELECT logits.logit AS s, truth.label AS y
            FROM logits JOIN truth USING (doc_id)
        ), rng AS (
            SELECT MIN(s) AS smin, MAX(s) AS smax FROM j
        ), bins AS (
            SELECT CAST(((s - smin) * 10) // (smax - smin + 1) AS BIGINT)
                       AS bin,
                   CAST(COUNT(*) AS BIGINT) AS nk,
                   CAST(SUM(y) AS BIGINT) AS pk
            FROM j, rng GROUP BY 1
        ), iv AS (
            SELECT jj.bin AS j, kk.bin AS k,
                   CAST(SUM(b.pk) AS BIGINT) AS p,
                   CAST(SUM(b.nk) AS BIGINT) AS q
            FROM bins jj
            JOIN bins kk ON jj.bin <= kk.bin
            JOIN bins b ON b.bin BETWEEN jj.bin AND kk.bin
            GROUP BY 1, 2
        ), inner_ AS (
            SELECT j, MIN(p * 1000000 // q) AS lo FROM iv GROUP BY j
        ), iso AS (
            SELECT bins.bin, bins.nk, bins.pk,
                   CAST(MAX(inner_.lo) AS BIGINT) AS fp
            FROM bins JOIN inner_ ON inner_.j <= bins.bin
            GROUP BY 1, 2, 3
        ), tot AS (
            SELECT CAST(SUM(nk) AS BIGINT) AS n,
                   CAST(SUM(pk) AS BIGINT) AS p
            FROM iso
        ), terms AS (
            SELECT
                CAST(SUM((CAST(fp AS HUGEINT) * nk - 1000000
                          * CAST(pk AS HUGEINT))
                         * (CAST(fp AS HUGEINT) * nk - 1000000
                            * CAST(pk AS HUGEINT)) // nk)
                     AS HUGEINT) AS rel_sum,
                CAST(SUM((CAST(pk AS HUGEINT) * tot.n
                          - CAST(tot.p AS HUGEINT) * nk)
                         * (CAST(pk AS HUGEINT) * tot.n
                            - CAST(tot.p AS HUGEINT) * nk)
                         * 1000000000000
                         // (CAST(nk AS HUGEINT) * tot.n * tot.n))
                     AS HUGEINT) AS res_sum,
                CAST(SUM(CAST(nk AS HUGEINT) * fp * fp
                         - 2000000 * CAST(fp AS HUGEINT) * pk
                         + 1000000000000 * CAST(pk AS HUGEINT))
                     AS HUGEINT) AS direct_sum
            FROM iso CROSS JOIN tot
            GROUP BY tot.n, tot.p
        )
        SELECT tot.n, tot.p AS n_pos,
               CAST(rel_sum // tot.n AS BIGINT) AS rel_pp2,
               CAST(res_sum // tot.n AS BIGINT) AS res_pp2,
               CAST(CAST(tot.p AS HUGEINT) * (tot.n - tot.p)
                    * 1000000000000
                    // (CAST(tot.n AS HUGEINT) * tot.n) AS BIGINT)
                   AS unc_pp2,
               CAST(direct_sum // tot.n AS BIGINT) AS brier_pp2,
               CAST(direct_sum // tot.n
                    - (rel_sum // tot.n - res_sum // tot.n
                       + CAST(tot.p AS HUGEINT) * (tot.n - tot.p)
                         * 1000000000000
                         // (CAST(tot.n AS HUGEINT) * tot.n))
                    AS BIGINT) AS identity_gap_pp2
        FROM terms, tot
        """,
        tags=("ext-stats", "ext-text", "ext-docs"),
    )
    def q_brier_decomposition_gate(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Brier-score decomposition (Murphy 1973) of the
        isotonic-calibrated quality gate: reliability (how far the
        calibrated forecast still sits from per-bin outcomes — small by
        construction, nonzero from PAV pooling), resolution (how much
        the bins separate the base rate) and uncertainty, plus the
        directly-computed Brier and the in-plan identity-gap audit.
        Composes calibration_bins → isotonic_calibration →
        brier_decomposition; after the one-pass binning everything is
        10-row grid arithmetic."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        w = text.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
        logit = text.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        ).select("doc_id", F.col("logit_micro").alias("s"))
        truth = docs.select(
            "doc_id",
            (
                F.expr(
                    "(size(array_distinct(split(text, ' '))) * 1000)"
                    " div size(split(text, ' '))"
                )
                >= 800
            )
            .cast("int")
            .alias("y"),
        )
        bins = stats.calibration_bins(
            logit.join(truth, "doc_id"), score_col="s", label_col="y"
        )
        iso = stats.isotonic_calibration(bins)
        return stats.brier_decomposition(iso)


_register_batch8()


def _register_batch9():
    """Batch 9: weighted single-source shortest paths (Bellman-Ford
    min-plus sweeps) over the co-purchase graph with 1000/support edge
    weights — the weighted sibling of bfs_hop_histogram."""
    from politicamente_etl_spark.operators import graph
    from politicamente_etl_spark.operators.sampling import (
        hash_bucket,
        sql_hash_bucket,
    )
    from politicamente_etl_spark.plans.catalog import T, register

    _seed_sql = sql_hash_bucket("p_partkey", seed="bfs-v1", n_buckets=50)
    _W_EDGE_SQL = """li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), we AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                   CAST(1000 // COUNT(*) AS BIGINT) AS w
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        )"""
    _SWEEP = """, d{i} AS (
            SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d{p}
                UNION ALL
                SELECT und.d AS node, d{p}.dist + und.w FROM und
                JOIN d{p} ON und.s = d{p}.node
            ) GROUP BY node
        )"""

    @register(
        "sssp_weighted_histogram",
        sql=f"""
        WITH {_W_EDGE_SQL}, und AS (
            SELECT pa AS s, pb AS d, w FROM we
            UNION ALL SELECT pb AS s, pa AS d, w FROM we
        ), d0 AS (
            SELECT p_partkey AS node, CAST(0 AS BIGINT) AS dist
            FROM part WHERE {_seed_sql} = 0
        ){"".join(_SWEEP.format(i=i, p=i - 1) for i in range(1, 5))}
        SELECT CAST(dist // 100 AS BIGINT) AS dist_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(node) AS BIGINT) AS sum_nodes,
               CAST(SUM(dist) AS BIGINT) AS sum_dist
        FROM d4 GROUP BY 1
        """,
        tags=("ext-graph", "ext-rel"),
    )
    def q_sssp_weighted_histogram(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Weighted shortest-path distances from the same ~2% part seed
        set as bfs_hop_histogram, with edge weight 1000/support (strong
        co-purchase ties are short) — 4 Bellman-Ford min-plus sweeps
        (`graph.bellman_ford_distances`), reported as a 0.1-weight-unit
        distance histogram with node-id and distance sums as witnesses.
        Same one-join-plus-min-merge sweep shape and per-sweep lineage
        cuts as BFS; the oracle unrolls the sweeps."""
        li = (
            T(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        # r9 opt: one-shuffle pair builder; identical support-2 edges.
        we = (
            graph.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
            .filter(F.col("cnt") >= 2)
            .select(
                "pa", "pb", F.expr("1000 div cnt").cast("long").alias("w")
            )
        )
        seeds = (
            T(spark, sf_dir, "part")
            .filter(hash_bucket("p_partkey", seed="bfs-v1", n_buckets=50) == 0)
            .select("p_partkey")
        )
        dist = graph.bellman_ford_distances(
            we, seeds, max_sweeps=4, src="pa", dst="pb"
        )
        return dist.groupBy(
            F.expr("dist div 100").cast("long").alias("dist_bucket")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("node").cast("long").alias("sum_nodes"),
            F.sum("dist").cast("long").alias("sum_dist"),
        )


_register_batch9()


def _register_batch10():
    """Batch 10: corpus-mix diversity (inverse Simpson over the
    language mix per source — concentration_report reused with unit
    weights) and Jensen-Shannon divergence between languages'
    char-bigram distributions (the SYMMETRIC, always-finite drift
    number next to the one-sided KL)."""
    from politicamente_etl_spark.operators import stats
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "source_lang_diversity",
        sql="""
        WITH per AS (
            SELECT source AS g, lang AS e, CAST(COUNT(*) AS BIGINT) AS x
            FROM documents GROUP BY 1, 2
        ), tot AS (
            SELECT g, CAST(SUM(x) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_entities,
                   CAST(MAX(x) AS BIGINT) AS x_top
            FROM per GROUP BY 1
        ), h AS (
            SELECT per.g, tot.n_entities, tot.total, tot.x_top,
                   CAST(SUM(CAST(x AS HUGEINT) * x * 1000000
                            // (CAST(total AS HUGEINT) * total))
                        AS BIGINT) AS hhi_ppm
            FROM per JOIN tot USING (g)
            GROUP BY 1, 2, 3, 4
        )
        SELECT g AS source, n_entities AS n_langs, total AS n_docs,
               hhi_ppm AS simpson_ppm,
               CAST(x_top * 1000000 // total AS BIGINT) AS top_share_ppm,
               CAST(1000000000 // hhi_ppm AS BIGINT) AS eff_langs_milli
        FROM h
        """,
        tags=("ext-docs", "ext-stats"),
    )
    def q_source_lang_diversity(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Language-mix diversity per source: Simpson concentration
        λ = Σ share² (the unit-weight reuse of
        stats.concentration_report) and its inverse — the 'effective
        number of languages' in milli (1000 × 1/λ) that dataset cards
        report. One (source, lang) rollup; everything else grid-sized."""
        docs = T(spark, sf_dir, "documents").select(
            "source", "lang", F.lit(1).alias("one")
        )
        rep = stats.concentration_report(docs, "source", "lang", "one")
        return rep.select(
            F.col("g").alias("source"),
            F.col("n_entities").alias("n_langs"),
            F.col("total").alias("n_docs"),
            F.col("hhi_ppm").alias("simpson_ppm"),
            "top_share_ppm",
            F.expr("1000000000 DIV hhi_ppm")
            .cast("long")
            .alias("eff_langs_milli"),
        )

    _LN2 = (
        "CAST(round(ln(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE)) * 1e6)"
        " AS BIGINT)"
    )

    @register(
        "lang_char_js_divergence",
        sql=f"""
        WITH grams AS (
            SELECT lang, substr(text, i, 2) AS bg
            FROM documents,
                 UNNEST(generate_series(1, length(text) - 1)) AS u(i)
        ), c AS (
            SELECT lang, bg, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM grams GROUP BY 1, 2
        ), n AS (
            SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1
        ), pairs AS (
            SELECT a.lang AS lang_a, b.lang AS lang_b
            FROM n a, n b WHERE a.lang < b.lang
        ), m AS (
            SELECT p.lang_a, p.lang_b, g.bg,
                   COALESCE(ca.cnt, 0) AS c1, COALESCE(cb.cnt, 0) AS c2,
                   na.n AS n1, nb.n AS n2
            FROM pairs p
            JOIN (SELECT DISTINCT bg FROM c) g ON TRUE
            LEFT JOIN c ca ON ca.lang = p.lang_a AND ca.bg = g.bg
            LEFT JOIN c cb ON cb.lang = p.lang_b AND cb.bg = g.bg
            JOIN n na ON na.lang = p.lang_a
            JOIN n nb ON nb.lang = p.lang_b
        ), terms AS (
            SELECT lang_a, lang_b, n1, n2,
                   CASE WHEN c1 = 0 THEN 0 ELSE
                     (c1 * 1000000 // n1)
                     * ({_LN2.format(a="2 * c1", b="n2")}
                        - {_LN2.format(a="c1 * n2 + c2 * n1", b="1")})
                   END AS tp,
                   CASE WHEN c2 = 0 THEN 0 ELSE
                     (c2 * 1000000 // n2)
                     * ({_LN2.format(a="2 * c2", b="n1")}
                        - {_LN2.format(a="c1 * n2 + c2 * n1", b="1")})
                   END AS tq
            FROM m
        )
        SELECT lang_a, lang_b,
               CAST(MIN(n1) AS BIGINT) AS n_grams_a,
               CAST(MIN(n2) AS BIGINT) AS n_grams_b,
               CAST(((CAST(SUM(tp) AS HUGEINT) - ((CAST(SUM(tp) AS HUGEINT)
                       % 1000000) + 1000000) % 1000000) // 1000000
                     + (CAST(SUM(tq) AS HUGEINT) - ((CAST(SUM(tq) AS HUGEINT)
                        % 1000000) + 1000000) % 1000000) // 1000000) // 2
                    AS BIGINT) AS js_micro
        FROM terms GROUP BY 1, 2
        """,
        tags=("ext-text", "ext-stats", "ext-docs"),
    )
    def q_lang_char_js_divergence(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Jensen-Shannon divergence between each language pair's
        character-bigram distributions — the symmetric, always-finite
        (≤ ln 2) distribution distance for 'how different do these
        corpora LOOK at the byte level': JS = ½·KL(p‖m) + ½·KL(q‖m)
        with m the midpoint. Ratio logs as micro-nat-snapped
        ln((2·c₁·N₂)/(c₁·N₂+c₂·N₁)) over double-cast factor products
        (the PSI overflow rule); zero-count sides contribute 0 exactly.
        Corpus work is one (lang, bigram) aggregate; the pair expansion
        runs on the bounded bigram-vocabulary grid."""
        docs = T(spark, sf_dir, "documents").select("lang", "text")
        grams = docs.select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 1),"
                    " i -> substring(text, i, 2))"
                )
            ).alias("bg"),
        )
        c = grams.groupBy("lang", "bg").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        n = c.groupBy("lang").agg(F.sum("cnt").cast("long").alias("n"))
        na = n.select(F.col("lang").alias("lang_a"), F.col("n").alias("n1"))
        nb = n.select(F.col("lang").alias("lang_b"), F.col("n").alias("n2"))
        pairs = na.join(nb, F.col("lang_a") < F.col("lang_b"))
        vocab = c.select("bg").distinct()
        ca = c.select(
            F.col("lang").alias("lang_a"), "bg", F.col("cnt").alias("c1")
        )
        cb = c.select(
            F.col("lang").alias("lang_b"), "bg", F.col("cnt").alias("c2")
        )
        ln2 = (
            "CAST(round(ln(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE)) * 1e6)"
            " AS BIGINT)"
        )
        m = (
            pairs.join(F.broadcast(vocab))
            .join(ca, ["lang_a", "bg"], "left")
            .join(cb, ["lang_b", "bg"], "left")
            .fillna(0, ["c1", "c2"])
        )
        terms = m.select(
            "lang_a",
            "lang_b",
            "n1",
            "n2",
            F.when(F.col("c1") == 0, F.lit(0))
            .otherwise(
                F.expr("c1 * 1000000 DIV n1")
                * (
                    F.expr(ln2.format(a="2 * c1", b="n2"))
                    - F.expr(ln2.format(a="c1 * n2 + c2 * n1", b="1"))
                )
            )
            .alias("tp"),
            F.when(F.col("c2") == 0, F.lit(0))
            .otherwise(
                F.expr("c2 * 1000000 DIV n2")
                * (
                    F.expr(ln2.format(a="2 * c2", b="n1"))
                    - F.expr(ln2.format(a="c1 * n2 + c2 * n1", b="1"))
                )
            )
            .alias("tq"),
        )
        fd = "(({x}) - pmod({x}, 1000000)) DIV 1000000"
        return (
            terms.groupBy("lang_a", "lang_b")
            .agg(
                F.min("n1").cast("long").alias("n_grams_a"),
                F.min("n2").cast("long").alias("n_grams_b"),
                F.sum("tp").cast("decimal(38,0)").alias("sp"),
                F.sum("tq").cast("decimal(38,0)").alias("sq"),
            )
            .select(
                "lang_a",
                "lang_b",
                "n_grams_a",
                "n_grams_b",
                F.expr(
                    f"CAST(({fd.format(x='sp')} + {fd.format(x='sq')})"
                    " DIV 2 AS BIGINT)"
                ).alias("js_micro"),
            )
        )


_register_batch10()


def _register_batch11():
    """Batch 11: HITS hubs & authorities over the bipartite
    order→part purchase graph — which orders are broad baskets (hubs)
    and which parts anchor them (authorities)."""
    from pyspark.sql import Window

    from politicamente_etl_spark.operators import graph
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "hits_order_part_scores",
        sql="""
        WITH e AS (
            SELECT DISTINCT l_orderkey AS u, l_partkey AS p FROM lineitem
        ), h0 AS (
            SELECT DISTINCT u, CAST(1000 AS BIGINT) AS h FROM e
        ), a1r AS (
            SELECT p, CAST(SUM(h) AS BIGINT) AS a
            FROM e JOIN h0 USING (u) GROUP BY 1
        ), a1 AS (
            SELECT p, CAST(a * 1000 // (SELECT MAX(a) FROM a1r) AS BIGINT)
                       AS a
            FROM a1r
        ), h1r AS (
            SELECT u, CAST(SUM(a) AS BIGINT) AS h
            FROM e JOIN a1 USING (p) GROUP BY 1
        ), h1 AS (
            SELECT u, CAST(h * 1000 // (SELECT MAX(h) FROM h1r) AS BIGINT)
                       AS h
            FROM h1r
        ), a2r AS (
            SELECT p, CAST(SUM(h) AS BIGINT) AS a
            FROM e JOIN h1 USING (u) GROUP BY 1
        ), a2 AS (
            SELECT p, CAST(a * 1000 // (SELECT MAX(a) FROM a2r) AS BIGINT)
                       AS a
            FROM a2r
        ), h2r AS (
            SELECT u, CAST(SUM(a) AS BIGINT) AS h
            FROM e JOIN a2 USING (p) GROUP BY 1
        ), h2 AS (
            SELECT u, CAST(h * 1000 // (SELECT MAX(h) FROM h2r) AS BIGINT)
                       AS h
            FROM h2r
        )
        SELECT side, node, score FROM (
            SELECT 'hub' AS side, u AS node, h AS score,
                   row_number() OVER (ORDER BY h DESC, u) AS rn
            FROM h2
        ) WHERE rn <= 20
        UNION ALL
        SELECT side, node, score FROM (
            SELECT 'auth' AS side, p AS node, a AS score,
                   row_number() OVER (ORDER BY a DESC, p) AS rn
            FROM a2
        ) WHERE rn <= 20
        """,
        tags=("ext-graph", "ext-rel"),
    )
    def q_hits_order_part_scores(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """HITS (Kleinberg) on the bipartite order→part graph, 2 fixed
        rounds with integer max-normalization (`graph.hits_scores`):
        hub orders are broad baskets of authoritative parts; authority
        parts appear in the hubbiest baskets — the mutual-reinforcement
        ranking PageRank's single score can't express on a bipartite
        graph. Top-20 per side by (score, id); every half-step is one
        equi-join + partial agg + 1-row max broadcast."""
        li = T(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("u"), F.col("l_partkey").alias("p")
        )
        scores = graph.hits_scores(li, iters=2, src="u", dst="p")
        w = Window.partitionBy("side").orderBy(
            F.col("score").desc(), F.col("node")
        )
        return (
            scores.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20)
            .select("side", "node", "score")
        )


_register_batch11()


def _register_batch12():
    """Batch 12: zero-copy shallow clone + copy-on-write divergence
    proof on the txlog table format."""
    import glob as _glob
    import os
    import tempfile

    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_shallow_clone_proof",
        sql="""
        WITH sub AS (
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_orderkey % 5 = 0
        ), cl AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 10 = 0 THEN cents + 100000
                        ELSE cents END AS cents
            FROM sub
        )
        SELECT CAST(0 AS BIGINT) AS files_copied_at_clone,
               CAST((SELECT COUNT(*) FROM sub) AS BIGINT) AS src_rows,
               CAST((SELECT SUM(cents) FROM sub) AS BIGINT) AS src_cents,
               CAST((SELECT COUNT(*) FROM cl) AS BIGINT) AS clone_rows,
               CAST((SELECT SUM(cents) FROM cl) AS BIGINT) AS clone_cents
        """,
        tags=("ext-sink",),
    )
    def q_txlog_shallow_clone_proof(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Shallow clone end-to-end: create the source table, CLONE it
        with zero data movement (the audit counts parquet files under
        the clone's data root at clone time — must be 0: the clone's v1
        manifest only REFERENCES source files), then merge a $1000 bump
        (keys % 10 == 0) into the CLONE — copy-on-write stages the
        rewrite under the clone's root — and read BOTH tables back:
        the source must be byte-identical to pre-clone, the clone
        diverged. The oracle derives both relations from the operation
        definitions; the cheap-fork contract (dev tables, migration
        dry-runs over production data) is the row."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        sub = o.filter(F.col("o_orderkey") % 5 == 0)
        root = tempfile.mkdtemp(prefix="txlog_clone_")
        src = TxLogTable.create(spark, os.path.join(root, "src"), sub)
        clone = src.clone_shallow(os.path.join(root, "clone"))
        files_copied = len(
            _glob.glob(os.path.join(root, "clone", "data", "**", "*.parquet"),
                       recursive=True)
        )
        bump = sub.filter(F.col("o_orderkey") % 10 == 0).withColumn(
            "cents", F.col("cents") + F.lit(100_000)
        )
        clone.merge(bump, ["o_orderkey"])
        s = src.snapshot().agg(
            F.count("*").cast("long").alias("src_rows"),
            F.sum("cents").cast("long").alias("src_cents"),
        )
        c = clone.snapshot().agg(
            F.count("*").cast("long").alias("clone_rows"),
            F.sum("cents").cast("long").alias("clone_cents"),
        )
        return (
            s.join(c)
            .select(
                F.lit(files_copied).cast("long").alias(
                    "files_copied_at_clone"
                ),
                "src_rows",
                "src_cents",
                "clone_rows",
                "clone_cents",
            )
        )


_register_batch12()


def _register_batch13():
    """Batch 13: interval-union coverage (the no-self-join sweep) and
    aggregate view maintenance under DELETES (retraction rows — the
    signed-multiplicity half of IVM that insert-only deltas miss)."""
    from politicamente_etl_spark.operators import temporal
    from politicamente_etl_spark.plans.catalog import (
        T,
        load_events,
        register,
    )

    @register(
        "interval_union_coverage",
        sql="""
        WITH iv AS (
            SELECT user_id AS g,
                   CAST(epoch_us(ts) AS BIGINT) AS s,
                   CAST(epoch_us(ts) + 300000000 AS BIGINT) AS e
            FROM events
        ), marked AS (
            SELECT g, s, e,
                   MAX(e) OVER (PARTITION BY g ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS run_max
            FROM iv
        )
        SELECT g AS user_id,
               CAST(SUM(greatest(0, e - greatest(s, COALESCE(run_max, s))))
                    AS BIGINT) AS covered,
               CAST(SUM(CASE WHEN run_max IS NULL OR s > run_max
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_islands
        FROM marked GROUP BY 1
        """,
        tags=("ext-temporal", "ext-events", "ext-window"),
    )
    def q_interval_union_coverage(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-user activity coverage: each event opens a 5-minute
        presence interval; `temporal.interval_union_length` sweeps the
        union exactly (running-max window, no O(n²) overlap self-join)
        and reports covered microseconds + merged-session islands —
        the uptime/SLA-coverage primitive."""
        ev = load_events(spark, sf_dir)
        iv = ev.select(
            "user_id",
            F.expr("unix_micros(ts)").cast("long").alias("s"),
            F.expr("unix_micros(ts) + 300000000").cast("long").alias("e"),
        )
        return temporal.interval_union_length(iv, "user_id", "s", "e")

    @register(
        "ivm_agg_under_deletes",
        sql="""
        WITH base AS (
            SELECT o_orderkey, o_custkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_orderkey % 3 <> 2
        ), final AS (
            SELECT b.* FROM base b WHERE b.o_orderkey % 5 <> 0
            UNION ALL
            SELECT o_orderkey, o_custkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT)
            FROM orders WHERE o_orderkey % 3 = 2
        )
        SELECT n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS cents,
               CAST(0 AS BIGINT) AS n_mismatched_groups
        FROM final
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
        """,
        tags=("ext-rel", "ext-stream", "ext-sink"),
    )
    def q_ivm_agg_under_deletes(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Aggregate view maintenance under RETRACTIONS: the per-nation
        (count, cents) view absorbs a simultaneous delete batch
        (multiplicity −1 rows) and an insert batch (+1) as ONE signed
        delta aggregate merged into V₁ — groups never recompute from
        the fact table, and a group whose count retracts to zero drops
        out. The oracle recomputes the final state directly; the
        in-plan maintained-vs-direct mismatch count must be 0. This is
        the half of IVM `ivm_join_delta_proof` doesn't cover: deletes
        force signed multiplicities, not just new rows."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")

        def keyed(df):
            return (
                df.join(c, df.o_custkey == c.c_custkey)
                .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
                .select(
                    F.col("n_name").alias("nation"), "cents", F.col("mult")
                )
            )

        base = o.filter(F.col("o_orderkey") % 3 != 2)
        v1 = keyed(base.withColumn("mult", F.lit(1))).groupBy("nation").agg(
            F.sum("mult").cast("long").alias("n_orders"),
            F.sum(F.col("cents") * F.col("mult")).cast("long").alias("cents"),
        )
        dels = base.filter(F.col("o_orderkey") % 5 == 0).withColumn(
            "mult", F.lit(-1)
        )
        ins = o.filter(F.col("o_orderkey") % 3 == 2).withColumn(
            "mult", F.lit(1)
        )
        delta = (
            keyed(dels.unionByName(ins))
            .groupBy("nation")
            .agg(
                F.sum("mult").cast("long").alias("d_n"),
                F.sum(F.col("cents") * F.col("mult"))
                .cast("long")
                .alias("d_cents"),
            )
        )
        maintained = (
            v1.join(delta, "nation", "full")
            .select(
                "nation",
                (
                    F.coalesce(F.col("n_orders"), F.lit(0))
                    + F.coalesce(F.col("d_n"), F.lit(0))
                )
                .cast("long")
                .alias("n_orders"),
                (
                    F.coalesce(F.col("cents"), F.lit(0))
                    + F.coalesce(F.col("d_cents"), F.lit(0))
                )
                .cast("long")
                .alias("cents"),
            )
            .filter(F.col("n_orders") > 0)
        )
        direct = (
            keyed(
                base.filter(F.col("o_orderkey") % 5 != 0)
                .unionByName(o.filter(F.col("o_orderkey") % 3 == 2))
                .withColumn("mult", F.lit(1))
            )
            .groupBy("nation")
            .agg(
                F.sum("mult").cast("long").alias("n_orders_d"),
                F.sum(F.col("cents") * F.col("mult"))
                .cast("long")
                .alias("cents_d"),
            )
        )
        mismatch = (
            maintained.join(direct, "nation", "full")
            .filter(
                (F.col("n_orders") != F.col("n_orders_d"))
                | (F.col("cents") != F.col("cents_d"))
                | F.col("n_orders").isNull()
                | F.col("n_orders_d").isNull()
            )
            .agg(F.count(F.lit(1)).cast("long").alias("bad"))
        )
        return maintained.join(F.broadcast(mismatch)).select(
            "nation",
            "n_orders",
            "cents",
            F.col("bad").alias("n_mismatched_groups"),
        )


_register_batch13()
