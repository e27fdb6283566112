"""Round-8 batch C: k-group variance statistics (one-way ANOVA,
Brown-Forsythe Levene), a hash-randomization significance test, TOST
equivalence gating, JSONL quarantine, and sentence segmentation stats.
(Kruskal-Wallis already exists — extended_r9c.)

Float-determinism pattern introduced here: ORDER-PINNED REDUCTION.
A sum of k per-group double terms is order-sensitive in IEEE
arithmetic, and neither engine guarantees aggregation order — so
cross-group combinations fold a SORTED list (by group key) left to
right on both engines (Spark `aggregate(array_sort(collect_list(...)))`,
DuckDB `list_sum(list(... ORDER BY ...))` is order-guaranteed by the
ordered-aggregate clause). Group counts are tiny (k ≤ 25), so the fold
is driver-free aggregate-size work."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _seg_cents(spark, sf_dir, T, segs=None):
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    x = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    if segs:
        x = x.filter(F.col("seg").isin(*segs))
    return x


# the shared suffix of every ordered-fold: Spark side
def _ordered_sum(df: DataFrame, key: str, term, out: str) -> DataFrame:
    """SUM of a double `term` over rows, folded in `key` order — the
    order-pinned reduction both engines replay identically."""
    return df.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col(key).alias("k"), term.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias(out)
    )



def _f_stat_from_suff(g, F):
    """Assemble (n_total, k_groups, ssb, ssw, f_stat) from a per-group
    sufficient-statistics frame (seg, n, s, q) — shared by the ANOVA
    and Levene twins so their 'identical IEEE sequence' contract has
    exactly one implementation (review r8, second pass)."""
    between = _ordered_sum(
        g,
        "seg",
        F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double"),
        "between_raw",
    )
    qsum = _ordered_sum(g, "seg", F.col("q"), "q_sum")
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        F.count("*").cast("long").alias("k"),
    )
    t = tot.crossJoin(F.broadcast(between)).crossJoin(F.broadcast(qsum))
    nn_d = F.col("nn").cast("double")
    k_d = F.col("k").cast("double")
    ssb = F.col("between_raw") - F.col("ss").cast("double") * F.col(
        "ss"
    ).cast("double") / nn_d
    ssw = F.col("q_sum") - F.col("between_raw")
    return t, ssb, ssw, nn_d, k_d


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    # shared oracle CTE: per-segment sufficient statistics in exact ints
    _SUFF_CTE = """
        x AS (
            SELECT c_mktsegment AS seg,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), g AS (
            SELECT seg,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS q
            FROM x GROUP BY seg
        )
    """

    @register(
        "anova_oneway_segments",
        sql=f"""
        WITH {_SUFF_CTE},
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(s) AS BIGINT) AS ss,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   list_sum(list(
                       CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE) ORDER BY seg)) AS between_raw,
                   list_sum(list(q ORDER BY seg)) AS q_sum
            FROM g
        )
        SELECT nn AS n_total, k AS k_groups,
               between_raw - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                   / CAST(nn AS DOUBLE) AS ssb,
               q_sum - between_raw AS ssw,
               ((between_raw - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                     / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
               / ((q_sum - between_raw) / (CAST(nn AS DOUBLE)
                     - CAST(k AS DOUBLE))) AS f_stat
        FROM tot
        """,
        tags=("ext-stats",),
    )
    def q_anova_oneway_segments(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """One-way ANOVA F across the five segments from SUFFICIENT
        STATISTICS only (n, Σc, Σc² per group — the sums any
        distributed engine produces in one pass; Σc² in HUGEINT/decimal
        because squared cents overflow int64 at this row count). SSB
        and SSW derive from the order-pinned folds of the 5 per-group
        terms, so both engines execute the identical IEEE sequence.
        This is textbook map-side-only statistics: nothing beyond the
        5-row group table ever moves."""
        x = _seg_cents(spark, sf_dir, T)
        g = x.groupBy("seg").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.sum(
                (F.col("cents") * F.col("cents")).cast("decimal(38,0)")
            )
            .cast("double")
            .alias("q"),
        )
        t, ssb, ssw, nn_d, k_d = _f_stat_from_suff(g, F)
        return t.select(
            F.col("nn").alias("n_total"),
            F.col("k").alias("k_groups"),
            ssb.alias("ssb"),
            ssw.alias("ssw"),
            ((ssb / (k_d - 1.0)) / (ssw / (nn_d - k_d))).alias("f_stat"),
        )

    @register(
        "levene_brown_forsythe_segments",
        sql="""
        WITH x AS (
            SELECT c_mktsegment AS seg,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), med AS (
            SELECT seg, cents AS m
            FROM (
                SELECT seg, cents,
                       row_number() OVER (PARTITION BY seg
                           ORDER BY cents) AS rn,
                       COUNT(*) OVER (PARTITION BY seg) AS n
                FROM x
            ) WHERE rn = (n + 1) // 2
        ), d AS (
            SELECT x.seg, ABS(x.cents - med.m) AS ad
            FROM x JOIN med USING (seg)
        ), g AS (
            SELECT seg,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(ad) AS BIGINT) AS s,
                   CAST(SUM(CAST(ad AS HUGEINT) * ad) AS DOUBLE) AS q
            FROM d GROUP BY seg
        ), tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(s) AS BIGINT) AS ss,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   list_sum(list(
                       CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE) ORDER BY seg)) AS between_raw,
                   list_sum(list(q ORDER BY seg)) AS q_sum
            FROM g
        )
        SELECT nn AS n_total, k AS k_groups,
               ((between_raw - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                     / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
               / ((q_sum - between_raw) / (CAST(nn AS DOUBLE)
                     - CAST(k AS DOUBLE))) AS w_stat
        FROM tot
        """,
        tags=("ext-stats",),
    )
    def q_levene_brown_forsythe_segments(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Brown-Forsythe Levene test: are segment VARIANCES equal? (the
        assumption anova_oneway_segments leans on). Deviations are
        taken from the per-group LOWER MEDIAN (deterministic rank — the
        robust Brown-Forsythe variant, and the only median both engines
        replay exactly), then the one-way-ANOVA F machinery runs on the
        absolute deviations: same sufficient-statistic shape, same
        order-pinned folds. Medians are rank windows partitioned by
        segment — the partitioned-sort shape, never a global order."""
        x = _seg_cents(spark, sf_dir, T)
        wm = Window.partitionBy("seg").orderBy("cents")
        med = (
            x.withColumn("rn", F.row_number().over(wm))
            .withColumn(
                "n", F.count("*").over(Window.partitionBy("seg"))
            )
            .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
            .select("seg", F.col("cents").alias("m"))
        )
        d = x.join(F.broadcast(med), "seg").select(
            "seg", F.abs(F.col("cents") - F.col("m")).alias("ad")
        )
        g = d.groupBy("seg").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("ad").cast("long").alias("s"),
            F.sum((F.col("ad") * F.col("ad")).cast("decimal(38,0)"))
            .cast("double")
            .alias("q"),
        )
        t, ssb, ssw, nn_d, k_d = _f_stat_from_suff(g, F)
        return t.select(
            F.col("nn").alias("n_total"),
            F.col("k").alias("k_groups"),
            ((ssb / (k_d - 1.0)) / (ssw / (nn_d - k_d))).alias("w_stat"),
        )

    @register(
        "hash_randomization_test",
        sql="""
        WITH x AS (
            SELECT o_orderkey AS k,
                   c_mktsegment AS seg,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ), obs AS (
            SELECT
              CAST(SUM(CASE WHEN seg = 'BUILDING' THEN cents END) AS DOUBLE)
                / CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 END) AS DOUBLE)
              - CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN cents END)
                     AS DOUBLE)
                / CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN 1 END)
                       AS DOUBLE) AS d_obs,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM x
        ), reps AS (
            SELECT i,
              CAST(SUM(CASE WHEN flip THEN cents END) AS DOUBLE)
                / CAST(SUM(CASE WHEN flip THEN 1 END) AS DOUBLE)
              - CAST(SUM(CASE WHEN NOT flip THEN cents END) AS DOUBLE)
                / CAST(SUM(CASE WHEN NOT flip THEN 1 END) AS DOUBLE) AS d_i
            FROM (
                SELECT i, cents,
                       substr(md5(i || ':' || k), 1, 1) < '8' AS flip
                FROM x CROSS JOIN (SELECT unnest(range(1, 200)) AS i)
            ) GROUP BY i
        )
        SELECT (SELECT n FROM obs) AS n_rows,
               CAST(199 AS BIGINT) AS n_reps,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM reps
                WHERE ABS(d_i) >= ABS((SELECT d_obs FROM obs)))
                   AS n_exceed,
               CAST((1 + (SELECT COUNT(*) FROM reps
                          WHERE ABS(d_i) >= ABS((SELECT d_obs FROM obs))))
                    AS DOUBLE) / 200.0 AS p_value
        """,
        tags=("ext-stats", "ext-sampling"),
    )
    def q_hash_randomization_test(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Randomization (permutation-style) test WITHOUT randomness:
        199 pseudo-reassignments of rows to two groups via
        md5(rep_id : row_key) — deterministic, seedless, identical on
        every engine and every rerun (the repo's standing no-RNG rule
        applied to resampling inference, same family as
        bootstrap_replicate_totals). Each replicate's mean difference
        uses integer group sums (one division per side), so doubles
        come from identical op sequences; p = (1 + #exceed)/(B+1), the
        add-one convention. Embarrassingly parallel at 100 TB: the
        cross join with the 199-row replicate table is map-side (rows
        never shuffle by replicate; partial aggregation compresses to
        199×groups before the exchange)."""
        # the hash needs the row KEY, so build the slice with keys kept
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        c = T(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        x = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            .select(
                F.col("o_orderkey").alias("k"),
                F.col("c_mktsegment").alias("seg"),
                F.floor(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
        )
        obs = x.agg(
            (
                F.sum(F.when(F.col("seg") == "BUILDING", F.col("cents")))
                .cast("double")
                / F.sum(
                    F.when(F.col("seg") == "BUILDING", F.lit(1))
                ).cast("double")
                - F.sum(
                    F.when(F.col("seg") == "MACHINERY", F.col("cents"))
                ).cast("double")
                / F.sum(
                    F.when(F.col("seg") == "MACHINERY", F.lit(1))
                ).cast("double")
            ).alias("d_obs"),
            F.count("*").cast("long").alias("n"),
        )
        reps_tbl = spark.range(1, 200).select(F.col("id").alias("i"))
        flip = (
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("i").cast("string"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                1,
            )
            < "8"
        )
        reps = (
            x.crossJoin(F.broadcast(reps_tbl))
            .withColumn("flip", flip)
            .groupBy("i")
            .agg(
                (
                    F.sum(F.when(F.col("flip"), F.col("cents")))
                    .cast("double")
                    / F.sum(F.when(F.col("flip"), F.lit(1))).cast("double")
                    - F.sum(
                        F.when(~F.col("flip"), F.col("cents"))
                    ).cast("double")
                    / F.sum(F.when(~F.col("flip"), F.lit(1))).cast(
                        "double"
                    )
                ).alias("d_i")
            )
        )
        j = reps.crossJoin(F.broadcast(obs))
        exceed = j.agg(
            F.sum(
                (F.abs(F.col("d_i")) >= F.abs(F.col("d_obs"))).cast("long")
            )
            .cast("long")
            .alias("n_exceed")
        )
        return (
            obs.crossJoin(F.broadcast(exceed)).select(
                F.col("n").alias("n_rows"),
                F.lit(199).cast("long").alias("n_reps"),
                F.col("n_exceed"),
                (
                    (1 + F.col("n_exceed")).cast("double") / 200.0
                ).alias("p_value"),
            )
        )

    @register(
        "tost_equivalence_gate",
        sql="""
        WITH x AS (
            SELECT c_mktsegment AS seg,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ), g AS (
            SELECT seg,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS q
            FROM x GROUP BY seg
        ), p AS (
            SELECT
              (SELECT n FROM g WHERE seg = 'BUILDING') AS n1,
              (SELECT s FROM g WHERE seg = 'BUILDING') AS s1,
              (SELECT q FROM g WHERE seg = 'BUILDING') AS q1,
              (SELECT n FROM g WHERE seg = 'MACHINERY') AS n2,
              (SELECT s FROM g WHERE seg = 'MACHINERY') AS s2,
              (SELECT q FROM g WHERE seg = 'MACHINERY') AS q2
        ), z AS (
            SELECT n1, n2,
                   CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                   CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                   (q1 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
                       AS v1,
                   (q2 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                       / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)
                       AS v2
            FROM p
        )
        SELECT n1, n2, m1 - m2 AS diff,
               sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
                   AS se,
               ((m1 - m2) + 0.005 * (m1 + m2) / 2.0)
                   / sqrt(v1 / CAST(n1 AS DOUBLE)
                          + v2 / CAST(n2 AS DOUBLE)) > 1.645
               AND (0.005 * (m1 + m2) / 2.0 - (m1 - m2))
                   / sqrt(v1 / CAST(n1 AS DOUBLE)
                          + v2 / CAST(n2 AS DOUBLE)) > 1.645
                   AS equivalent
        FROM z
        """,
        tags=("ext-stats", "ext-quality"),
    )
    def q_tost_equivalence_gate(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """TOST (two one-sided tests) EQUIVALENCE gate: not "is B
        different from M" but "is B provably WITHIN ±0.5% of M" — the
        question release gates actually ask (a new data pipeline must
        match the old one; failing to reject difference is not
        evidence of equivalence). Both one-sided z-statistics come from
        per-group sufficient statistics (n, Σc, Σc² — Welch unpooled
        variances), every double from the identical op sequence on
        both engines, margin defined as a fraction of the pooled mean
        so the gate is scale-free. Large-sample z critical value
        (1.645) — at these n the t correction is < 1e-4."""
        x = _seg_cents(spark, sf_dir, T, segs=("BUILDING", "MACHINERY"))
        g = x.groupBy("seg").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
            .cast("double")
            .alias("q"),
        )
        b = g.filter(F.col("seg") == "BUILDING").select(
            F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("q").alias("q1")
        )
        m = g.filter(F.col("seg") == "MACHINERY").select(
            F.col("n").alias("n2"), F.col("s").alias("s2"), F.col("q").alias("q2")
        )
        p = b.crossJoin(F.broadcast(m))
        n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
        m1 = F.col("s1").cast("double") / n1d
        m2 = F.col("s2").cast("double") / n2d
        v1 = (
            F.col("q1") - F.col("s1").cast("double") * F.col("s1").cast("double") / n1d
        ) / (n1d - 1.0)
        v2 = (
            F.col("q2") - F.col("s2").cast("double") * F.col("s2").cast("double") / n2d
        ) / (n2d - 1.0)
        se = F.sqrt(v1 / n1d + v2 / n2d)
        margin = 0.005 * (m1 + m2) / 2.0
        diff = m1 - m2
        return p.select(
            "n1",
            "n2",
            diff.alias("diff"),
            se.alias("se"),
            (
                ((diff + margin) / se > 1.645)
                & ((margin - diff) / se > 1.645)
            ).alias("equivalent"),
        )

    @register(
        "jsonl_quarantine_report",
        sql="""
        WITH x AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS BIGINT) AS qty,
                   (l_orderkey * 3 + l_linenumber) % 17 = 0 AS corrupt
            FROM lineitem
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN corrupt THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_good,
               CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bad,
               CAST(SUM(CASE WHEN corrupt THEN 0 ELSE qty END) AS BIGINT)
                   AS qty_sum_good
        FROM x
        """,
        tags=("ext-source", "ext-quality"),
    )
    def q_jsonl_quarantine_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The JSONL twin of csv_quarantine_report: every 17th record is
        written TRUNCATED (unterminated JSON object), read back
        PERMISSIVE with `columnNameOfCorruptRecord` — structurally
        broken records quarantine instead of failing the job, clean
        aggregates stay uncontaminated, bad counts reconcile exactly.
        Together the two queries pin the malformed-input contract for
        both text formats the ingest path accepts."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        corrupt = (
            F.col("l_orderkey") * 3 + F.col("l_linenumber")
        ) % 17 == 0
        good_json = F.concat(
            F.lit('{"ok":'),
            F.col("l_orderkey").cast("string"),
            F.lit(',"ln":'),
            F.col("l_linenumber").cast("string"),
            F.lit(',"qty":'),
            F.col("qty").cast("string"),
            F.lit("}"),
        )
        bad_json = F.concat(
            F.lit('{"ok":'), F.col("l_orderkey").cast("string"), F.lit(',')
        )
        lines = li.select(
            F.when(corrupt, bad_json).otherwise(good_json).alias("value")
        )
        d = os.path.join(tempfile.mkdtemp(prefix="jsonl_quar_"), "rows")
        lines.write.mode("errorifexists").text(d)
        back = (
            spark.read.schema(
                "ok long, ln long, qty long, _quarantine string"
            )
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_quarantine")
            .json(d)
        )
        return back.agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.col("_quarantine").isNull().cast("long"))
            .cast("long")
            .alias("n_good"),
            F.sum(F.col("_quarantine").isNotNull().cast("long"))
            .cast("long")
            .alias("n_bad"),
            F.sum(
                F.when(
                    F.col("_quarantine").isNull(), F.col("qty")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("qty_sum_good"),
        )

    @register(
        "sentence_split_stats",
        sql="""
        WITH s AS (
            SELECT source,
                   len(list_filter(
                       string_split_regex(text, '[.!?]+'),
                       x -> trim(x) != '')) AS n_sent
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_sent) AS BIGINT) AS sent_sum,
               CAST(MAX(n_sent) AS BIGINT) AS sent_max,
               CAST(SUM(n_sent) * 100 // COUNT(*) AS BIGINT)
                   AS avg_x100
        FROM s GROUP BY source
        """,
        tags=("ext-text",),
    )
    def q_sentence_split_stats(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Sentence segmentation statistics per source — the text-
        pipeline primitive under chunking, per-sentence dedup, and
        sentence-level quality scores: regex split on terminal
        punctuation runs ([.!?]+), empty fragments dropped (trailing
        punctuation, ellipses). Pure expression work (split + filter
        + size, whole-stage codegen); the integer-scaled average
        (×100, floor-div) keeps the comparison engine-exact. A real
        segmenter adds abbreviation/quote handling; the split contract
        and the distribution shape it feeds are what this pins."""
        d = T(spark, sf_dir, "documents").select("source", "text")
        n_sent = F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda x: F.trim(x) != "",
            )
        ).cast("long")
        s = d.select("source", n_sent.alias("n_sent"))
        return s.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_sent").cast("long").alias("sent_sum"),
            F.max("n_sent").cast("long").alias("sent_max"),
            (F.sum("n_sent") * 100 / F.count("*"))
            .cast("long")
            .alias("avg_x100"),
        )


_register()
