"""Round-8 batch B: rank statistics (Mann-Whitney U), multiple-testing
control (Benjamini-Hochberg FDR), curriculum scheduling for training
pipelines, malformed-CSV quarantine accounting, and a hash-sample
equi-depth histogram (the oracle-checkable twin of the KLL-sketch
decile path).

Determinism: rank math stays in doubled-integer units (average ranks
over ties are .5-granular, so 2x makes them exact BIGINTs); the FDR
gate compares doubles produced by the IDENTICAL op sequence on both
engines (one division, one multiply — IEEE-deterministic); schedule
order ties break on md5 (no equal keys)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "mann_whitney_u_segments",
        sql="""
        WITH x AS (
            SELECT c_mktsegment AS seg,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ), vc AS (
            SELECT cents,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
                        AS BIGINT) AS cnt_b
            FROM x GROUP BY cents
        ), w AS (
            SELECT cents, cnt, cnt_b, cnt - cnt_b AS cnt_m,
                   2 * (SUM(cnt) OVER (ORDER BY cents
                        ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS r2
            FROM vc
        ), agg AS (
            SELECT CAST(SUM(cnt_b) AS BIGINT) AS n1,
                   CAST(SUM(cnt_m) AS BIGINT) AS n2,
                   CAST(SUM(cnt_b * r2) AS BIGINT) AS r1_2,
                   CAST(SUM(cnt_m * r2) AS BIGINT) AS r2_2
            FROM w
        )
        SELECT 'BUILDING' AS seg, n1 AS n, r1_2 AS rank_sum_x2,
               CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u_x2
        FROM agg
        UNION ALL
        SELECT 'MACHINERY', n2, r2_2,
               CAST(r2_2 - n2 * (n2 + 1) AS BIGINT)
        FROM agg
        """,
        tags=("ext-stats",),
    )
    def q_mann_whitney_u_segments(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Mann-Whitney U (Wilcoxon rank-sum) between two customer
        segments' order values — the nonparametric two-sample test
        (does one distribution stochastically dominate?) that needs no
        normality assumption, unlike the t-test twins
        (ab_test_sufficient_stats). Tie-corrected AVERAGE ranks in
        doubled units keep everything integer: rank math runs over the
        VALUE-COUNT table (one groupBy to |distinct prices| rows, then
        one ordered cumsum window over that compressed distribution —
        never a per-row global sort), so at 100 TB the windowed stage
        is bounded by distinct values, not row count. U1+U2 = 2·n1·n2
        is the built-in self-check (follows from the two output rows).
        Significance: z = (U - n1n2/2)/sqrt(var) is one scalar op on
        the returned sufficient statistics."""
        o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        x = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            .select(
                F.col("c_mktsegment").alias("seg"),
                F.floor(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
        )
        vc = x.groupBy("cents").agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum((F.col("seg") == "BUILDING").cast("long"))
            .cast("long")
            .alias("cnt_b"),
        )
        w = Window.orderBy("cents").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ranked = vc.select(
            "cnt",
            "cnt_b",
            (F.col("cnt") - F.col("cnt_b")).alias("cnt_m"),
            (
                2 * (F.sum("cnt").over(w) - F.col("cnt"))
                + F.col("cnt")
                + 1
            ).alias("r2"),
        )
        agg = ranked.agg(
            F.sum("cnt_b").cast("long").alias("n1"),
            F.sum("cnt_m").cast("long").alias("n2"),
            F.sum(F.col("cnt_b") * F.col("r2")).cast("long").alias("r1_2"),
            F.sum(F.col("cnt_m") * F.col("r2")).cast("long").alias("r2_2"),
        )
        b = agg.select(
            F.lit("BUILDING").alias("seg"),
            F.col("n1").alias("n"),
            F.col("r1_2").alias("rank_sum_x2"),
            (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1))
            .cast("long")
            .alias("u_x2"),
        )
        m = agg.select(
            F.lit("MACHINERY").alias("seg"),
            F.col("n2").alias("n"),
            F.col("r2_2").alias("rank_sum_x2"),
            (F.col("r2_2") - F.col("n2") * (F.col("n2") + 1))
            .cast("long")
            .alias("u_x2"),
        )
        return b.unionByName(m)

    @register(
        "benjamini_hochberg_fdr_gates",
        sql="""
        WITH counts AS (
            SELECT n_name,
                   CAST(COUNT(*) AS BIGINT) AS n_i
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        ), scored AS (
            SELECT n_name,
                   CAST(abs(25 * n_i - SUM(n_i) OVER ()) AS BIGINT) AS dev
            FROM counts
        ), ranked AS (
            SELECT n_name, dev,
                   CAST(row_number() OVER (
                       ORDER BY 1.0 / (1.0 + CAST(dev AS DOUBLE)),
                                n_name) AS BIGINT) AS k,
                   1.0 / (1.0 + CAST(dev AS DOUBLE)) AS p
            FROM scored
        ), kstar AS (
            SELECT COALESCE(MAX(CASE WHEN p <= CAST(k AS DOUBLE) * 0.1
                                              / 25.0
                                     THEN k END), 0) AS ks
            FROM ranked
        )
        SELECT n_name, dev, k, k <= (SELECT ks FROM kstar) AS rejected
        FROM ranked
        """,
        tags=("ext-stats", "ext-quality"),
    )
    def q_benjamini_hochberg_fdr_gates(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Benjamini-Hochberg FDR control over 25 simultaneous per-nation
        deviation tests — the multiple-comparisons gate every
        quality-monitoring dashboard needs (25 sources × a 10% alpha
        = 2.5 false alarms per sweep without correction). p-surrogates
        are 1/(1+dev): one division from an exact integer deviation, so
        both engines produce bit-identical doubles and the step-up
        comparison p_(k) ≤ k·α/m decides identically. The procedure is
        pure window algebra over the 25-row aggregate (rank ascending,
        max passing rank k*, reject 1..k*) — the expensive part is the
        grouped count, which is the usual shuffle; everything after is
        driver-free aggregate-size work."""
        o = T(spark, sf_dir, "orders").select("o_custkey")
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        counts = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").cast("long").alias("n_i"))
        )
        scored = counts.select(
            "n_name",
            F.abs(
                25 * F.col("n_i") - F.sum("n_i").over(Window.partitionBy())
            )
            .cast("long")
            .alias("dev"),
        )
        p = 1.0 / (1.0 + F.col("dev").cast("double"))
        ranked = scored.select(
            "n_name",
            "dev",
            F.row_number()
            .over(Window.orderBy(p.asc(), F.col("n_name")))
            .cast("long")
            .alias("k"),
            p.alias("p"),
        )
        kstar = ranked.agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("p")
                        <= F.col("k").cast("double") * 0.1 / 25.0,
                        F.col("k"),
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("ks")
        )
        return ranked.crossJoin(F.broadcast(kstar)).select(
            "n_name", "dev", "k", (F.col("k") <= F.col("ks")).alias("rejected")
        )

    @register(
        "curriculum_schedule_by_difficulty",
        sql="""
        WITH b AS (
            SELECT doc_id,
                   CASE WHEN n_chars < 150 THEN 0
                        WHEN n_chars < 300 THEN 1
                        WHEN n_chars < 420 THEN 2
                        ELSE 3 END AS bucket
            FROM documents
        ), sched AS (
            SELECT doc_id, bucket,
                   CAST(row_number() OVER (
                       ORDER BY bucket,
                                md5(CAST(doc_id AS VARCHAR)),
                                doc_id) AS BIGINT) AS pos
            FROM b
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(pos) AS BIGINT) AS first_pos,
               CAST(MAX(pos) AS BIGINT) AS last_pos,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM sched
        WHERE pos <= 1000
        GROUP BY bucket
        """,
        tags=("ext-mlprep", "ext-sampling"),
    )
    def q_curriculum_schedule_by_difficulty(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """CURRICULUM-ORDERED training schedule: documents sorted
        easy-to-hard (length buckets as the difficulty proxy), shuffled
        WITHIN each difficulty stage by md5 (deterministic, seedless,
        engine-portable — the repo's standing no-RNG rule), positions
        materialized, and the first-1000 window fingerprinted per
        bucket. Pins the two properties a curriculum must have: stages
        are contiguous (first/last pos ranges don't interleave) and
        intra-stage order is hash-uniform, not ingest order (id_sum
        over the head is the tripwire). The global row_number here runs
        once over the catalog at schedule-build time; at 100 TB you
        build it with the same two-pass range-offset decomposition
        `contiguous_id_assignment` demonstrates (sort keys are
        (bucket, md5) prefixes), not a single reducer."""
        d = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
        b = d.select(
            "doc_id",
            F.when(F.col("n_chars") < 150, 0)
            .when(F.col("n_chars") < 300, 1)
            .when(F.col("n_chars") < 420, 2)
            .otherwise(3)
            .alias("bucket"),
        )
        sched = b.select(
            "doc_id",
            "bucket",
            F.row_number()
            .over(
                Window.orderBy(
                    "bucket",
                    F.md5(F.col("doc_id").cast("string")),
                    "doc_id",
                )
            )
            .cast("long")
            .alias("pos"),
        )
        return (
            sched.filter(F.col("pos") <= 1000)
            .groupBy("bucket")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.min("pos").cast("long").alias("first_pos"),
                F.max("pos").cast("long").alias("last_pos"),
                F.sum("doc_id").cast("long").alias("id_sum"),
            )
        )

    @register(
        "csv_quarantine_report",
        sql="""
        WITH x AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS BIGINT) AS qty,
                   (l_orderkey * 7 + l_linenumber) % 13 = 0 AS corrupt
            FROM lineitem
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN corrupt THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_good,
               CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bad,
               CAST(SUM(CASE WHEN corrupt THEN 0 ELSE qty END) AS BIGINT)
                   AS qty_sum_good,
               CAST(SUM(CASE WHEN corrupt THEN l_orderkey ELSE 0 END)
                    AS BIGINT) AS bad_key_sum
        FROM x
        """,
        tags=("ext-source", "ext-quality"),
    )
    def q_csv_quarantine_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Malformed-row QUARANTINE accounting for the CSV ingest path
        (the reference's file format — SURVEY §2 S3): a CSV written
        with a deterministic corruption rule (every 13th line carries
        an unparseable quantity) is read back PERMISSIVE with
        `columnNameOfCorruptRecord`, so bad rows land in a quarantine
        column instead of killing the job (FAILFAST) or silently
        vanishing (DROPMALFORMED). The report pins total/good/bad
        counts, the good-row quantity sum (no corrupt value leaked into
        the aggregate), and the BAD rows' key checksum — recoverable
        for replay, the operational contract of a quarantine. The
        corrupt column costs nothing on clean rows (NULL) and parsing
        stays one pass; at 100 TB this is why PERMISSIVE+quarantine is
        the ingest default over retry-the-world."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        corrupt = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 13 == 0
        lines = li.select(
            F.concat_ws(
                ",",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.when(corrupt, F.lit("xx")).otherwise(
                    F.col("qty").cast("string")
                ),
            ).alias("value")
        )
        d = os.path.join(tempfile.mkdtemp(prefix="csv_quar_"), "rows")
        lines.write.mode("errorifexists").text(d)
        back = (
            spark.read.schema(
                "ok long, ln long, qty long, _quarantine string"
            )
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_quarantine")
            .csv(d)
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
                F.when(F.col("_quarantine").isNull(), F.col("qty")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("qty_sum_good"),
            F.sum(
                F.when(
                    F.col("_quarantine").isNotNull(), F.col("ok")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("bad_key_sum"),
        )

    @register(
        "equi_depth_histogram_hashsketch",
        sql="""
        WITH v AS (
            SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
                   md5(l_orderkey || '|' || l_linenumber || '|'
                       || CAST(floor(l_extendedprice * 100) AS BIGINT))
                       AS h
            FROM lineitem
        ), s AS (
            SELECT cents, h FROM v ORDER BY h LIMIT 4000
        ), r AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, h) AS rn
            FROM s
        ), e AS (
            SELECT cents AS edge FROM r WHERE rn % 400 = 0 AND rn < 4000
        )
        SELECT CAST(1 + (SELECT COUNT(*) FROM e WHERE v.cents > e.edge)
                    AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM v
        GROUP BY 1
        """,
        tags=("ext-olap", "ext-stats", "ext-approx"),
    )
    def q_equi_depth_histogram_hashsketch(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The ORACLE-CHECKABLE approximate decile histogram (VERDICT r7
        item 5): `equi_depth_histogram_prices_approx` uses Spark's KLL
        sketch, whose edges are implementation-defined and can never
        hash-match another engine — this twin replaces the sketch with
        a DETERMINISTIC uniform sample (the 4000 rows with the smallest
        md5 of the row key: top-k by hash is a one-pass distributed
        min-heap, mergeable like any sketch), takes exact decile edges
        OF THE SAMPLE by deterministic rank, and buckets the full table
        against them. Same statistical contract as KLL (edges within
        sampling error of true deciles; bucket counts prove it: each
        lands near n/10), same at-scale shape (bounded memory,
        map-side mergeable, edges broadcast back as expressions), but
        every byte reproducible on any engine — so the driver can
        hash-check the production decile PATH, not just a rows-count.
        The 9 edges collected to the driver are bounded metadata (the
        same pattern as the exact twin's percentile edges)."""
        # the hash key folds the VALUE in: the synthetic lineitem has
        # duplicate (orderkey, linenumber) pairs, so a position-only key
        # lets each engine pick a different row among equal-hash groups
        # at the top-k boundary — with cents inside the hash, equal hash
        # means equal sampled value and the sample multiset is unique
        li = T(spark, sf_dir, "lineitem").select(
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.floor(F.col("l_extendedprice") * 100)
                    .cast("long")
                    .cast("string"),
                )
            ).alias("h"),
        )
        sample = li.orderBy("h").limit(4000)
        ranked = sample.select(
            "cents",
            F.row_number()
            .over(Window.orderBy("cents", "h"))
            .alias("rn"),
        )
        edges = [
            r["cents"]
            for r in ranked.filter(
                (F.col("rn") % 400 == 0) & (F.col("rn") < 4000)
            )
            .orderBy("rn")
            .collect()
        ]
        bucket = F.lit(1)
        for e in edges:
            bucket = bucket + (F.col("cents") > F.lit(e)).cast("int")
        return (
            li.select(bucket.cast("int").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_rows"))
        )


_register()
