"""Round-8 batch E: the restore-across-logical-deletes proof (driver
certification of the round-8 filter-barrier fix), higher-moment
normality gating (Jarque-Bera), single-outlier gating (Grubbs), and a
corpus BLEU-2 precision — the n-gram-overlap eval metric as pure
join/aggregate work."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_dv_restore_proof",
        sql="""
        SELECT 'post_delete_restore' AS label,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderkey % 9 != 4
        UNION ALL
        SELECT 'pre_delete_restore',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_txlog_dv_restore_proof(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """RESTORE across logical deletes, both directions, driver-
        certified (the round-8 review fix): restoring to a version that
        POSTDATES a deletion vector must reproduce that version exactly
        — the restore manifest re-adds files with their ORIGINAL add
        versions and acts as a filter barrier, so the DV keeps applying
        (the old behavior re-added files at the restore version, which
        postdated every filter and silently resurrected all deleted
        rows). Restoring to a PRE-delete version still undoes the
        delete (the barrier drops filters whose origin lies after the
        target). Both rows fingerprint count + key checksum against the
        pure-SQL relation of each restored state."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        path = os.path.join(tempfile.mkdtemp(prefix="dv_restore_"), "t")
        t = TxLogTable.create(spark, path, o)  # v1
        t.delete_where_rowindex("o_orderkey % 9 = 4")  # v2
        t.restore(2)  # v3 — must still hide the deleted rows
        post = t.snapshot().agg(
            F.lit("post_delete_restore").alias("label"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
        t.restore(1)  # v4 — must resurrect everything
        pre = t.snapshot().agg(
            F.lit("pre_delete_restore").alias("label"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
        return post.unionByName(pre)

    @register(
        "jarque_bera_normality_gate",
        sql="""
        WITH v AS (
            SELECT l_returnflag,
                   CAST(floor(l_quantity) AS BIGINT) AS x
            FROM lineitem
        ), s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s1,
                   CAST(SUM(x * x) AS BIGINT) AS s2,
                   CAST(SUM(x * x * x) AS BIGINT) AS s3,
                   CAST(SUM(x * x * x * x) AS BIGINT) AS s4
            FROM v GROUP BY l_returnflag
        ), m AS (
            SELECT l_returnflag, n, s1, s2, s3, s4,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu
            FROM s
        ), c AS (
            SELECT l_returnflag, n, mu,
                   CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mu * mu AS m2,
                   CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                       - 3.0 * mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                       + 2.0 * mu * mu * mu AS m3,
                   CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
                       - 4.0 * mu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                       + 6.0 * mu * mu
                         * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                       - 3.0 * mu * mu * mu * mu AS m4
            FROM m
        )
        SELECT l_returnflag, n,
               m3 / (m2 * sqrt(m2)) AS skewness,
               m4 / (m2 * m2) - 3.0 AS excess_kurtosis,
               CAST(n AS DOUBLE) / 6.0
                   * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                      + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                        / 4.0) AS jb_stat,
               CAST(n AS DOUBLE) / 6.0
                   * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                      + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                        / 4.0) > 5.99 AS non_normal
        FROM c
        """,
        tags=("ext-stats", "ext-quality"),
    )
    def q_jarque_bera_normality_gate(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Jarque-Bera normality gate per return flag: skewness and
        excess kurtosis from the 3rd/4th RAW moments (Σx, Σx², Σx³, Σx⁴
        — one distributed pass, int64-exact because quantities are ≤50
        so x⁴ ≤ 6.25e6), combined into JB = n/6·(S² + K²/4) and
        compared to the χ²₂ 95% critical value (5.99). Normality checks
        gate every "±2σ" alerting rule downstream — uniform quantities
        fail it by design here (platykurtic, K≈-1.2), which is the
        point: the gate must fire on non-Gaussian data. Every double
        derives from exact integers through the literally identical op
        sequence on both engines; no cross-group sums, so no fold is
        needed."""
        v = T(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            F.floor(F.col("l_quantity")).cast("long").alias("x"),
        )
        s = v.groupBy("l_returnflag").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("s1"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
            F.sum(F.col("x") * F.col("x") * F.col("x"))
            .cast("long")
            .alias("s3"),
            F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x"))
            .cast("long")
            .alias("s4"),
        )
        n_d = F.col("n").cast("double")
        mu = F.col("s1").cast("double") / n_d
        m2 = F.col("s2").cast("double") / n_d - mu * mu
        m3 = (
            F.col("s3").cast("double") / n_d
            - 3.0 * mu * (F.col("s2").cast("double") / n_d)
            + 2.0 * mu * mu * mu
        )
        m4 = (
            F.col("s4").cast("double") / n_d
            - 4.0 * mu * (F.col("s3").cast("double") / n_d)
            + 6.0 * mu * mu * (F.col("s2").cast("double") / n_d)
            - 3.0 * mu * mu * mu * mu
        )
        skew = m3 / (m2 * F.sqrt(m2))
        kurt = m4 / (m2 * m2) - 3.0
        jb = n_d / 6.0 * (skew * skew + kurt * kurt / 4.0)
        return s.select(
            "l_returnflag",
            "n",
            skew.alias("skewness"),
            kurt.alias("excess_kurtosis"),
            jb.alias("jb_stat"),
            (jb > 5.99).alias("non_normal"),
        )

    @register(
        "grubbs_max_outlier_gate",
        sql="""
        WITH v AS (
            SELECT event_type,
                   CAST(floor("value" * 1000) AS BIGINT) AS milli
            FROM events
        ), s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(milli) AS BIGINT) AS s1,
                   CAST(SUM(CAST(milli AS HUGEINT) * milli) AS DOUBLE)
                       AS q,
                   CAST(MAX(milli) AS BIGINT) AS mx
            FROM v GROUP BY event_type
        )
        SELECT event_type, n, mx AS max_milli,
               (CAST(mx AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   / sqrt((q - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                               / CAST(n AS DOUBLE))
                          / (CAST(n AS DOUBLE) - 1.0)) AS g_stat,
               (CAST(mx AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   / sqrt((q - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                               / CAST(n AS DOUBLE))
                          / (CAST(n AS DOUBLE) - 1.0)) > 3.0
                   AS flagged
        FROM s
        """,
        tags=("ext-stats", "ext-events"),
    )
    def q_grubbs_max_outlier_gate(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Grubbs' test for the single most extreme observation per
        event type: G = (max − mean)/s against a fixed 3.0 gate — the
        "is the worst point an outlier, or just the tail?" question
        that complements the fence-style detectors (zscore/MAD/HBOS
        flag many points; Grubbs judges exactly one). Values
        milli-snap to integers so Σ and Σ² are exact (Σ² widened
        HUGEINT/decimal); the one mean/sd/ratio chain is the identical
        IEEE sequence on both engines. One aggregate, no window, no
        shuffle beyond the grouped sums."""
        from politicamente_etl_spark.plans.catalog import load_events

        v = load_events(spark, sf_dir).select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("long").alias("milli"),
        )
        s = v.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("milli").cast("long").alias("s1"),
            F.sum((F.col("milli") * F.col("milli")).cast("decimal(38,0)"))
            .cast("double")
            .alias("q"),
            F.max("milli").cast("long").alias("mx"),
        )
        n_d = F.col("n").cast("double")
        mean = F.col("s1").cast("double") / n_d
        sd = F.sqrt(
            (
                F.col("q")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / n_d
            )
            / (n_d - 1.0)
        )
        g = (F.col("mx").cast("double") - mean) / sd
        return s.select(
            "event_type",
            "n",
            F.col("mx").alias("max_milli"),
            g.alias("g_stat"),
            (g > 3.0).alias("flagged"),
        )

    @register(
        "bleu2_pair_precision",
        sql="""
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), pairs AS (
            SELECT c.doc_id AS pair_id, c.toks AS cand, r.toks AS ref
            FROM docs c JOIN docs r ON r.doc_id = c.doc_id + 1
            WHERE c.doc_id % 2 = 0
        ), cand_bg AS (
            SELECT pair_id, bg, CAST(COUNT(*) AS BIGINT) AS c_cnt
            FROM (
                SELECT pair_id,
                       unnest([concat_ws(' ', cand[i], cand[i+1])
                               for i in range(1, len(cand))]) AS bg
                FROM pairs
            ) GROUP BY pair_id, bg
        ), ref_bg AS (
            SELECT pair_id, bg, CAST(COUNT(*) AS BIGINT) AS r_cnt
            FROM (
                SELECT pair_id,
                       unnest([concat_ws(' ', ref[i], ref[i+1])
                               for i in range(1, len(ref))]) AS bg
                FROM pairs
            ) GROUP BY pair_id, bg
        ), clipped AS (
            SELECT c.pair_id,
                   SUM(LEAST(c.c_cnt, COALESCE(r.r_cnt, 0))) AS overlap,
                   SUM(c.c_cnt) AS total
            FROM cand_bg c LEFT JOIN ref_bg r USING (pair_id, bg)
            GROUP BY c.pair_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(overlap) AS BIGINT) AS clipped_overlap,
               CAST(SUM(total) AS BIGINT) AS cand_bigrams,
               CAST(SUM(overlap) * 1000000 // SUM(total) AS BIGINT)
                   AS micro_precision_x1e6
        FROM clipped
        """,
        tags=("ext-text", "ext-eval"),
    )
    def q_bleu2_pair_precision(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Corpus-level BLEU-2 modified precision over synthetic
        candidate/reference pairs (doc 2k vs doc 2k+1 — adjacent docs
        as a deterministic pairing): per pair, bigram counts CLIP at
        the reference count (Papineni's modified precision — a
        candidate repeating one matching bigram can't inflate its
        score), then micro-average across the corpus. The generation-
        eval metric as pure DataFrame work: explode bigrams, two
        grouped counts, one LEFT join, clip with least() — no UDF, and
        the shuffles are all (pair, bigram)-keyed equi-joins, which is
        how BLEU over millions of generations parallelizes. Integer
        counts end-to-end; the final micro precision is scaled-integer
        floor division."""
        docs = T(spark, sf_dir, "documents").select(
            "doc_id", F.split(F.col("text"), " ").alias("toks")
        )
        cand = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.col("doc_id").alias("pair_id"), F.col("toks").alias("cand")
        )
        ref = docs.select(
            (F.col("doc_id") - 1).alias("pair_id"),
            F.col("toks").alias("ref"),
        )
        pairs = cand.join(ref, "pair_id")

        def bigrams(col):
            # guard size==1: Spark's sequence(1, 0) STEPS DOWN to [1, 0]
            # (it never returns empty), so a space-free document would
            # evaluate element_at(toks, 0) and kill the query with
            # INVALID_ARRAY_INDEX (review r8, second pass; the DuckDB
            # range(1, 1) is empty and needs no guard)
            return F.when(
                F.size(col) > 1,
                F.transform(
                    F.sequence(F.lit(1), F.size(col) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(col, i), F.element_at(col, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))

        cand_bg = (
            pairs.select(
                "pair_id", F.explode(bigrams(F.col("cand"))).alias("bg")
            )
            .groupBy("pair_id", "bg")
            .agg(F.count("*").cast("long").alias("c_cnt"))
        )
        ref_bg = (
            pairs.select(
                "pair_id", F.explode(bigrams(F.col("ref"))).alias("bg")
            )
            .groupBy("pair_id", "bg")
            .agg(F.count("*").cast("long").alias("r_cnt"))
        )
        clipped = (
            cand_bg.join(ref_bg, ["pair_id", "bg"], "left")
            .groupBy("pair_id")
            .agg(
                F.sum(
                    F.least(
                        F.col("c_cnt"),
                        F.coalesce(F.col("r_cnt"), F.lit(0)),
                    )
                ).alias("overlap"),
                F.sum("c_cnt").alias("total"),
            )
        )
        return clipped.agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("overlap").cast("long").alias("clipped_overlap"),
            F.sum("total").cast("long").alias("cand_bigrams"),
            F.floor(
                F.sum("overlap") * 1000000 / F.sum("total")
            )
            .cast("long")
            .alias("micro_precision_x1e6"),
        )


_register()
