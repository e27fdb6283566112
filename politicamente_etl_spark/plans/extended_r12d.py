"""Round-7 batch D: storage-bucketed co-located joins, Kneser-Ney
bigram smoothing, per-language CCNet quality buckets, one EM step of a
Gaussian mixture, and a per-key Kalman (local-level) filter.

Each query pairs a Spark-first plan with a DuckDB oracle per the
catalog contract; float work is either integer-micro-snapped per row
(order-independent sums) or an IEEE-identical op sequence on both
engines (the Kalman recursion — every +,*,/ is a separate vectorized
kernel in DuckDB and a separate Python float op in the pandas UDF, so
no fused-multiply-add can diverge them).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politicamente_etl_spark.functions.scalar import money_sum, sql_money_sum
from politicamente_etl_spark.operators import text as text_ops

# Kalman local-level constants (shared by the Spark fold and the oracle
# recursion — keep the literals textually identical on both sides).
_KF_Q = 0.1  # process noise
_KF_R = 1.0  # observation noise


# one bucketed copy per (sf_dir, n_buckets) per process: repeat callers
# (driver rounds, tests, probes) reuse it instead of leaking a fresh
# catalog table + tempdir parquet copy every invocation; value carries
# the tempdir so stale entries can be torn down on recreation/atexit
# (ADVICE r7 — the old cache leaked a tempdir per cache-miss session)
_BUCKETED_CACHE: dict[tuple[str, int], tuple[str, str, str]] = {}


def _drop_bucketed(spark: SparkSession | None, to: str, tc: str, base: str):
    import shutil

    if spark is not None:
        for t in (to, tc):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
    shutil.rmtree(base, ignore_errors=True)


def _cleanup_bucketed_cache():
    # atexit: sessions are usually gone by now — the parquet tempdirs are
    # the part that would survive the process, so rmtree is the real work
    for to, tc, base in _BUCKETED_CACHE.values():
        _drop_bucketed(None, to, tc, base)
    _BUCKETED_CACHE.clear()


def _bucketed_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Write orders/customer as BUCKETED tables (hash-bucketed by the
    join key at WRITE time, `bucketBy` + `sortBy`) and read them back
    through the session catalog. Reading a bucketed table gives Spark a
    pre-established HashPartitioning on the bucket key, so an equi-join
    of two tables bucketed the same way needs NO shuffle on either side
    — the storage layout IS the exchange. At 100 TB this converts every
    recurring orders⋈customer into a zero-shuffle local join: you pay
    the partitioning once at ingest instead of per query (the Hive/
    Spark bucketed-table contract; Delta/Iceberg expose the same idea
    as clustering). Table names are uuid-suffixed: registration is
    session-scoped metadata over an external tempdir path."""
    from politicamente_etl_spark.sources.readers import load_table

    import atexit

    cache_key = (os.path.abspath(sf_dir), n_buckets)
    if cache_key in _BUCKETED_CACHE:
        to, tc, base = _BUCKETED_CACHE[cache_key]
        try:
            return spark.table(to), spark.table(tc)
        except Exception:
            # different session than the one that wrote them: the old
            # catalog names are dead metadata and the old tempdir parquet
            # is unreachable — reclaim both before re-paying the write
            _drop_bucketed(spark, to, tc, base)
            del _BUCKETED_CACHE[cache_key]
    if not _BUCKETED_CACHE:
        atexit.register(_cleanup_bucketed_cache)
    sfx = uuid.uuid4().hex[:10]
    base = tempfile.mkdtemp(prefix="bucketed_join_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    to, tc = f"bkt_orders_{sfx}", f"bkt_customer_{sfx}"
    (
        o.write.bucketBy(n_buckets, "o_custkey")
        .sortBy("o_custkey")
        .option("path", os.path.join(base, "orders"))
        .saveAsTable(to)
    )
    (
        c.write.bucketBy(n_buckets, "c_custkey")
        .sortBy("c_custkey")
        .option("path", os.path.join(base, "customer"))
        .saveAsTable(tc)
    )
    _BUCKETED_CACHE[cache_key] = (to, tc, base)
    return spark.table(to), spark.table(tc)


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    # -- storage-bucketed co-located join ---------------------------------

    @register(
        "bucketed_colocated_join",
        sql="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
                   AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """,
        bench=True,
        tags=("ext-storage", "ext-join"),
    )
    def q_bucketed_colocated_join(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Revenue by market segment through BUCKETED storage: both
        fact and dim are written `bucketBy(8, key)` and re-read, so the
        equi-join consumes the write-time hash layout instead of
        shuffling either side (plan-pinned in
        tests/test_plan_quality.py: with broadcast disabled, the join
        runs with ZERO ShuffleExchange under it). The only shuffle in
        the query is the final tiny segment rollup. The oracle joins
        the raw parquet — equality proves bucketed write+read is
        lossless and the bucket pruning/partitioning metadata changes
        nothing about the answer. This is the ingest-once/join-forever
        trade every 100 TB warehouse makes for its hottest join key.
        Bench note: the one-time bucketed write is paid in bench.py's
        warmup pass (and cached per process), so timed iterations
        measure the join, not the ingest."""
        bo, bc = _bucketed_tables(spark, sf_dir)
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        return joined.groupBy("c_mktsegment").agg(
            F.count("*").cast("long").alias("n_orders"),
            money_sum("o_totalprice", "revenue"),
        )

    # -- interpolated Kneser-Ney bigram smoothing --------------------------

    @register(
        "kneser_ney_bigram_scores",
        sql="""
        WITH t AS (
            SELECT string_split(text, ' ') AS toks FROM documents
        ), bi AS (
            SELECT unnest([concat_ws(' ', toks[i], toks[i+1])
                           for i in range(1, len(toks))]) AS bg
            FROM t
        ), p AS (
            SELECT split_part(bg, ' ', 1) AS w1,
                   split_part(bg, ' ', 2) AS w2
            FROM bi
        ), c12 AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12
            FROM p GROUP BY 1, 2
        ), c1 AS (
            SELECT w1, CAST(SUM(n12) AS BIGINT) AS c1n,
                   CAST(COUNT(*) AS BIGINT) AS nf
            FROM c12 GROUP BY 1
        ), cb AS (
            SELECT w2, CAST(COUNT(*) AS BIGINT) AS nb
            FROM c12 GROUP BY 1
        ), nt AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS ntb FROM c12
        )
        SELECT w1, w2, n12,
               CAST(round((GREATEST(CAST(n12 AS DOUBLE) - 0.75, 0.0)
                           / CAST(c1n AS DOUBLE)
                           + 0.75 * CAST(nf AS DOUBLE)
                             / CAST(c1n AS DOUBLE)
                             * (CAST(nb AS DOUBLE) / CAST(ntb AS DOUBLE)))
                          * 1000000.0) AS BIGINT) AS p_kn_micro,
               CAST(row_number() OVER (ORDER BY n12 DESC, w1, w2) AS INT)
                   AS rnk
        FROM c12 JOIN c1 USING (w1) JOIN cb USING (w2) CROSS JOIN nt
        QUALIFY rnk <= 20
        """,
        tags=("ext-text",),
    )
    def q_kneser_ney_bigram_scores(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Interpolated Kneser-Ney bigram probabilities (the standard
        n-gram-LM smoother, Chen & Goodman 1999) over the corpus: the
        discounted bigram MLE backs off to the CONTINUATION unigram
        (how many distinct left-contexts a word completes — not raw
        frequency), with absolute discount D=0.75. All four count
        tables (bigram, left-context totals + fan-out, continuation
        fan-in, distinct-bigram total) come from ONE bigram aggregate
        re-grouped three ways — the fact (token stream) shuffles once;
        everything downstream is vocabulary-sized. Per-probability
        micro snap keeps the doubles engine-identical; output = the
        top-20 bigrams by count. At 100 TB the c12 aggregate IS the
        cost; the KN algebra on top is free — which is why KN stays
        the production smoother for count-based LMs (quality-gate
        scoring, fertility estimates) at corpus scale."""
        docs = T(spark, sf_dir, "documents").select("text")
        pairs = docs.select(
            F.explode(text_ops.shingles_regex("text", 2)).alias("bg")
        ).select(
            F.split("bg", " ")[0].alias("w1"),
            F.split("bg", " ")[1].alias("w2"),
        )
        c12 = pairs.groupBy("w1", "w2").agg(
            F.count("*").cast("long").alias("n12")
        )
        c1 = c12.groupBy("w1").agg(
            F.sum("n12").cast("long").alias("c1n"),
            F.count("*").cast("long").alias("nf"),
        )
        cb = c12.groupBy("w2").agg(F.count("*").cast("long").alias("nb"))
        nt = c12.agg(F.count("*").cast("long").alias("ntb"))
        p_kn = (
            F.greatest(F.col("n12").cast("double") - 0.75, F.lit(0.0))
            / F.col("c1n").cast("double")
            + F.lit(0.75)
            * F.col("nf").cast("double")
            / F.col("c1n").cast("double")
            * (F.col("nb").cast("double") / F.col("ntb").cast("double"))
        )
        w = Window.orderBy(F.col("n12").desc(), "w1", "w2")
        return (
            c12.join(c1, "w1")
            .join(cb, "w2")
            .crossJoin(F.broadcast(nt))
            .withColumn(
                "p_kn_micro",
                F.round(p_kn * 1000000.0, 0).cast("long"),
            )
            .withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= 20)
            .select("w1", "w2", "n12", "p_kn_micro", "rnk")
        )

    # -- per-language CCNet quality buckets --------------------------------

    @register(
        "ccnet_lang_buckets_report",
        sql="""
        WITH toks AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), vocab AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks
        ), lp AS (
            SELECT term,
                   CAST(round(ln(CAST(tf AS DOUBLE)
                                 / CAST(n_total AS DOUBLE)) * 1000000.0)
                        AS BIGINT) AS lp_micro
            FROM vocab CROSS JOIN tot
        ), doc AS (
            SELECT t.doc_id, t.lang,
                   CAST(COUNT(*) AS BIGINT) AS n_tok,
                   CAST(SUM(l.lp_micro) AS BIGINT) AS sum_lp
            FROM toks t JOIN lp l USING (term)
            GROUP BY 1, 2
        ), b AS (
            SELECT lang, n_tok, sum_lp,
                   ntile(3) OVER (PARTITION BY lang
                       ORDER BY CAST(sum_lp AS DOUBLE) / 1000000.0
                                / CAST(n_tok AS DOUBLE) DESC,
                                doc_id) AS nt
            FROM doc
        )
        SELECT lang,
               CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(sum_lp) AS BIGINT) AS sum_lp_micro
        FROM b GROUP BY 1, 2
        """,
        tags=("ext-text", "ext-sampling"),
    )
    def q_ccnet_lang_buckets_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The CCNet pipeline's PER-LANGUAGE head/middle/tail split
        (Wenzek et al. 2020 bucket the corpus within each language, so
        a low-resource language's best third survives even when its
        absolute perplexity is worse than a high-resource language's
        worst): per-doc mean logprob under the corpus unigram LM
        (micro-nat snapped — `unigram_logprob_quality` is the global
        twin), ntile(3) PARTITIONED BY lang with a doc_id tiebreak,
        then the per-(lang, bucket) rollup a mixing policy consumes
        (doc/token mass per tercile). The per-lang window sorts only
        doc-level rows (|docs|, not |tokens|) and each language sorts
        independently — at 100 TB this is the partitioned-sort shape
        that scales, vs one global sort; swap exact ntile for the
        threshold mode of `text.unigram_logprob_scores` to drop the
        sort entirely."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "text")
        toks = docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
        )
        vocab = toks.groupBy("term").agg(F.count("*").cast("long").alias("tf"))
        tot = toks.agg(F.count("*").cast("long").alias("n_total"))
        lp = vocab.crossJoin(F.broadcast(tot)).select(
            "term",
            F.round(
                F.log(
                    F.col("tf").cast("double") / F.col("n_total").cast("double")
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("lp_micro"),
        )
        doc = toks.join(lp, "term").groupBy("doc_id", "lang").agg(
            F.count("*").cast("long").alias("n_tok"),
            F.sum("lp_micro").cast("long").alias("sum_lp"),
        )
        w = Window.partitionBy("lang").orderBy(
            (
                F.col("sum_lp").cast("double")
                / 1000000.0
                / F.col("n_tok").cast("double")
            ).desc(),
            "doc_id",
        )
        b = doc.withColumn("nt", F.ntile(3).over(w))
        return (
            b.withColumn(
                "bucket",
                F.when(F.col("nt") == 1, "head")
                .when(F.col("nt") == 2, "middle")
                .otherwise("tail"),
            )
            .groupBy("lang", "bucket")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_tok").cast("long").alias("n_tokens"),
                F.sum("sum_lp").cast("long").alias("sum_lp_micro"),
            )
        )

    # -- one EM step of a 2-component 1-D Gaussian mixture -----------------

    # Responsibility of component 2 under equal priors/variances:
    # r2 = 1 / (1 + exp(-a)), a = ((x-mu1)^2 - (x-mu2)^2) / 2.
    # The SQL and Spark expressions below are textual twins of this.
    _GMM_MU1, _GMM_MU2 = 9.0, 12.0

    @register(
        "gmm_em_one_step",
        sql=f"""
        WITH x AS (
            SELECT ln(o_totalprice) AS x FROM orders
        ), r AS (
            SELECT x,
                   1.0 / (1.0 + exp(-(((x - {_GMM_MU1}) * (x - {_GMM_MU1})
                       - (x - {_GMM_MU2}) * (x - {_GMM_MU2})) / 2.0)))
                       AS r2
            FROM x
        ), m AS (
            SELECT x, r2, 1.0 - r2 AS r1 FROM r
        ), rows_k AS (
            SELECT 1 AS component,
                   CAST(round(r1 * 1000000.0) AS BIGINT) AS rm,
                   CAST(round(r1 * x * 1000000.0) AS BIGINT) AS rxm,
                   CAST(round(r1 * x * x * 1000000.0) AS BIGINT) AS rx2m
            FROM m
            UNION ALL
            SELECT 2 AS component,
                   CAST(round(r2 * 1000000.0) AS BIGINT) AS rm,
                   CAST(round(r2 * x * 1000000.0) AS BIGINT) AS rxm,
                   CAST(round(r2 * x * x * 1000000.0) AS BIGINT) AS rx2m
            FROM m
        )
        SELECT component,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rm) AS BIGINT) AS sum_r_micro,
               CAST(SUM(rxm) AS DOUBLE) / CAST(SUM(rm) AS DOUBLE) AS mu_new,
               sqrt(CAST(SUM(rx2m) AS DOUBLE) / CAST(SUM(rm) AS DOUBLE)
                    - (CAST(SUM(rxm) AS DOUBLE) / CAST(SUM(rm) AS DOUBLE))
                      * (CAST(SUM(rxm) AS DOUBLE) / CAST(SUM(rm) AS DOUBLE)))
                   AS sigma_new
        FROM rows_k GROUP BY component
        """,
        tags=("ext-stats", "ext-ml"),
    )
    def q_gmm_em_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
        """One exact EM iteration of a 2-component Gaussian mixture on
        log order value (fixed init mu=(9,12), unit variances, equal
        priors): the E-step responsibility reduces to a logistic in the
        squared-distance difference; the M-step needs only three
        sufficient statistics per component — Σr, Σrx, Σrx² — each
        integer-micro-snapped PER ROW so the sums are exact and
        order-independent (the float-aggregation discipline every
        distributed EM needs: double sums are non-associative, so an
        unsnapped implementation returns different mixtures on
        different partitionings). One scan, one 2-group aggregate —
        iterating to convergence is this same query in a loop, cost
        O(scan) per step at any scale. Long-form union keeps the
        output tidy (component, n, Σr, mu', sigma')."""
        mu1, mu2 = _GMM_MU1, _GMM_MU2
        x = T(spark, sf_dir, "orders").select(
            F.log("o_totalprice").alias("x")
        )
        a = (
            (F.col("x") - mu1) * (F.col("x") - mu1)
            - (F.col("x") - mu2) * (F.col("x") - mu2)
        ) / 2.0
        m = x.withColumn("r2", 1.0 / (1.0 + F.exp(-a))).withColumn(
            "r1", 1.0 - F.col("r2")
        )

        def snapped(r: str, k: int) -> DataFrame:
            return m.select(
                F.lit(k).alias("component"),
                F.round(F.col(r) * 1000000.0, 0).cast("long").alias("rm"),
                F.round(F.col(r) * F.col("x") * 1000000.0, 0)
                .cast("long")
                .alias("rxm"),
                F.round(F.col(r) * F.col("x") * F.col("x") * 1000000.0, 0)
                .cast("long")
                .alias("rx2m"),
            )

        rows_k = snapped("r1", 1).unionByName(snapped("r2", 2))
        mu_new = F.sum("rxm").cast("double") / F.sum("rm").cast("double")
        return rows_k.groupBy("component").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("rm").cast("long").alias("sum_r_micro"),
            mu_new.alias("mu_new"),
            F.sqrt(
                F.sum("rx2m").cast("double") / F.sum("rm").cast("double")
                - mu_new * mu_new
            ).alias("sigma_new"),
        )

    # -- per-nation Kalman local-level filter ------------------------------

    @register(
        "kalman_local_level_daily",
        sql=f"""
        WITH RECURSIVE base AS (
            SELECT n_name AS nation, o_orderdate AS day,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        ), idx AS (
            SELECT nation,
                   CAST(cents AS DOUBLE) / 10000000.0 AS x,
                   CAST(row_number() OVER (PARTITION BY nation
                        ORDER BY day) AS BIGINT) AS t
            FROM base
        ), f AS (
            SELECT nation, t, x AS level, CAST(1.0 AS DOUBLE) AS p,
                   CAST(0.0 AS DOUBLE) AS k
            FROM idx WHERE t = 1
            UNION ALL
            SELECT i.nation, i.t,
                   f.level + ((f.p + {_KF_Q}) / ((f.p + {_KF_Q}) + {_KF_R}))
                             * (i.x - f.level),
                   (1.0 - (f.p + {_KF_Q}) / ((f.p + {_KF_Q}) + {_KF_R}))
                       * (f.p + {_KF_Q}),
                   (f.p + {_KF_Q}) / ((f.p + {_KF_Q}) + {_KF_R})
            FROM f JOIN idx i ON i.nation = f.nation AND i.t = f.t + 1
        )
        SELECT nation, CAST(t AS BIGINT) AS n_obs,
               CAST(round(level * 1000000.0) AS BIGINT) AS level_micro,
               CAST(round(p * 1000000.0) AS BIGINT) AS p_micro,
               CAST(round(k * 1000000.0) AS BIGINT) AS gain_micro
        FROM f
        QUALIFY row_number() OVER (PARTITION BY nation ORDER BY t DESC) = 1
        """,
        tags=("ext-stats", "ext-temporal"),
    )
    def q_kalman_local_level_daily(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Kalman local-level filter over each nation's daily revenue
        (state-space smoothing — the model behind 'is today's revenue a
        level shift or noise?'; Q=0.1, R=1.0): per-key
        SEQUENTIAL state via applyInPandas — each nation's series
        filters independently inside one Arrow batch while all 25 run
        in parallel, the canonical Spark shape for per-entity recursions
        (the same seam as holt_winters/pack_sequences). The oracle
        replays the identical recursion as a DuckDB RECURSIVE CTE, so
        the driver row certifies the filter STATE TRAJECTORY, not just
        a summary: both engines execute the same IEEE double op
        sequence (no FMA on either side — DuckDB kernels and Python
        floats both evaluate one op at a time), making the final
        (level, covariance, gain) bit-identical before the micro snap.
        Daily totals fold in exact integer cents first, so the input
        series is engine-identical too. At 100 TB: keys partition the
        work; each key's state is O(1) — the filter streams."""
        import math

        import pandas as pd

        o = T(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        daily = (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"), "o_orderdate")
            .agg(F.sum("cents").cast("long").alias("cents"))
        )

        q_noise, r_noise = _KF_Q, _KF_R

        def kalman(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("o_orderdate")
            xs = [float(v) / 10000000.0 for v in pdf["cents"]]
            level, p, k = xs[0], 1.0, 0.0
            for x in xs[1:]:
                pe = p + q_noise
                k = pe / (pe + r_noise)
                level = level + k * (x - level)
                p = (1.0 - k) * pe
            snap = lambda v: int(math.floor(v * 1000000.0 + 0.5))  # noqa: E731
            return pd.DataFrame(
                {
                    "nation": [pdf["nation"].iloc[0]],
                    "n_obs": [len(xs)],
                    "level_micro": [snap(level)],
                    "p_micro": [snap(p)],
                    "gain_micro": [snap(k)],
                }
            )

        return daily.groupBy("nation").applyInPandas(
            kalman,
            schema="nation string, n_obs long, level_micro long,"
            " p_micro long, gain_micro long",
        )


_register()
