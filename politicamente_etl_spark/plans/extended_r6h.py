"""Round-6 prep batch 9: experimentation sufficient statistics (Welch
t-test inputs), leave-one-out held-out perplexity per source, and a
JSONL source round-trip — the A/B-measurement shape, the
cross-validated LM-quality signal (score a source under a model trained
on everything EXCEPT it), and the one text source format the reader
matrix lacked.

Parity rules as earlier extended modules: test statistics are emitted
as exact integer sufficient statistics (the num/den discipline), LOO
log-probs reuse the micro-nat snap over integer count ratios, and the
JSONL path proves round-trip identity against the parquet oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    # -- A/B sufficient statistics ------------------------------------------

    @register(
        "ab_test_sufficient_stats",
        sql="""
        WITH v AS (
            SELECT event_type AS grp,
                   CAST(floor(value * 1000) AS BIGINT) AS vm
            FROM events WHERE event_type IN ('click', 'purchase')
        )
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(vm) AS BIGINT) AS sum_milli,
               CAST(SUM(vm * vm) AS BIGINT) AS sumsq_milli,
               CAST(COUNT(*) * SUM(vm * vm) - SUM(vm) * SUM(vm)
                    AS BIGINT) AS var_num
        FROM v GROUP BY grp
        """,
        tags=("ext-stats", "ext-events"),
    )
    def q_ab_test_sufficient_stats(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Welch t-test inputs for the click-vs-purchase value
        comparison, as EXACT integer sufficient statistics per arm
        (n, sum, sum-of-squares, n-scaled variance numerator
        n*ss - s^2) — the experimentation readout computed the way a
        100 TB metrics pipeline must: one partial-agg pass producing
        mergeable sums; the t statistic itself is read-time float
        arithmetic over six integers. Milli-snapped values keep the
        squares exact."""
        ev = load_events(spark, sf_dir)
        v = ev.filter(
            F.col("event_type").isin("click", "purchase")
        ).select(
            F.col("event_type").alias("grp"),
            F.floor(F.col("value") * 1000).cast("long").alias("vm"),
        )
        g = v.groupBy("grp").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("vm").cast("long").alias("sum_milli"),
            F.sum(F.col("vm") * F.col("vm")).cast("long").alias("sumsq_milli"),
        )
        return g.withColumn(
            "var_num",
            (
                F.col("n") * F.col("sumsq_milli")
                - F.col("sum_milli") * F.col("sum_milli")
            ).cast("long"),
        )

    # -- leave-one-out held-out perplexity ----------------------------------

    @register(
        "heldout_perplexity_by_source",
        sql="""
        WITH toks AS (
            SELECT source AS g, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), cgw AS (
            SELECT g, term, CAST(COUNT(*) AS BIGINT) AS c_gw
            FROM toks GROUP BY 1, 2
        ), ng AS (
            SELECT g, CAST(SUM(c_gw) AS BIGINT) AS n_g FROM cgw GROUP BY 1
        ), cw AS (
            SELECT term, CAST(SUM(c_gw) AS BIGINT) AS c_w FROM cgw GROUP BY 1
        ), n AS (
            SELECT CAST(SUM(c_gw) AS BIGINT) AS n_tot FROM cgw
        )
        SELECT g AS source,
               CAST(SUM(c_gw) AS BIGINT) AS n_tokens,
               CAST(SUM(c_gw * CAST(round(ln(
                        CAST(c_w - c_gw + 1 AS DOUBLE)
                        / CAST(n_tot - n_g AS DOUBLE)) * 1e6) AS BIGINT))
                    AS BIGINT) AS loo_lp_micro_tokens
        FROM cgw
        JOIN cw USING (term)
        JOIN ng USING (g)
        CROSS JOIN n
        GROUP BY g
        """,
        tags=("ext-text", "ext-quality"),
    )
    def q_heldout_perplexity_by_source(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Leave-one-out held-out log-likelihood per source: each
        source's tokens scored under the add-one unigram LM trained on
        every OTHER source — computed WITHOUT retraining per fold, via
        the count identity (held-out counts = corpus counts minus own
        counts). Low loo_lp per token = the source reads as unlike the
        rest of the mix — the cross-validated twin of
        source_unigram_kl (which compares INCLUDING itself).
        Micro-nat-snapped integer sum; perplexity =
        exp(-lp/1e6/n_tokens) at read time."""
        docs = T(spark, sf_dir, "documents").select("source", "text")
        toks = docs.select(
            F.col("source").alias("g"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        cgw = toks.groupBy("g", "term").agg(F.count("*").alias("c_gw"))
        ng = cgw.groupBy("g").agg(F.sum("c_gw").alias("n_g"))
        cw = cgw.groupBy("term").agg(F.sum("c_gw").alias("c_w"))
        ntot = cgw.agg(F.sum("c_gw").alias("n_tot"))
        terms = (
            cgw.join(cw, "term")
            .join(F.broadcast(ng), "g")
            .crossJoin(F.broadcast(ntot))
            .withColumn(
                "lp",
                F.round(
                    F.log(
                        (F.col("c_w") - F.col("c_gw") + 1).cast("double")
                        / (F.col("n_tot") - F.col("n_g")).cast("double")
                    )
                    * F.lit(1e6),
                    0,
                ).cast("long"),
            )
        )
        return terms.groupBy(F.col("g").alias("source")).agg(
            F.sum("c_gw").cast("long").alias("n_tokens"),
            F.sum(F.col("c_gw") * F.col("lp"))
            .cast("long")
            .alias("loo_lp_micro_tokens"),
        )

    # -- JSONL source round-trip --------------------------------------------

    @register(
        "jsonl_roundtrip_stats",
        sql="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(SUM(length(text)) AS BIGINT) AS chars_sum
        FROM documents
        GROUP BY source
        """,
        tags=("ext-source",),
    )
    def q_jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """JSON-Lines source coverage: write the documents table as
        JSONL (the interchange format most text-pipeline tooling
        speaks), read it back through spark.read.json with an explicit
        schema (schema inference on 100 TB of JSONL is a full extra
        scan — production readers always pin the schema), and
        fingerprint per source. The oracle reads the original parquet:
        equality proves the round trip lossless, including text
        containing quotes/newlines-escapes."""
        import atexit
        import shutil
        import tempfile

        docs = T(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        stage = tempfile.mkdtemp(prefix="jsonl_rt_")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        path = f"{stage}/docs_jsonl"
        docs.write.mode("overwrite").json(path)
        back = spark.read.schema(
            "doc_id long, text string, source string"
        ).json(path)
        return back.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(F.length("text")).cast("long").alias("chars_sum"),
        )


_register()


def _register_more():
    from politicamente_etl_spark.plans.catalog import T, register

    # -- CMS merge proof ----------------------------------------------------

    _CMS_CELLS = """
            SELECT doc_id, i,
                   CAST('0x' || substr(md5(tok || '|' || CAST(i AS VARCHAR)),
                        1, 15) AS BIGINT) % 16 AS b
            FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
                  FROM documents) t, unnest([1, 2, 3, 4]) AS u(i)
            WHERE tok != ''
    """

    @register(
        "cms_merge_proof",
        sql=f"""
        WITH cells AS (
            {_CMS_CELLS}
        ), whole AS (
            SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM cells GROUP BY 1, 2
        ), halves AS (
            SELECT i, b, doc_id % 2 AS half, CAST(COUNT(*) AS BIGINT) AS c
            FROM cells GROUP BY 1, 2, 3
        ), merged AS (
            SELECT i, b, CAST(SUM(c) AS BIGINT) AS c
            FROM halves GROUP BY 1, 2
        )
        SELECT w.i, w.b, w.c AS c_whole, m.c AS c_merged,
               w.c = m.c AS merge_ok
        FROM whole w JOIN merged m ON w.i = m.i AND w.b = m.b
        """,
        tags=("ext-sketch", "ext-approx"),
    )
    def q_cms_merge_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Count-min sketch mergeability, proven cell by cell: the d=4 ×
        w=16 counter grid built per doc_id-parity half and SUM-merged
        equals the whole-stream grid — CMS merges by cell-wise ADDITION
        (where HLL merges by max), the property that lets per-day
        sketches roll up into monthly heavy-hitter state without
        re-scanning the stream. Token-level counts this time (not
        vocab-level), so the halves genuinely partition the stream."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        toks = docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        ).filter(F.col("tok") != "")
        cells = toks.select(
            "doc_id",
            F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)])).alias("i"),
            "tok",
        ).select(
            "doc_id",
            "i",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("tok"), F.col("i"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % 16
            ).alias("b"),
        )
        whole = cells.groupBy("i", "b").agg(
            F.count("*").cast("long").alias("c_whole")
        )
        halves = cells.groupBy(
            "i", "b", (F.col("doc_id") % 2).alias("half")
        ).agg(F.count("*").alias("c"))
        merged = halves.groupBy("i", "b").agg(
            F.sum("c").cast("long").alias("c_merged")
        )
        return whole.join(merged, ["i", "b"]).select(
            F.col("i").cast("long").alias("i"),
            F.col("b").cast("long").alias("b"),
            "c_whole",
            "c_merged",
            (F.col("c_whole") == F.col("c_merged")).alias("merge_ok"),
        )

    # -- trimmed mean -------------------------------------------------------

    @register(
        "trimmed_mean_revenue_by_segment",
        sql="""
        WITH o AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) // 100000 AS y
            FROM orders JOIN customer c ON o_custkey = c.c_custkey
            GROUP BY segment, o_orderkey
        ), cut AS (
            SELECT segment,
                   quantile_cont(y, 0.05) AS lo,
                   quantile_cont(y, 0.95) AS hi
            FROM o GROUP BY segment
        )
        SELECT o.segment,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN y >= lo AND y <= hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN y >= lo AND y <= hi THEN y ELSE 0 END)
                    AS BIGINT) AS sum_kept_kilo
        FROM o JOIN cut ON o.segment = cut.segment
        GROUP BY o.segment
        """,
        tags=("ext-stats", "ext-rel"),
    )
    def q_trimmed_mean_revenue_by_segment(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """5%-trimmed per-segment order-value statistics: exact
        interpolated percentile cuts (quantile_cont parity) over
        kilodollar-snapped order totals, then kept-count and kept-sum as
        exact integers — the robust mean = sum/n at read time. The
        standard heavy-tail-immune KPI; one aggregate for the cuts
        (segment-sized), one for the trim."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        y = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy(
                F.col("c_mktsegment").alias("segment"),
                "o_orderkey",
            )
            .agg(
                F.expr(
                    "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                    " AS BIGINT) div 100000"
                ).alias("y")
            )
        )
        cut = y.groupBy("segment").agg(
            F.expr("percentile(y, 0.05)").alias("lo"),
            F.expr("percentile(y, 0.95)").alias("hi"),
        )
        return (
            y.join(F.broadcast(cut), "segment")
            .groupBy("segment")
            .agg(
                F.count("*").cast("long").alias("n_total"),
                F.sum(
                    ((F.col("y") >= F.col("lo")) & (F.col("y") <= F.col("hi")))
                    .cast("long")
                )
                .cast("long")
                .alias("n_kept"),
                F.sum(
                    F.when(
                        (F.col("y") >= F.col("lo"))
                        & (F.col("y") <= F.col("hi")),
                        F.col("y"),
                    ).otherwise(0)
                )
                .cast("long")
                .alias("sum_kept_kilo"),
            )
        )


_register_more()


def _register_spans():
    from politicamente_etl_spark.operators import dedup
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "dup_span_extraction",
        sql="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), g AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, i AS p,
                   concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                             toks[i+4]) AS gram
            FROM t, unnest(generate_series(1, len(toks) - 4)) AS u(i)
            WHERE len(toks) >= 5
        ), d AS (
            SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
        ), dp AS (
            SELECT doc_id, n_tokens, p FROM g JOIN d USING (gram)
        ), isl AS (
            SELECT doc_id, n_tokens, p,
                   CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                        ORDER BY p) <= 5 THEN 0 ELSE 1 END AS brk
            FROM dp
        ), isl2 AS (
            SELECT doc_id, n_tokens, p,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS UNBOUNDED PRECEDING) AS island
            FROM isl
        ), spans AS (
            SELECT doc_id, n_tokens, island,
                   MAX(p) - MIN(p) + 5 AS span_tokens
            FROM isl2 GROUP BY 1, 2, 3
        )
        SELECT doc_id, n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens,
               CAST((1000000 * SUM(span_tokens)) // n_tokens AS BIGINT)
                   AS dup_ppm
        FROM spans GROUP BY doc_id, n_tokens
        """,
        tags=("ext-dedup", "ext-text"),
    )
    def q_dup_span_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact-substring dedup realized: per-document maximal token
        spans covered by corpus-duplicated 5-grams (start positions <= 5
        apart merge, so span sizes are the exact covered-position union)
        — the extraction pass that dup_ngram_costing prices and a
        removal job would cut. Per-doc windows only; the corpus-sized
        work is the same gram aggregate as the costing pass."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        return dedup.duplicated_span_report(docs)


_register_spans()


def _register_span_apply():
    from politicamente_etl_spark.operators import dedup
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "dedup_spans_applied",
        sql="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), g AS (
            SELECT doc_id, i AS p,
                   concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                             toks[i+4]) AS gram
            FROM t, unnest(generate_series(1, len(toks) - 4)) AS u(i)
            WHERE len(toks) >= 5
        ), d AS (
            SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
        ), dp AS (
            SELECT doc_id, p FROM g JOIN d USING (gram)
        ), isl AS (
            SELECT doc_id, p,
                   CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                        ORDER BY p) <= 5 THEN 0 ELSE 1 END AS brk
            FROM dp
        ), isl2 AS (
            SELECT doc_id, p,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS UNBOUNDED PRECEDING) AS island
            FROM isl
        ), spans AS (
            SELECT doc_id, MIN(p) AS s_p, MAX(p) + 4 AS e_p
            FROM isl2 GROUP BY doc_id, island
        ), per_doc AS (
            SELECT doc_id, list({'s_p': s_p, 'e_p': e_p}) AS sp
            FROM spans GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(range(1, len(toks) + 1),
                    p -> len(list_filter(COALESCE(sp, []),
                         s -> p >= s.s_p AND p <= s.e_p)) = 0))
                    AS BIGINT) AS kept_tokens,
               md5(COALESCE(list_aggregate(
                   list_transform(
                       list_filter(range(1, len(toks) + 1),
                           p -> len(list_filter(COALESCE(sp, []),
                                s -> p >= s.s_p AND p <= s.e_p)) = 0),
                       p -> toks[p]),
                   'string_agg', ' '), '')) AS clean_digest
        FROM t LEFT JOIN per_doc ON t.doc_id = per_doc.doc_id
        """,
        tags=("ext-dedup", "ext-text"),
    )
    def q_dedup_spans_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Substring dedup APPLIED: every corpus-duplicated 5-gram span
        cut from every document (the Lee-et-al both-copies default),
        survivors re-joined and md5-fingerprinted — detect -> cut ->
        verify in one engine-exact query; docs without spans pass
        through whole. The cut is a per-row expression over the
        collected span list: no Python, no extra corpus shuffle."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        return dedup.remove_duplicated_spans(docs)


_register_span_apply()
