"""Round-4 catalog batch 1: corpus-curation analytics a training-data
pipeline runs between ingestion and packing — chunk-grain dedup, template
detection, co-occurrence/entropy statistics, DSIR-style importance
weighting, tf-idf retrieval, class rebalancing, k-fold assignment, frame
sampling plans, and the greedy packer's realized pack statistics (whose
oracle is a DuckDB RECURSIVE CTE reproducing the sequential walk).

Oracle-parity rules carried from the earlier plan modules:
- integer SUM/COUNT casts to BIGINT (DuckDB HUGEINT artifact);
- every ln() is snapped to integer micro-nats BEFORE any aggregation, so
  float accumulation order cannot differ between engines;
- ratios surface as integer ppm via integer division (`DIV` / `//`), or
  as ONE final double division of two exact integers;
- md5 hex strings and ('0x' || hex)::BIGINT arithmetic are the shared
  deterministic randomness (same bytes on both engines);
- no DATE/TIMESTAMP output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politicamente_etl_spark.operators import multimodal, sampling, text

MICRO = 1_000_000

# 8-token non-overlapping chunks: the dedup grain. Small enough to catch
# copied spans inside otherwise-distinct docs, big enough to not match by
# chance (the probe on this corpus: ~5% duplicate chunks at width 8).
CHUNK_W = 8

_CHUNK_SQL = f"""
        WITH t AS (
            SELECT doc_id, source, string_split(text, ' ') AS toks
            FROM documents
        ), c AS (
            SELECT doc_id, source,
                   unnest([{{'ci': k,
                             'ct': array_to_string(
                                 toks[k * {CHUNK_W} + 1 : k * {CHUNK_W} + {CHUNK_W}],
                                 ' ')}}
                           for k in range(0,
                               1 + (greatest(len(toks) - {CHUNK_W}, 0)
                                    + {CHUNK_W - 1}) // {CHUNK_W})]) AS ch
            FROM t
        ), f AS (
            SELECT doc_id, source, md5(ch.ct) AS h,
                   CAST(ch.ci AS BIGINT) AS ci
            FROM c
        )"""


def _chunks(
    spark: SparkSession, sf_dir: str, with_source: bool = False
) -> DataFrame:
    from politicamente_etl_spark.plans.catalog import T

    # r10: the r9 spread() fan-out is REMOVED — fixed-stride slicing plus
    # one md5 per ~8-token chunk is too cheap for the fan-out shuffle of
    # the full text column to pay for itself (A/B at sf0.1: spread
    # 0.80 s, no spread 0.64 s; the 8-core bench run was FASTER than the
    # 32-core one under spread, PERF r9 scaling 0.66). At production
    # split counts the scan is already parallel and the removed call was
    # a no-op anyway.
    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    ch = text.chunk_documents(docs, window=CHUNK_W, stride=CHUNK_W)
    if with_source:
        # chunk_documents drops non-(id, text) columns; re-attach source
        # via a broadcast of the 2-column dim projection.
        ch = ch.join(F.broadcast(docs.select("doc_id", "source")), "doc_id")
    cols = ["doc_id"] + (["source"] if with_source else [])
    return ch.select(
        *cols,
        F.md5("chunk_text").alias("h"),
        F.col("chunk_idx").cast("long").alias("ci"),
    )


def _register():
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    # -- chunk-grain dedup ---------------------------------------------------

    @register(
        "chunk_dedup_report",
        bench=True,
        sql=_CHUNK_SQL
        + """, r AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, ci)
                       AS rn
            FROM f
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_chunks,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS dup_ppm
        FROM r GROUP BY doc_id
        """,
        tags=("ext-text", "ext-dedup"),
    )
    def q_chunk_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Paragraph/span-grain exact dedup (Dolma-style): docs are cut
        into fixed 8-token chunks, each chunk keeps only its FIRST
        occurrence corpus-wide (ordered by doc_id, chunk_idx), and every
        doc reports its duplicated-span fraction — the signal for
        span-level cleaning where doc-level dedup keeps too much.

        Scale shape: one md5 per chunk, one shuffle on the 16-byte chunk
        hash for the keep-first window, one groupBy doc. The chunk text
        itself never shuffles (only the hash does)."""
        ch = _chunks(spark, sf_dir)
        w = Window.partitionBy("h").orderBy("doc_id", "ci")
        dup = F.when(F.row_number().over(w) > 1, 1).otherwise(0)
        return (
            ch.withColumn("__dup", dup)
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_chunks"),
                F.sum("__dup").cast("long").alias("n_dup_chunks"),
            )
            .withColumn(
                "dup_ppm",
                F.expr("n_dup_chunks * 1000000 DIV n_chunks").cast("long"),
            )
        )

    @register(
        "template_chunks_cross_source",
        sql=_CHUNK_SQL
        + """
        SELECT h,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM f
        GROUP BY h
        HAVING COUNT(DISTINCT source) >= 2
        ORDER BY n_docs DESC, h
        LIMIT 20
        """,
        tags=("ext-text", "ext-dedup"),
    )
    def q_template_chunks_cross_source(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Boilerplate/template detection: 8-token spans that recur across
        MULTIPLE sources (site templates, license blurbs, navigation
        chrome — the text that survives doc-level dedup because its host
        pages differ). Top spans by document reach; the output hash is
        the removal key for a downstream span-strip pass.

        One shuffle on the chunk hash; distinct-counts are partial-
        aggregated; TakeOrdered top-k — no global sort."""
        ch = _chunks(spark, sf_dir, with_source=True)
        return (
            ch.groupBy("h")
            .agg(
                F.countDistinct("doc_id").cast("long").alias("n_docs"),
                F.countDistinct("source").cast("long").alias("n_sources"),
            )
            .filter(F.col("n_sources") >= 2)
            .orderBy(F.col("n_docs").desc(), "h")
            .limit(20)
        )

    # -- token statistics ----------------------------------------------------

    @register(
        "token_pmi_pairs",
        sql=f"""
        WITH td AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ), n AS (
            SELECT COUNT(DISTINCT doc_id) AS n_docs FROM td
        ), ct AS (
            SELECT t, COUNT(*) AS c FROM td GROUP BY t
        ), pairs AS (
            SELECT a.t AS t_a, b.t AS t_b, COUNT(*) AS c_ab
            FROM td a JOIN td b ON a.doc_id = b.doc_id AND a.t < b.t
            GROUP BY 1, 2
        )
        SELECT t_a, t_b, CAST(c_ab AS BIGINT) AS c_ab,
               CAST(round(ln(CAST(c_ab AS DOUBLE) * n.n_docs
                           / (CAST(ca.c AS DOUBLE) * cb.c)) * {MICRO}, 0)
                    AS BIGINT) AS pmi_micro
        FROM pairs
        JOIN ct ca ON pairs.t_a = ca.t
        JOIN ct cb ON pairs.t_b = cb.t
        CROSS JOIN n
        WHERE c_ab >= 20
        ORDER BY pmi_micro DESC, t_a, t_b
        LIMIT 50
        """,
        tags=("ext-text",),
    )
    def q_token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Pointwise mutual information of token pairs co-occurring in the
        same document — collocation mining over doc-level co-occurrence
        (PMI = ln(P(a,b)/P(a)P(b)), micro-nat snapped). The classic
        phrase/entity-association signal.

        Scale shape: the pair join is an inverted-index SELF-join on
        doc_id over DISTINCT (doc, token) rows, so cost is Σ_doc k_doc²
        with k = per-doc distinct vocab — bounded by a df-cap on the
        vocabulary in a web-scale deployment (here the corpus vocab is
        tiny). Support floor c_ab ≥ 20 kills the noise tail before the
        top-k."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        td = docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("t"),
        )
        n = td.agg(F.countDistinct("doc_id").alias("n_docs"))
        ct = td.groupBy("t").agg(F.count("*").alias("c"))
        a, b = td.alias("a"), td.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("a.t") < F.col("b.t")),
            )
            .groupBy(
                F.col("a.t").alias("t_a"), F.col("b.t").alias("t_b")
            )
            .agg(F.count("*").alias("c_ab"))
            .filter(F.col("c_ab") >= 20)
        )
        pmi = F.round(
            F.log(
                F.col("c_ab").cast("double") * F.col("n_docs")
                / (F.col("ca.c").cast("double") * F.col("cb.c"))
            )
            * MICRO,
            0,
        ).cast("long")
        return (
            pairs.join(F.broadcast(ct.alias("ca")), F.col("t_a") == F.col("ca.t"))
            .join(F.broadcast(ct.alias("cb")), F.col("t_b") == F.col("cb.t"))
            .join(F.broadcast(n))
            .select(
                "t_a",
                "t_b",
                F.col("c_ab").cast("long").alias("c_ab"),
                pmi.alias("pmi_micro"),
            )
            .orderBy(F.col("pmi_micro").desc(), "t_a", "t_b")
            .limit(50)
        )

    @register(
        "token_entropy_quality",
        sql=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ), tc AS (
            SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
        ), dn AS (
            SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens FROM tc
            GROUP BY 1
        )
        SELECT tc.doc_id, dn.n_tokens,
               CAST(-SUM(c * CAST(round(
                        ln(CAST(c AS DOUBLE) / dn.n_tokens) * {MICRO}, 0)
                    AS BIGINT)) AS BIGINT) AS ent_sum_micro,
               CAST(-SUM(c * CAST(round(
                        ln(CAST(c AS DOUBLE) / dn.n_tokens) * {MICRO}, 0)
                    AS BIGINT)) AS DOUBLE)
                   / (CAST(dn.n_tokens AS DOUBLE) * {MICRO})
                   AS entropy_nats
        FROM tc JOIN dn USING (doc_id)
        GROUP BY tc.doc_id, dn.n_tokens
        """,
        tags=("ext-text", "ext-quality"),
    )
    def q_token_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-document token-distribution Shannon entropy — the
        repetition/diversity quality axis (word-salad scores high,
        single-phrase loops score near zero; both tails are suspect).
        Each ln(p) is micro-nat snapped per (doc, token) BEFORE the sum,
        so the per-doc aggregate is exact integer arithmetic; the only
        float op is the final division. Two narrow shuffles (doc+token,
        then doc)."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        tc = (
            docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
            .groupBy("doc_id", "t")
            .agg(F.count("*").alias("c"))
        )
        dn = tc.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n_tokens"))
        lp_micro = F.round(
            F.log(F.col("c").cast("double") / F.col("n_tokens")) * MICRO, 0
        ).cast("long")
        return (
            tc.join(dn, "doc_id")
            .groupBy("doc_id", "n_tokens")
            .agg((-F.sum(F.col("c") * lp_micro)).cast("long").alias("ent_sum_micro"))
            .withColumn(
                "entropy_nats",
                F.col("ent_sum_micro").cast("double")
                / (F.col("n_tokens").cast("double") * F.lit(MICRO)),
            )
        )

    @register(
        "source_vocab_jaccard",
        sql="""
        WITH st AS (
            SELECT DISTINCT source, unnest(string_split(text, ' ')) AS t
            FROM documents
        ), vs AS (
            SELECT source, COUNT(*) AS v FROM st GROUP BY source
        ), shared AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   COUNT(*) AS n_shared
            FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT source_a, source_b,
               CAST(n_shared AS BIGINT) AS n_shared,
               CAST(n_shared * 1000000
                    // (va.v + vb.v - n_shared) AS BIGINT) AS jaccard_ppm
        FROM shared
        JOIN vs va ON source_a = va.source
        JOIN vs vb ON source_b = vb.source
        """,
        tags=("ext-text", "ext-dedup"),
    )
    def q_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Pairwise source similarity by vocabulary overlap (Jaccard of
        distinct-token sets) — the corpus-mixing diagnostic: near-1 pairs
        are the same feed under two names; near-0 pairs are genuinely
        complementary domains.

        Scale shape: inverted-index join on token over DISTINCT (source,
        token) rows — cost Σ_token s_token², bounded because s ≤
        |sources| (tiny), never |docs|²; the quadratic is in SOURCES, the
        right side to be quadratic in."""
        docs = T(spark, sf_dir, "documents").select("source", "text")
        st = docs.select(
            "source", F.explode(F.array_distinct(F.split("text", " "))).alias("t")
        ).distinct()
        vs = st.groupBy("source").agg(F.count("*").alias("v"))
        a, b = st.alias("a"), st.alias("b")
        shared = (
            a.join(
                b,
                (F.col("a.t") == F.col("b.t"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(
                F.col("a.source").alias("source_a"),
                F.col("b.source").alias("source_b"),
            )
            .agg(F.count("*").alias("n_shared"))
        )
        return (
            shared.join(
                F.broadcast(vs.alias("va")),
                F.col("source_a") == F.col("va.source"),
            )
            .join(
                F.broadcast(vs.alias("vb")),
                F.col("source_b") == F.col("vb.source"),
            )
            .select(
                "source_a",
                "source_b",
                F.col("n_shared").cast("long").alias("n_shared"),
                F.expr(
                    "n_shared * 1000000 DIV (va.v + vb.v - n_shared)"
                ).cast("long").alias("jaccard_ppm"),
            )
        )

    # -- DSIR-style importance weighting ------------------------------------

    @register(
        "dsir_importance_weights",
        sql=f"""
        WITH tok AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
            FROM documents
        ), tgt AS (
            SELECT t, COUNT(*) AS c FROM tok WHERE lang = 'en' GROUP BY t
        ), src AS (
            SELECT t, COUNT(*) AS c FROM tok WHERE lang <> 'en' GROUP BY t
        ), vocab AS (
            SELECT DISTINCT t FROM tok
        ), tot AS (
            SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM tgt) AS nt,
                   (SELECT CAST(SUM(c) AS BIGINT) FROM src) AS ns,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM vocab) AS v
        ), ratio AS (
            SELECT vocab.t,
                   CAST(round(ln(
                       (CAST(COALESCE(tgt.c, 0) + 1 AS DOUBLE)
                           * (tot.ns + tot.v))
                       / (CAST(COALESCE(src.c, 0) + 1 AS DOUBLE)
                           * (tot.nt + tot.v))) * {MICRO}, 0) AS BIGINT)
                       AS r_micro
            FROM vocab
            LEFT JOIN tgt USING (t)
            LEFT JOIN src USING (t)
            CROSS JOIN tot
        )
        SELECT tok.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(r.r_micro) AS BIGINT) AS dsir_micro,
               CAST(SUM(r.r_micro) > 0 AS BOOLEAN) AS prefer_target
        FROM tok JOIN ratio r USING (t)
        GROUP BY tok.doc_id
        """,
        tags=("ext-text", "ext-quality", "ext-sampling"),
    )
    def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
        """DSIR-style importance weights (Xie et al. 2023's shape on
        unigram features): per-token log-likelihood ratio between a
        TARGET distribution (lang='en' here; in production, the
        high-quality reference corpus) and the SOURCE distribution, both
        Laplace-smoothed over the union vocabulary; a document's weight
        is the sum over its token occurrences. Positive ⇒ the doc looks
        more like the target — the resampling signal for targeted data
        selection.

        The per-token ratio table is vocabulary-sized (broadcastable
        at realistic vocab; here joined by token), docs aggregate with
        one shuffle, and every ratio is micro-nat snapped so doc sums
        are exact integers."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "text")
        tok = docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("t")
        )
        tgt = tok.filter(F.col("lang") == "en").groupBy("t").agg(
            F.count("*").alias("ct")
        )
        src = tok.filter(F.col("lang") != "en").groupBy("t").agg(
            F.count("*").alias("cs")
        )
        vocab = tok.select("t").distinct()
        # nt/ns come straight from the per-side count tables (the 3-way
        # vocab join need not run twice — it appears once, in `ratio`)
        tot = (
            tgt.agg(F.sum("ct").cast("long").alias("nt"))
            .crossJoin(src.agg(F.sum("cs").cast("long").alias("ns")))
            .crossJoin(vocab.agg(F.count("*").cast("long").alias("v")))
        )
        ratio = (
            vocab.join(tgt, "t", "left")
            .join(src, "t", "left")
            .join(F.broadcast(tot))
            .select(
                "t",
                F.round(
                    F.log(
                        (F.coalesce("ct", F.lit(0)) + 1).cast("double")
                        * (F.col("ns") + F.col("v"))
                        / (
                            (F.coalesce("cs", F.lit(0)) + 1).cast("double")
                            * (F.col("nt") + F.col("v"))
                        )
                    )
                    * MICRO,
                    0,
                ).cast("long").alias("r_micro"),
            )
        )
        return (
            tok.join(ratio, "t")
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_tokens"),
                F.sum("r_micro").cast("long").alias("dsir_micro"),
            )
            .withColumn("prefer_target", F.col("dsir_micro") > 0)
        )

    # -- tf-idf retrieval ----------------------------------------------------

    @register(
        "tfidf_query_similarity",
        sql=f"""
        WITH tf AS (
            SELECT doc_id, t, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                  FROM documents)
            GROUP BY 1, 2
        ), n AS (
            SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf
        ), idf AS (
            SELECT t,
                   CAST(round(ln(CAST(n.n_docs AS DOUBLE) / COUNT(*))
                              * {MICRO}, 0) AS BIGINT) AS idf_micro
            FROM tf CROSS JOIN n GROUP BY t, n.n_docs
        ), w AS (
            SELECT doc_id, t, tf * idf_micro AS w
            FROM tf JOIN idf USING (t)
        ), dots AS (
            SELECT q.doc_id AS anchor_id, d.doc_id,
                   CAST(SUM(q.w * d.w) AS BIGINT) AS dot
            FROM w q JOIN w d ON q.t = d.t AND q.doc_id <> d.doc_id
            WHERE q.doc_id < 5
            GROUP BY 1, 2
        )
        SELECT anchor_id, doc_id, dot FROM dots
        QUALIFY row_number() OVER (PARTITION BY anchor_id
                ORDER BY dot DESC, doc_id) <= 10
        """,
        tags=("ext-text", "ext-sim"),
    )
    def q_tfidf_query_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sparse lexical retrieval: tf-idf inner products between 5
        anchor (query) documents and the corpus via an inverted-index
        join, top-10 per anchor. The BM25-family retrieval shape — the
        lexical half of hybrid search (`hybrid_search_rrf` fuses this
        kind of ranking with the dense one).

        Weights are integers (tf × micro-snapped idf), so dot products
        are exact sums — no float accumulation across the token join.
        Scale: the join touches only postings of tokens the ANCHORS
        contain (query-side filter pushed before the join); per-anchor
        candidate sets are bounded by posting-list sizes, the standard
        DAAT bound, with a df-cap on hot tokens as the skew valve."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        tf = (
            docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
            .groupBy("doc_id", "t")
            .agg(F.count("*").alias("tf"))
        )
        n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
        idf = (
            tf.groupBy("t")
            .agg(F.count("*").alias("df"))
            .join(F.broadcast(n))
            .select(
                "t",
                F.round(
                    F.log(F.col("n_docs").cast("double") / F.col("df"))
                    * MICRO,
                    0,
                ).cast("long").alias("idf_micro"),
            )
        )
        w = tf.join(idf, "t").select(
            "doc_id", "t", (F.col("tf") * F.col("idf_micro")).alias("w")
        )
        q = w.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("anchor_id"), "t", F.col("w").alias("qw")
        )
        dots = (
            F.broadcast(q)
            .join(w, "t")
            .filter(F.col("anchor_id") != F.col("doc_id"))
            .groupBy("anchor_id", "doc_id")
            .agg(F.sum(F.col("qw") * F.col("w")).cast("long").alias("dot"))
        )
        rw = Window.partitionBy("anchor_id").orderBy(
            F.col("dot").desc(), "doc_id"
        )
        return (
            dots.withColumn("__rn", F.row_number().over(rw))
            .filter(F.col("__rn") <= 10)
            .select("anchor_id", "doc_id", "dot")
        )

    # -- corpus profile ratios ----------------------------------------------

    @register(
        "bytes_per_token_by_source",
        sql="""
        SELECT source,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS total_tokens,
               CAST(SUM(n_chars) AS DOUBLE)
                   / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                   AS chars_per_token
        FROM documents
        GROUP BY source
        """,
        tags=("ext-text", "ext-quality"),
    )
    def q_bytes_per_token_by_source(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Tokenizer-compression profile per source: chars (≈bytes here)
        per whitespace token — the cost model for token-budget planning
        and the canary for sources whose content is markup/binary junk
        (ratio way off the corpus norm). Single partial-agg pass; the
        division happens once per source on exact integer sums."""
        docs = T(spark, sf_dir, "documents").select(
            "source", "n_chars", F.size(F.split("text", " ")).alias("__nt")
        )
        return (
            docs.groupBy("source")
            .agg(
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.sum("__nt").cast("long").alias("total_tokens"),
            )
            .withColumn(
                "chars_per_token",
                F.col("total_chars").cast("double")
                / F.col("total_tokens").cast("double"),
            )
        )

    # -- class rebalancing / folds / frames ----------------------------------

    @register(
        "class_rebalance_realized",
        sql="""
        WITH c AS (
            SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
        ), m AS (
            SELECT MAX(cnt) AS mx FROM c
        ), f AS (
            SELECT lang, CAST((m.mx + c.cnt - 1) // c.cnt AS BIGINT)
                       AS factor
            FROM c CROSS JOIN m
        )
        SELECT d.doc_id, d.lang,
               CAST(unnest(generate_series(1, f.factor)) AS BIGINT)
                   AS copy_idx
        FROM documents d JOIN f USING (lang)
        """,
        tags=("ext-sampling",),
    )
    def q_class_rebalance_realized(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Deterministic oversampling to class parity: each language's
        docs are replicated ceil(max_class/count) times (epoch-style
        integer replication, not probabilistic), realized as (doc,
        copy_idx) rows — the balanced-epoch manifest a trainer consumes.
        The per-class factor table is tiny and broadcast; replication is
        a narrow sequence-explode, so the blow-up is bounded by
        n_classes × max_class and no shuffle occurs at all."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
        c = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
        m = c.agg(F.max("cnt").alias("mx"))
        f = c.join(F.broadcast(m)).select(
            "lang",
            F.expr("(mx + cnt - 1) DIV cnt").cast("long").alias("factor"),
        )
        return (
            docs.join(F.broadcast(f), "lang")
            .select(
                "doc_id",
                "lang",
                F.explode(
                    F.sequence(F.lit(1).cast("long"), F.col("factor"))
                ).alias("copy_idx"),
            )
        )

    @register(
        "stratified_kfold_assign",
        sql=f"""
        SELECT lang,
               CAST(CAST(('0x' || substring(md5(concat_ws(':', 'fold-v1',
                        CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 5
                    AS BIGINT) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM documents
        GROUP BY 1, 2
        """,
        tags=("ext-sampling",),
    )
    def q_stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
        """5-fold cross-validation assignment, stratified per language:
        fold = md5(seed:id) mod 5 — a pure per-row function of the id, so
        folds are stable under re-runs, appends, and engines (the same
        property consistent_sample_k leans on). The checksum column makes
        membership (not just counts) oracle-verifiable. Scan + one
        two-key partial agg; nothing else."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
        fold = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("fold-v1"), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 5
        )
        return (
            docs.withColumn("fold", fold.cast("long"))
            .groupBy("lang", "fold")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("doc_id").cast("long").alias("id_checksum"),
            )
        )

    @register(
        "frame_sample_plan",
        sql="""
        SELECT doc_id,
               CAST(unnest(generate_series(0,
                   least(16, n_chars // 40 + 1) - 1)) AS BIGINT) AS frame_idx,
               CAST(unnest(generate_series(0,
                   least(16, n_chars // 40 + 1) - 1)) * 40 AS BIGINT) AS ts_ms
        FROM documents
        """,
        tags=("ext-multimodal",),
    )
    def q_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Video frame-sampling plan (`multimodal.frame_sampling_plan`):
        one row per (item, frame) at 25 fps equivalent (every 40 ms),
        capped at 16 frames — computed on the metadata table only
        (n_chars stands in for duration_ms; the binary payload never
        participates). The declarative planner half of the
        extract_video_frames decode stub."""
        docs = T(spark, sf_dir, "documents").select(
            "doc_id", F.col("n_chars").alias("duration_ms")
        )
        return multimodal.frame_sampling_plan(docs)

    # -- greedy packing realized --------------------------------------------

    @register(
        "greedy_pack_stats",
        sql=f"""
        WITH RECURSIVE d AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                   CAST({sampling.sql_hash_bucket('doc_id', seed='pack-v1',
                                                  n_buckets=8)} AS BIGINT)
                       AS b,
                   CAST(('0x' || substring(md5(concat_ws(':', 'pack-v1',
                            CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                       AS oh
            FROM documents
        ), r AS (
            SELECT b, nt,
                   ROW_NUMBER() OVER (PARTITION BY b ORDER BY oh, doc_id)
                       AS rn
            FROM d
        ), walk AS (
            SELECT b, rn, nt AS run, CAST(0 AS BIGINT) AS pid
            FROM r WHERE rn = 1
            UNION ALL
            SELECT r.b, r.rn,
                   CASE WHEN w.run + r.nt > 512 THEN r.nt
                        ELSE w.run + r.nt END,
                   CASE WHEN w.run + r.nt > 512 THEN w.pid + 1
                        ELSE w.pid END
            FROM walk w JOIN r ON r.b = w.b AND r.rn = w.rn + 1
        )
        SELECT CAST(b * 4294967296 + pid AS BIGINT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(run) AS BIGINT) AS pack_tokens
        FROM walk GROUP BY 1
        """,
        tags=("ext-sampling",),
    )
    def q_greedy_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Realized pack statistics of the TRUE-GREEDY packer
        (`sampling.pack_sequences(mode="greedy")`, round-4 fix #3): every
        pack's token total is ≤ the 512 budget (single oversize docs sit
        alone), unlike the closed-form mode's budget-aligned slices. The
        oracle reproduces the per-bucket sequential walk with a DuckDB
        RECURSIVE CTE — proving the applyInPandas state machine row for
        row, not just statistically. 8 bucket streams pack in parallel;
        the aggregate is one shuffle on pack_id."""
        from politicamente_etl_spark.operators.text import tokens

        docs = T(spark, sf_dir, "documents").select(
            "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
        )
        packed = sampling.pack_sequences(
            docs, budget=512, n_buckets=8, mode="greedy"
        )
        return packed.groupBy("pack_id").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("cum_tokens").cast("long").alias("pack_tokens"),
        )


_register()
