"""Round-6 prep batch 1: ranked retrieval (BM25), exact-substring
dedup costing, and deterministic epoch-shuffle shards — the three
remaining LLM-pipeline shapes the catalog lacked: a free-text lexical
query ranking (tfidf_query_similarity covers doc-as-query; this covers
query-as-terms with length normalization), the measurement pre-pass
that decides whether the expensive suffix-array substring dedup is
worth running per source, and the reshuffle-per-epoch data-loader
contract (determinism + permutation invariance) expressed as one
shuffle.

Same engine-parity rules as extended_r4*/r5*: every float expression
is snapped to integer micro-units at its birth so all aggregation is
exact integer arithmetic; rates are ppm via integer division; no
DATE/TIMESTAMP or raw-double output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (used by operators)

BM25_TERMS = ("dup", "vector", "join")


def _register():
    from politicamente_etl_spark.operators import dedup, sampling, text
    from politicamente_etl_spark.plans.catalog import T, register

    terms_sql = ", ".join(f"'{t}'" for t in BM25_TERMS)

    @register(
        "bm25_topk_docs",
        bench=True,
        sql=f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                   unnest(string_split(text, ' ')) AS t
            FROM documents
        ), tf AS (
            SELECT doc_id, dl, t, COUNT(*) AS tf
            FROM toks WHERE t IN ({terms_sql}) GROUP BY 1, 2, 3
        ), stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS avgdl
            FROM documents
        ), idf AS (
            SELECT t,
                   ln(1e0 + ((n_docs - COUNT(*)) + 5e-1)
                          / (CAST(COUNT(*) AS DOUBLE) + 5e-1)) AS idf
            FROM tf CROSS JOIN stats GROUP BY t, n_docs
        ), contrib AS (
            SELECT tf.doc_id,
                   CAST(round(((idf.idf
                        * (CAST(tf.tf AS DOUBLE) * (1.2e0 + 1e0)))
                        / (CAST(tf.tf AS DOUBLE)
                           + 1.2e0 * ((1e0 - 7.5e-1)
                                      + 7.5e-1 * (CAST(tf.dl AS DOUBLE)
                                                  / stats.avgdl))))
                        * 1e6, 0) AS BIGINT) AS c
            FROM tf JOIN idf USING (t) CROSS JOIN stats
        ), agg AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_hit,
                   CAST(SUM(c) AS BIGINT) AS score_micro
            FROM contrib GROUP BY 1
        )
        SELECT doc_id, n_hit, score_micro,
               CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
                    AS INT) AS rnk
        FROM agg
        QUALIFY rnk <= 10
        """,
        tags=("ext-text", "ext-sim"),
    )
    def q_bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """BM25 top-10 for the fixed query {dup, vector, join}: one
        rare term (df=25 at sf0.01) and two common ones, so the ranking
        exercises both the idf spread and the dl/avgdl length
        normalization. Contributions are micro-snapped integers before
        the cross-term sum (addition-order-proof); the top-k is
        orderBy+limit (TakeOrdered), never a global row_number sort.
        Engine note: every SQL float literal is scientific notation
        (1.2e0, 7.5e-1) so DuckDB binds DOUBLE, not DECIMAL."""
        from politicamente_etl_spark.operators.core import spread

        # r9 opt: fan the one-split bench scan out before the two
        # tokenize passes (postings + corpus stats) — single-core
        # otherwise; no-op at production split counts.
        docs = spread(
            T(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
        )
        return text.bm25_topk(docs, list(BM25_TERMS), k=10)

    @register(
        "dup_ngram_costing",
        sql="""
        WITH toks AS (
            SELECT source, string_split(text, ' ') AS a FROM documents
        ), grams AS (
            SELECT source, array_to_string(a[i:i+4], ' ') AS g
            FROM toks, UNNEST(generate_series(1, len(a) - 4)) AS u(i)
        ), gs AS (
            SELECT source, g, COUNT(*) AS c FROM grams GROUP BY 1, 2
        ), gt AS (
            SELECT source, g, c, SUM(c) OVER (PARTITION BY g) AS ct
            FROM gs
        ), rolled AS (
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_occ,
                   CAST(SUM(CASE WHEN ct > 1 THEN c ELSE 0 END)
                        AS BIGINT) AS dup_occ,
                   CAST(SUM(CASE WHEN ct > 1 THEN c * (length(g) + 1)
                            ELSE 0 END) AS BIGINT) AS dup_bytes
            FROM gt GROUP BY 1
        )
        SELECT source, n_occ, dup_occ, dup_bytes,
               CAST((dup_occ * 1000000) // n_occ AS BIGINT) AS dup_ppm
        FROM rolled
        """,
        tags=("ext-dedup", "ext-docs"),
    )
    def q_dup_ngram_costing(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-source exact-substring-dedup costing over token 5-grams
        (~9% of occurrences are duplicated at sf0.01 — non-trivial by
        construction). The decide-before-you-pay artifact for the
        Lee-et-al substring dedup pass. DuckDB builds grams via
        1-based inclusive array slices a[i:i+4]; Spark via the
        single-regex-sweep shingler — byte-identical on the
        single-space-normalized corpus."""
        docs = T(spark, sf_dir, "documents").select("source", "text")
        return dedup.duplicated_ngram_costing(docs, n=5)

    @register(
        "epoch_shuffle_shards",
        sql="""
        WITH epochs AS (
            SELECT UNNEST(generate_series(0, 2)) AS epoch
        ), rows_ AS (
            SELECT d.doc_id, e.epoch,
                   CAST(('0x' || substring(md5(concat_ws(':', 'epoch-v1',
                        CAST(e.epoch AS VARCHAR),
                        CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                       AS ord
            FROM documents d CROSS JOIN epochs e
        )
        SELECT CAST(epoch AS INT) AS epoch,
               CAST(ord % 8 AS INT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(MIN(ord) AS BIGINT) AS min_ord
        FROM rows_ GROUP BY 1, 2
        """,
        tags=("ext-sample",),
    )
    def q_epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Three training epochs sharded 8 ways by md5(seed:epoch:id):
        the data-loader contract — rerunning an epoch reproduces its
        shards exactly (no RNG state), and every epoch re-permutes the
        same corpus (per-epoch totals invariant across epochs; the
        oracle exposes exactly that). 60-bit md5 prefix arithmetic is
        engine-exact on both sides (Spark conv(hex,16,10), DuckDB
        CAST('0x'||hex AS BIGINT))."""
        docs = T(spark, sf_dir, "documents").select("doc_id")
        return sampling.epoch_shuffle_shards(docs, n_epochs=3, n_shards=8)

    from politicamente_etl_spark.operators.sampling import sql_hash_bucket

    w_sql = (
        f"CAST({sql_hash_bucket('i', seed='qc-w', n_buckets=2001)} - 1000"
        " AS BIGINT)"
    )
    f_bucket = sql_hash_bucket("f", seed="qc-v1", n_buckets=4096)

    @register(
        "hashed_classifier_gate",
        bench=True,
        sql=f"""
        WITH uni AS (
            SELECT doc_id, 'u:' || unnest(string_split(text, ' ')) AS f
            FROM documents
        ), arr AS (
            SELECT doc_id, string_split(text, ' ') AS a FROM documents
        ), big AS (
            SELECT doc_id, 'b:' || array_to_string(a[i:i+1], ' ') AS f
            FROM arr, UNNEST(generate_series(1, len(a) - 1)) AS u(i)
        ), feats AS (
            SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM big
        ), fb AS (
            SELECT doc_id, {f_bucket} AS bucket FROM feats
        ), w AS (
            SELECT CAST(i AS INT) AS bucket, {w_sql} AS w_micro
            FROM generate_series(0, 4095) AS t(i)
        )
        SELECT fb.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_feats,
               CAST(SUM(w.w_micro) AS BIGINT) AS logit_micro,
               CAST(CASE WHEN SUM(w.w_micro) > 0 THEN 1 ELSE 0 END AS INT)
                   AS label
        FROM fb JOIN w USING (bucket)
        GROUP BY 1
        """,
        tags=("ext-text", "ext-docs"),
    )
    def q_hashed_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """fastText-shaped quality-gate inference over the corpus:
        unigram+bigram feature hashing into 4096 buckets, a broadcast
        (bucket, weight) lookup, one per-doc integer logit sum, label at
        zero. The weights are the deterministic md5-derived fixture
        (`fixture_hash_weights`) so the DuckDB oracle rebuilds the SAME
        model from arithmetic alone — swap in trained weights and the
        plan is unchanged. The classifier-inference shape every curated
        pretraining corpus runs at full scale."""
        from politicamente_etl_spark.operators.core import spread

        # r9 opt: fan the one-split bench scan out before the two
        # tokenize/shingle explode branches (single-core otherwise;
        # no-op at production split counts).
        docs = spread(
            T(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
        )
        w = text.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
        return text.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        )

    @register(
        "token_budget_selection",
        sql="""
        WITH d AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST((len(list_distinct(string_split(text, ' '))) * 1000)
                        // len(string_split(text, ' ')) AS BIGINT) AS q_milli
            FROM documents
        )
        SELECT source, doc_id, q_milli, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY q_milli DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY q_milli DESC, doc_id) AS INT) AS q_rank
        FROM d
        QUALIFY cum_tokens <= 600
        """,
        tags=("ext-sample", "ext-docs"),
    )
    def q_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-source curation under a 600-token budget (~45% of each
        source's corpus at sf0.01, so the cut is real): quality =
        lexical diversity in milli-units (distinct/total tokens — an
        integer, so ranking is engine-exact), greedy keep-best until
        the budget is spent, whole documents only. The
        budget-to-document-list step of data mixing."""
        docs = T(spark, sf_dir, "documents").select("source", "doc_id", "text")
        toks = F.split(F.col("text"), " ")
        d = docs.select(
            "source",
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.expr(
                "CAST((size(array_distinct(split(text, ' '))) * 1000)"
                " div size(split(text, ' ')) AS BIGINT)"
            ).alias("q_milli"),
        )
        return sampling.select_by_token_budget(
            d, budget_tokens=600, group_col="source"
        )


_register()
