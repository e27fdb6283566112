"""Round-6 prep batch 7: the BPE merge-application step (the second
half of tokenizer training's inner loop) and an l-diversity audit (the
k-anonymity sibling that catches homogeneous sensitive values inside
otherwise-large QI classes).

The BPE apply is the new oracle technique here: both engines run the
IDENTICAL leftmost-greedy left fold over each word's characters (Spark
`aggregate` / DuckDB `list_reduce`, segmentation carried as a
space-joined symbol string), so the merged segmentation itself is
engine-exact — not just its statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The merge applied is the top pair from bpe_pair_counts at the driver's
# scale factor — a PARAMETER of the operator (the training loop supplies
# it), pinned here so both engines apply the same merge.
_MERGE_A, _MERGE_B = "e", "r"


def _register():
    from politicamente_etl_spark.operators import quality, text
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    # -- BPE merge application ----------------------------------------------

    @register(
        "bpe_one_merge_recount",
        sql=f"""
        WITH w AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE length(w) >= 2
            GROUP BY w
        ), seg AS (
            SELECT wf,
                   string_split(
                       list_reduce(
                           [w[i] for i in range(1, length(w) + 1)],
                           (acc, x) -> CASE
                               WHEN (acc = '{_MERGE_A}'
                                     OR ends_with(acc, ' {_MERGE_A}'))
                                    AND x = '{_MERGE_B}'
                               THEN acc || x
                               ELSE acc || ' ' || x END),
                       ' ') AS syms
            FROM w
        ), p AS (
            SELECT wf,
                   unnest([syms[i] || '+' || syms[i + 1]
                           for i in range(1, len(syms))]) AS pair
            FROM seg WHERE len(syms) >= 2
        )
        SELECT pair,
               CAST(SUM(wf) AS BIGINT) AS n_occurrences,
               CAST(COUNT(*) AS BIGINT) AS n_vocab_positions
        FROM p
        GROUP BY pair
        ORDER BY n_occurrences DESC, pair
        LIMIT 10
        """,
        tags=("ext-text",),
    )
    def q_bpe_one_merge_recount(spark: SparkSession, sf_dir: str) -> DataFrame:
        """One BPE training iteration: apply the round-1 winning merge
        ('e','r' at the driver's corpus) leftmost-greedily to every
        vocabulary word via a sequential character fold, then recount
        adjacent symbol pairs over the merged segmentations — the next
        round's candidate table ('er'-containing pairs now compete as
        single symbols). Segmentations are engine-exact: Spark's
        aggregate fold and DuckDB's list_reduce run the identical
        recurrence."""
        docs = T(spark, sf_dir, "documents").select("text")
        return text.apply_bpe_merge_and_recount(
            docs, _MERGE_A, _MERGE_B, top_k=10
        )

    # -- l-diversity --------------------------------------------------------

    @register(
        "l_diversity_report",
        sql="""
        WITH qi AS (
            SELECT CAST(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                        % 7 AS INT) AS dow,
                   CAST(date_part('hour', ts) AS INT) AS hour,
                   event_type
            FROM events
        ), cls AS (
            SELECT dow, hour,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_sens
            FROM qi GROUP BY 1, 2
        )
        SELECT dow,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN n_sens < 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low_diversity,
               CAST(MIN(n_sens) AS BIGINT) AS min_diversity,
               CAST(SUM(CASE WHEN n_sens < 3 THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_at_risk
        FROM cls GROUP BY dow
        """,
        tags=("ext-quality", "ext-privacy"),
    )
    def q_l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """l-diversity audit (Machanavajjhala et al. 2007), the
        k-anonymity complement: a QI class may hold many users yet ONE
        sensitive value — linkage then discloses the attribute without
        re-identification. Classes on (dow, hour) with < 3 distinct
        event types are flagged; per-dow rollup. Reuses
        k_anonymity_classes with the sensitive attribute in the subject
        slot (the computation — distinct count per QI class — is
        identical; the interpretation differs)."""
        ev = load_events(spark, sf_dir)
        qi = ev.select(
            F.pmod(F.unix_date(F.to_date("ts")), F.lit(7))
            .cast("int")
            .alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
            "event_type",
        )
        cls = quality.k_anonymity_classes(
            qi, ["dow", "hour"], "event_type", k=3
        ).withColumnRenamed("n_subjects", "n_sens")
        return cls.groupBy("dow").agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum(F.col("at_risk").cast("long"))
            .cast("long")
            .alias("n_low_diversity"),
            F.min("n_sens").cast("long").alias("min_diversity"),
            F.sum(F.when(F.col("at_risk"), F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
        )


_register()


def _register_pr():
    from politicamente_etl_spark.operators import dedup
    from politicamente_etl_spark.plans.catalog import T, register

    # SQL recipes below mirror extended.py's _JACCARD_PAIRS_CTES /
    # _SH_SIG_CTE (module-local there); both recipes are already parity-
    # pinned by their own driver-green queries, so this composition stays
    # in sync through those.
    _sh_hashes = (
        "list_transform(string_split(text, ' '),"
        " tk -> CAST(('0x' || substring(md5(tk), 1, 15)) AS BIGINT))"
    )
    _sh_bits = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> ((h >> {i}) & 1) = 1))"
        f" >= len(hs) THEN 1 ELSE 0 END) * {1 << i}"
        for i in range(dedup.SIMHASH_BITS)
    )

    @register(
        "dedup_method_pr",
        sql=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   unnest([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                           for i in range(1, len(toks) - 1)]) AS sh
            FROM t
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), truth AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes na ON inter.doc_a = na.doc_id
            JOIN sizes nb ON inter.doc_b = nb.doc_id
            WHERE CAST(n_common AS DOUBLE)
                      / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) >= 0.4
        ), th AS (
            SELECT doc_id, {_sh_hashes} AS hs FROM documents
        ), sm AS (
            SELECT doc_id, CAST({_sh_bits} AS BIGINT) AS simhash FROM th
        ), sig AS (
            SELECT doc_id, simhash,
                   simhash >> 8 AS band_hi, simhash & 255 AS band_lo
            FROM sm
        ), cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sa, b.simhash AS sb
            FROM sig a JOIN sig b
              ON a.band_hi = b.band_hi AND a.doc_id < b.doc_id
            UNION ALL
            SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
            FROM sig a JOIN sig b
              ON a.band_lo = b.band_lo AND a.doc_id < b.doc_id
        ), pred AS (
            SELECT DISTINCT doc_a, doc_b FROM cand
            WHERE bit_count(xor(sa, sb)) <= 3
        ), tp AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS c
            FROM truth p JOIN pred q
              ON p.doc_a = q.doc_a AND p.doc_b = q.doc_b
        ), nt AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS c FROM truth
        ), np AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS c FROM pred
        )
        SELECT nt.c AS n_truth, np.c AS n_pred, tp.c AS n_tp,
               CAST((1000000 * tp.c) // np.c AS BIGINT) AS precision_ppm,
               CAST((1000000 * tp.c) // nt.c AS BIGINT) AS recall_ppm
        FROM nt CROSS JOIN np CROSS JOIN tp
        """,
        tags=("ext-dedup", "ext-quality"),
    )
    def q_dedup_method_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Dedup-method evaluation: precision/recall of the cheap SimHash
        detector (hamming <= 3) against the exact 3-gram Jaccard >= 0.4
        ground truth — the audit a pipeline runs before trusting an
        approximate dedup pass at scale (false positives delete good
        data; false negatives leak duplicates into training). Exact
        integer counts + ppm ratios; both sides are the repo's existing
        corpus-safe pair generators."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        truth = dedup.ngram_jaccard_pairs(docs).select("doc_a", "doc_b")
        pred = dedup.simhash_near_dup_pairs(docs).select("doc_a", "doc_b")
        nt = truth.agg(F.count("*").cast("long").alias("n_truth"))
        np_ = pred.agg(F.count("*").cast("long").alias("n_pred"))
        tp = (
            truth.join(pred, ["doc_a", "doc_b"])
            .agg(F.count("*").cast("long").alias("n_tp"))
        )
        return (
            nt.crossJoin(np_)
            .crossJoin(tp)
            .withColumn(
                "precision_ppm",
                F.expr("(1000000 * n_tp) div n_pred").cast("long"),
            )
            .withColumn(
                "recall_ppm",
                F.expr("(1000000 * n_tp) div n_truth").cast("long"),
            )
        )


_register_pr()


def _register_scale():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "embedding_dim_robust_scale",
        sql="""
        WITH m AS (
            SELECT i AS dim,
                   CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                       AS mv
            FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               quantile_cont(mv, 0.25) AS q1_milli,
               quantile_cont(mv, 0.5) AS median_milli,
               quantile_cont(mv, 0.75) AS q3_milli,
               quantile_cont(mv, 0.75) - quantile_cont(mv, 0.25) AS iqr_milli
        FROM m GROUP BY dim
        """,
        tags=("ext-sim", "ext-stats", "ext-profile"),
    )
    def q_embedding_dim_robust_scale(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-dimension robust-scaling parameters (median / IQR over
        milli-snapped components) — the outlier-immune normalization a
        pipeline fits before quantization or distance work (mean/std
        from embedding_dim_variance_rank shifts under heavy tails;
        median/IQR does not). Exact interpolated percentiles: Spark
        `percentile` and DuckDB `quantile_cont` share the (n-1)*p
        definition, and quarter-step interpolants over integers are
        exact doubles. One posexplode + 64-group percentile aggregate."""
        emb = T(spark, sf_dir, "embeddings")
        m = emb.select(F.posexplode("embedding").alias("i0", "e")).select(
            (F.col("i0") + 1).cast("long").alias("dim"),
            F.floor(F.col("e").cast("double") * 1000)
            .cast("long")
            .alias("mv"),
        )
        return m.groupBy("dim").agg(
            F.expr("percentile(mv, 0.25)").alias("q1_milli"),
            F.expr("percentile(mv, 0.5)").alias("median_milli"),
            F.expr("percentile(mv, 0.75)").alias("q3_milli"),
            F.expr("percentile(mv, 0.75) - percentile(mv, 0.25)").alias(
                "iqr_milli"
            ),
        )


_register_scale()


def _register_mix():
    from politicamente_etl_spark.operators import sampling
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "mix_schedule_realized",
        sql="""
        WITH c AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), t AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c
        ), s AS (
            SELECT source,
                   CAST(floor(sqrt(CAST(n_docs AS DOUBLE)
                                   / CAST(n_total AS DOUBLE)) * 1e9)
                        AS BIGINT) AS w_micro
            FROM c CROSS JOIN t
        ), wt AS (
            SELECT CAST(SUM(w_micro) AS BIGINT) AS w_total FROM s
        ), b AS (
            SELECT source,
                   CAST((6000 * w_micro) // w_total AS BIGINT) AS budget
            FROM s CROSS JOIN wt
        ), d AS (
            SELECT dd.source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST((len(list_distinct(string_split(text, ' '))) * 1000)
                        // len(string_split(text, ' ')) AS BIGINT) AS q_milli,
                   b.budget
            FROM documents dd JOIN b ON dd.source = b.source
        )
        SELECT source, doc_id, q_milli, n_tokens, budget,
               CAST(SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY q_milli DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY q_milli DESC, doc_id) AS INT) AS q_rank
        FROM d
        QUALIFY cum_tokens <= budget
        """,
        tags=("ext-sample", "ext-docs"),
    )
    def q_mix_schedule_realized(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The data-mixing pipeline END TO END: temperature-scaled source
        weights (T=2, integer micro) allocate a 6000-token global budget
        per source, then greedy best-quality-first whole-document
        selection realizes each allocation — the composition of
        temperature_mix_weights and select_by_token_budget that an
        actual pretraining mix job runs (weights -> budgets -> document
        lists), auditable row by row."""
        docs = T(spark, sf_dir, "documents").select("source", "doc_id", "text")
        counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
        total = counts.agg(F.sum("n_docs").cast("long").alias("n_total"))
        w = counts.crossJoin(F.broadcast(total)).select(
            "source",
            F.floor(
                F.sqrt(
                    F.col("n_docs").cast("double")
                    / F.col("n_total").cast("double")
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("w_micro"),
        )
        wt = w.agg(F.sum("w_micro").cast("long").alias("w_total"))
        budgets = w.crossJoin(F.broadcast(wt)).select(
            "source",
            F.expr("(6000 * w_micro) div w_total").cast("long").alias("budget"),
        )
        toks = F.split(F.col("text"), " ")
        d = docs.join(F.broadcast(budgets), "source").select(
            "source",
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.expr(
                "CAST((size(array_distinct(split(text, ' '))) * 1000)"
                " div size(split(text, ' ')) AS BIGINT)"
            ).alias("q_milli"),
            "budget",
        )
        return sampling.select_by_token_budget(
            d, group_col="source", budget_col="budget"
        ).select(
            "source", "doc_id", "q_milli", "n_tokens", "budget",
            "cum_tokens", "q_rank",
        )

    @register(
        "char_coverage_curve",
        sql="""
        WITH ch AS (
            SELECT unnest([text[i] for i in range(1, length(text) + 1)]) AS c
            FROM documents
        ), f AS (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS n
            FROM ch WHERE c <> ' ' GROUP BY c
        ), t AS (
            SELECT CAST(SUM(n) AS BIGINT) AS total FROM f
        )
        SELECT c AS ch, n,
               CAST((1000000 * SUM(n) OVER (ORDER BY n DESC, c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    // total AS BIGINT) AS cum_ppm
        FROM f CROSS JOIN t
        ORDER BY n DESC, c
        LIMIT 20
        """,
        tags=("ext-text", "ext-profile"),
    )
    def q_char_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Character-coverage curve (the SentencePiece character_coverage
        input): corpus character frequencies, cumulative ppm in
        frequency order — where the curve crosses 999500 ppm is the
        alphabet a byte-fallback tokenizer must keep. The histogram is a
        tiny aggregate; the cumulative window ranges over the alphabet,
        not the corpus."""
        docs = T(spark, sf_dir, "documents").select("text")
        ch = docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text)),"
                    " i -> substring(text, i, 1))"
                )
            ).alias("c")
        ).filter(F.col("c") != " ")
        f = ch.groupBy("c").agg(F.count("*").cast("long").alias("n"))
        t = f.agg(F.sum("n").cast("long").alias("total"))
        return (
            f.crossJoin(F.broadcast(t))
            .select(
                F.col("c").alias("ch"),
                "n",
                F.expr(
                    "CAST((1000000 * sum(n) OVER (ORDER BY n DESC, c"
                    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
                    " div total AS BIGINT)"
                ).alias("cum_ppm"),
            )
            .orderBy(F.col("n").desc(), "ch")
            .limit(20)
        )


_register_mix()
