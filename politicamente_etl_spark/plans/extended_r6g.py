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
