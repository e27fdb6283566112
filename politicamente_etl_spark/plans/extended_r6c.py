"""Round-6 prep batch 3: k-core graph peeling, BPE merge-candidate
counting, per-source unigram KL drift, and lakehouse schema evolution —
a graph-density primitive, the tokenizer-training counting pass, the
distribution-shift score behind mixture rebalancing, and the
add-a-column contract every long-lived table eventually needs.

Parity rules as the earlier extended modules. New oracle techniques
here: the k-core peel unrolls its fixed round budget into generated
CTE chains (simultaneous peeling is deterministic, so round r's graph
is a pure function of round r-1's), and KL reuses the proven micro-nat
ln snap (round(ln(p)*1e6), engine-exact per unigram_logprob_quality)
with integer-count weighting so the cross-term sum stays exact.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.functions.scalar import money_sum, sql_money_sum

_KCORE_K = 3
_KCORE_ROUNDS = 4


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled peeling oracle: e0 = support-2 co-purchase edges; each
    round keeps nodes with degree >= k and edges with both ends kept."""
    ctes = [
        """
        li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        )"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""
        k{r} AS MATERIALIZED (
            SELECT n FROM (
                SELECT u AS n FROM e{r - 1}
                UNION ALL SELECT v FROM e{r - 1}
            ) GROUP BY n HAVING COUNT(*) >= {k}
        ),
        e{r} AS MATERIALIZED (
            SELECT u, v FROM e{r - 1}
            WHERE u IN (SELECT n FROM k{r}) AND v IN (SELECT n FROM k{r})
        )"""
        )
    stats = "\n        UNION ALL ".join(
        f"""SELECT {r} AS round,
               (SELECT CAST(COUNT(DISTINCT n) AS BIGINT) FROM (
                    SELECT u AS n FROM e{r} UNION ALL SELECT v FROM e{r})
               ) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges"""
        for r in range(0, rounds + 1)
    )
    return (
        "WITH "
        + ",".join(ctes)
        + f"\n        SELECT CAST(round AS INT) AS round, n_nodes, n_edges"
        + f"\n        FROM ({stats})"
    )


def _register():
    from politicamente_etl_spark.operators import graph, text
    from politicamente_etl_spark.plans.catalog import T, register

    # -- k-core peeling -----------------------------------------------------

    @register(
        "kcore_peeling_rounds",
        sql=_kcore_sql(_KCORE_K, _KCORE_ROUNDS),
        tags=("ext-graph",),
    )
    def q_kcore_peeling_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Four rounds of 3-core peeling on the support-2 co-purchase
        graph (same edge set as copurchase_triangles): per-round
        surviving node/edge counts — the density stratification that
        separates the cohesive product core from the tree-like fringe.
        Simultaneous peeling is deterministic (no tie-breaks); each
        round is one degree aggregate + two semi-joins, and the whole
        report is a single lazy job."""
        li = (
            T(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        # r9 opt: one-shuffle pair builder; identical support-2 edges.
        e = (
            graph.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
            .filter(F.col("cnt") >= 2)
            .select(
                F.col("pa").alias("src"), F.col("pb").alias("dst")
            )
        )
        return graph.kcore_peel(e, k=_KCORE_K, rounds=_KCORE_ROUNDS)

    # -- BPE pair counting --------------------------------------------------

    @register(
        "bpe_pair_counts",
        sql="""
        WITH w AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE length(w) >= 2
            GROUP BY w
        ), p AS (
            SELECT wf,
                   unnest([substring(w, i, 2)
                           for i in range(1, length(w))]) AS pair
            FROM w
        )
        SELECT pair,
               CAST(SUM(wf) AS BIGINT) AS n_occurrences,
               CAST(COUNT(*) AS BIGINT) AS n_vocab_positions
        FROM p WHERE length(pair) = 2
        GROUP BY pair
        ORDER BY n_occurrences DESC, pair
        LIMIT 10
        """,
        tags=("ext-text",),
    )
    def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Top-10 BPE merge candidates over the document corpus: adjacent
        character-pair counts weighted by word frequency — the counting
        pass of tokenizer training (Sennrich et al. 2016), where the
        expensive corpus scan collapses to a vocabulary-sized pair
        explode after the word-frequency aggregate."""
        docs = T(spark, sf_dir, "documents").select("text")
        return text.bpe_pair_stats(docs, top_k=10)

    # -- per-source KL drift ------------------------------------------------

    @register(
        "source_unigram_kl",
        sql="""
        WITH toks AS (
            SELECT source AS g, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), cgw AS (
            SELECT g, term, CAST(COUNT(*) AS BIGINT) AS c_gw
            FROM toks GROUP BY 1, 2
        ), ng AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g FROM toks GROUP BY 1
        ), cw AS (
            SELECT term, CAST(SUM(c_gw) AS BIGINT) AS c_w FROM cgw GROUP BY 1
        ), n AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM toks
        )
        SELECT g AS source,
               CAST(SUM(c_gw) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
               CAST(SUM(c_gw * (
                    CAST(round(ln(CAST(c_gw AS DOUBLE) / CAST(n_g AS DOUBLE))
                               * 1e6) AS BIGINT)
                  - CAST(round(ln(CAST(c_w AS DOUBLE) / CAST(n_tot AS DOUBLE))
                               * 1e6) AS BIGINT)))
                    AS BIGINT) AS kl_micro_tokens
        FROM cgw
        JOIN cw USING (term)
        JOIN ng USING (g)
        CROSS JOIN n
        GROUP BY g
        """,
        tags=("ext-text", "ext-quality", "ext-stats"),
    )
    def q_source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-source distribution drift: exact-integer KL numerator of
        each source's unigram distribution against the corpus mixture
        (micro-nat-snapped logs x integer counts) — the domain-shift
        score behind DSIR-style reweighting and mixture rebalancing."""
        docs = T(spark, sf_dir, "documents").select("source", "text")
        return text.source_unigram_kl(docs, group_col="source")

    # -- lakehouse schema evolution -----------------------------------------

    @register(
        "txlog_schema_evolution",
        sql=f"""
        WITH rows_all AS (
            SELECT c_custkey, c_name, NULL::DOUBLE AS c_acctbal
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT c_custkey, c_name, c_acctbal
            FROM customer WHERE c_custkey % 3 = 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(c_acctbal) AS BIGINT) AS n_with_acctbal,
               CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
               {sql_money_sum('COALESCE(c_acctbal, 0)', 'acctbal_sum')}
        FROM rows_all
        """,
        tags=("ext-sink",),
    )
    def q_txlog_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Schema evolution on the commit-log table: create with a narrow
        customer projection, then append a WIDENED batch (new c_acctbal
        column) under merge_schema=True; the snapshot read unions by
        name across commit layouts, null-filling the pre-evolution rows
        — the add-a-column contract (Delta's mergeSchema) proven
        end-to-end through the log: old files are never rewritten, the
        new column is born at its commit. The oracle derives the same
        contents from the commit definitions over the source parquet."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        c = T(spark, sf_dir, "customer")
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_se_"), "t")
        base = c.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey", "c_name"
        )
        widened = c.filter(F.col("c_custkey") % 3 == 1).select(
            "c_custkey", "c_name", "c_acctbal"
        )
        t = TxLogTable.create(spark, path, base)
        t.append(widened, merge_schema=True)
        snap = t.snapshot()
        return snap.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count("c_acctbal").cast("long").alias("n_with_acctbal"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
            money_sum(F.coalesce(F.col("c_acctbal"), F.lit(0)), "acctbal_sum"),
        )


_register()
