"""Round-6 batch G: deterministic random-walk corpus generation — the
graph-embedding data pipeline's sampling stage (DeepWalk/node2vec prep)
under the repo's no-RNG rule: hash-ranked transitions make the walk
corpus a pure function of the graph, so the oracle unrolls the exact
same three steps as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EDGE_CTES = """
        li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), e0 AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ), e AS (
            SELECT pa AS s, pb AS d FROM e0
            UNION
            SELECT pb AS s, pa AS d FROM e0
        )
"""


def _step(t: int) -> str:
    prev = f"f{t - 1}"
    return f"""
        c{t} AS (
            SELECT {prev}.walk, {prev}.seed_node, e.d AS cand,
                   md5(concat_ws(':', 'walk-v1',
                       CAST({prev}.walk AS VARCHAR), '{t}',
                       CAST({prev}.node AS VARCHAR),
                       CAST(e.d AS VARCHAR))) AS h
            FROM {prev} JOIN e ON {prev}.node = e.s
        ), b{t} AS (
            SELECT walk, seed_node, MIN(h) AS mh
            FROM c{t} GROUP BY 1, 2
        ), f{t} AS (
            SELECT c{t}.walk, c{t}.seed_node, c{t}.cand AS node
            FROM c{t} JOIN b{t}
              ON c{t}.walk = b{t}.walk AND c{t}.seed_node = b{t}.seed_node
            WHERE c{t}.h = b{t}.mh
        )"""


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "copurchase_walk_corpus",
        sql=f"""
        WITH {_EDGE_CTES},
        n AS (SELECT DISTINCT s AS node FROM e),
        w AS (SELECT UNNEST(generate_series(0, 1)) AS walk),
        f0 AS (SELECT walk, node AS seed_node, node FROM n, w),
        {_step(1)},
        {_step(2)},
        {_step(3)},
        visits AS (
            SELECT node FROM f0
            UNION ALL SELECT node FROM f1
            UNION ALL SELECT node FROM f2
            UNION ALL SELECT node FROM f3
        )
        SELECT node AS part, CAST(COUNT(*) AS BIGINT) AS n_visits
        FROM visits GROUP BY node
        ORDER BY n_visits DESC, part LIMIT 20
        """,
        tags=("ext-rel", "ext-graph", "ext-sampling"),
    )
    def q_copurchase_walk_corpus(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Walk-corpus hub profile: 2 deterministic 3-step walks start
        from every node of the co-purchase graph (same support-2 edge
        set as copurchase_pagerank); transitions hash-rank neighbors by
        md5(seed:walk:step:u:v) — graph.md5_random_walks — and the top
        20 most-visited parts summarize the corpus a skip-gram embedder
        would train on (visit mass ≈ the walk-stationary centrality,
        cheaper than the power iteration). The oracle unrolls the SAME
        three steps as CTEs — possible only because the walk is a pure
        function of the graph, no RNG state anywhere.

        Scale shape: per step ONE frontier-onto-edges equi-join + one
        min aggregate + a min-match self-join (BSP, lineage cut per
        round); the corpus is n_nodes × n_walks rows per step. At
        100 TB the frontier join partitions by current node like every
        other iterative-graph op here."""
        from politicamente_etl_spark.operators.graph import (
            cooccurrence_pairs,
            md5_random_walks,
        )

        li = (
            T(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        # r9 opt: one-shuffle pair builder; identical support-2 edges.
        e = (
            cooccurrence_pairs(li, "l_orderkey", "l_partkey")
            .filter(F.col("cnt") >= 2)
            .select(
                F.col("pa").alias("src"), F.col("pb").alias("dst")
            )
        )
        visits = md5_random_walks(e, walk_len=3, n_walks=2)
        return (
            visits.groupBy(F.col("node").alias("part"))
            .agg(F.count("*").cast("long").alias("n_visits"))
            .orderBy(F.col("n_visits").desc(), "part")
            .limit(20)
        )


_register()


def _register_skipgram():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "copurchase_skipgram_pairs",
        sql=f"""
        WITH {_EDGE_CTES},
        n AS (SELECT DISTINCT s AS node FROM e),
        w AS (SELECT UNNEST(generate_series(0, 1)) AS walk),
        f0 AS (SELECT walk, node AS seed_node, node FROM n, w),
        {_step(1)},
        {_step(2)},
        {_step(3)},
        corpus AS (
            SELECT walk, seed_node, 0 AS step, node FROM f0
            UNION ALL SELECT walk, seed_node, 1, node FROM f1
            UNION ALL SELECT walk, seed_node, 2, node FROM f2
            UNION ALL SELECT walk, seed_node, 3, node FROM f3
        )
        SELECT a.node AS center, b.node AS context,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM corpus a JOIN corpus b
          ON a.walk = b.walk AND a.seed_node = b.seed_node
         AND abs(a.step - b.step) BETWEEN 1 AND 2
        GROUP BY 1, 2
        ORDER BY n_pairs DESC, center, context LIMIT 50
        """,
        tags=("ext-rel", "ext-graph", "ext-sampling"),
    )
    def q_copurchase_skipgram_pairs(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The skip-gram training pairs a word2vec-style embedder
        consumes, generated from the deterministic walk corpus: within
        each walk sequence, every (center, context) pair at step
        distance 1-2 — exactly the windowing DeepWalk applies to its
        trajectories, with walks standing in for sentences. One
        self-join keyed by (walk, seed) — each group is walk_len+1
        rows, so the join is bounded per walk regardless of graph
        size — then a pair rollup. Top-50 heaviest pairs fingerprint
        the corpus; the full relation is the embedder's input."""
        from politicamente_etl_spark.operators.graph import (
            cooccurrence_pairs,
            md5_random_walks,
        )

        li = (
            T(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        # r9 opt: one-shuffle pair builder; identical support-2 edges.
        e = (
            cooccurrence_pairs(li, "l_orderkey", "l_partkey")
            .filter(F.col("cnt") >= 2)
            .select(
                F.col("pa").alias("src"), F.col("pb").alias("dst")
            )
        )
        corpus = md5_random_walks(e, walk_len=3, n_walks=2)
        ca, cb = corpus.alias("ca"), corpus.alias("cb")
        dist = F.abs(F.col("ca.step") - F.col("cb.step"))
        return (
            ca.join(
                cb,
                (F.col("ca.walk") == F.col("cb.walk"))
                & (F.col("ca.seed_node") == F.col("cb.seed_node"))
                & dist.between(1, 2),
            )
            .groupBy(
                F.col("ca.node").alias("center"),
                F.col("cb.node").alias("context"),
            )
            .agg(F.count("*").cast("long").alias("n_pairs"))
            .orderBy(F.col("n_pairs").desc(), "center", "context")
            .limit(50)
        )


_register_skipgram()
