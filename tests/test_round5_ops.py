"""Round-5 batch-2 operators: Bloom-filter join pruning (txlog has its
own suite in test_txlog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from politicamente_etl_spark.operators.joins import bloom_prefilter

from tests.conftest import SF_DIR


def _tables(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return li, o


def test_bloom_prefilter_no_false_negatives(spark):
    li, o = _tables(spark)
    build = o.filter(F.col("o_orderpriority") == "1-URGENT")
    pruned = bloom_prefilter(li, build, "l_orderkey", "o_orderkey")
    # every true match survives: join through the pruned side equals the
    # plain join exactly (Bloom admits false positives only)
    j_pruned = (
        pruned.join(build, pruned.l_orderkey == build.o_orderkey)
        .agg(F.count("*"), F.sum("l_quantity"))
        .first()
    )
    j_plain = (
        li.join(build, li.l_orderkey == build.o_orderkey)
        .agg(F.count("*"), F.sum("l_quantity"))
        .first()
    )
    assert tuple(j_pruned) == tuple(j_plain)


def test_bloom_prefilter_actually_prunes(spark):
    li, o = _tables(spark)
    build = o.filter(F.col("o_orderpriority") == "1-URGENT")  # ~20% of orders
    pruned = bloom_prefilter(li, build, "l_orderkey", "o_orderkey")
    n_all = li.count()
    n_pruned = pruned.count()
    n_true = li.join(
        build.select("o_orderkey"), li.l_orderkey == build.o_orderkey, "semi"
    ).count()
    # prunes the vast majority of non-matching rows, keeps all matches
    assert n_true <= n_pruned < 0.5 * n_all


def test_bloom_false_positive_rate_bounded_when_undersized(spark):
    li, o = _tables(spark)
    build = o.filter(F.col("o_orderpriority") == "1-URGENT")
    # deliberately tiny filter (4096 bits for ~300 keys) still keeps the
    # fp rate usable and NEVER drops a true match
    pruned = bloom_prefilter(
        li, build, "l_orderkey", "o_orderkey", num_bits=1 << 12, num_hashes=3
    )
    n_true = li.join(
        build.select("o_orderkey"), li.l_orderkey == build.o_orderkey, "semi"
    ).count()
    survivors = pruned.count()
    assert survivors >= n_true
    matches = pruned.join(
        build.select("o_orderkey"), pruned.l_orderkey == build.o_orderkey, "semi"
    ).count()
    assert matches == n_true


def test_bloom_bits_are_broadcast_in_plan(spark):
    li, o = _tables(spark)
    build = o.filter(F.col("o_orderpriority") == "1-URGENT")
    pruned = bloom_prefilter(li, build, "l_orderkey", "o_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pagerank_integer_matches_reference_sweeps(spark):
    # star graph: hub 1 — leaves 2,3,4; plus isolated pair 5-6
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 6)], ["src", "dst"]
    )
    from politicamente_etl_spark.operators.graph import pagerank_integer

    got = {
        r.node: r.rank
        for r in pagerank_integer(edges, iterations=2, init=10**12).collect()
    }
    # reference sweeps in plain python ints (same formula)
    deg = {1: 3, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}
    nbrs = {1: [2, 3, 4], 2: [1], 3: [1], 4: [1], 5: [6], 6: [5]}
    r = {n: 10**12 for n in deg}
    for _ in range(2):
        r = {
            v: 15 * 10**12 // 100
            + 85 * sum(r[u] // deg[u] for u in nbrs[v]) // 100
            for v in deg
        }
    assert got == r
    # hub outranks leaves; the isolated pair keeps its symmetric mass
    assert got[1] > got[2] == got[3] == got[4]
    assert got[5] == got[6]


def test_personalized_pagerank_confines_mass_to_seed_neighborhood(spark):
    # path graph 1-2-3-4-5, seed at node 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    from politicamente_etl_spark.operators.graph import pagerank_integer

    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {
        r.node: r.rank
        for r in pagerank_integer(
            edges, iterations=2, init=10**12, personalize=seeds
        ).collect()
    }
    # python reference with identical integer ops
    deg = {1: 1, 2: 2, 3: 2, 4: 2, 5: 1}
    nbrs = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4]}
    r = {n: (10**12 if n == 1 else 0) for n in deg}
    for _ in range(2):
        r = {
            v: (15 * 10**12 // 100 if v == 1 else 0)
            + 85 * sum(r[u] // deg[u] for u in nbrs[v]) // 100
            for v in deg
        }
    assert got == r
    # mass near the seed; nodes beyond 2 hops still untouched
    assert got[1] > 0 and got[2] > 0 and got[3] > 0
    assert got[4] == 0 and got[5] == 0


def test_weighted_median_gagg_matches_window_form(spark):
    from politicamente_etl_spark.operators.agg import weighted_median_gagg
    from politicamente_etl_spark.plans.catalog import CATALOG

    exact = {
        r.l_returnflag: r.weighted_median_price
        for r in CATALOG["weighted_median_freight"].fn(spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    wm = weighted_median_gagg()
    got = {
        r.l_returnflag: r.m
        for r in li.groupBy("l_returnflag")
        .agg(wm(F.col("l_extendedprice"), F.col("l_quantity").cast("long")).alias("m"))
        .collect()
    }
    assert got == exact


def test_pagerank_oriented_unique_flag_matches_default_path(spark):
    """r9-opt: `edges_oriented_unique=True` skips the defensive
    filter+distinct on the symmetrized union (and the per-sweep shape
    pre-joins degree onto the checkpointed edge relation). On an input
    that satisfies the contract — DISTINCT rows with src < dst — both
    paths must produce bit-identical ranks."""
    from politicamente_etl_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (5, 6)], ["src", "dst"]
    )
    default = {
        r.node: r.rank for r in pagerank_integer(edges, iterations=2).collect()
    }
    flagged = {
        r.node: r.rank
        for r in pagerank_integer(
            edges, iterations=2, edges_oriented_unique=True
        ).collect()
    }
    assert default == flagged


def test_pagerank_sweep_is_single_join(spark):
    """r9-opt plan pin: a sweep is ONE probe join (edge-with-degree ⋈
    ranks) + one aggregate. The old shape pre-joined ranks⋈deg every
    sweep — two joins; rank div deg is per-source constant, so folding
    it onto the joined edge row sums identical integers."""
    import re

    from politicamente_etl_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 50)], ["src", "dst"]
    )
    ranks = pagerank_integer(edges, iterations=1, edges_oriented_unique=True)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    joins = re.findall(
        r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
        r"|BroadcastNestedLoopJoin|CartesianProduct",
        plan,
    )
    assert len(joins) == 1, plan
