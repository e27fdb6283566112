"""Unit tests for deterministic sampling/splits and near-dup cluster
resolution (operators/sampling.py, dedup.near_dup_clusters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from politicamente_etl_spark.operators import dedup, sampling


def test_split_is_deterministic_and_total(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sampling.with_split(df).orderBy("doc_id").collect()
    b = sampling.with_split(df).orderBy("doc_id").collect()
    assert a == b
    splits = {r["split"] for r in a}
    assert splits == {"train", "val", "test"}
    n_train = sum(r["split"] == "train" for r in a)
    assert 0.85 < n_train / 2000 < 0.95  # ~90% within hash noise


def test_split_stable_under_appends(spark):
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s = {r["doc_id"]: r["split"] for r in sampling.with_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.with_split(big).collect()}
    assert all(b[k] == v for k, v in s.items())


def test_hash_sample_rate_and_subset_monotonicity(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    kept10 = {r["doc_id"] for r in sampling.hash_sample(df, 0.10).collect()}
    kept20 = {r["doc_id"] for r in sampling.hash_sample(df, 0.20).collect()}
    assert 0.07 < len(kept10) / 5000 < 0.13
    assert kept10 <= kept20  # raising the rate only adds rows


def test_stratified_rates_per_stratum(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    out = sampling.stratified_hash_sample(
        df, {"en": 0.2, "zh": 1.0}, default_rate=0.0
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["zh"] == 2000
    assert 0.15 < counts["en"] / 2000 < 0.25


def test_near_dup_clusters_components(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 9)], ["doc_id"]
    )
    # components: {1,2,3} via chain 1-2, 2-3; {4,5}; singletons 6,7,8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["doc_a", "doc_b"]
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup.near_dup_clusters(docs, pairs).collect()
    }
    assert rows == {
        1: (1, 1), 2: (1, 0), 3: (1, 0),
        4: (4, 1), 5: (4, 0),
        6: (6, 1), 7: (7, 1), 8: (8, 1),
    }


def test_near_dup_clusters_long_chain_converges(spark):
    n = 12  # path graph 0-1-...-11: worst-case diameter for propagation
    docs = spark.range(0, n).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    out = dedup.near_dup_clusters(docs, pairs).collect()
    assert all(r["cluster_id"] == 0 for r in out)
    assert sum(r["is_canonical"] for r in out) == 1


def test_cluster_keyed_split_keeps_cluster_together(spark):
    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 50) for i in range(50)], ["doc_a", "doc_b"]
    )
    clusters = dedup.near_dup_clusters(docs, pairs)
    split = sampling.with_split(clusters, key_col="cluster_id")
    # every cluster lands in exactly one split — no train/test leakage
    n_multi = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_multi == 0


def test_write_training_shards_layout(spark, tmp_path):
    from politicamente_etl_spark.operators import sampling
    from politicamente_etl_spark.sources.sinks import write_training_shards

    df = sampling.with_split(
        spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, shard_rows=500, shuffle_key="doc_id")

    import glob
    import os

    splits = {os.path.basename(p) for p in glob.glob(f"{path}/split=*")}
    assert splits == {"split=train", "split=val", "split=test"}

    back = spark.read.parquet(path)
    assert back.count() == 3000
    # every shard respects the row bound
    for f in glob.glob(f"{path}/split=*/part-*.parquet"):
        n = spark.read.parquet(f).count()
        assert n <= 500, f
    # round trip preserves the assignment exactly
    orig = {(r["doc_id"], r["split"]) for r in df.collect()}
    got = {(r["doc_id"], r["split"]) for r in back.collect()}
    assert orig == got
