"""Streaming reads OF the commit-log table (sources/txlogstream.py):
version-offset micro-batches, append-only discipline, rewrite refusal."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.sources.txlog import TxLogTable

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def registered(spark):
    from politicamente_etl_spark.sources.txlogstream import TxLogStreamDataSource

    spark.dataSource.register(TxLogStreamDataSource)
    return spark


def orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def _start(spark, path, name):
    return (
        spark.readStream.format("txlogstream")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def test_stream_tails_commits_incrementally(registered, tmp_path):
    spark = registered
    o = orders(spark)
    t = TxLogTable.create(spark, str(tmp_path / "s"), o.filter(F.col("o_orderkey") % 3 == 0))
    q = _start(spark, t.path, "txs1")
    try:
        q.processAllAvailable()
        n1 = spark.table("txs1").count()
        assert n1 == o.filter(F.col("o_orderkey") % 3 == 0).count()
        # new commits appear incrementally — only the delta is emitted
        t.append(o.filter(F.col("o_orderkey") % 3 == 1))
        q.processAllAvailable()
        n2 = spark.table("txs1").count()
        assert n2 == o.filter(F.col("o_orderkey") % 3 != 2).count()
        # no duplicates: the first commit's rows were not re-read
        dups = (
            spark.table("txs1")
            .groupBy("o_orderkey")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dups == 0
    finally:
        q.stop()


def test_stream_skips_optimize_and_refuses_merge(registered, tmp_path):
    spark = registered
    o = orders(spark)
    t = TxLogTable.create(spark, str(tmp_path / "m"), o.limit(0))
    for i in range(3):
        t.append(o.filter(F.col("o_orderkey") % 50 == i).coalesce(1))
    q = _start(spark, t.path, "txs2")
    try:
        q.processAllAvailable()
        n = spark.table("txs2").count()
        # optimize rewrites layout, not contents → stream must emit nothing
        t.optimize(target_file_bytes=1 << 30)
        q.processAllAvailable()
        assert spark.table("txs2").count() == n
        # merge rewrites rows → the stream must fail loudly
        t.merge(
            o.filter(F.col("o_orderkey") % 50 == 0).withColumn(
                "o_orderpriority", F.lit("X")
            ),
            ["o_orderkey"],
        )
        with pytest.raises(Exception, match="ignore_changes|Stream|query"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_stream_ignore_changes_skips_rewrites(registered, tmp_path):
    spark = registered
    o = orders(spark)
    t = TxLogTable.create(spark, str(tmp_path / "i"), o.filter(F.col("o_orderkey") % 2 == 0))
    t.merge(
        o.filter(F.col("o_orderkey") % 4 == 0).withColumn(
            "o_orderpriority", F.lit("X")
        ),
        ["o_orderkey"],
    )
    q = (
        spark.readStream.format("txlogstream")
        .option("path", t.path)
        .option("ignore_changes", "true")
        .load()
        .writeStream.format("memory")
        .queryName("txs3")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # only the create commit's rows; the merge rewrite was skipped
        assert (
            spark.table("txs3").count()
            == o.filter(F.col("o_orderkey") % 2 == 0).count()
        )
    finally:
        q.stop()


def test_stream_refuses_delete_without_flag(spark, sf_dir):
    """A logical-delete commit must STOP the tail (loud failure), not
    silently drop the retraction — and ignore_deletes=true opts into
    skipping it, Delta's ignoreDeletes contract."""
    import os
    import tempfile

    import pytest
    from pyspark.sql import functions as F

    from politicamente_etl_spark.sources.txlog import TxLogTable
    from politicamente_etl_spark.sources.txlogstream import (
        TxLogStreamDataSource,
    )

    try:
        spark.dataSource.register(TxLogStreamDataSource)
    except Exception:
        pass
    df = spark.range(0, 200).selectExpr("id as k", "id % 5 as g")
    path = os.path.join(tempfile.mkdtemp(prefix="igdel_"), "t")
    t = TxLogTable.create(spark, path, df)
    t.delete_where_rowindex("g = 2")
    name = "igdel_refuse_" + os.path.basename(os.path.dirname(path))
    q = (
        spark.readStream.format("txlogstream")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    with pytest.raises(Exception, match="ignore_deletes"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_stream_skips_constraints_and_reads_clone_create(spark):
    """Metadata-only commits (set_constraint) must be tail-invisible,
    and a shallow clone's v1 must stream like create (it IS the
    initial data of the cloned table)."""
    import os
    import tempfile

    from politicamente_etl_spark.sources.txlog import TxLogTable
    from politicamente_etl_spark.sources.txlogstream import (
        TxLogStreamDataSource,
    )

    try:
        spark.dataSource.register(TxLogStreamDataSource)
    except Exception:
        pass
    df = spark.range(0, 100).selectExpr("id as k", "id % 3 as g")
    base = tempfile.mkdtemp(prefix="igmeta_")
    t = TxLogTable.create(spark, os.path.join(base, "src"), df)
    t.set_constraint("k_pos", "k >= 0")
    t.append(spark.range(100, 150).selectExpr("id as k", "id % 3 as g"))
    c = t.clone_shallow(os.path.join(base, "clone"))
    for path, expect in ((t.path, 150), (c.path, 150)):
        name = "igmeta_" + os.path.basename(path)
        q = (
            spark.readStream.format("txlogstream")
            .option("path", path)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert spark.table(name).count() == expect
