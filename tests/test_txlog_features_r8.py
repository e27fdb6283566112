"""Generated columns and rename-without-rewrite (round-8 batch H)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.sources.txlog import (
    ConstraintViolation,
    TxLogTable,
)


def _mk(spark, prefix="feat_"):
    path = os.path.join(tempfile.mkdtemp(prefix=prefix), "t")
    df = spark.range(0, 100).selectExpr(
        "id as k",
        "cast(id * 1.5 as double) as price",
        "cast(floor(id * 1.5 * 100) as bigint) as cents",
    )
    return TxLogTable.create(spark, path, df), path


GEN = "CAST(floor(price * 100) AS BIGINT)"


def test_generated_column_computes_when_absent(spark):
    t, _ = _mk(spark)
    t.set_generated_column("cents", GEN)
    t.append(
        spark.range(100, 150).selectExpr(
            "id as k", "cast(id * 1.5 as double) as price"
        )
    )
    snap = t.snapshot()
    assert snap.count() == 150
    assert (
        snap.filter(~F.col("cents").eqNullSafe(F.expr(GEN))).count() == 0
    )


def test_generated_column_rejects_wrong_values_atomically(spark):
    t, _ = _mk(spark)
    t.set_generated_column("cents", GEN)
    v = t.latest_version()
    with pytest.raises(ConstraintViolation):
        t.append(
            spark.range(200, 210).selectExpr(
                "id as k",
                "cast(id * 1.5 as double) as price",
                "cast(0 as bigint) as cents",
            )
        )
    assert t.latest_version() == v, "nothing may commit on violation"
    # correct provided values pass (idempotent with the expression)
    t.append(
        spark.range(200, 210).selectExpr(
            "id as k",
            "cast(id * 1.5 as double) as price",
            "cast(floor(id * 1.5 * 100) as bigint) as cents",
        )
    )
    assert t.snapshot().count() == 110


def test_generated_column_merge_path_and_drop(spark):
    t, _ = _mk(spark)
    t.set_generated_column("cents", GEN)
    # merge WITHOUT the generated column: computed for the upsert batch
    t.merge(
        spark.range(90, 120).selectExpr(
            "id as k", "cast(id * 3.0 as double) as price"
        ),
        keys=["k"],
    )
    snap = t.snapshot()
    assert snap.count() == 120
    assert (
        snap.filter(~F.col("cents").eqNullSafe(F.expr(GEN))).count() == 0
    )
    # dropping the rule ends both computation and validation
    t.set_generated_column("cents", None)
    t.append(
        spark.range(500, 505).selectExpr(
            "id as k",
            "cast(id * 1.5 as double) as price",
            "cast(-1 as bigint) as cents",
        )
    )
    assert t.snapshot().filter("cents = -1").count() == 5


def test_rename_spans_vintages_and_prunes(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="ren_"), "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 100).selectExpr(
            "id as k", "cast(id * 2.0 as double) as amount"
        ),
    )
    t.rename_column("amount", "value_usd")
    t.append(
        spark.range(100, 150).selectExpr(
            "id as k", "cast(id * 2.0 as double) as value_usd"
        )
    )
    snap = t.snapshot()
    assert set(snap.columns) == {"k", "value_usd"}
    assert snap.count() == 150
    assert snap.filter(F.col("value_usd") != F.col("k") * 2.0).count() == 0
    # zonemap remap: predicates on the NEW name prune pre-rename files
    kept, total = t.scan_files({"value_usd": (250.0, None)})
    assert len(kept) < total
    assert (
        t.scan({"value_usd": (250.0, None)}).count()
        == snap.filter("value_usd >= 250.0").count()
    )
    # time travel to the pre-rename version shows the OLD name
    assert "amount" in t.snapshot(version=1).columns
    # retired logical name is rejected for new writes
    with pytest.raises(ValueError, match="schema drift"):
        t.append(
            spark.range(0, 5).selectExpr(
                "id as k", "cast(1.0 as double) as amount"
            )
        )
    # chained rename composes
    t.rename_column("value_usd", "v2")
    assert set(t.snapshot().columns) == {"k", "v2"}


def test_rename_guards(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="ren_g_"), "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 50).selectExpr("id as k", "id % 3 as g"),
    )
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    t.delete_where_logical(
        "k", keys_df=spark.range(0, 5).selectExpr("id as k")
    )
    with pytest.raises(ValueError, match="tombstone key"):
        t.rename_column("k", "key")
    # deletion vectors are positional — renaming their table is fine
    t.delete_where_rowindex("g = 1")
    t.rename_column("g", "grp")
    assert t.snapshot().filter("grp = 1").count() == 0
    t.set_constraint("g_pos", "grp >= 0")
    with pytest.raises(ValueError, match="live expression"):
        t.rename_column("grp", "g3")


def test_stream_refuses_rename(spark):
    from politicamente_etl_spark.sources.txlogstream import (
        TxLogStreamDataSource,
    )

    try:
        spark.dataSource.register(TxLogStreamDataSource)
    except Exception:
        pass
    path = os.path.join(tempfile.mkdtemp(prefix="ren_s_"), "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 20).selectExpr("id as k", "id % 3 as g"),
    )
    t.rename_column("g", "grp")
    name = "ren_stream_" + os.path.basename(os.path.dirname(path))
    q = (
        spark.readStream.format("txlogstream")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    with pytest.raises(Exception, match="renames a column"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
