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

# sim-covered: both features ride driver queries
# (txlog_generated_column_proof / txlog_column_rename_proof) re-run by
# every full sim; full tier only, protecting the fast tier's 20-minute
# budget (VERDICT r7 item 7)
pytestmark = pytest.mark.slow


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


# -- round-8 third-pass review fixes --------------------------------------


def test_rename_merge_and_delete_target_prerename_files(spark):
    """merge()/delete_keys() after a rename must still find pre-rename
    files via the LOGICAL key name (the raw-read detection previously
    saw NULLs and inserted duplicates / skipped deletes)."""
    path = os.path.join(tempfile.mkdtemp(prefix="ren_m_"), "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 100).selectExpr(
            "id as old_k", "cast(id * 2.0 as double) as v"
        ),
    )
    t.rename_column("old_k", "k")
    # upsert hits keys living ONLY in pre-rename files
    rep = t.merge(
        spark.range(50, 120).selectExpr(
            "id as k", "cast(id * 5.0 as double) as v"
        ),
        keys=["k"],
    )
    snap = t.snapshot()
    assert snap.count() == 120, "matched keys must update, not duplicate"
    assert snap.filter("k = 60 and v = 300.0").count() == 1
    assert rep["merge_stats"]["files_rewritten"] > 0
    # copy-on-write delete by the logical name reaches pre-rename rows
    t.delete_keys(
        spark.range(0, 10).selectExpr("id as k"), keys=["k"]
    )
    assert t.snapshot().count() == 110
    assert t.snapshot().filter("k < 10").count() == 0


def test_rename_survives_checkpoint_vacuum_and_clone(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="ren_ck_"), "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 80).selectExpr(
            "id as k", "cast(id * 2.0 as double) as amount"
        ),
    )
    t.rename_column("amount", "price")  # v2
    t.append(
        spark.range(80, 100).selectExpr(
            "id as k", "cast(id * 2.0 as double) as price"
        )
    )  # v3
    t.append(
        spark.range(100, 120).selectExpr(
            "id as k", "cast(id * 2.0 as double) as price"
        )
    )  # v4
    # retention vacuum expires the rename manifest itself
    t.vacuum(retain_versions=2, sidecar_grace_sec=0.0)
    snap = t.snapshot()
    assert set(snap.columns) == {"k", "price"}
    assert snap.filter(F.col("price").isNull()).count() == 0, (
        "pre-rename files must still alias after manifest expiry"
    )
    # and the clone of a renamed table reads its source files aliased
    c = t.clone_shallow(
        os.path.join(tempfile.mkdtemp(prefix="ren_cl_"), "c")
    )
    cs = c.snapshot()
    assert set(cs.columns) == {"k", "price"}
    assert cs.filter(F.col("price").isNull()).count() == 0
    assert cs.count() == 120


def test_generated_rule_survives_vacuum_and_clone(spark):
    t, path = _mk(spark)
    t.set_generated_column("cents", GEN)
    t.append(
        spark.range(100, 120).selectExpr(
            "id as k", "cast(id * 1.5 as double) as price"
        )
    )
    t.append(
        spark.range(120, 140).selectExpr(
            "id as k", "cast(id * 1.5 as double) as price"
        )
    )
    t.vacuum(retain_versions=2, sidecar_grace_sec=0.0)
    with pytest.raises(ConstraintViolation):
        t.append(
            spark.range(900, 905).selectExpr(
                "id as k",
                "cast(id * 1.5 as double) as price",
                "cast(0 as bigint) as cents",
            )
        )
    c = t.clone_shallow(
        os.path.join(tempfile.mkdtemp(prefix="gen_cl_"), "c")
    )
    with pytest.raises(ConstraintViolation):
        c.append(
            spark.range(900, 905).selectExpr(
                "id as k",
                "cast(id * 1.5 as double) as price",
                "cast(0 as bigint) as cents",
            )
        )


def test_restore_rolls_back_rename(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="ren_rs_"), "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 50).selectExpr(
            "id as k", "cast(id * 2.0 as double) as amount"
        ),
    )
    t.rename_column("amount", "price")  # v2
    t.restore(1)  # v3: schema rolls back with the data
    assert set(t.snapshot().columns) == {"k", "amount"}
    t.restore(2)  # v4: rename re-established
    assert set(t.snapshot().columns) == {"k", "price"}


def test_generated_requires_existing_column(spark):
    t, _ = _mk(spark)
    with pytest.raises(ValueError, match="not in the table schema"):
        t.set_generated_column("brand_new", "k * 2")


def test_sync_and_overwrite_enforce_generation(spark):
    t, _ = _mk(spark)
    t.set_generated_column("cents", GEN)
    bad = spark.range(0, 50).selectExpr(
        "id as k",
        "cast(id * 1.5 as double) as price",
        "cast(0 as bigint) as cents",
    )
    with pytest.raises(ConstraintViolation):
        t.sync_from(bad, keys=["k"])
    with pytest.raises(ConstraintViolation):
        t.overwrite(bad)
    # omitting the column: computed on both paths
    ok = spark.range(0, 50).selectExpr(
        "id as k", "cast(id * 1.5 as double) as price"
    )
    t.sync_from(ok, keys=["k"])
    snap = t.snapshot()
    assert snap.count() == 50
    assert snap.filter(~F.col("cents").eqNullSafe(F.expr(GEN))).count() == 0


def test_rename_substring_guard_is_word_boundary(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="ren_wb_"), "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 10).selectExpr(
            "id as price",
            "cast(id * 2 as bigint) as price_usd",
        ),
    )
    t.set_constraint("usd_pos", "price_usd >= 0")
    # 'price' is a substring of 'price_usd' but NOT referenced
    t.rename_column("price", "amount")
    assert set(t.snapshot().columns) == {"amount", "price_usd"}


def test_bloom_dropped_not_remapped_after_rename(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="ren_bl_"), "t")
    df = spark.range(0, 400).selectExpr(
        "id as acct", "id % 8 as part", "cast(id * 1.0 as double) as v"
    )
    t = TxLogTable.create(
        spark, path, df, cluster_file_col="part", bloom_cols=("acct",)
    )
    t.rename_column("acct", "account_id")
    # equality scan on the NEW name: the old-name bloom must NOT
    # falsely prune (name is hashed into the probe bits) — every
    # matching row must come back
    got = t.scan({"account_id": (123, 123)}).collect()
    assert len(got) == 1 and got[0]["account_id"] == 123


def test_stream_rename_skippable_with_ignore_changes(spark):
    from politicamente_etl_spark.sources.txlogstream import (
        TxLogStreamDataSource,
    )

    try:
        spark.dataSource.register(TxLogStreamDataSource)
    except Exception:
        pass
    path = os.path.join(tempfile.mkdtemp(prefix="ren_sk_"), "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 20).selectExpr("id as k", "id % 3 as g"),
    )
    t.rename_column("g", "grp")
    t.append(spark.range(20, 30).selectExpr("id as k", "id % 3 as grp"))
    name = "ren_skip_" + os.path.basename(os.path.dirname(path))
    q = (
        spark.readStream.format("txlogstream")
        .option("path", path)
        .option("ignore_changes", "true")
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
    assert spark.table(name).count() == 30, (
        "rename must be skippable; rows keep flowing"
    )
