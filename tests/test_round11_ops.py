"""Round-6 batch A tests: the Z-order write path (sinks.write_zordered_txlog)
and its driver query txlog_zorder_storage_report."""

import os

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.plans.catalog import CATALOG

pytestmark = pytest.mark.usefixtures("spark")


def test_write_zordered_txlog_layout_and_pruning(spark, tmp_path):
    """The sink writes one data file per non-empty Morton bucket, the
    zonemaps prune a 2-D box in BOTH dimensions, and pruning is
    invisible to semantics (scan == full filter)."""
    from politicamente_etl_spark.sources.sinks import write_zordered_txlog

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 37) % 64).alias("y"),
    )
    t = write_zordered_txlog(
        spark, str(tmp_path / "zt"), df, ["x", "y"], bits=4, n_files=16
    )
    live, total = t.scan_files()
    assert total == 16  # 64 values/dim -> every Z-bucket non-empty
    assert len(live) == 16
    # box = middle quarter of both dims: [32, 47] x [32, 47]
    preds = {"x": (32, 47), "y": (32, 47)}
    kept, _ = t.scan_files(preds)
    # Z-order: both dimensions prune -> strictly fewer files than the
    # 1-D layout would keep (a linear-x layout keeps bucket files whose
    # x-range hits [32,47] but every file spans all y)
    assert 0 < len(kept) < 16
    got = sorted(r.k for r in t.scan(preds).collect())
    want = sorted(
        r.k
        for r in df.filter(
            F.col("x").between(32, 47) & F.col("y").between(32, 47)
        ).collect()
    )
    assert got == want


def test_write_zordered_txlog_rejects_nondivisible_n_files(spark, tmp_path):
    from politicamente_etl_spark.sources.sinks import write_zordered_txlog

    df = spark.range(16).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    with pytest.raises(ValueError, match="must divide"):
        write_zordered_txlog(
            spark, str(tmp_path / "zt"), df, ["x", "y"], bits=4, n_files=7
        )


def test_zorder_storage_report_matches_model_query(spark, sf_dir):
    """The new write-path query's four storage-measured numbers equal
    the planner model's zorder row — same bucket math, real files."""
    storage = CATALOG["txlog_zorder_storage_report"].fn(spark, sf_dir).first()
    model = {
        r.layout: r
        for r in CATALOG["zorder_skipping_model"].fn(spark, sf_dir).collect()
    }["zorder"]
    assert storage.n_files == model.n_files
    assert storage.files_kept == model.files_kept
    assert storage.rows_in_kept_files == model.rows_in_kept_files
    assert storage.n_rows_match == model.n_rows_match
