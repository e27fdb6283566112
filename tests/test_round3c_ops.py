"""Round-3 closing-batch tests: gap-fill/locf, the stream-stream LEFT
OUTER interval join (sentinel-driven watermark flush), and plan-shape
pins for the TPC-H decorrelation queries (oracle parity itself is covered
by test_oracle_parity's CATALOG parametrization).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.operators import temporal
from tests.test_plan_quality import plan_of, q


# ---------------------------------------------------------------------------
# gap_fill_forward
# ---------------------------------------------------------------------------


def test_gap_fill_forward_fills_and_grids(spark):
    d = datetime.date
    df = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), 1.0),
            ("a", d(2024, 1, 4), 4.0),
            ("b", d(2024, 2, 10), 10.0),
        ],
        "k string, day date, v double",
    )
    out = temporal.gap_fill_forward(df, ["k"], "day", "v").toPandas()
    a = out[out.k == "a"].sort_values("day").reset_index(drop=True)
    # dense calendar between each key's own min and max
    assert list(a.day) == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    # observed values survive, gaps are NULL, ffill carries forward
    assert list(a.v)[0] == 1.0 and list(a.v)[3] == 4.0
    assert a.v.isna().tolist() == [False, True, True, False]
    assert list(a["ffill"]) == [1.0, 1.0, 1.0, 4.0]
    # single-observation key grids to exactly one row — no cross-key bleed
    b = out[out.k == "b"]
    assert len(b) == 1 and list(b["ffill"]) == [10.0]


def test_gap_fill_plan_no_cartesian(spark, sf_dir):
    """The grid generation must be sequence+explode per key (Generate),
    never a calendar cross join."""
    plan = plan_of(q("gap_fill_daily_revenue", spark, sf_dir))
    assert "Generate" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# stream-stream LEFT OUTER interval join
# ---------------------------------------------------------------------------


def test_streaming_left_outer_flushes_trailing_clicks(spark, sf_dir):
    """The sentinel batch must flush EVERY real unmatched click — including
    those inside the final watermark+within horizon, which a plain finite
    replay would hold in state forever. Exact equivalence with the batch
    left join proves full emission."""
    from politicamente_etl_spark.streaming import windows as W

    ev = W.stream_events_with_sentinel(spark, sf_dir)
    j = W.interval_join(
        ev, "click", "purchase", "30 minutes",
        watermark="10 minutes", how="left_outer",
    )
    out = W.run_stream_to_table(j, mode="append").filter(F.col("user_id") >= 0)
    n_stream = out.count()
    n_stream_unmatched = out.filter(F.col("right_id").isNull()).count()

    b = W.normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    clicks = b.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("left_id"), F.col("ts").alias("left_ts")
    )
    purchases = b.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("right_ts"),
    )
    bj = clicks.join(
        purchases,
        F.expr(
            "user_id = r_user_id AND right_ts >= left_ts"
            " AND right_ts <= left_ts + interval 30 minutes"
        ),
        "left",
    )
    assert n_stream == bj.count()
    assert n_stream_unmatched == bj.filter(F.col("right_id").isNull()).count()
    assert n_stream_unmatched > 0  # the outer path is actually exercised


# ---------------------------------------------------------------------------
# plan pins for the TPC-H decorrelation batch
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "order_count_distribution",
        "idle_rich_customers",
        "supplier_revenue_share_gate",
        "brand_supplier_counts",
        "regional_market_share",
        "nation_product_margin",
    ],
)
def test_rel2_no_cartesian(name, spark, sf_dir):
    """Scalar subqueries must broadcast 1-row sides; NOT EXISTS / NOT IN
    must decorrelate to hash anti joins — never a cartesian product."""
    plan = plan_of(q(name, spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_idle_rich_anti_join_shape(spark, sf_dir):
    plan = plan_of(q("idle_rich_customers", spark, sf_dir))
    assert "LeftAnti" in plan


def test_brand_supplier_counts_anti_join_shape(spark, sf_dir):
    plan = plan_of(q("brand_supplier_counts", spark, sf_dir))
    assert "LeftAnti" in plan


def test_regional_market_share_broadcasts_dims(spark, sf_dir):
    """supplier→nation→region chain joins broadcast; the only shuffle-worthy
    join is lineitem⋈orders."""
    plan = plan_of(q("regional_market_share", spark, sf_dir))
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# bucketed tables: the pay-once join-free layout
# ---------------------------------------------------------------------------


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the same key and count must sort-merge-join
    with ZERO Exchange operators — the write-time shuffle replaces every
    future join shuffle on that key."""
    from politicamente_etl_spark.sources import readers, sinks

    o = readers.load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    c = readers.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    sinks.write_bucketed(
        o, "bt_orders", ["o_custkey"], buckets=8,
        sort_by=["o_custkey"], path=str(tmp_path / "bt_orders"),
    )
    sinks.write_bucketed(
        c, "bt_customer", ["c_custkey"], buckets=8,
        sort_by=["c_custkey"], path=str(tmp_path / "bt_customer"),
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bt_orders").join(
                spark.table("bt_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = plan_of(j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert j.count() == o.count()  # inner join, FK always resolves
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_customer")


def test_bucketed_agg_no_exchange(spark, sf_dir, tmp_path):
    """A groupBy on the bucket key reuses the write-time clustering — the
    aggregate plans with no Exchange."""
    from politicamente_etl_spark.sources import readers, sinks

    o = readers.load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    sinks.write_bucketed(
        o, "bt_orders_agg", ["o_custkey"], buckets=8,
        path=str(tmp_path / "bt_orders_agg"),
    )
    try:
        agg = spark.table("bt_orders_agg").groupBy("o_custkey").count()
        plan = plan_of(agg)
        assert "Exchange" not in plan
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders_agg")
