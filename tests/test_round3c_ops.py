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


# ---------------------------------------------------------------------------
# Python UDTF surface
# ---------------------------------------------------------------------------


def test_chunk_text_udtf_matches_expression_operator(spark, sf_dir):
    """The SQL-LATERAL UDTF must produce exactly the expression operator's
    chunks (idx, token count, text) for every document."""
    from politicamente_etl_spark.functions.udtf import register_udtfs
    from politicamente_etl_spark.operators import text as T_ops
    from politicamente_etl_spark.sources.readers import load_table

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_chunk_tokens, c.chunk_text"
        " FROM udtf_docs d, LATERAL chunk_text(d.text, 128, 96) c"
    )
    via_expr = T_ops.chunk_documents(docs, window=128, stride=96)
    cols = ["doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text"]
    a = via_udtf.toPandas().astype({"chunk_idx": "int64"})[cols]
    b = via_expr.toPandas().astype({"chunk_idx": "int64"})[cols]
    a = a.sort_values(cols[:2]).reset_index(drop=True)
    b = b.sort_values(cols[:2]).reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# end-to-end: zip feed -> quality/dedup gates -> bucketed corpus table
# ---------------------------------------------------------------------------


def test_zip_to_bucketed_corpus_pipeline(spark, tmp_path):
    """The switch-over narrative in one test: a zipped CSV feed scans
    member-parallel (zipcsv), flows through exact dedup, and lands as a
    bucketed table that joins back to new batches with zero Exchange."""
    import zipfile

    from politicamente_etl_spark.operators import dedup
    from politicamente_etl_spark.sources import sinks
    from politicamente_etl_spark.sources.zipsource import register_zipcsv

    register_zipcsv(spark)
    zp = str(tmp_path / "feed.zip")
    rows = [(str(i), f"doc text number {i % 8}") for i in range(32)]
    half = len(rows) // 2
    with zipfile.ZipFile(zp, "w") as z:
        for m, part in (("a.csv", rows[:half]), ("b.csv", rows[half:])):
            body = "doc_id;text\n" + "\n".join(f"{i};{t}" for i, t in part)
            z.writestr(m, body.encode("latin-1"))

    feed = (
        spark.read.format("zipcsv").option("path", zp).load()
        .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text")
    )
    assert feed.rdd.getNumPartitions() == 2  # member-parallel

    kept = dedup.exact_dedup(feed, id_col="doc_id", text_col="text")
    assert kept.count() == 8  # 8 distinct texts survive

    sinks.write_bucketed(
        kept, "corpus_e2e", ["doc_id"], buckets=4,
        path=str(tmp_path / "corpus_e2e"),
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            batch = spark.table("corpus_e2e").select("doc_id").limit(4)
            j = spark.table("corpus_e2e").join(
                batch.hint("shuffle_merge"), "doc_id"
            )
            assert j.count() == 4
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_e2e")


# ---------------------------------------------------------------------------
# declarative data-quality constraints
# ---------------------------------------------------------------------------


def test_constraint_report_dirty_data(spark):
    """Every check kind fires on a deliberately dirty frame, and the
    report carries exact violation counts."""
    from politicamente_etl_spark.operators import quality as Q

    child = spark.createDataFrame(
        [
            (1, 10.0, "F"),
            (1, -5.0, "X"),      # dup key, out of range, bad domain
            (None, 20.0, "O"),   # null key
            (7, 999.0, "F"),     # dangling FK (parent has no 7)
        ],
        "k int, v double, s string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    rep = Q.constraint_report(
        child,
        checks=[
            Q.not_null("k"),
            Q.in_range("v", 0.0, 100.0),
            Q.in_set("s", ("F", "O")),
        ],
        unique_keys=[["k"]],
        referential=[(parent, "k", "pk")],
    ).toPandas().set_index("check_name")
    assert rep.loc["not_null(k)", "metric"] == 1
    assert rep.loc["in_range(v,0.0,100.0)", "metric"] == 2  # -5 and 999
    assert rep.loc["in_set(s)", "metric"] == 1
    assert rep.loc["unique(k)", "metric"] == 1  # one extra row on k=1
    # dangling: k=7 (null key rows don't join either; left_anti keeps null)
    assert rep.loc["ref(k->pk)", "metric"] == 2
    assert not rep.loc["in_range(v,0.0,100.0)", "passed"]
    assert rep.loc["in_set(s)", "threshold"] == 0


def test_row_level_report_single_pass(spark, sf_dir):
    """All row-level checks must compile into ONE aggregate over ONE scan
    — the plan contains exactly one parquet scan."""
    from politicamente_etl_spark.operators import quality as Q
    from politicamente_etl_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    rep = Q.row_level_report(
        o,
        [
            Q.not_null("o_custkey"),
            Q.in_range("o_totalprice", 1.0, 400000.0),
            Q.in_set("o_orderstatus", ("F", "O", "P")),
        ],
    )
    plan = plan_of(rep)
    # one scan block (each source appears once as a "Location:" detail)
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "partial_sum" in plan  # map-side combine of the check counters


def test_key_skew_report_plan(spark, sf_dir):
    """Top-k heavy keys must plan as TakeOrdered (per-partition heaps),
    never a full sort of the key space; the global rollup broadcasts."""
    plan = plan_of(q("event_key_skew_report", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# AQE skew-join split: the runtime answer to hot keys
# ---------------------------------------------------------------------------


def test_aqe_splits_skewed_join(spark):
    """A hot key 200x heavier than its siblings must be split by AQE at
    runtime (SortMergeJoin(skew=true)) — this is the engine-level
    complement to explicit salting (joins.salted_join) and the behavior
    key_skew_report's skew_ratio is the advance warning for."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = (
            spark.range(0, 200_000)
            .select(F.lit(0).alias("k"), F.col("id").alias("v"))
            .union(
                spark.range(0, 900).select(
                    (F.col("id") % 9 + 1).cast("long").alias("k"),
                    F.col("id").alias("v"),
                )
            )
        )
        right = spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        # collect() j itself: count() would run a separate QueryExecution
        # and leave j's own adaptive plan unfinalized
        assert len(j.collect()) == 200_900  # correctness survives the split
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final
        assert "skewed" in final  # AQEShuffleRead split the hot partition
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_stream_quality_audit_per_batch(spark, tmp_path):
    """Two micro-batches, one dirty: the audit table carries one report
    row per (batch, constraint) and the dirty batch's violation shows up
    with its batch_id."""
    import pandas as pd

    from politicamente_etl_spark.operators import quality as Q
    from politicamente_etl_spark.streaming import windows as W

    src = tmp_path / "qsrc"
    src.mkdir()
    clean = pd.DataFrame({"user_id": [1.0, 2.0], "value": [5.0, 7.0]})
    dirty = pd.DataFrame({"user_id": [3.0, None], "value": [9.0, -4.0]})
    clean.to_parquet(src / "00_clean.parquet")
    dirty.to_parquet(src / "01_dirty.parquet")

    stream = (
        spark.readStream.schema("user_id double, value double")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(str(src))
    )
    audit = W.stream_quality_audit(
        stream,
        checks=[Q.not_null("user_id"), Q.in_range("value", 0.0, 100.0)],
        audit_path=str(tmp_path / "audit"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).toPandas()
    assert len(audit) == 4  # 2 batches x 2 constraints
    assert set(audit.batch_id) == {0, 1}
    assert set(audit.batch_rows) == {2}  # both batches carry 2 rows
    by = audit.set_index(["batch_id", "check_name"])
    # identify the dirty batch by its violation (file->batch order is
    # not guaranteed)
    nn = audit[audit.check_name == "not_null(user_id)"]
    dirty_id = nn[nn.metric == 1].batch_id.iloc[0]
    clean_id = 1 - dirty_id
    assert by.loc[(clean_id, "not_null(user_id)"), "metric"] == 0
    assert by.loc[(dirty_id, "not_null(user_id)"), "metric"] == 1
    assert by.loc[(dirty_id, "in_range(value,0.0,100.0)"), "metric"] == 1
    assert not by.loc[(dirty_id, "in_range(value,0.0,100.0)"), "passed"]


# ---------------------------------------------------------------------------
# KMV distinct sketch: deterministic, oracle-exact approximation
# ---------------------------------------------------------------------------


def test_kmv_accuracy_and_exact_small_groups(spark):
    """Error within the ~1/sqrt(k) theory band for a 10k-distinct group;
    EXACT count for groups with fewer than k distinct values."""
    from politicamente_etl_spark.operators.agg import kmv_distinct

    big = spark.range(0, 10_000).selectExpr("'big' AS g", "id AS v")
    small = spark.range(0, 40).selectExpr("'small' AS g", "id AS v")
    rep = (
        kmv_distinct(big.union(small), "g", "v", k=64)
        .toPandas()
        .set_index("g")
    )
    assert rep.loc["small", "est_distinct"] == 40.0  # exhaustive: exact
    err = abs(rep.loc["big", "est_distinct"] - 10_000) / 10_000
    assert err < 0.35  # 1/sqrt(64) = 12.5% expected; generous determinism-safe cap


def test_kmv_sketch_is_mergeable(spark):
    """Sketching the union of two disjoint halves equals sketching the
    full data — the nightly-rollup property (the k smallest hashes of
    A ∪ B are a subset of the k smallest of A plus the k smallest of B,
    so partial sketches merge losslessly)."""
    from politicamente_etl_spark.operators.agg import kmv_distinct

    full = spark.range(0, 5_000).selectExpr("'g' AS g", "id AS v")
    a = full.filter("v % 2 = 0")
    b = full.filter("v % 2 = 1")
    s_ab = kmv_distinct(a.union(b), "g", "v", k=64).collect()[0]
    s_full = kmv_distinct(full, "g", "v", k=64).collect()[0]
    assert s_ab.kth_hash == s_full.kth_hash
    assert s_ab.est_distinct == s_full.est_distinct


def test_kmv_plan_group_limit(spark, sf_dir):
    """The per-group top-k must plan as WindowGroupLimit (partial heaps
    before the exchange), not a full per-group sort."""
    plan = plan_of(q("kmv_distinct_users", spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_observed_metrics_ride_the_main_pass(spark, sf_dir, tmp_path):
    """Constraint counters attached via observe() must accumulate during
    the pipeline's OWN write action — no second scan — and match the
    dedicated audit pass."""
    from politicamente_etl_spark.operators import quality as Q
    from politicamente_etl_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    checks = [Q.not_null("o_custkey"), Q.in_range("o_totalprice", 1.0, 400000.0)]
    obs_df, obs = Q.observed(o, checks)
    obs_df.write.mode("overwrite").parquet(str(tmp_path / "out"))  # main pass
    got = obs.get
    audit = {
        r.check_name: r.metric
        for r in Q.row_level_report(o, checks).collect()
    }
    assert got == audit
    assert got["in_range(o_totalprice,1.0,400000.0)"] > 0


@pytest.mark.parametrize(
    "name",
    [
        "two_nation_trade_volume",
        "bracketed_discount_revenue",
        "min_unit_price_supplier",
        "dominant_supplier_share",
    ],
)
def test_rel3_no_cartesian(name, spark, sf_dir):
    plan = plan_of(q(name, spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_bracketed_predicates_push_to_scans(spark, sf_dir):
    """Q19 shape: the common quantity upper bound and the part-side
    brand/size disjunction must reach their scans as pushed filters."""
    plan = plan_of(q("bracketed_discount_revenue", spark, sf_dir))
    scans = [b for b in plan.split("\n\n") if "PushedFilters" in b]
    assert any("l_quantity" in b for b in scans)
    assert any("p_brand" in b or "p_size" in b for b in scans)


def test_min_unit_price_is_agg_argmin(spark, sf_dir):
    """The per-part argmin must be an aggregate (min of struct — planned
    as partial+final SortAggregate, since struct mins aren't
    hash-aggregable), never a window sort over the whole fact table."""
    plan = plan_of(q("min_unit_price_supplier", spark, sf_dir))
    assert "Window" not in plan
    assert plan.count("SortAggregate") >= 2  # partial + final


def test_observed_metrics_on_streaming_progress(spark, tmp_path):
    """The same observe() counters must surface per micro-batch in
    StreamingQueryProgress.observedMetrics (string-name form)."""
    import pandas as pd

    from politicamente_etl_spark.operators import quality as Q

    src = tmp_path / "osrc"
    src.mkdir()
    pd.DataFrame({"v": [1.0, -3.0, 5.0]}).to_parquet(src / "a.parquet")
    stream = (
        spark.readStream.schema("v double").format("parquet").load(str(src))
    )
    checks = [Q.in_range("v", 0.0, 10.0)]
    aggs = [
        F.sum(c.violation.cast("long")).cast("long").alias(c.name)
        for c in checks
    ]
    q_stream = (
        stream.observe("audit", *aggs)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q_stream.processAllAvailable()
        progresses = [p for p in q_stream.recentProgress if p.observedMetrics]
    finally:
        q_stream.stop()
    assert progresses, "no progress carried observedMetrics"
    got = progresses[-1].observedMetrics["audit"]
    assert got["in_range(v,0.0,10.0)"] == 1


def test_sentinel_stream_handles_nanos_vintage(spark, tmp_path):
    """stream_events_with_sentinel must work when events.parquet carries
    the TIMESTAMP(NANOS)/int64 vintage: both staged files are re-landed
    through normalize_ts, so the stage directory is uniform TimestampType
    (a raw copy next to a µs sentinel would crash the scan with a
    footer-type mismatch)."""
    import pandas as pd

    from politicamente_etl_spark.streaming import windows as W

    d = tmp_path / "nsv"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 10:00:00")
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [
                int(base.value),
                int((base + pd.Timedelta("5min")).value),
                int((base + pd.Timedelta("10min")).value),
            ],
            "user_id": [1, 1, 2],
            "event_type": ["click", "purchase", "click"],
            "value": [1.0, 2.0, 3.0],
            "props": ["{}", "{}", "{}"],
        }
    ).to_parquet(d / "events.parquet")

    ev = W.stream_events_with_sentinel(spark, str(d))
    j = W.interval_join(
        ev, "click", "purchase", "30 minutes",
        watermark="10 minutes", how="left_outer",
    )
    out = W.run_stream_to_table(j, mode="append").filter(F.col("user_id") >= 0)
    rows = {(r.left_id, r.right_id) for r in out.collect()}
    # user 1's click converts; user 2's click has no purchase -> outer row
    assert rows == {(1, 2), (3, None)}


def test_quality_empty_inputs_are_clean_not_null(spark, tmp_path):
    """Review regressions: (a) an EMPTY input yields metric=0/passed=true
    (never NULL); (b) a fully-empty constraint set yields an empty typed
    report; (c) a zero-batch stream yields an empty audit table."""
    from politicamente_etl_spark.operators import quality as Q
    from politicamente_etl_spark.streaming import windows as W

    empty = spark.createDataFrame([], "k int, v double")
    rep = Q.row_level_report(empty, [Q.in_range("v", 0.0, 1.0)]).collect()
    assert rep[0].metric == 0 and rep[0].passed is True

    none_at_all = Q.constraint_report(empty, checks=[])
    assert none_at_all.count() == 0
    assert "check_name" in none_at_all.columns

    src = tmp_path / "empty_src"
    src.mkdir()  # no files: the stream runs zero micro-batches
    audit = W.stream_quality_audit(
        spark.readStream.schema("v double").format("parquet").load(str(src)),
        checks=[Q.in_range("v", 0.0, 1.0)],
        audit_path=str(tmp_path / "audit"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert audit.count() == 0 and "batch_id" in audit.columns


# ---------------------------------------------------------------------------
# dedup hardening (second self-review pass)
# ---------------------------------------------------------------------------


def test_short_docs_never_minhash_pair(spark):
    """Docs shorter than the shingle width have an empty shingle set →
    NO signature row and NO pairs (previously every short doc collapsed
    into one xxhash64(NULL) bucket and paired with est_jaccard 1.0)."""
    from politicamente_etl_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "hello world"),          # 2 tokens: no 3-gram shingle
            (2, "foo"),                  # 1 token
            (3, "one two three four five six seven"),
            (4, "one two three four five six eight"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_near_dup_pairs(df).collect()
    ids = {(r.id_a, r.id_b) for r in pairs} if pairs and hasattr(pairs[0], "id_a") else {
        (r[0], r[1]) for r in pairs
    }
    assert all(1 not in p and 2 not in p for p in ids)
    assert len(ids) >= 1  # the two real near-dups still pair


def test_near_dup_clusters_raises_on_nonconvergence(spark):
    """A chain longer than max_iter must raise, not silently return a
    split clustering."""
    from politicamente_etl_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i,) for i in range(11)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        dedup.near_dup_clusters(docs, pairs, max_iter=2)
    # and with enough rounds the same chain converges to one cluster
    ok = dedup.near_dup_clusters(docs, pairs, max_iter=15).toPandas()
    assert ok.cluster_id.nunique() == 1
