"""Temporal / inequality join operators Spark lacks natively:
as-of join and range join (SURVEY.md §2.3 notes their absence in both the
reference and stock Spark; large-scale feature pipelines need them).

Both are built from shuffle-friendly primitives — union+window for as-of,
bucketized equi-join for range — never a cross join or a per-row UDF, so
the shapes survive 100 TB. DuckDB has native ASOF / inequality joins, which
is what makes these oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the nearest right row within
    the same `on` key — `direction="backward"` takes the greatest
    right_ts <= left_ts (the default, pandas/DuckDB ASOF semantics),
    `direction="forward"` the smallest right_ts >= left_ts. An optional
    `tolerance` (a Column the ts difference must not exceed, e.g.
    ``F.expr("INTERVAL 30 MINUTES")`` for timestamps or a numeric literal
    for epoch columns) nulls out matches farther than the bound — pandas
    ``merge_asof(tolerance=...)`` parity.

    Implementation is the union+window pattern (one shuffle on the key, a
    per-partition sort, zero cross products): tag both sides, union, and
    carry the nearest right values with last/first(ignorenulls) over a
    one-sided window ordered by (ts, side) — the side bit ordered so an
    equal-ts right row satisfies the <= / >= bound. The tolerance check is
    a post-projection, not a join condition, so the plan shape is
    unchanged. Equivalent to pandas merge_asof / DuckDB ASOF JOIN."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    left_only = [c for c in left.columns if c not in (on, left_ts)]
    carried = ["asof_ts"] + [f"asof_{c}" for c in right_cols]

    # Side ordering: the equal-ts right row must fall INSIDE the one-sided
    # window of a left row — before it for backward, after it for forward.
    side_left = 1 if backward else 0
    side_right = 0 if backward else 1

    l_u = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(side_left).alias("__side"),
        *[F.col(c) for c in left_only],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("asof_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    r_u = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(side_right).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
    )
    if backward:
        w = (
            Window.partitionBy(on)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )

        def pick(c: str) -> Column:
            return F.last(c, ignorenulls=True).over(w)

    else:
        w = (
            Window.partitionBy(on)
            .orderBy("__ts", "__side")
            .rowsBetween(0, Window.unboundedFollowing)
        )

        def pick(c: str) -> Column:
            return F.first(c, ignorenulls=True).over(w)

    filled = l_u.unionByName(r_u).select(
        F.col(on),
        "__ts",
        "__side",
        *left_only,
        *[pick(c).alias(c) for c in carried],
    )
    out = (
        filled.filter(F.col("__side") == F.lit(side_left))
        .withColumnRenamed("__ts", left_ts)
        .drop("__side")
    )
    if tolerance is not None:
        delta = (
            (F.col(left_ts) - F.col("asof_ts"))
            if backward
            else (F.col("asof_ts") - F.col(left_ts))
        )
        keep = F.col("asof_ts").isNotNull() & (delta <= tolerance)
        out = out.select(
            on,
            left_ts,
            *left_only,
            *[F.when(keep, F.col(c)).otherwise(F.lit(None)).alias(c) for c in carried],
        )
    return out


def range_join_bucketed(
    left: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range join (value ∈ [lo, hi)) via bucketization: each range row
    explodes to its covering buckets (narrow on the small ranges side),
    the probe side computes one bucket per row, and the join is a plain
    equi-join on bucket + a residual filter. Shuffle cost is |left| +
    |ranges| × avg_buckets — never |left| × |ranges|."""
    w = float(bucket_width)
    r_b = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / w).cast("long"),
            )
        ),
    )
    l_b = left.withColumn("__bucket", F.floor(F.col(value_col) / w).cast("long"))
    return (
        l_b.join(r_b, "__bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    width: str = "1 hour",
) -> DataFrame:
    """Time-bucketed OHLC (open/high/low/close) bars per key — the classic
    downsampling aggregate for metric/tick streams. Open/close are the
    first/last value by (ts, id) within the bar; high/low are max/min.

    Shape: one shuffle on (key, bar), two per-partition sorts (asc rank
    for open, desc rank for close — same window partition, Spark plans
    them in one Window stage pair without a second exchange), then the
    bar-level aggregate. Values pass through un-summed (open/close copy a
    row, high/low are exact comparisons), so doubles are hash-safe
    without snapping."""
    bar = F.window(ts_col, width).getField("start")
    base = df.select(
        F.col(key_col),
        bar.alias("__bar"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__v"),
    )
    w_asc = Window.partitionBy(key_col, "__bar").orderBy("__ts", "__id")
    w_desc = Window.partitionBy(key_col, "__bar").orderBy(
        F.col("__ts").desc(), F.col("__id").desc()
    )
    ranked = base.withColumns(
        {
            "__rn_a": F.row_number().over(w_asc),
            "__rn_d": F.row_number().over(w_desc),
        }
    )
    return (
        ranked.groupBy(key_col, "__bar")
        .agg(
            F.min(F.when(F.col("__rn_a") == 1, F.col("__v"))).alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.min(F.when(F.col("__rn_d") == 1, F.col("__v"))).alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            key_col,
            F.unix_timestamp("__bar").alias("bar_start_epoch"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def gap_fill_forward(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    value_col: str,
    fill_col: str = "ffill",
) -> DataFrame:
    """Regularize a sparse per-key daily series onto a dense calendar and
    forward-fill the value — the time-series `gap fill + locf` operator
    (neither stock Spark nor the reference has one; every metrics/feature
    pipeline regrids before windowed models).

    Shape: per-key MIN/MAX date (one partial-agg shuffle on the key) →
    `sequence()` + explode generates each key's calendar slice WITHOUT any
    cross join (the grid is born distributed, co-partitioned by key) →
    left join the observed rows back on (key, date) → one
    `last(value, ignoreNulls=True)` running window per key for the fill.
    Every stage is keyed by `key_cols`: with |keys| >> cores this is
    embarrassingly parallel at any corpus size, and the only risk — a
    single key spanning a huge date range — grows the generated rows
    linearly, never quadratically.

    Output grain: one row per (key, calendar day); `value_col` is NULL on
    gap days, `fill_col` carries the last observation. Emits the day as an
    ISO string (oracle-compared outputs never carry raw DATE columns)."""
    bounds = df.groupBy(*key_cols).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence("__lo", "__hi", F.expr("interval 1 day"))
        ).alias(date_col),
    )
    joined = grid.join(df, [*key_cols, date_col], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.withColumn(
        fill_col, F.last(value_col, ignorenulls=True).over(w)
    ).withColumn(date_col, F.date_format(date_col, "yyyy-MM-dd"))


def cogrouped_conversion_stats(
    clicks: DataFrame,
    purchases: DataFrame,
    within_us: int = 1_800_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Per-user click→purchase conversion stats via COGROUPED
    applyInPandas — the API tier for per-key imperative logic that
    DataFrame algebra can't express cleanly (two sorted event streams
    walked together per key). Here the walk is a vectorized numpy
    searchsorted per user: for each click, the first purchase at or after
    it; converted if within `within_us`.

    This is deliberately the ONLY cogroup in the repo: everything
    expressible as joins/windows stays JVM-side (the equivalent SQL is
    this operator's oracle — kept equivalent BY TEST, which is exactly
    the discipline a pipeline needs before trusting a pandas path).
    Scale shape: cogroup shuffles each side once on the key, then
    per-key Arrow batches; cost is linear in events, parallelism is
    |users|. Output only for users with ≥1 click; all-integer µs
    arithmetic keeps it engine-exact (-1 sentinels for 'never')."""
    import numpy as np
    import pandas as pd

    def fn(cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cdf) == 0:
            return pd.DataFrame(
                columns=[key_col, "n_clicks", "n_purchases", "n_converted",
                         "min_latency_us"]
            )
        tc = np.sort(cdf[ts_col].to_numpy(dtype="int64"))
        tp = np.sort(pdf[ts_col].to_numpy(dtype="int64"))
        if len(tp):
            idx = np.searchsorted(tp, tc, side="left")
            hit = idx < len(tp)
            lat = np.where(hit, tp[np.minimum(idx, len(tp) - 1)] - tc, -1)
        else:
            lat = np.full(len(tc), -1, dtype="int64")
        converted = (lat >= 0) & (lat <= within_us)
        return pd.DataFrame(
            {
                key_col: [int(cdf[key_col].iloc[0])],
                "n_clicks": [len(tc)],
                "n_purchases": [len(tp)],
                "n_converted": [int(converted.sum())],
                "min_latency_us": [
                    int(lat[converted].min()) if converted.any() else -1
                ],
            }
        )

    return (
        clicks.groupBy(key_col)
        .cogroup(purchases.groupBy(key_col))
        .applyInPandas(
            fn,
            schema=(
                f"{key_col} long, n_clicks long, n_purchases long,"
                " n_converted long, min_latency_us long"
            ),
        )
    )


def kaplan_meier_terms(
    durations: DataFrame,
    t_col: str = "t",
    event_col: str = "d",
    censor_col: str = "c",
) -> DataFrame:
    """Kaplan-Meier survival curve (1958) from a pre-aggregated duration
    table (one row per time step t with d = events and c = censorings at
    t): emits, per step,

        n_risk      — subjects still at risk entering t
                      (reverse-cumulative d + c, exact integers)
        surv_lp_micro — cumulative log survival in micro-nats:
                      sum over t' <= t of round(ln(1 - d/n_risk) * 1e6)

    i.e. the product-limit estimator carried in LOG space so the
    cumulative op is an integer SUM (exact, mergeable) instead of a
    float product; S(t) = exp(surv_lp_micro / 1e6) at read time. The
    churn/retention estimator that handles censoring correctly — naive
    retention curves silently treat still-active subjects as churned.

    Shape note: the cumulative windows here are over the AGGREGATED time
    axis (one row per duration step — dozens to thousands of rows
    whatever the subject count), so the unpartitioned window ranges over
    a table that a single reducer holds trivially; the subject-sized
    work is the upstream duration aggregate, not this operator."""
    w_ge = (
        Window.orderBy(F.col(t_col))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_le = (
        Window.orderBy(F.col(t_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = durations.withColumn(
        "n_risk",
        F.sum(F.col(event_col) + F.col(censor_col)).over(w_ge).cast("long"),
    )
    step_lp = F.round(
        F.log(
            (F.col("n_risk") - F.col(event_col)).cast("double")
            / F.col("n_risk").cast("double")
        )
        * F.lit(1e6),
        0,
    ).cast("long")
    return (
        at_risk.withColumn("__lp", step_lp)
        .withColumn("surv_lp_micro", F.sum("__lp").over(w_le).cast("long"))
        .select(
            F.col(t_col),
            F.col(event_col).cast("long").alias(event_col),
            F.col(censor_col).cast("long").alias(censor_col),
            "n_risk",
            "surv_lp_micro",
        )
    )


def u_shaped_attribution(
    events: DataFrame,
    touch_type: str = "click",
    conv_type: str = "purchase",
    lookback_us: int = 259_200_000_000,
    first_last_ppm: int = 400_000,
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every
    conversion distributes its value over the user's touch events inside
    the lookback window (72h default) — first and last touch get
    `first_last_ppm` each (40% by default), the remaining 200k ppm split
    evenly across middle touches (integer div; a 1-touch path gets 1e6,
    a 2-touch path 500k/500k). The multi-touch complement of
    `click_conversion_attribution`'s last-touch as-of join.

    Credits are exact integers: credit_ppm per touch, and
    credited_value_milli_ppm = credit_ppm * floor(value*1000) — read
    time divides by 1e9 for currency. Conversions attribute
    independently (a touch may earn credit from several conversions),
    the standard multi-touch semantics.

    Scale shape: one shuffle on user_id for the touch×conversion
    pairing (attribution is within-user by definition, so user_id is
    the natural co-location key; per-user fan-out is bounded by session
    activity, and a hot user is an AQE skew-join case, not a plan
    change), then per-conversion windows — embarrassingly parallel, no
    global sort.
    """
    touches = events.filter(F.col("event_type") == touch_type).select(
        "user_id",
        F.expr("unix_micros(ts)").alias("t_us"),
        F.col("event_id").alias("touch_id"),
    )
    convs = events.filter(F.col("event_type") == conv_type).select(
        "user_id",
        F.expr("unix_micros(ts)").alias("c_us"),
        F.col("event_id").alias("conv_id"),
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    paired = touches.join(convs, "user_id").filter(
        (F.col("t_us") <= F.col("c_us"))
        & (F.col("t_us") >= F.col("c_us") - F.lit(lookback_us))
    )
    w = Window.partitionBy("conv_id").orderBy("t_us", "touch_id")
    ranked = (
        paired.withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("conv_id")))
    )
    mid_ppm = F.expr(
        f"CAST((1000000 - 2 * {first_last_ppm}) div (n - 2) AS BIGINT)"
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1_000_000))
        .when(F.col("n") == 2, F.lit(500_000))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n")),
            F.lit(first_last_ppm),
        )
        .otherwise(mid_ppm)
        .cast("long")
    )
    return ranked.select(
        "conv_id",
        "touch_id",
        "user_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("n").cast("long").alias("n_touches"),
        credit.alias("credit_ppm"),
        (credit * F.col("v_milli")).cast("long").alias("credited_value_milli_ppm"),
    )


def window_funnel_levels(
    events: DataFrame,
    steps: list[str],
    window_us: int = 7_200_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """ClickHouse-style windowFunnel: per user, the deepest funnel level
    reachable by a chain t1 <= t2 <= ... <= tk of step events with the
    WHOLE chain inside `window_us` of its first step. Single ordered
    pass per user: the accumulator keeps, per level, the MAXIMUM
    first-step timestamp among valid chains reaching it — a later
    first step strictly dominates (more window room left), and because
    events fold in time order, any chain recorded at level s-1 has its
    step-(s-1) event no later than the current event, so the greedy
    max is exact: on an event matching step s at time t,
    f[s] := max(f[s], f[s-1]) when t - f[s-1] <= window
    (f[1] := max(f[1], t)) — one JVM `aggregate` fold over the user's
    time-sorted (ts, type) array.

    Scale shape: one shuffle builds per-user sorted arrays (bounded by
    per-user activity — the sessionization envelope); the fold is
    per-row expression work; the rollup shuffles |levels| partial
    counts. Returns (level, n_users) for level 0..len(steps), where a
    user counts at their MAX level.
    """
    sentinel = -4_611_686_018_427_387_904  # -2^62: "unreached"
    seqs = (
        events.select(
            F.col(user_col).alias("u"),
            F.struct(
                F.expr(f"unix_micros({ts_col})").alias("t"),
                F.col(id_col).alias("eid"),
                F.col(type_col).alias("et"),
            ).alias("s"),
        )
        .groupBy("u")
        .agg(F.expr("array_sort(collect_list(s))").alias("seq"))
    )
    n = len(steps)
    init = ", ".join(f"CAST({sentinel} AS BIGINT)" for _ in range(n))
    upd = f"array({init})"
    # build the per-event update expression level by level (descending so
    # one event can't advance two levels off its own update)
    step_cases = []
    for s in range(n, 0, -1):
        cond = f"x.s.et = '{steps[s - 1]}'"
        if s == 1:
            new = "greatest(element_at(acc, 1), x.s.t)"
        else:
            new = (
                f"IF(element_at(acc, {s - 1}) > {sentinel}"
                f" AND x.s.t - element_at(acc, {s - 1}) <= {window_us},"
                f" greatest(element_at(acc, {s}), element_at(acc, {s - 1})),"
                f" element_at(acc, {s}))"
            )
        step_cases.append((s, cond, new))
    # transform positions 1..n of acc in one shot
    parts = []
    for pos in range(1, n + 1):
        s, cond, new = next(c for c in step_cases if c[0] == pos)
        parts.append(f"IF({cond}, {new}, element_at(acc, {pos}))")
    body = "array(" + ", ".join(parts) + ")"
    levels = seqs.withColumn(
        "f",
        F.expr(
            f"aggregate(transform(seq, e -> struct(e AS s)), {upd},"
            f" (acc, x) -> {body})"
        ),
    ).withColumn(
        "level",
        F.expr(
            f"size(filter(f, v -> v > {sentinel}))"
        ).cast("long"),
    )
    return (
        levels.groupBy("level")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def logrank_test(
    steps: DataFrame,
    t_col: str = "t",
    d1_col: str = "d1",
    c1_col: str = "c1",
    d2_col: str = "d2",
    c2_col: str = "c2",
) -> DataFrame:
    """Log-rank (Mantel-Cox) test between two survival groups, from the
    same pre-aggregated step table family as `kaplan_meier_terms` (one
    row per time step with per-group event/censor counts). Under H₀
    (equal hazards), at each step with d_j total events, n1_j / n_j at
    risk:

        O₁ = Σ d1_j          E₁ = Σ d_j·n1_j/n_j
        V  = Σ d_j·(n1_j/n_j)·(n2_j/n_j)·(n_j−d_j)/(n_j−1)
        χ²₁ = (O₁−E₁)²/V

    Every E/V term is micro-snapped at birth (the house floor — both
    engines floor identically; single-at-risk steps where n_j = 1
    contribute zero variance by the standard convention), O₁ is exact,
    and the statistic finishes as chi2_milli in DECIMAL(38,0) —
    (O₁·10⁶ − E₁_micro)² outgrows BIGINT around O₁ ≈ 3000.

    Shape note: like the KM estimator, the windows (reverse-cumulative
    at-risk counts) run over the AGGREGATED time axis, bounded by the
    duration grid, not the subject count; the subject-sized work is the
    upstream duration aggregate.
    """
    w_ge = (
        Window.orderBy(F.col(t_col))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = steps.select(
        F.col(t_col).alias("t"),
        F.col(d1_col).cast("long").alias("d1"),
        F.col(d2_col).cast("long").alias("d2"),
        F.sum(F.col(d1_col) + F.col(c1_col)).over(w_ge).cast("long").alias("n1"),
        F.sum(F.col(d2_col) + F.col(c2_col)).over(w_ge).cast("long").alias("n2"),
    ).select(
        "t",
        "d1",
        (F.col("d1") + F.col("d2")).alias("d"),
        "n1",
        (F.col("n1") + F.col("n2")).alias("n"),
    )
    terms = risk.select(
        "d1",
        F.expr(
            "CAST(d AS decimal(38,0)) * n1 * 1000000 DIV n"
        ).alias("e1_micro"),
        F.expr(
            "CASE WHEN n <= 1 THEN CAST(0 AS decimal(38,0))"
            " ELSE CAST(d AS decimal(38,0)) * n1 * (n - n1) * (n - d)"
            "      * 1000000 DIV (CAST(n AS decimal(38,0)) * n * (n - 1))"
            " END"
        ).alias("v_micro"),
    )
    return (
        terms.agg(
            F.sum("d1").cast("long").alias("o1"),
            F.sum("e1_micro").alias("e1_micro"),
            F.sum("v_micro").alias("v_micro"),
        )
        .select(
            "o1",
            F.col("e1_micro").cast("long").alias("e1_micro"),
            F.col("v_micro").cast("long").alias("v_micro"),
            F.expr(
                "CAST(CASE WHEN v_micro = 0 THEN 0 ELSE"
                " (CAST(o1 AS decimal(38,0)) * 1000000 - e1_micro)"
                " * (CAST(o1 AS decimal(38,0)) * 1000000 - e1_micro)"
                " * 1000 DIV (v_micro * CAST(1000000 AS decimal(38,0)))"
                " END AS BIGINT)"
            ).alias("chi2_milli"),
        )
    )


def interval_union_length(
    intervals: DataFrame,
    group_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Total length covered by a union of (possibly overlapping)
    half-open intervals per group — the classic sweep: order intervals
    by start within the group, carry the running maximum end seen
    BEFORE each row, and count only the part extending past it:

        covered = Σ max(0, e_i − max(s_i, run_max_before_i))

    plus the merged-island count (rows whose start clears every prior
    end start a new island). Exact integers throughout; the session
    coverage / machine-uptime / SLA-window primitive.

    Scale shape: one shuffle partitioned by group; the window walks
    each group's intervals in start order (per-user interval counts
    are activity-bounded; a hot group is an AQE skew case, not a plan
    change). No self-join — the O(n²) overlap-pair formulation is
    exactly what the running max avoids.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(start_col), F.col(end_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = intervals.select(
        F.col(group_col).alias("g"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
        F.coalesce(
            F.max(F.col(end_col)).over(w), F.lit(None).cast("long")
        ).alias("run_max"),
    ).select(
        "g",
        F.greatest(
            F.lit(0),
            F.col("e")
            - F.greatest(F.col("s"), F.coalesce(F.col("run_max"), F.col("s"))),
        ).alias("add_len"),
        F.when(
            F.col("run_max").isNull() | (F.col("s") > F.col("run_max")), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    return marked.groupBy(F.col("g").alias(group_col)).agg(
        F.sum("add_len").cast("long").alias("covered"),
        F.sum("new_island").cast("long").alias("n_islands"),
    )
