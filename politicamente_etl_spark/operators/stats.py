"""Robust / distributional statistics operators (SURVEY.md §2.10 —
pipeline-quality analytics beyond plain moments).

Everything here is built from exact `percentile` aggregates plus joins —
no global-sort windows. The pattern shared by all four operators:

    1. one hash aggregate computes the distribution summary (percentile
       array / median — map-side partial, one row per group through the
       shuffle);
    2. the summary (tiny: one row per group or one row total) joins back
       against the full table, where the planner broadcasts it;
    3. per-row classification is pure expression work (codegen'd).

That is the scale-safe replacement for the NTILE-over-global-sort shape:
an `ntile(10) OVER (ORDER BY x)` funnels 100 TB through one reducer,
while a percentile aggregate + broadcast-threshold comparison touches the
data twice with no sort at all. Exact `percentile` itself hash-aggregates
per group; for corpora where even the per-group value multiset is too
large, swap in `percentile_approx` (same call shape — documented
per-operator).

DuckDB's `quantile_cont` matches Spark's `percentile` interpolation
(linear between closest ranks), which is what makes these oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pct(col: str, frac_expr: str, approx: bool) -> Column:
    """Exact or sketch percentile with one call shape. The exact form
    holds each group's value multiset in the aggregation buffer; the
    approx form (KLL-style sketch, bounded memory) is the swap-in when a
    group's values outgrow an executor — same SQL surface, documented
    rank error instead of exactness."""
    fn = "approx_percentile" if approx else "percentile"
    return F.expr(f"{fn}({col}, {frac_expr})")


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_mads: float = 3.0,
    approx: bool = False,
) -> DataFrame:
    """Median-absolute-deviation outlier flagging per group — the robust
    alternative to z-scores (a handful of extreme rows drags a mean/stddev
    fence toward itself; the median fence does not move).

    Two percentile aggregates (median, then median of |x - median|), each
    a map-side-combined hash agg; the per-group summaries are broadcast
    back. Returns only the outlier rows with their fence values.

    100 TB: both aggs shuffle one row per (partition, group); the joins
    broadcast (groups are few). No window, no sort. ``approx=True`` swaps
    both medians for the bounded-memory percentile sketch — the mode to
    run when a single group's value multiset outgrows an executor (the
    fences move by the sketch's rank error; the flagging stays robust).

    Caveat (classic MAD degeneracy): when ≥50% of a group's values tie
    at the median, mad = 0 — the fence collapses, every off-median row
    flags, and deviation_mads is ±Infinity. Callers on heavily-tied
    integer data should pre-aggregate or fall back to the IQR fence;
    this operator preserves the textbook definition rather than
    silently clamping.
    """
    med = df.groupBy(group_col).agg(
        _pct(value_col, "0.5", approx).alias("med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.withColumn("__ad", F.abs(F.col(value_col) - F.col("med")))
        .groupBy(group_col)
        .agg(_pct("__ad", "0.5", approx).alias("mad"))
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .filter(F.abs(F.col(value_col) - F.col("med")) > F.lit(n_mads) * F.col("mad"))
        .withColumn(
            "deviation_mads",
            F.abs(F.col(value_col) - F.col("med")) / F.col("mad"),
        )
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    approx: bool = False,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram: bucket edges are the exact
    1/n..(n-1)/n percentiles; each row lands in the count of edges at or
    below its value. One percentile aggregate produces the n-1 edges as a
    single array literal-sized row; the bucket assignment is
    `size(filter(edges, e -> e <= x))` over the broadcast edges — pure
    expression, no sort, no window, two scans total.

    Buckets can be unequal when the value distribution has heavy ties
    (all tied values share a bucket) — that is the correct equi-depth
    semantics, not an artifact. ``approx=True`` computes the edges with
    the bounded-memory percentile sketch — the mode for a value multiset
    too large for one aggregation buffer (bucket depths then deviate by
    the sketch's rank error). Returns (bucket, n_rows, min_v, max_v).
    """
    fracs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    edges = df.agg(
        _pct(value_col, f"array({fracs})", approx).alias("edges")
    )
    return (
        df.crossJoin(F.broadcast(edges))
        .withColumn(
            "bucket",
            F.size(
                F.filter("edges", lambda e: e <= F.col(value_col).cast("double"))
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


def _score_against_edges(value: Column, edges_col: str) -> Column:
    """1 + number of edges strictly below the value → a 1..n score."""
    return (F.size(F.filter(edges_col, lambda e: e < value)) + F.lit(1)).cast("int")


def rfm_scores(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM customer segmentation: per-customer Recency (days since last
    order, counted from the corpus max date), Frequency (order count),
    Monetary (total spend), each scored 1..n against exact quantile edges
    of the per-customer distribution. The conventional implementation is
    three `ntile` windows — three global sorts; here each scorebook is a
    percentile aggregate over the (already reduced) per-customer rows and
    the edges broadcast back, so nothing is ever globally sorted.

    Scores use "1 + edges strictly below" so tied boundary customers get
    identical scores on any engine — `ntile`'s arbitrary boundary split
    is exactly what breaks cross-engine determinism. Returns one row per
    customer: (cust, recency_days, frequency, monetary, r/f/m scores,
    rfm_cell)."""
    base = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(date_col).alias("last_order"),
        F.count("*").cast("bigint").alias("frequency"),
        # exact decimal sum → double: order-insensitive, engine-identical
        # (see functions.scalar.money_sum)
        F.sum(F.col(amount_col).cast("decimal(27,4)")).cast("double").alias("monetary"),
    )
    anchor = orders.agg(F.max(date_col).alias("anchor"))
    base = base.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days",
        F.datediff(F.to_date("anchor"), F.to_date("last_order")).cast("bigint"),
    )
    fracs = ", ".join(str(i / n_tiles) for i in range(1, n_tiles))
    edges = base.agg(
        F.expr(f"percentile(recency_days, array({fracs}))").alias("r_edges"),
        F.expr(f"percentile(frequency, array({fracs}))").alias("f_edges"),
        F.expr(f"percentile(monetary, array({fracs}))").alias("m_edges"),
    )
    scored = (
        base.crossJoin(F.broadcast(edges))
        # recency scores run reversed: the MOST recent customer earns n
        .withColumn(
            "r_score",
            (
                F.lit(n_tiles + 1)
                - _score_against_edges(F.col("recency_days").cast("double"), "r_edges")
            ).cast("int"),
        )
        .withColumn(
            "f_score", _score_against_edges(F.col("frequency").cast("double"), "f_edges")
        )
        .withColumn(
            "m_score", _score_against_edges(F.col("monetary").cast("double"), "m_edges")
        )
        .withColumn(
            "rfm_cell",
            F.concat_ws("", "r_score", "f_score", "m_score"),
        )
    )
    return scored.select(
        "cust",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        "rfm_cell",
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order event-type transition matrix (empirical Markov chain):
    for each user's time-ordered event stream, count (state → next state)
    hops and normalize within each source state.

    One window partitioned BY USER (thousands of rows each, never a
    global sort — the partition key carries the scale), then a hash
    aggregate on the (cur, nxt) pair. The per-source normalizing join is
    an aggregate of the tiny transition table against itself, broadcast.
    Ties on `ts` break by `order_tiebreak` so the sequence — and hence
    the matrix — is engine-independent."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    hops = (
        events.withColumn("nxt", F.lead(type_col).over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col(type_col).alias("cur"), "nxt")
        .agg(F.count("*").alias("n_hops"))
    )
    totals = hops.groupBy("cur").agg(F.sum("n_hops").alias("n_from"))
    return (
        hops.join(F.broadcast(totals), "cur")
        .withColumn(
            "p_hop", F.col("n_hops").cast("double") / F.col("n_from").cast("double")
        )
        .select("cur", "nxt", "n_hops", "n_from", "p_hop")
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Partition-skew diagnostic for a join/agg key: the top-k heaviest
    keys with their share of the table and the global skew ratio
    (max key count ÷ mean key count) — the number that predicts whether a
    shuffle on this key straggles. This is the probe a pipeline runs
    BEFORE choosing between a plain shuffle join, salting
    (`joins.salted_join`), or an AQE skew split.

    Shape: one hash agg to per-key counts (map-side combined), one 1-row
    global rollup over those counts broadcast back onto the top-k rows,
    and a TakeOrdered for the top-k itself — no full sort, no window over
    the key space. Count arithmetic is integer; the two ratios are single
    double divisions, so the report is engine-exact."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("key_count"))
    totals = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("key_count").cast("long").alias("n_rows"),
        F.max("key_count").cast("long").alias("max_count"),
    )
    top = counts.orderBy(F.col("key_count").desc(), key_col).limit(top_k)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.col(key_col),
            F.col("key_count").cast("long").alias("key_count"),
            "n_keys",
            "n_rows",
            (
                F.col("key_count").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("key_share"),
            (
                F.col("max_count").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("skew_ratio"),
        )
    )


def ntile_buckets(
    df: DataFrame,
    value_col: str,
    n: int,
    order_cols: list[str] | None = None,
    exact: bool = True,
    out_col: str = "bucket",
) -> DataFrame:
    """Equal-population bucketing (decile/percentile assignment) with an
    explicit scale switch:

    - ``exact=True`` (the oracle mode): ``ntile(n)`` over a GLOBAL sort —
      bit-exact equal-count bins with deterministic tie-breaks
      (`order_cols` appended to the ordering), but the sort serializes
      through one reducer; right when the bucketed table is already an
      aggregate (users, not events) or when bins must be exactly equal.
    - ``exact=False`` (the 100 TB mode): bucket boundaries from
      ``approx_percentile`` (a mergeable sketch — one partial-agg pass,
      no global sort), then a narrow broadcast comparison against the
      n-1 edges. Bins are approximately equal-count; boundary rows may
      land one bucket off the exact answer, which is the documented,
      bounded trade (same swap unigram_logprob_scores makes for its
      quality buckets).

    Buckets are 1..n in DESCENDING value order (bucket 1 = top values)
    in both modes, so callers can flip modes without re-mapping."""
    if exact:
        order = [F.col(value_col).desc()] + [
            F.col(c) for c in (order_cols or [])
        ]
        return df.withColumn(out_col, F.ntile(n).over(Window.orderBy(*order)))
    fracs = [i / n for i in range(1, n)]
    edges = df.agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(f) for f in fracs]), 10_000
        ).alias("__edges")
    )
    v = F.col(value_col)
    # descending buckets: above the (n-1)/n quantile → bucket 1, ...
    expr = F.lit(n)
    for i, _ in enumerate(fracs):
        # edge index i holds the (i+1)/n quantile; values above the
        # LAST edge are bucket 1
        expr = F.when(
            v > F.element_at("__edges", i + 1), F.lit(n - 1 - i)
        ).otherwise(expr)
    return (
        df.join(F.broadcast(edges))
        .withColumn(out_col, expr)
        .drop("__edges")
    )


def autocorr_terms(
    series: DataFrame,
    t_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample-autocorrelation terms of an integer-valued, integer-indexed
    series at lags 1..max_lag, emitted as EXACT integer numerator /
    denominator pairs instead of a float ratio (acf_k = num_k / den — the
    division is a presentation concern; emitting the terms keeps the
    result order-independent and engine-exact, the same discipline as
    embedding_dim_variance_rank's variance numerator).

    With S = sum(x), n = count, dev_t = n*x_t - S (mean-centering scaled
    through by n so everything stays integral):

        num_k = sum over observed pairs (t, t-k) of dev_t * dev_{t-k}
        den   = sum over all t of dev_t^2        (n^2-scaled, cancels)

    Missing index values (days with no data) simply produce no pair at
    the lags they'd participate in — n_pairs per lag reports exactly how
    many survived, so the estimate's support is part of the answer.

    Shape: the series is already aggregated (one row per t); the lag
    structure is ONE equi-join of the series against its explode over
    lags 1..max_lag (t matches t-k), then an (max_lag)-group aggregate —
    no window over a global sort, no per-lag rescan. For a 100 TB events
    source the expensive part is building `series` (a partial-agg'd
    groupBy upstream of this operator); the ACF itself touches n rows.

    Caller owns the value scaling: dev products grow as (n * x)^2 * n, so
    x should be pre-scaled (e.g. kilodollars) to keep num/den inside
    BIGINT at the target n."""
    stats = series.agg(
        F.count("*").cast("long").alias("__n"),
        F.sum(F.col(value_col)).cast("long").alias("__s"),
    )
    dev = (
        series.crossJoin(F.broadcast(stats))
        .select(
            F.col(t_col).alias("__t"),
            (F.col("__n") * F.col(value_col) - F.col("__s")).alias("__dev"),
        )
    )
    den = dev.agg(
        F.sum(F.col("__dev") * F.col("__dev")).cast("long").alias("den")
    )
    lagged = dev.select(
        "__t",
        F.col("__dev").alias("__dev_b"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(max_lag)))
        ).alias("lag"),
    ).select((F.col("__t") + F.col("lag")).alias("__t"), "lag", "__dev_b")
    return (
        dev.join(lagged, "__t")
        .groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("__dev") * F.col("__dev_b")).cast("long").alias("num"),
        )
        .crossJoin(F.broadcast(den))
        .select(F.col("lag").cast("int").alias("lag"), "n_pairs", "num", "den")
    )


def grouped_ols_terms(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit, emitted as EXACT
    integer terms (the same emit-the-ratio-parts discipline as
    autocorr_terms): with integer x (e.g. a month index) and integer y
    (snapped revenue),

        slope     = slope_num / den
        intercept = intercept_num / den
        slope_num     = n*sum(xy) - sum(x)*sum(y)
        den           = n*sum(x^2) - sum(x)^2
        intercept_num = sum(y)*sum(x^2) - sum(x)*sum(xy)

    One partial-agg'd groupBy over (group) carrying five integer sums —
    the single-pass sufficient-statistics form, trivially mergeable
    across partitions/days (sum the sums), which is why it scales where
    a per-group sort-and-regress cannot. Complements
    theil_sen_revenue_trend (robust, pair-based) with the classical
    estimator."""
    g = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(x_col)).cast("long").alias("sx"),
        F.sum(F.col(y_col)).cast("long").alias("sy"),
        F.sum(F.col(x_col) * F.col(y_col)).cast("long").alias("sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).cast("long").alias("sxx"),
    )
    return g.select(
        group_col,
        F.col("n").alias("n_points"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("den"),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        .cast("long")
        .alias("intercept_num"),
    )


def dim_label_mutual_info(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    top_k: int = 16,
) -> DataFrame:
    """Per-dimension feature relevance: mutual information between each
    embedding dimension's SIGN and the class label,
    I(S_i; L) = sum_{s,l} p(s,l) * ln(p(s,l) / (p(s) p(l))) — the
    filter-method feature selector (which dimensions carry label signal;
    near-zero MI marks dims PQ/pruning can drop without hurting a
    downstream probe). Complements embedding_dim_variance_rank: variance
    measures spread, MI measures class alignment.

    Exact integers end to end: with joint counts n_sl, margins n_s (per
    dim), n_l, total N, the n-scaled numerator is
      mi_micro_n = sum n_sl * (L(n_sl) + L(N) - L(n_s) - L(n_l)),
    each L() an independently micro-nat-snapped ln of an integer count
    (the proven idiom) — divide by N at read time for nats/row.

    Shape: one posexplode aggregate to (dim, sign, label) joint counts
    (the only corpus-sized shuffle, 2·|labels|·dims groups, map-side
    combined), margins derived FROM the joint table (no rescan), tiny
    equi-joins, TakeOrdered top-k."""
    m = emb.select(
        label_col, F.posexplode(vec_col).alias("i0", "e")
    ).select(
        (F.col("i0") + 1).alias("dim"),
        (F.col("e").cast("double") >= 0).cast("int").alias("s"),
        F.col(label_col).alias("l"),
    )
    joint = m.groupBy("dim", "s", "l").agg(F.count("*").alias("n_sl"))
    ns = joint.groupBy("dim", "s").agg(F.sum("n_sl").alias("n_s"))
    nl = joint.groupBy("l").agg(F.sum("n_sl").alias("n_l"))
    ntot = joint.agg(F.sum("n_sl").alias("n_tot"))

    def L(c):
        return F.round(F.log(c.cast("double")) * F.lit(1e6), 0).cast("long")

    terms = (
        joint.join(ns, ["dim", "s"])
        .join(F.broadcast(nl), "l")
        .crossJoin(F.broadcast(ntot))
        .withColumn(
            "contrib",
            F.col("n_sl")
            * (
                L(F.col("n_sl"))
                + L(F.col("n_tot"))
                - L(F.col("n_s"))
                - L(F.col("n_l"))
            ),
        )
    )
    return (
        terms.groupBy("dim")
        .agg(
            F.sum("n_sl").cast("long").alias("n_rows"),
            F.sum("contrib").cast("long").alias("mi_micro_n"),
        )
        .select(F.col("dim").cast("long").alias("dim"), "n_rows", "mi_micro_n")
        .orderBy(F.col("mi_micro_n").desc(), "dim")
        .limit(top_k)
    )


def cusum_changepoint(
    series: DataFrame,
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Single change-point location via the CUSUM statistic: with
    dev_t = n*x_t - S (n-scaled mean centering, exact integers), the
    cumulative sum C_t = sum_{t'<=t} dev_t' peaks in magnitude at the
    most likely mean-shift point (Page 1954 / Pettitt's unpivoted
    form). Emits ONE row: the argmax |C_t| with the exact integer
    evidence on both sides of the cut (sums and counts, so the two
    means are num/den at read time).

    Shape: same contract as autocorr_terms — the input is an already
    aggregated series (one row per t), so the cumulative window and the
    argmax run over an aggregate-sized table; the corpus-sized work is
    upstream. Ties on |C_t| break on earlier t."""
    stats = series.agg(
        F.count("*").cast("long").alias("__n"),
        F.sum(F.col(value_col)).cast("long").alias("__s"),
    )
    dev = series.crossJoin(F.broadcast(stats)).select(
        F.col(t_col).alias("t"),
        F.col(value_col).cast("long").alias("x"),
        (F.col("__n") * F.col(value_col) - F.col("__s")).alias("__dev"),
        "__n",
        "__s",
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dev.select(
        "t",
        "x",
        "__n",
        "__s",
        F.sum("__dev").over(w).cast("long").alias("cusum"),
        F.sum("x").over(w).cast("long").alias("sum_le"),
        F.count("*").over(w).cast("long").alias("n_le"),
    )
    pick = Window.orderBy(F.abs(F.col("cusum")).desc(), F.col("t"))
    return (
        cum.withColumn("__r", F.row_number().over(pick))
        .filter(F.col("__r") == 1)
        .select(
            F.col("t").alias("change_t"),
            "cusum",
            F.col("n_le").alias("n_before"),
            F.col("sum_le").alias("sum_before"),
            (F.col("__n") - F.col("n_le")).cast("long").alias("n_after"),
            (F.col("__s") - F.col("sum_le")).cast("long").alias("sum_after"),
        )
    )


def seasonal_decomposition_hourly(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    half_window: int = 12,
) -> DataFrame:
    """STL-lite additive decomposition of the hourly event-value series:
    trend = centered (2*half_window+1)-hour moving average, seasonal =
    per-hour-of-day mean of the detrended series, residual = value -
    trend - seasonal (classical decomposition, Cleveland et al. 1990's
    non-iterated core). Emitted as exact integer sufficient statistics
    in the num/den discipline: v_milli (hour's value sum, milli), the
    25-hour trend SUM (NULL at the series edges where the window is
    incomplete), and the seasonal numerator/denominator for the row's
    hour-of-day — seas_num = sum over complete rows of
    (25*v_milli - trend_sum), seas_den = their count. Read time:
    trend = trend_sum/25, seasonal = seas_num/(25*seas_den),
    residual = v - trend - seasonal; every emitted column is an exact
    integer, so the decomposition hashes identically across engines.

    Scale shape: the corpus-sized work is the per-hour partial
    aggregate (one shuffle). The windows then run on the CALENDAR
    series — one row per hour, 8,760/year, bounded by wall-clock time
    not data volume — so the unpartitioned RANGE window over hour
    number is driver-scale by construction, not a scale hazard (a
    century of hours is <1M rows).
    """
    hourly = (
        events.select(
            F.expr(f"unix_micros({ts_col}) div 3600000000")
            .cast("long")
            .alias("h"),
            F.floor(F.col(value_col) * 1000).cast("long").alias("vm"),
        )
        .groupBy("h")
        .agg(F.sum("vm").cast("long").alias("v_milli"))
    )
    span = 2 * half_window + 1
    wr = (
        Window.orderBy("h").rangeBetween(-half_window, half_window)
    )
    t = hourly.withColumn("w_sum", F.sum("v_milli").over(wr)).withColumn(
        "w_cnt", F.count("*").over(wr)
    )
    t = t.withColumn(
        "trend_sum",
        F.when(F.col("w_cnt") == span, F.col("w_sum")).cast("long"),
    ).withColumn("hod", (F.col("h") % 24).cast("long"))
    seas = (
        t.filter(F.col("trend_sum").isNotNull())
        .groupBy("hod")
        .agg(
            F.sum(F.lit(span) * F.col("v_milli") - F.col("trend_sum"))
            .cast("long")
            .alias("seas_num"),
            F.count("*").cast("long").alias("seas_den"),
        )
    )
    return t.join(F.broadcast(seas), "hod", "left").select(
        "h",
        "hod",
        "v_milli",
        "trend_sum",
        "seas_num",
        "seas_den",
    )


def seq_pattern_support(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_len: int = 3,
    session_days: bool = True,
    max_types: int = 64,
) -> DataFrame:
    """Sequential-pattern support (the counting core of GSP/PrefixSpan,
    Srikant & Agrawal 1996): for every ordered pattern of event types up
    to `max_len` long, how many sequences contain it as a SUBSEQUENCE
    (order preserved, gaps allowed). The market-basket sibling of the
    funnel queries — funnels pin one hand-written path, this scores
    every candidate path. The sequence unit is the (user, UTC day)
    session by default (`session_days`) — whole-history sequences
    saturate every short pattern for any active user, while day
    sessions make support a discriminating signal.

    Matching is a greedy left fold over the user's ordered type
    sequence with the remaining-pattern STRING as accumulator (the
    same-type-accumulator idiom that makes Spark `aggregate` and
    DuckDB `list_reduce` agree): consume the head token on match,
    matched when the remainder is empty. Greedy earliest-match is
    exactly subsequence containment.

    Scale shape: one shuffle builds per-user sequences (groupBy user;
    per-user arrays bounded by activity). The pattern table is
    |types| + |types|^2 + |types|^3 rows, which is only broadcastable
    while |types| is small — so the type domain is CAPPED at the
    `max_types` most frequent event types (ties broken by type name,
    deterministic). At the default K=64 the grid tops out at
    64+64²+64³ ≈ 266k short strings (~a few MB broadcast); an
    unguarded realistic taxonomy (|types| ≈ 10³) would otherwise
    build a 10⁹-row grid and OOM the broadcast — the same
    documented-contract cap as the clustering-coefficient degree-64
    wedge guard. Patterns are scored against FULL sequences (rare
    types still appear inside `seq`; they just don't mint candidate
    patterns). The frequency top-K itself is one partial-aggregated
    groupBy over the type column followed by a driver-side TopK —
    |types| rows, never the event table. Matching is map-side
    (broadcast grid) and the final rollup shuffles |patterns| partial
    counts. n_sequences_total rides along for read-time support
    ratios.

    Returns (pattern, plen, n_support, n_sequences_total).
    """
    keys = [F.col(user_col).alias("u")]
    if session_days:
        keys.append(
            F.expr(f"unix_micros({ts_col}) div 86400000000").alias("d")
        )
    seqs = (
        events.select(
            *keys,
            F.struct(
                F.expr(f"unix_micros({ts_col})").alias("t"),
                F.col(id_col).alias("eid"),
                F.col(type_col).alias("et"),
            ).alias("s"),
        )
        .groupBy(["u", "d"] if session_days else ["u"])
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(s)), x -> x.et)"),
                " ",
            ).alias("seq")
        )
    )
    types = (
        events.groupBy(F.col(type_col).alias("t1"))
        .agg(F.count("*").alias("__n"))
        .orderBy(F.col("__n").desc(), "t1")
        .limit(max_types)
        .select("t1")
    )
    pats = types.select(F.col("t1").alias("pattern"))
    if max_len >= 2:
        p2 = (
            types.crossJoin(types.select(F.col("t1").alias("t2")))
            .select(F.concat_ws(" ", "t1", "t2").alias("pattern"))
        )
        pats = pats.unionByName(p2)
    if max_len >= 3:
        p3 = (
            types.crossJoin(types.select(F.col("t1").alias("t2")))
            .crossJoin(types.select(F.col("t1").alias("t3")))
            .select(F.concat_ws(" ", "t1", "t2", "t3").alias("pattern"))
        )
        pats = pats.unionByName(p3)
    n_total = seqs.agg(F.count("*").cast("long").alias("n_sequences_total"))
    matched = seqs.crossJoin(F.broadcast(pats)).withColumn(
        "hit",
        (
            F.expr(
                "aggregate(split(seq, ' '), pattern, (acc, x) ->"
                " IF(acc != '' AND (acc = x OR startswith(acc, concat(x, ' '))),"
                " IF(acc = x, '', substring(acc, length(x) + 2)), acc))"
            )
            == ""
        ).cast("long"),
    )
    return (
        matched.groupBy("pattern")
        .agg(F.sum("hit").cast("long").alias("n_support"))
        .withColumn(
            "plen",
            (F.size(F.split(F.col("pattern"), " "))).cast("long"),
        )
        .crossJoin(F.broadcast(n_total))
        .select("pattern", "plen", "n_support", "n_sequences_total")
    )


def loo_target_encoding(
    df: DataFrame,
    group_col: str,
    target_col: str,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Leave-one-out target encoding (the categorical-feature encoder of
    gradient-boosting pipelines, Micci-Barreca 2001 without the prior
    term): each row's encoding is the mean target of its OWN category
    computed over every OTHER row — the standard trick that keeps the
    feature informative while blocking single-row target leakage.

    Exactness: `target_col` must already be an integer (cents/milli);
    the encoding is carried as the (numerator, denominator) pair
    (sum-minus-self, n-minus-one) plus the floored integer mean, so the
    driver hash never sees a float. Singleton categories yield NULL
    (no other row to borrow a mean from) — the caller imputes.

    Scale shape: ONE partial-aggregated groupBy over the category column
    produces a |categories|-row summary joined back onto the fact table;
    the per-row arithmetic is codegen'd expression work. No window, no
    sort. The join carries NO mandatory broadcast hint: categorical
    encoders get applied to high-cardinality keys too (user ids), where
    a forced broadcast is the OOM trap — the planner/AQE broadcasts the
    summary while it is small and degrades to a shuffle join past the
    threshold.

    Returns keep_cols + (group_col, target, loo_num, loo_den, loo_mean).
    """
    g = df.groupBy(group_col).agg(
        F.sum(target_col).cast("long").alias("__g_sum"),
        F.count("*").cast("long").alias("__g_n"),
    )
    out = df.join(g, group_col)
    loo_num = (F.col("__g_sum") - F.col(target_col)).cast("long")
    loo_den = (F.col("__g_n") - F.lit(1)).cast("long")
    return out.select(
        *keep_cols,
        F.col(group_col),
        F.col(target_col).cast("long").alias("target"),
        F.when(loo_den > 0, loo_num).alias("loo_num"),
        F.when(loo_den > 0, loo_den).alias("loo_den"),
        # targets are non-negative integers, so truncating DIV == floor
        F.when(
            loo_den > 0,
            F.expr(f"(__g_sum - {target_col}) DIV (__g_n - 1)"),
        )
        .cast("long")
        .alias("loo_mean"),
    )


# Sign-safe exact floor division by a positive literal: subtracting the
# (always non-negative) pmod makes the numerator an exact multiple, so
# truncating DIV returns the floor quotient for negative values too.
# DuckDB twin: (x - ((x % d) + d) % d) // d — same argument.
def _floordiv_sql(x: str, d: int) -> str:
    return f"(({x}) - pmod({x}, {d})) DIV {d}"


def holt_winters_level_trend(
    daily: DataFrame,
    group_col: str,
    day_col: str = "day",
    value_col: str = "v",
    alpha_tenths: int = 2,
    beta_tenths: int = 1,
    horizon: int = 7,
) -> DataFrame:
    """Holt's double exponential smoothing (level + trend, no seasonal
    term) over each group's ordered daily series, as an exact integer
    recurrence so both engines replay the identical fold:

        l_t = floor((a·x_t     + (10-a)·(l+b)) / 10)
        b_t = floor((c·(l_t-l) + (10-c)·b)     / 10)

    with a = alpha_tenths, c = beta_tenths (smoothing factors in
    tenths), seeded l_1 = x_1, b_1 = 0. Floor division is sign-safe via
    the pmod trick (`_floordiv_sql`) because the trend can go negative.

    Scale shape: one partial-aggregated groupBy builds each group's
    (day, value) array — bounded by the CALENDAR (≤ a few thousand
    entries regardless of row volume), the same justification as
    seasonal_decomposition_hourly — then the recurrence is a map-side
    `aggregate` fold per group. No window, no per-row state exchange.
    The DuckDB oracle replays the fold as a recursive CTE stepping on
    row_number.

    Returns (group, n_days, level, trend, forecast) where forecast is
    the `horizon`-step-ahead linear extrapolation level + horizon·trend.
    """
    a, c = alpha_tenths, beta_tenths
    lnew = _floordiv_sql(f"{a} * x.v + {10 - a} * (acc.l + acc.b)", 10)
    bnew = _floordiv_sql(f"{c} * (({lnew}) - acc.l) + {10 - c} * acc.b", 10)
    fold = F.expr(
        "aggregate(xs,"
        " named_struct('i', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT),"
        "              'b', CAST(0 AS BIGINT)),"
        " (acc, x) -> named_struct("
        "   'i', acc.i + 1L,"
        "   'l', CASE WHEN acc.i = 0 THEN x.v ELSE " + lnew + " END,"
        "   'b', CASE WHEN acc.i = 0 THEN CAST(0 AS BIGINT)"
        "        ELSE " + bnew + " END))"
    )
    series = (
        daily.select(
            F.col(group_col).alias("g"),
            F.struct(
                F.col(day_col).alias("d"), F.col(value_col).cast("long").alias("v")
            ).alias("s"),
        )
        .groupBy("g")
        .agg(F.array_sort(F.collect_list("s")).alias("xs"))
    )
    return series.select(
        F.col("g").alias(group_col),
        F.size("xs").cast("long").alias("n_days"),
        fold.alias("__hw"),
    ).select(
        group_col,
        "n_days",
        F.col("__hw.l").alias("level"),
        F.col("__hw.b").alias("trend"),
        (F.col("__hw.l") + F.lit(horizon) * F.col("__hw.b"))
        .cast("long")
        .alias("forecast"),
    )


def hbos_scores(
    events: DataFrame,
    id_col: str = "event_id",
    value_col: str = "value",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_value_bins: int = 16,
    top_k: int = 50,
) -> DataFrame:
    """Histogram-based outlier score (HBOS, Goldstein & Dengel 2012):
    per-feature equi-width histograms, a row's score is the summed
    negative log density of its bins — the cheap multivariate anomaly
    detector that needs no pairwise distances. Features here: the
    16-bin equi-width value histogram, hour-of-day, and event type.

    Integer exactness: score contribution per feature is
    ln_micro(n_total) − ln_micro(n_bin) with ln_micro(x) =
    round(ln(x)·1e6) — the micro-nat snap shared with the LM-quality
    operators, so rank order is engine-identical. The value bin index
    is pure integer arithmetic: ((v−min)·B) DIV (max−min+1), which
    lands in [0, B−1] with no cap needed.

    Scale shape: the min/max and each histogram are one partial
    aggregate each (16 + 24 + |types| rows total) that broadcast back
    onto the fact table; scoring is codegen'd expressions and the
    result is a TakeOrdered top-k — no global sort, no window.
    """
    ln_micro = "CAST(round(ln(CAST({n} AS DOUBLE)) * 1e6) AS BIGINT)"
    v_milli = F.floor(F.col(value_col).cast("double") * 1000).cast("long")
    base = events.select(
        F.col(id_col),
        v_milli.alias("vm"),
        F.expr(f"pmod(unix_micros({ts_col}) div 3600000000, 24)")
        .cast("long")
        .alias("hod"),
        F.col(type_col).alias("et"),
    )
    rng = base.agg(
        F.min("vm").alias("vmin"),
        F.max("vm").alias("vmax"),
        F.count("*").alias("n_total"),
    )
    binned = base.join(F.broadcast(rng)).select(
        id_col,
        "hod",
        "et",
        "n_total",
        F.expr(f"((vm - vmin) * {n_value_bins}) DIV (vmax - vmin + 1)")
        .cast("long")
        .alias("vbin"),
        # binned feeds three histograms AND the scoring join; Catalyst
        # does not CSE repeated subplans, so cut the lineage once here
        # instead of re-scanning the fact table per consumer
    ).localCheckpoint(eager=False)
    h_v = binned.groupBy("vbin").agg(F.count("*").alias("n_v"))
    h_h = binned.groupBy("hod").agg(F.count("*").alias("n_h"))
    h_t = binned.groupBy("et").agg(F.count("*").alias("n_t"))
    scored = (
        binned.join(F.broadcast(h_v), "vbin")
        .join(F.broadcast(h_h), "hod")
        .join(F.broadcast(h_t), "et")
        .select(
            F.col(id_col),
            F.col("vbin"),
            F.col("hod"),
            F.col("et").alias("event_type"),
            (
                3 * F.expr(ln_micro.format(n="n_total"))
                - F.expr(ln_micro.format(n="n_v"))
                - F.expr(ln_micro.format(n="n_h"))
                - F.expr(ln_micro.format(n="n_t"))
            )
            .cast("long")
            .alias("hbos_micro"),
        )
    )
    return scored.orderBy(
        F.col("hbos_micro").desc(), F.col(id_col)
    ).limit(top_k)


def auc_exact_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Exact ROC-AUC via the tie-corrected Mann-Whitney rank sum — the
    classifier-gate evaluation number, computed without floats: with
    average ranks doubled to stay integral,

        2·R_pos = Σ_s n_pos(s) · (2·cum_below(s) + n_tot(s) + 1)
        AUC     = (2·R_pos − n_pos·(n_pos+1)) / (2·n_pos·n_neg)

    emitted as the (auc_num, auc_den) integer pair plus a floored ppm.

    Scale shape: one groupBy collapses the corpus to |distinct scores|
    rows; the running `cum_below` is a window over THAT summary, not
    the data. Callers must therefore pass a BUCKETED score (micro-nat
    logits DIV'd into milli-nat buckets or coarser) so the summary is
    bounded — rank-sum AUC over bucketed scores is exactly the
    tie-corrected AUC of the bucketed classifier. `label_col` is 0/1.
    """
    per_score = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count("*").cast("long").alias("n_tot"),
        F.sum(F.col(label_col).cast("long")).cast("long").alias("n_pos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "cum_below", F.coalesce(F.sum("n_tot").over(w), F.lit(0))
    )
    return ranked.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        (F.sum("n_tot") - F.sum("n_pos")).cast("long").alias("n_neg"),
        F.sum(
            F.col("n_pos") * (2 * F.col("cum_below") + F.col("n_tot") + 1)
        )
        .cast("long")
        .alias("rank_sum_x2"),
    ).select(
        "n_pos",
        "n_neg",
        (F.col("rank_sum_x2") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("long")
        .alias("auc_num"),
        (2 * F.col("n_pos") * F.col("n_neg")).cast("long").alias("auc_den"),
        F.expr(
            "(rank_sum_x2 - n_pos * (n_pos + 1)) * 1000000"
            " DIV (2 * n_pos * n_neg)"
        )
        .cast("long")
        .alias("auc_ppm"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a scored/labelled table: equal-width
    bins over the observed score range, per bin the row count, positive
    count, positive rate (ppm, floored) and the mean score as an exact
    (sum, count) pair — the calibration audit next to `auc_exact_report`.

    Scale shape: one 1-row min/max aggregate broadcast back, then one
    partial-aggregated groupBy on the bin index (≤ n_bins rows out).
    Bin index arithmetic is the same capless DIV as hbos_scores.
    """
    rng = scored.agg(
        F.min(score_col).alias("smin"), F.max(score_col).alias("smax")
    )
    return (
        scored.join(F.broadcast(rng))
        .select(
            F.expr(
                f"(({score_col} - smin) * {n_bins})"
                " DIV (smax - smin + 1)"
            )
            .cast("long")
            .alias("bin"),
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("s").cast("long").alias("score_sum"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("n_pos * 1000000 DIV n").cast("long").alias("pos_rate_ppm"),
            "score_sum",
        )
    )


def _rank2x(df: DataFrame, col: str, out: str) -> DataFrame:
    """Doubled average ranks of `col` as integers: 2·avg_rank =
    2·cnt_below + cnt_equal + 1, computed on the per-distinct-value
    SUMMARY (the same bounded-window trick as auc_exact_report).
    Returns (value, rank2x) to join back on the value."""
    per = df.groupBy(F.col(col).alias("__v")).agg(
        F.count("*").cast("long").alias("__n")
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    return per.select(
        F.col("__v").alias(col),
        (
            2 * F.coalesce(F.sum("__n").over(w), F.lit(0))
            + F.col("__n")
            + 1
        )
        .cast("long")
        .alias(out),
    )


def spearman_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Spearman rank correlation with exact tie handling: Pearson over
    AVERAGE ranks, carried as doubled-integer ranks so every sufficient
    statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an exact integer — the
    monotonic-association audit between two scores (e.g. does the cheap
    quality heuristic rank documents like the trained gate?).

    Emits the six sufficient statistics (composable: sum them across
    shards and finish anywhere) plus the signed squared correlation
    sign(ρ)·ρ² in ppm, finished in DECIMAL(38,0). The in-engine finish
    is exact while (n·Σxy)² fits 38 digits (n ≲ 3·10⁴ rows); beyond
    that, consume the exact statistics and finish in arbitrary
    precision driver-side — the stats, not the ppm, are the contract.

    Shape: two per-distinct-value rank summaries (bounded windows over
    summaries, not data — callers bucket continuous scores first), two
    joins back on the value, one 1-row aggregate.
    """
    rx = _rank2x(df, x_col, "__rx")
    ry = _rank2x(df, y_col, "__ry")
    ranked = df.join(rx, x_col).join(ry, y_col)
    stats = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__rx").cast("long").alias("sx"),
        F.sum("__ry").cast("long").alias("sy"),
        F.sum(F.col("__rx") * F.col("__ry")).cast("long").alias("sxy"),
        F.sum(F.col("__rx") * F.col("__rx")).cast("long").alias("sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).cast("long").alias("syy"),
    )
    d38 = "CAST({} AS decimal(38,0))"
    num = f"({d38.format('n')} * {d38.format('sxy')} - {d38.format('sx')} * {d38.format('sy')})"
    dxx = f"({d38.format('n')} * {d38.format('sxx')} - {d38.format('sx')} * {d38.format('sx')})"
    dyy = f"({d38.format('n')} * {d38.format('syy')} - {d38.format('sy')} * {d38.format('sy')})"
    return stats.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.expr(
            f"CAST((CASE WHEN {num} < 0 THEN -1 ELSE 1 END"
            f" * (({num} * {num}) * 1000000)"
            f" DIV ({dxx} * {dyy})) AS BIGINT)"
        ).alias("rho_sq_signed_ppm"),
    )


def isotonic_calibration(
    bins: DataFrame,
    bin_col: str = "bin",
    n_col: str = "n",
    pos_col: str = "n_pos",
) -> DataFrame:
    """Isotonic regression over calibration bins via the CLOSED-FORM
    pool-adjacent-violators solution: the monotone fit at bin i is
    max_{j≤i} min_{k≥j} mean(pos_rate over bins j..k) (Ayer et al.
    1955) — the calibrated, monotone probability the raw reliability
    diagram violates. Stack-based PAV is a sequential while-loop; the
    max-min form is pure joins over the BIN GRID, which is bounded by
    design (10-32 bins), so the triple expansion is O(B³) rows of a
    tiny table — declarative, engine-exact, and cheap at any corpus
    size because the corpus collapsed to B rows upstream.

    Exactness: interval means are (pos, n) integer pairs compared by
    cross-multiplication (a/b vs c/d as a·d vs c·b — no floats); the
    selected extremum is emitted as floored ppm, where equal fractions
    give equal ppm whatever (num, den) pair represents them.

    Returns one row per bin: (bin, n, n_pos, raw_rate_ppm,
    iso_rate_ppm), iso monotone non-decreasing in bin.
    """
    b = bins.select(
        F.col(bin_col).alias("bin"),
        F.col(n_col).cast("long").alias("n"),
        F.col(pos_col).cast("long").alias("n_pos"),
    )
    j = b.select(F.col("bin").alias("j"))
    k = b.select(F.col("bin").alias("k"))
    # interval sums j..k via one grid join onto the bin table — the bin
    # relations are bounded by design (≤ n_bins rows), so the mandatory
    # broadcast is the house-sanctioned kind and the inequality joins
    # plan as BNLJ over tiny builds, never a shuffled cartesian
    iv = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(b),
            (F.col("bin") >= F.col("j")) & (F.col("bin") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            F.sum("n_pos").cast("long").alias("p"),
            F.sum("n").cast("long").alias("q"),
        )
    )
    # floor-to-ppm commutes with both extrema (floor is non-decreasing:
    # min floor == floor min, max floor == floor max), so the max-min
    # runs directly on floored ppm values — the output IS
    # floor(isotonic fraction · 1e6), no fraction compare needed
    inner = iv.groupBy("j").agg(
        F.min(F.expr("p * 1000000 DIV q")).alias("lo")
    )
    out = (
        b.select("bin", "n", "n_pos")
        .join(F.broadcast(inner), F.col("j") <= F.col("bin"))
        .groupBy("bin", "n", "n_pos")
        .agg(F.max("lo").cast("long").alias("iso_rate_ppm"))
    )
    return out.select(
        "bin",
        "n",
        "n_pos",
        F.expr("n_pos * 1000000 DIV n").cast("long").alias("raw_rate_ppm"),
        "iso_rate_ppm",
    )


# Sign-safe exact floor division by a positive COLUMN denominator (the
# literal-divisor twin is _floordiv_sql above): subtracting pmod(x, d)
# (non-negative for d > 0) makes x an exact multiple, so truncating DIV
# is the floor quotient for negative numerators too.
# DuckDB twin: (x - ((x % d) + d) % d) // d.
def _floordiv_col(x: str, d: str) -> str:
    return f"((({x}) - pmod({x}, {d})) DIV ({d}))"


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's κ — chance-corrected agreement between two categorical
    labelings (classifier vs truth, or two independent heuristics).
    With a_ii the agreement diagonal, r_i / c_i the marginal totals:

        κ = (n·Σa_ii − Σ r_i·c_i) / (n² − Σ r_i·c_i)

    — every term an exact integer, so the statistic is emitted as the
    (kappa_num, kappa_den) pair plus a SIGN-SAFE floored ppm (κ can be
    negative for worse-than-chance raters; pmod floor division keeps
    the floor exact either side of zero). Squared-scale products (n·a,
    r·c, n²) finish in DECIMAL(38,0) per the house overflow rule —
    BIGINT wraps silently near n ≈ 3e9.

    Scale shape: one groupBy collapses the corpus to the contingency
    matrix (bounded by the label vocabulary), marginals and the finish
    are aggregates of THAT — nothing downstream of the first shuffle
    depends on corpus size.
    """
    cells = df.groupBy(
        F.col(rater_a).alias("a"), F.col(rater_b).alias("b")
    ).agg(F.count("*").cast("long").alias("n_ab"))
    # marginals via one pass over the bounded cell table (grouping sets
    # would also work; two tiny aggregates keep the plan obvious)
    ra = cells.groupBy("a").agg(F.sum("n_ab").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("n_ab").alias("c"))
    pe = (
        ra.join(cb, ra.a == cb.b)
        .agg(
            # COALESCE: raters with DISJOINT label sets share no label,
            # the marginal join is empty, and chance agreement is 0 —
            # not NULL (found by the hypothesis draw ('b','a')×2)
            F.coalesce(
                F.sum(F.col("r").cast("decimal(38,0)") * F.col("c")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("pe_x_n")
        )
    )
    po = cells.agg(
        F.sum("n_ab").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n_ab")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    return (
        po.join(F.broadcast(pe))
        .select(
            "n",
            "n_agree",
            F.col("pe_x_n").cast("decimal(38,0)").alias("pe_x_n"),
            F.expr("CAST(n AS decimal(38,0)) * n_agree - pe_x_n").alias(
                "kappa_num"
            ),
            F.expr("CAST(n AS decimal(38,0)) * n - pe_x_n").alias(
                "kappa_den"
            ),
        )
        .select(
            "n",
            "n_agree",
            F.col("pe_x_n").cast("long").alias("pe_x_n"),
            F.col("kappa_num").cast("long").alias("kappa_num"),
            F.col("kappa_den").cast("long").alias("kappa_den"),
            # degenerate contract: both raters constant on the SAME
            # label makes pe = n² and the denominator 0 (κ undefined);
            # emit 0 — observed agreement equals chance agreement there
            F.expr(
                "CASE WHEN kappa_den = 0 THEN 0 ELSE "
                + _floordiv_col("kappa_num * 1000000", "kappa_den")
                + " END"
            )
            .cast("long")
            .alias("kappa_ppm"),
        )
    )


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cramér's V — the [0,1]-normalized χ² association between two
    categorical columns (bias-uncorrected). Using χ² = n·Σ o²/(r·c) − n,
    each cell contributes an independently micro-snapped term

        term_micro(i,j) = ⌊ n · o_ij² · 10⁶ / (r_i · c_j) ⌋

    so chi2_micro = Σ term_micro − 10⁶·n and V² = χ²/(n·(min(r,c)−1))
    as floored ppm. The per-cell floor (≤1 micro each, bounded by the
    grid size) is the deterministic snap-at-birth the house applies to
    every rational — both engines floor identically. Products run in
    DECIMAL(38,0) (n·o² outgrows BIGINT around n ≈ 2e6 on a skewed
    grid). Degenerate contract: a single-level column admits no
    association, so min(r,c) = 1 emits v2_ppm = 0 (χ² is exactly 0
    there too) instead of dividing by zero.

    Scale shape: identical to cohens_kappa — corpus → bounded
    contingency cells, everything after is grid-sized.
    """
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count("*").cast("long").alias("o"))
    ra = cells.groupBy("a").agg(F.sum("o").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("n_rows"),
        F.countDistinct("b").cast("long").alias("n_cols"),
    )
    terms = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .join(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(n AS decimal(38,0)) * o * o * 1000000"
                " DIV (CAST(r AS decimal(38,0)) * c)"
            ).alias("term_micro")
        )
        .agg(F.sum("term_micro").alias("s_micro"))
    )
    return (
        tot.join(F.broadcast(terms))
        .select(
            "n",
            "n_rows",
            "n_cols",
            F.expr(
                "CAST(s_micro - CAST(n AS decimal(38,0)) * 1000000"
                " AS BIGINT)"
            ).alias("chi2_micro"),
            F.expr(
                "CAST(CASE WHEN least(n_rows, n_cols) = 1 THEN 0"
                " ELSE (s_micro - CAST(n AS decimal(38,0)) * 1000000)"
                " DIV (CAST(n AS decimal(38,0))"
                "      * (least(n_rows, n_cols) - 1)) END AS BIGINT)"
            ).alias("v2_ppm"),
        )
    )


def concentration_report(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    value_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration per group: with per-entity
    integer totals x_i inside a group, HHI = Σ shareᵢ² emitted as

        hhi_ppm = Σ_i ⌊ x_i² · 10⁶ / (Σx)² ⌋

    (per-entity floor snap; ≤ n_entities micro of total downward bias,
    deterministic on both engines) plus the top single-entity share.
    1e6/n_entities ppm = perfectly even; 1e6 = monopoly. Squares and
    the (Σx)² denominator run in DECIMAL(38,0)/HUGEINT — cents² wraps
    BIGINT at Σx ≈ $30M.

    Scale shape: one (group, entity) partial-agg shuffle, then a
    group-level agg of the entity rollup joined to its 1-row-per-group
    totals — no window, no corpus-sized rejoin.
    """
    per = df.groupBy(
        F.col(group_col).alias("g"), F.col(entity_col).alias("e")
    ).agg(F.sum(F.col(value_col)).cast("long").alias("x"))
    tot = per.groupBy("g").agg(
        F.sum("x").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_entities"),
        F.max("x").cast("long").alias("x_top"),
    )
    return (
        per.join(tot, "g")
        .select(
            "g",
            "total",
            "n_entities",
            "x_top",
            F.expr(
                "CAST(x AS decimal(38,0)) * x * 1000000"
                " DIV (CAST(total AS decimal(38,0)) * total)"
            ).alias("t_ppm"),
        )
        .groupBy("g", "total", "n_entities", "x_top")
        .agg(F.sum("t_ppm").cast("long").alias("hhi_ppm"))
        .select(
            F.col("g"),
            F.col("n_entities"),
            F.col("total"),
            "hhi_ppm",
            F.expr("x_top * 1000000 DIV total")
            .cast("long")
            .alias("top_share_ppm"),
        )
    )


def psi_report(
    binned: DataFrame,
    bin_col: str = "bin",
    ref_col: str = "c_ref",
    cur_col: str = "c_cur",
) -> DataFrame:
    """Population Stability Index per bin — the model-monitoring drift
    score between a reference and a current distribution over the SAME
    bins: PSI = Σ (p−q)·ln(p/q). Input is the already-binned count
    table (bin, c_ref, c_cur); add-one smoothing keeps empty bins
    finite (callers provide the zero-filled grid or accept hit-bins
    only). With N'_r = Σ(c_ref+1), N'_c = Σ(c_cur+1):

        p_ppm  = ⌊(c_ref+1)·10⁶ / N'_r⌋         (floored shares)
        ln Δ   = ln_micro((c_ref+1)·N'_c) − ln_micro((c_cur+1)·N'_r)
        contrib_micro = floor₊((p_ppm − q_ppm)·lnΔ / 10⁶)

    — micro-nat-snapped logs of integer PRODUCTS (the exact-ratio trick
    shared with dim_label_mutual_info), sign-safe pmod floor for the
    product of two possibly-negative snapped factors (exact math makes
    each contribution ≥ 0; snapping can graze below zero and both
    engines floor identically). PSI > 0.2 ≈ actionable drift.

    Scale shape: corpus is already collapsed to the bin grid upstream;
    this is grid-sized arithmetic with two 1-row broadcast totals.
    """
    b = binned.select(
        F.col(bin_col).alias("bin"),
        (F.col(ref_col).cast("long") + 1).alias("cr"),
        (F.col(cur_col).cast("long") + 1).alias("cc"),
    )
    tot = b.agg(
        F.sum("cr").cast("long").alias("nr"),
        F.sum("cc").cast("long").alias("nc"),
    )
    # each product factor casts to DOUBLE BEFORE the multiply — a
    # BIGINT·BIGINT product wraps at N ≈ 3e9; the double product of two
    # exact integers is one correctly-rounded IEEE op on both engines
    ln = "CAST(round(ln(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE)) * 1e6) AS BIGINT)"
    j = b.join(F.broadcast(tot)).select(
        "bin",
        (F.col("cr") - 1).cast("long").alias("c_ref"),
        (F.col("cc") - 1).cast("long").alias("c_cur"),
        F.expr("cr * 1000000 DIV nr").cast("long").alias("p_ppm"),
        F.expr("cc * 1000000 DIV nc").cast("long").alias("q_ppm"),
        (
            F.expr(ln.format(a="cr", b="nc")) - F.expr(ln.format(a="cc", b="nr"))
        )
        .cast("long")
        .alias("ln_diff_micro"),
    )
    return j.select(
        "bin",
        "c_ref",
        "c_cur",
        "p_ppm",
        "q_ppm",
        F.expr(
            _floordiv_sql("(p_ppm - q_ppm) * ln_diff_micro", 1_000_000)
        )
        .cast("long")
        .alias("contrib_micro"),
    )


def ks_one_vs_rest(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test, each group against the
    REST of the corpus: D_g = max_v |F_g(v) − F_rest(v)| computed
    exactly by cross-multiplied cumulative counts —

        d_num = max_v |c1(v)·n2 − c2(v)·n1|,   D = d_num / (n1·n2)

    and the α = 0.05 decision by the asymptotic two-sample bound
    D > c(α)·√((n1+n2)/(n1·n2)) squared into the pure-integer compare
    d_num²·10⁶ > c²·(n1+n2)·n1·n2 with c²(0.05) = −ln(0.025)/2 scaled to
    1_844_440/10⁶ (Smirnov), evaluated in DECIMAL(38,0) — d_num⁴-free,
    but d_num² ≈ n⁴ bounds the exact in-engine verdict at n ≲ 10⁹ rows
    per pair; beyond that consume (d_num, n1, n2) and decide driver-side.

    Scale shape: the corpus collapses to the (group, value) grid in one
    partial-agg shuffle; ECDFs are windows over the VALUE SUMMARY
    (bounded by distinct values — callers bucket unbounded domains
    first), zero-filled by a groups×values grid of two bounded
    summaries. The step maximum is taken at every distinct value of the
    merged sample, which is exactly where |F1−F2| can change.
    """
    base = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    )
    gv = base.groupBy("g", "v").agg(F.count("*").cast("long").alias("c"))
    # bounded summaries: per-value totals with a global running cum, and
    # per-group sizes
    vals = gv.groupBy("v").agg(F.sum("c").alias("cv"))
    w_all = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    vals = vals.withColumn("ct", F.sum("cv").over(w_all).cast("long")).drop(
        "cv"
    )
    grps = gv.groupBy("g").agg(F.sum("c").cast("long").alias("n1"))
    tot = grps.agg(F.sum("n1").cast("long").alias("n"))
    grid = grps.join(F.broadcast(vals)).join(F.broadcast(tot))
    w_g = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        grid.join(gv, ["g", "v"], "left")
        .withColumn("c1", F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w_g))
        .select(
            "g",
            "n1",
            (F.col("n") - F.col("n1")).alias("n2"),
            F.expr(
                "abs(CAST(c1 AS decimal(38,0)) * (n - n1)"
                "    - CAST(ct - c1 AS decimal(38,0)) * n1)"
            ).alias("diff"),
        )
    )
    return (
        cum.groupBy("g", "n1", "n2")
        .agg(F.max("diff").alias("d_num"))
        .select(
            "g",
            "n1",
            "n2",
            F.col("d_num").cast("long").alias("d_num"),
            F.expr(
                "CAST(d_num * 1000000"
                " DIV (CAST(n1 AS decimal(38,0)) * n2) AS BIGINT)"
            ).alias("d_ppm"),
            F.expr(
                "CAST(d_num * d_num * 1000000 >"
                " 1844440 * (CAST(n1 AS decimal(38,0)) + n2) * n1 * n2"
                " AS INT)"
            ).alias("reject_05"),
        )
    )


def brier_decomposition(
    iso_bins: DataFrame,
    n_col: str = "n",
    pos_col: str = "n_pos",
    p_col: str = "iso_rate_ppm",
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over calibration
    bins whose forecast is constant within a bin (here: the isotonic
    fit, so this audits the CALIBRATED gate):

        Brier = REL − RES + UNC
        REL = Σ n_k(p_k − ȳ_k)²/n   RES = Σ n_k(ȳ_k − ȳ)²/n
        UNC = ȳ(1 − ȳ)

    All four emitted in pp2 (ppm², i.e. Brier·10¹²) from integer
    sufficient statistics with the house per-term floor snap; the
    DIRECT Brier Σ(p−y)²/n is computed independently via the exact
    identity Σ_k (n_k·p_k² − 2·10⁶·p_k·pos_k + 10¹²·pos_k) (y² = y),
    and `identity_gap_pp2` = direct − (rel − res + unc) ships as the
    audit column — exact rationals make it 0; snapping leaves a few
    pp2. Squared products run in DECIMAL(38,0) (p²·n is 10¹²·n).

    Scale shape: input is the bounded bin summary — everything here is
    grid-sized arithmetic after the upstream one-pass binning.
    """
    b = iso_bins.select(
        F.col(n_col).cast("long").alias("nk"),
        F.col(pos_col).cast("long").alias("pk"),
        F.col(p_col).cast("long").alias("fp"),
    )
    tot = b.agg(
        F.sum("nk").cast("long").alias("n"),
        F.sum("pk").cast("long").alias("p"),
    )
    terms = b.join(F.broadcast(tot)).agg(
        F.first("n").alias("n"),
        F.first("p").alias("p"),
        F.sum(
            F.expr(
                "(CAST(fp AS decimal(38,0)) * nk - 1000000 * CAST(pk AS decimal(38,0)))"
                " * (CAST(fp AS decimal(38,0)) * nk - 1000000 * CAST(pk AS decimal(38,0)))"
                " DIV nk"
            )
        ).alias("rel_sum"),
        F.sum(
            F.expr(
                "(CAST(pk AS decimal(38,0)) * n - CAST(p AS decimal(38,0)) * nk)"
                " * (CAST(pk AS decimal(38,0)) * n - CAST(p AS decimal(38,0)) * nk)"
                " * 1000000000000 DIV (CAST(nk AS decimal(38,0)) * n * n)"
            )
        ).alias("res_sum"),
        F.sum(
            F.expr(
                "CAST(nk AS decimal(38,0)) * fp * fp"
                " - 2000000 * CAST(fp AS decimal(38,0)) * pk"
                " + 1000000000000 * CAST(pk AS decimal(38,0))"
            )
        ).alias("direct_sum"),
    )
    return terms.select(
        "n",
        F.col("p").alias("n_pos"),
        F.expr("CAST(rel_sum DIV n AS BIGINT)").alias("rel_pp2"),
        F.expr("CAST(res_sum DIV n AS BIGINT)").alias("res_pp2"),
        F.expr(
            "CAST(CAST(p AS decimal(38,0)) * (n - p) * 1000000000000"
            " DIV (CAST(n AS decimal(38,0)) * n) AS BIGINT)"
        ).alias("unc_pp2"),
        F.expr("CAST(direct_sum DIV n AS BIGINT)").alias("brier_pp2"),
        F.expr(
            "CAST(direct_sum DIV n"
            " - (rel_sum DIV n - res_sum DIV n"
            "    + CAST(p AS decimal(38,0)) * (n - p) * 1000000000000"
            "      DIV (CAST(n AS decimal(38,0)) * n)) AS BIGINT)"
        ).alias("identity_gap_pp2"),
    )
