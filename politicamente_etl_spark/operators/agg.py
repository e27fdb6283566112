"""Aggregation operators (SURVEY.md §2.4).

Spark's hash aggregate always does a map-side partial + reduce-side final,
so each groupBy here ships only one pre-aggregated row per (partition, key)
through the shuffle — the property that makes these plans scale-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sum_and_status_by_key(
    df: DataFrame,
    key: str,
    sum_col: str,
    status_col: str,
    sum_alias: str = "total",
    status_alias: str = "status",
) -> DataFrame:
    """A1 — SUM + FIRST by key (`load.py:104-107`: total votes per candidate
    plus the final-status label).

    `F.first` is nondeterministic under shuffle; the status column is
    constant within a key in the reference's data, so the intent is "any
    value" — `F.min` is the deterministic equivalent (SURVEY.md §2.9.1) and
    what the oracle SQL encodes."""
    return df.groupBy(key).agg(
        F.sum(sum_col).alias(sum_alias),
        F.min(status_col).alias(status_alias),
    )


def approx_aggs(
    df: DataFrame, key: str, distinct_col: str, quantile_col: str
) -> DataFrame:
    """Extended surface — approximate aggregates (SURVEY.md §2.10):
    HyperLogLog++ distinct-count and approximate percentile. Sketch
    internals differ across engines, so these are rows-only checked; the
    exactness-independent columns (count) still anchor the result."""
    return df.groupBy(key).agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct(distinct_col).alias("approx_distinct"),
        F.percentile_approx(quantile_col, 0.5).alias("approx_median"),
    )


def merge_aggregates(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    count_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental aggregate maintenance: merge an already-aggregated
    state table with a new batch's partial aggregate — the
    materialized-view refresh that does NOT rescan history. Nightly cost
    becomes O(batch + |state|) instead of O(all data ever ingested).

    Correctness rests on the merged measures being associative: counts
    and sums add, min/max fold — so merge(agg(A), agg(B)) == agg(A ∪ B)
    exactly. For money sums both the per-partition aggregate AND this
    merge snap to DECIMAL(27,4) (exact 4-decimal partials stay exact
    through the double round-trip up to 2^53·10⁻⁴), which is what makes
    the refreshed view bit-identical to a full recompute — the property
    the paired catalog query proves against the full-table oracle.
    AVG must be carried as (sum, count), never merged as avg-of-avgs.

    One unionByName (no shuffle) + one partial-aggregated groupBy on the
    keys. With the state table written bucketed by the keys, the merge
    reuses the on-disk partitioning and only the batch side shuffles."""
    sum_cols = sum_cols or []
    count_cols = count_cols or []
    min_cols = min_cols or []
    max_cols = max_cols or []
    both = state.unionByName(delta)
    aggs = (
        [
            F.sum(F.col(c).cast("decimal(27,4)")).cast("double").alias(c)
            for c in sum_cols
        ]
        + [F.sum(c).alias(c) for c in count_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return both.groupBy(*keys).agg(*aggs)


# 48-bit hash space for the KMV sketch: 12 hex chars of md5, exactly
# representable in a BIGINT on both engines (Spark conv(,16,10), DuckDB
# CAST('0x'||… AS BIGINT)) and in a DOUBLE (< 2^53) for the estimator.
KMV_SPACE = float(1 << 48)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Approximate distinct count per group via a K-Minimum-Values sketch
    (Bar-Yossef et al. 2002) built from PURE DataFrame algebra — unlike
    HLL (`approx_aggs`, whose register layout is engine-private and can
    only be rows-only-checked), every intermediate here is deterministic
    md5 arithmetic, so the APPROXIMATE answer itself hash-matches the
    DuckDB oracle exactly. The estimator: with the k smallest 48-bit
    hashes of the distinct values, est = (k−1) · 2⁴⁸ / kth_min; if a
    group has fewer than k distinct hashes the sketch is exhaustive and
    the count is exact.

    Scale shape: one distinct on (group, hash) — map-side combined, the
    only data-sized shuffle — then a WindowGroupLimit top-k per group
    (per-partition heaps of k rows BEFORE the exchange, so the rank
    shuffle carries ≤ k·partitions rows per group) and a k-row-per-group
    final agg. The sketch is mergeable by construction (union two KMV
    tables, re-rank, cut at k) — the nightly-rollup property that makes
    it a real alternative to exact COUNT(DISTINCT) at 100 TB."""
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col), h.alias("__h")).distinct()
    w = Window.partitionBy(group_col).orderBy("__h")
    kept = hashes.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return (
        kept.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("__h").alias("kth_hash"),
        )
        .withColumn(
            "est_distinct",
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            ).otherwise(
                F.lit(float(k - 1))
                * F.lit(KMV_SPACE)
                / F.col("kth_hash").cast("double")
            ),
        )
    )


def weighted_median_gagg():
    """Grouped-aggregate pandas UDAF twin of the exact weighted-median
    window query (§2.8 UDF surface, the aggregate-shaped counterpart of
    text.quality_score_pandas_udf): per group, Arrow ships the (value,
    weight) columns to one Python worker which returns the first value
    whose cumulative weight crosses half the total — the same crossing
    rule as the cumulative-weight window, so the two paths agree exactly
    (tests/test_round5_ops.py pins it).

    The window form is preferred at scale: it streams per-partition and
    never concentrates a group in one process, while a grouped-agg UDAF
    materializes each group's columns in a single worker (fine for
    bounded groups, the template for aggregations that genuinely need
    Python — a percentile sketch merge, a scipy fit)."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: the module's `from __future__ import
    # annotations` stringifies type hints, so eval-type inference from
    # hints is unavailable (same constraint as text.quality_score_pandas_udf)
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wmedian(value, weight):
        order = np.argsort(value.to_numpy(), kind="stable")
        v = value.to_numpy()[order]
        w = weight.to_numpy()[order]
        cw = np.cumsum(w)
        return float(v[np.searchsorted(2 * cw, cw[-1], side="left")])

    return wmedian


def hll_registers(
    df: DataFrame,
    value_col: str,
    b: int = 6,
    seed: str = "hll-v1",
) -> DataFrame:
    """HyperLogLog REGISTERS (Flajolet et al. 2007) from pure DataFrame
    algebra — the engine-exact counterpart of `approx_aggs`'s opaque
    `approx_count_distinct` sketch. The register table (2^b rows of
    (bucket, max leading-zero rank)) IS the sketch: it is what a pipeline
    stores per partition/day and what makes HLL mergeable (union two
    register tables, take MAX per bucket). Building it from deterministic
    md5 arithmetic makes the sketch itself oracle-checkable, not just the
    final estimate: Spark and DuckDB produce bit-identical registers.

    Hash layout: 60-bit md5 int; top ``b`` bits select the bucket, the
    remaining ``60-b`` bits w give the rank rho = (leading zeros of w in
    its field) + 1 = (60-b) + 1 - bit_length(w), via the cross-engine
    identity bit_length(w) = length(bin(w)) for w > 0.

    Scale shape: one hash aggregate keyed by bucket (2^b groups,
    map-side combined — each executor reduces its partitions to <= 2^b
    rows before the exchange), exactly how a sketch build should run on
    100 TB: the shuffle carries registers, never values. Estimation from
    the registers (alpha_m * m^2 / sum 2^-rho) is a read-time concern and
    needs 128-bit or decimal arithmetic to stay exact — the engine-exact
    ESTIMATOR in this repo is kmv_distinct; this operator is the
    mergeable-state surface."""
    width = 60 - b
    field = 1 << width
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(seed), F.col(value_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    # Integer div/mod only: h < 2^60 exceeds the double-exact range, so a
    # float division here could mis-bucket values near field boundaries.
    hashed = df.select(h.alias("__h")).select(
        F.expr(f"__h % CAST({field} AS BIGINT)").alias("__w"),
        F.expr(f"__h div CAST({field} AS BIGINT)").alias("bucket"),
    )
    rho = F.when(F.col("__w") == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.expr("bin(__w)"))
    )
    return (
        hashed.select("bucket", rho.cast("int").alias("__rho"))
        .groupBy("bucket")
        .agg(F.max("__rho").alias("max_rho"))
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise set-operation estimates between groups' distinct-value
    sets from K-Minimum-Values sketches (Beyer et al., SIGMOD 2007) —
    the union/intersection companion of `kmv_distinct`, still pure
    deterministic md5 algebra so the APPROXIMATE answers hash-match the
    oracle. For each group pair (a < b):

        union sketch  = k smallest hashes of S_a ∪ S_b (merge, re-rank, cut)
        est_union     = (k−1)·2⁴⁸ / kth_min          (n_kept < k ⇒ exact)
        k_inter       = |union sketch ∩ S_a ∩ S_b|
        est_inter     = k_inter · est_union / n_kept

    (one formula covers the exhaustive case: n_kept < k makes est_union
    = n_kept and est_inter = k_inter exactly). The KMV merge is the
    whole point at scale: per-group sketches are k-row tables, so every
    pairwise estimate is arithmetic over k·|groups| rows — no re-scan,
    no |A|×|B| join of the raw sets. The corpus-sized work is the one
    distinct on (group, hash).

    Returns (g_a, g_b, n_kept, kth_hash, k_inter, est_union, est_inter).
    """
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col).alias("g"), h.alias("hv")).distinct()
    w = Window.partitionBy("g").orderBy("hv")
    sk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "hv")
    )
    types = sk.select("g").distinct()
    pairs = (
        types.select(F.col("g").alias("g_a"))
        .join(types.select(F.col("g").alias("g_b")))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    ua = pairs.join(sk, sk.g == pairs.g_a).select(
        "g_a", "g_b", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    ub = pairs.join(sk, sk.g == pairs.g_b).select(
        "g_a", "g_b", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    u = (
        ua.unionAll(ub)
        .groupBy("g_a", "g_b", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w2 = Window.partitionBy("g_a", "g_b").orderBy("hv")
    kept = u.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= k
    )
    return (
        kept.groupBy("g_a", "g_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("hv").alias("kth_hash"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("k_inter"),
        )
        .select(
            "g_a",
            "g_b",
            "n_kept",
            "kth_hash",
            "k_inter",
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            )
            .otherwise(
                F.lit(float(k - 1))
                * F.lit(KMV_SPACE)
                / F.col("kth_hash").cast("double")
            )
            .alias("est_union"),
        )
        .withColumn(
            "est_inter",
            F.col("k_inter").cast("double")
            * F.col("est_union")
            / F.col("n_kept").cast("double"),
        )
    )
