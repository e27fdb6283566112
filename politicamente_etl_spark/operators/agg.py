"""Aggregation operators (SURVEY.md §2.4).

Spark's hash aggregate always does a map-side partial + reduce-side final,
so each groupBy here ships only one pre-aggregated row per (partition, key)
through the shuffle — the property that makes these plans scale-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
