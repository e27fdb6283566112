"""Change-data-capture between table snapshots.

The reference pipeline's nightly loads are full-snapshot replaces
(`load.py`'s truncate-and-insert shape); at warehouse scale the useful
derivative is the CHANGESET between consecutive snapshots — the rows to
insert/update/delete — which is what downstream incremental consumers
(merge sinks, cache invalidation, audit) actually want.

Scale shape: one full-outer equi-join on the key columns, comparing only
the listed value columns. The join shuffles each snapshot once on the
key; with both snapshots bucketed by key (sinks.write_bucketed) the
Exchange disappears entirely. Unchanged rows are dropped as early as
possible so the changeset — typically a tiny fraction of the table —
is all that flows downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Changeset between two snapshots of the same table.

    Returns one row per changed key: the key columns plus
    ``change_type`` ∈ {'insert', 'update', 'delete'} and, for each
    compared column c, ``old_c`` / ``new_c`` (NULL on the missing side
    of inserts/deletes). Unchanged keys are dropped. NULL-safe equality
    (`eqNullSafe`) so NULL→value and value→NULL transitions register as
    updates, never as spurious matches."""
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__o", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__n", F.lit(1))
    joined = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__o").isNull(), F.lit("insert"))
        .when(F.col("__n").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
