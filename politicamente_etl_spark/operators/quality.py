"""Declarative data-quality constraints (Deequ-style), single-pass.

The reference guards its loads imperatively (P5 null-input early-outs,
P6 join-miss drops — `load.py:44-55`); a production lakehouse needs the
same checks as DECLARATIVE constraints evaluated per batch, cheaply, with
an auditable report. This module compiles a constraint list into ONE
aggregate pass over the table (every row-level predicate becomes a
conditional count inside the same HashAggregate — no per-constraint
scans), plus one anti-join per referential constraint (the only check
that genuinely needs a second relation).

Report grain: one row per constraint — (constraint, metric, threshold,
passed). `metric` is the violation count for row-level checks and the
dangling-key count for referential ones, so `passed = metric <= threshold`
with threshold 0 meaning hard constraints; a nonzero threshold expresses
tolerance budgets ("≤ 0.1 % nulls") as absolute counts the caller
precomputes.

At 100 TB: the row-level pass is a single partial-agg'd scan (cost =
one read of the checked columns); referential checks are hash anti-joins
on the key — broadcast when the parent side is a dim, shuffle otherwise,
the planner's call. Nothing here sorts, windows, or collects.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: `name` labels the report row; `violation` is a
    boolean Column that is TRUE where a row VIOLATES the constraint."""

    name: str
    violation: Column
    threshold: int = 0


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check(
        f"in_range({col},{lo},{hi})",
        ~F.col(col).between(F.lit(lo), F.lit(hi)) | F.col(col).isNull(),
    )


def in_set(col: str, allowed: tuple) -> Check:
    return Check(
        f"in_set({col})",
        ~F.col(col).isin(list(allowed)) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches({col})",
        ~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def row_level_report(
    df: DataFrame, checks: list[Check], rows_col: str | None = None
) -> DataFrame:
    """All row-level constraints in ONE aggregate pass: each check is a
    conditional count in the same HashAggregate. SUM over an empty input
    is NULL, so every counter coalesces to 0 — an empty batch must read
    as 'clean', not as NULL-is-neither-passed-nor-failed. `rows_col`
    additionally carries the input row count through the SAME pass (for
    per-batch audits that would otherwise pay a second scan)."""
    if not checks:
        raise ValueError("row_level_report: empty check list")
    aggs = [
        F.coalesce(F.sum(c.violation.cast("long")), F.lit(0))
        .cast("long")
        .alias(c.name)
        for c in checks
    ]
    if rows_col is not None:
        aggs.append(F.count(F.lit(1)).cast("long").alias(rows_col))
    wide = df.agg(*aggs)
    # unpivot the 1-row wide frame into (constraint, metric) — stack() is
    # a narrow Generate over a single row, not a shuffle.
    pairs = ", ".join(f"'{c.name}', `{c.name}`" for c in checks)
    long = wide.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, metric)",
        *([f"`{rows_col}`"] if rows_col is not None else []),
    )
    thr = F.create_map(
        *[x for c in checks for x in (F.lit(c.name), F.lit(c.threshold))]
    )
    return long.select(
        "check_name",
        "metric",
        thr[F.col("check_name")].cast("long").alias("threshold"),
        (F.col("metric") <= thr[F.col("check_name")]).alias("passed"),
        *([rows_col] if rows_col is not None else []),
    )


def uniqueness_report(df: DataFrame, keys: list[str], threshold: int = 0) -> DataFrame:
    """Duplicate-key count as a constraint row: count rows beyond the
    first per key (one hash agg; metric = Σ(count−1) over keys)."""
    name = f"unique({','.join(keys)})"
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
            .cast("long")
            .alias("metric")
        )
    )
    return dups.select(
        F.lit(name).alias("check_name"),
        "metric",
        F.lit(threshold).cast("long").alias("threshold"),
        (F.col("metric") <= threshold).alias("passed"),
    )


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    threshold: int = 0,
) -> DataFrame:
    """Dangling-foreign-key count: child keys with no parent (hash
    anti-join on the key — broadcast for dim parents, shuffle otherwise)."""
    name = f"ref({child_key}->{parent_key})"
    dangling = (
        child.select(child_key)
        .join(
            parent.select(F.col(parent_key).alias(child_key)),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("metric"))
    )
    return dangling.select(
        F.lit(name).alias("check_name"),
        "metric",
        F.lit(threshold).cast("long").alias("threshold"),
        (F.col("metric") <= threshold).alias("passed"),
    )


def constraint_report(
    df: DataFrame,
    checks: list[Check],
    unique_keys: list[list[str]] | None = None,
    referential: list[tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Full audit: one row-level pass + one agg per uniqueness key set +
    one anti-join per FK. The unions are unions of 1-to-few-row frames —
    report size is |constraints|, never data-sized. With no constraints
    at all (e.g. a dynamically-built config that resolved empty) the
    result is an EMPTY report with the right schema, not an error."""
    parts = [row_level_report(df, checks)] if checks else []
    for keys in unique_keys or []:
        parts.append(uniqueness_report(df, keys))
    for parent, ck, pk in referential or []:
        parts.append(referential_report(df, parent, ck, pk))
    if not parts:
        return df.sparkSession.createDataFrame(
            [], "check_name string, metric long, threshold long, passed boolean"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def observed(df: DataFrame, checks: list[Check]):
    """Attach the row-level constraints to the MAIN pass via
    ``df.observe()``: the violation counters accumulate as the pipeline's
    own action executes — zero extra scans, zero extra shuffles. Returns
    (df_with_observation, Observation); after the caller runs ITS action
    (write, count, …), ``observation.get`` yields
    {check_name: violation_count}. The complement of `row_level_report`
    (a dedicated audit pass): use this when the batch is already being
    written/aggregated anyway and the audit should ride along for free —
    at 100 TB that saves a full table read per batch.

    The same `.observe(name, *aggs)` form (string name instead of an
    Observation) works on streaming DataFrames, surfacing the counters in
    every StreamingQueryProgress."""
    from pyspark.sql import Observation

    obs = Observation()
    # COALESCE(…, 0): SUM over zero rows is NULL, but the module contract
    # is "an empty batch reads as clean" — same guard as row_level_report.
    aggs = [
        F.coalesce(F.sum(c.violation.cast("long")), F.lit(0))
        .cast("long")
        .alias(c.name)
        for c in checks
    ]
    return df.observe(obs, *aggs), obs


def k_anonymity_classes(
    df: DataFrame,
    qi_cols: list[str],
    subject_col: str,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): group rows by their
    quasi-identifier tuple and measure how many distinct SUBJECTS share
    each equivalence class. A class with fewer than ``k`` subjects
    re-identifies its members by linkage — those rows must be suppressed
    or generalized before release. Returns one row per QI class:
    (qi..., n_rows, n_subjects, at_risk).

    Shape: one hash aggregate on the QI tuple with a distinct-subject
    count inside (Spark plans count(distinct) as a two-phase partial
    expand — both phases map-side combined, keyed by the QI tuple; no
    global sort). The QI class count is bounded by the generalization
    grid (type x dow x hour ~ 10^3-10^4 classes), so the final rollup is
    tiny no matter the row count."""
    cls = df.groupBy(*qi_cols).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct(subject_col).cast("long").alias("n_subjects"),
    )
    return cls.withColumn("at_risk", F.col("n_subjects") < F.lit(int(k)))


def t_closeness_classes(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) with total
    variation distance — the third rung of the release-privacy ladder
    after `k_anonymity_classes` and the l-diversity report: a QI class
    leaks its members' sensitive attribute when the class's sensitive
    DISTRIBUTION sits far from the table-wide one, even if the class is
    large and diverse. TVD = ½ Σ_b |p_b − q_b| over sensitive buckets.

    Exactness: with class size n_c, table size N, class bucket counts
    cnt_b and global bucket counts g_b, the common-denominator identity

        2·n_c·N·TVD = Σ_{b∈class} (|cnt_b·N − g_b·n_c| − g_b·n_c) + n_c·N

    (absent buckets contribute g_b·n_c, and Σ_b g_b = N folds the
    zero-fill into one closed term) lets the whole audit run on the
    OBSERVED (class, bucket) cells — no dense bucket-fill join — in
    pure integer arithmetic, emitted as tvd_ppm by integer division.
    The cross products run in DECIMAL(38,0) (DuckDB: HUGEINT) because
    cnt·N outgrows BIGINT once N reaches trillions of rows.

    Shape: one partial-aggregated groupBy on (QI, bucket) for the
    cells, one on the QI for class sizes, the bounded global bucket
    table and the class-size table broadcast back, one per-class
    rollup. Class and bucket grids are bounded by the generalization
    design, not by rows.

    Returns one row per QI class: (qi..., n_rows, tvd_ppm).
    """
    cell = df.groupBy(*qi_cols, sensitive_col).agg(
        F.count("*").cast("long").alias("cnt")
    )
    g = df.groupBy(F.col(sensitive_col).alias("__sv")).agg(
        F.count("*").cast("long").alias("g")
    )
    n_tot = df.agg(F.count("*").cast("long").alias("N"))
    sizes = df.groupBy(
        *[F.col(c).alias(f"__q_{c}") for c in qi_cols]
    ).agg(F.count("*").cast("long").alias("n_rows"))
    d38 = "decimal(38,0)"
    # NULL-SAFE joins: groupBy keeps NULL groups, so a NULL sensitive
    # value is a legitimate bucket and a NULL QI component a legitimate
    # class — plain equi-joins would silently drop both, breaking the
    # Σ g_b = N identity the closed form relies on (code-review finding)
    qi_cond = None
    for c in qi_cols:
        this = F.col(c).eqNullSafe(F.col(f"__q_{c}"))
        qi_cond = this if qi_cond is None else (qi_cond & this)
    terms = (
        cell.join(
            F.broadcast(g), F.col(sensitive_col).eqNullSafe(F.col("__sv"))
        )
        .join(F.broadcast(sizes), qi_cond)
        .crossJoin(F.broadcast(n_tot))
        .select(
            *qi_cols,
            "n_rows",
            "N",
            (
                F.abs(
                    F.col("cnt").cast(d38) * F.col("N").cast(d38)
                    - F.col("g").cast(d38) * F.col("n_rows").cast(d38)
                )
                - F.col("g").cast(d38) * F.col("n_rows").cast(d38)
            ).alias("term"),
        )
        .groupBy(*qi_cols)
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.first("N").alias("N"),
            F.sum("term").alias("s"),
        )
    )
    return terms.select(
        *qi_cols,
        "n_rows",
        F.expr(
            "CAST((CAST(1000000 AS decimal(38,0))"
            " * (s + CAST(n_rows AS decimal(38,0)) * CAST(N AS decimal(38,0))))"
            " DIV (CAST(2 AS decimal(38,0)) * CAST(n_rows AS decimal(38,0))"
            " * CAST(N AS decimal(38,0))) AS BIGINT)"
        ).alias("tvd_ppm"),
    )
