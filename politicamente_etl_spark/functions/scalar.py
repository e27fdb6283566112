"""Scalar expression helpers (SURVEY.md §2.6, F1-F7) + oracle determinism.

Everything here is a Catalyst expression (JVM-side, codegen'd) — no Python
UDFs. The reference's per-row Python (`load.py:16,36,61-62,70-71`) becomes
columnar expressions.

Oracle determinism (SURVEY.md §7.3): double summation is order-dependent and
Spark's merge order varies run-to-run, so any SUM over a double money column
would hash-mismatch the DuckDB oracle. The testdata money columns are exact
2-decimal values, and products of 2-decimal values are exact 4-decimal
values, so snapping the addend to DECIMAL before the SUM makes the aggregate
EXACT (decimal sums are associative) and therefore bit-identical across
engines and runs. The final cast back to double is a single well-defined
conversion. The paired oracle SQL must use the same construction —
``sql_money_sum`` renders it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 4 absorbs products of TWO 2-decimal values (extendedprice *
# (1 - discount)); a product of THREE needs scale 6 — snapping below the
# expression's true decimal width rounds, and rounding modes differ across
# engines.
MONEY_DECIMAL = "decimal(27,4)"


def money(col: Column | str, scale: int = 4) -> Column:
    """Snap a (possibly computed) money expression to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(27,{scale})")


def money_sum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-insensitive exact SUM of a money expression, as double."""
    return F.sum(money(col, scale)).cast("double").alias(alias)


def money_avg(col: Column | str, alias: str) -> Column:
    """Deterministic AVG: exact decimal SUM cast to double, then one double
    division by the count — identical arithmetic on Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(money(c)).cast("double") / F.count(c)).alias(alias)


def sql_money_sum(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB-side rendering of money_sum for oracle SQL strings."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE) AS {alias}"
    )


def sql_money_avg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,4))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# ---------------------------------------------------------------------------
# Reference scalar functions (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


def synth_key(*cols: Column | str, sep: str = "-") -> Column:
    """F1 — key synthesis by string concat (`load.py:57,66,70-71`).

    Provided for surface fidelity; joins should prefer multi-column keys
    (the reference's concat key collides when a name contains '-',
    SURVEY.md §2.9.4)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def election_date(year_col: Column | str, turn_col: Column | str) -> Column:
    """F2+F3 — derived election date (`load.py:62`): October, day 2 for turn
    1 else day 30, hardcoded by the reference regardless of year — replicated
    exactly (SURVEY.md §2.9.5)."""
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    t = F.col(turn_col) if isinstance(turn_col, str) else turn_col
    dom = F.when(t == 1, F.lit(2)).otherwise(F.lit(30))
    return F.make_date(y, F.lit(10), dom)


def uuid_col() -> Column:
    """F5 — per-row UUID v4 (`load.py:36`). Non-deterministic by nature:
    excluded from oracle-hashed columns; compare on natural keys instead."""
    return F.expr("uuid()")
