"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``politicamente_etl_spark``; this module only
adapts the query catalog (plans/catalog.py + plans/extended.py) to the
driver's three-function surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from politicamente_etl_spark.plans.catalog import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1) on /root/testdata/sf0.001."""
    return CATALOG["flagship_revenue_rollup"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    return {name: q.fn for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; entries with no SQL (approximate /
    streaming-stateful ops) are omitted → driver runs rows-only checks."""
    return {name: q.sql for name, q in CATALOG.items() if q.sql is not None}
