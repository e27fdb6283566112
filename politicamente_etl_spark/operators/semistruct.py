"""Semi-structured (JSON / VARIANT) operators.

Spark 4's VARIANT type stores parsed JSON in a compact binary encoding —
repeated path extraction skips re-parsing the string per access (the
string-JSON `get_json_object` path re-tokenizes on every call), and the
encoding pushes through shuffles/parquet untouched. This module is the
typed boundary: parse once at ingest, extract to real columns at use.

Typed extractions produce plain int/string/double columns, so queries
built on them stay DuckDB-oracle-comparable (`json_extract` twins) even
though the VARIANT value itself never leaves Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_variant(df: DataFrame, col: str, out: str = "v") -> DataFrame:
    """Parse a JSON string column into a VARIANT column (parse once,
    extract many). Malformed JSON → NULL (try-semantics at the parse
    boundary mirrors the CSV quarantine philosophy: one bad payload must
    not kill a 100 TB scan)."""
    return df.withColumn(out, F.try_parse_json(F.col(col)))


def variant_fields(
    df: DataFrame, vcol: str, fields: dict[str, tuple[str, str]]
) -> DataFrame:
    """Typed field extraction: ``fields`` maps output column name →
    (variant path, SQL type). try_variant_get returns NULL on missing
    paths or uncastable values — per-row tolerance, no job failure."""
    out = df
    for name, (path, dtype) in fields.items():
        out = out.withColumn(name, F.try_variant_get(F.col(vcol), path, dtype))
    return out


def variant_schema_profile(df: DataFrame, vcol: str) -> DataFrame:
    """Schema-drift profile of a semi-structured column: the distinct
    inferred schemas (schema_of_variant per row) with row counts, most
    common first. The audit a pipeline runs when an upstream feed starts
    emitting a new payload shape — one hash aggregate on a short schema
    string; at any corpus size the result is |distinct shapes| rows."""
    return (
        df.select(F.schema_of_variant(F.col(vcol)).alias("variant_schema"))
        .groupBy("variant_schema")
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), "variant_schema")
    )
