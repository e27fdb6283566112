"""Spatial operators: grid-bucketed proximity joins over planar
integer coordinates.

The reference has no geo surface; this is part of the beyond-reference
LLM/analytics toolbox (SURVEY.md §2.10): deduplicating geotagged
documents, colocating events, or blocking entity resolution by place
all reduce to "pairs within radius r" — which at 100 TB must be a
cell-grid equi-join (each point meets only its 3×3 neighborhood), never
an all-pairs product.

Coordinates are integer milli-degrees throughout, distances are exact
integer squared milli-degrees on the equirectangular plane — a
deliberate planar approximation (fine at city scale, documented) that
keeps every comparison engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def synth_coords(key: Column, seed: str = "geo-v1") -> tuple[Column, Column]:
    """Deterministic synthetic (lat, lon) in milli-degrees from a key:
    two independent 60-bit md5 draws mapped onto [-90000, 90000) /
    [-180000, 180000). The fixture generator for spatial tests/queries
    on tables that carry no real coordinates."""

    def h(salt: str) -> Column:
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed + salt), key.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")

    lat = (h(":lat") % 180_000) - 90_000
    lon = (h(":lon") % 360_000) - 180_000
    return lat, lon


def sql_synth_coords(expr: str, seed: str = "geo-v1") -> tuple[str, str]:
    """DuckDB twin of `synth_coords` for oracle queries."""

    def h(salt: str) -> str:
        return (
            f"CAST(('0x' || substring(md5(concat_ws(':', '{seed}{salt}', "
            f"CAST({expr} AS VARCHAR))), 1, 15)) AS BIGINT)"
        )

    return (
        f"(({h(':lat')}) % 180000 - 90000)",
        f"(({h(':lon')}) % 360000 - 180000)",
    )


def neighbor_pairs_within(
    df: DataFrame,
    id_col: str,
    lat_col: str = "lat_milli",
    lon_col: str = "lon_milli",
    radius_milli: int = 700,
) -> DataFrame:
    """All point pairs within `radius_milli` (planar squared distance),
    found via a grid-cell equi-join: cell side = radius, the left side
    explodes to its 3×3 cell neighborhood, the right side stays in its
    own cell, so every qualifying pair meets on exactly one (cell)
    key and is emitted once (ordered a < b). Returns
    (a, b, dist_sq_milli).

    Scale shape: one shuffle on cell id for each side (the left 9×
    explode is a narrow map), per-cell local products bounded by cell
    density — the standard spatial blocking join. A dense city cell is
    an AQE skew case, not a plan change; shrinking the cell side (and
    widening the neighborhood ring accordingly) re-bounds the local
    product. No condition ever compares points across non-adjacent
    cells, and nothing is O(n²) globally.
    """
    r2 = radius_milli * radius_milli
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).alias("plat"),
        F.col(lon_col).alias("plon"),
        F.expr(f"{lat_col} div {radius_milli}").alias("cy"),
        F.expr(f"{lon_col} div {radius_milli}").alias("cx"),
    )
    left = pts.select(
        F.col("pid").alias("a"),
        F.col("plat").alias("alat"),
        F.col("plon").alias("alon"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dy ->"
                " transform(sequence(-1, 1), dx ->"
                " struct(cy + dy AS cy, cx + dx AS cx))))"
            )
        ).alias("c"),
    ).select("a", "alat", "alon", F.col("c.cy").alias("cy"), F.col("c.cx").alias("cx"))
    right = pts.select(
        F.col("pid").alias("b"),
        F.col("plat").alias("blat"),
        F.col("plon").alias("blon"),
        "cy",
        "cx",
    )
    d2 = (F.col("alat") - F.col("blat")) * (F.col("alat") - F.col("blat")) + (
        F.col("alon") - F.col("blon")
    ) * (F.col("alon") - F.col("blon"))
    return (
        left.join(right, ["cy", "cx"])
        .filter((F.col("a") < F.col("b")) & (d2 <= F.lit(r2)))
        .select("a", "b", d2.cast("long").alias("dist_sq_milli"))
    )
