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

from pyspark.sql import Column, DataFrame, Window
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


def density_clusters(
    df: DataFrame,
    id_col: str,
    lat_col: str = "lat_milli",
    lon_col: str = "lon_milli",
    radius_milli: int = 2500,
    min_neighbors: int = 2,
) -> DataFrame:
    """DBSCAN-shaped density clustering (Ester et al. 1996) from the
    grid-blocked proximity join: a point with >= min_neighbors others
    within the radius is CORE; clusters are connected components of the
    core-core neighbor graph (via the large/small-star CC operator, so
    cluster diameter costs log rounds, not hops); non-core points with
    a core neighbor attach as BORDER to the smallest adjacent cluster
    id (DBSCAN leaves border assignment arbitrary — pinning min makes
    it engine-deterministic). Unpaired points are noise and are not
    emitted.

    Scale shape: neighbor_pairs_within's cell equi-join + one degree
    aggregate + CC's groupBy-min/equi-join rounds — every stage is a
    key-partitioned shuffle on point or cell ids; nothing global.

    Returns (pid, cluster_id, role) with role in ('core', 'border').
    """
    from politicamente_etl_spark.operators.graph import connected_components

    # pairs feeds the degree count, the core-edge build, and the border
    # attach — checkpoint the (small) pair list so the grid join runs
    # once, not once per consumer (no Catalyst CSE across subplans).
    pairs = (
        neighbor_pairs_within(df, id_col, lat_col, lon_col, radius_milli)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    und = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = und.groupBy("a").agg(F.count("*").alias("dg"))
    core = deg.filter(F.col("dg") >= min_neighbors).select(
        F.col("a").alias("pid")
    )
    core_edges = (
        pairs.join(core.select(F.col("pid").alias("a")), "a", "left_semi")
        .join(core.select(F.col("pid").alias("b")), "b", "left_semi")
    )
    cc = connected_components(core_edges, "a", "b")  # (node, component)
    iso_core = core.join(
        cc.select(F.col("node").alias("pid")), "pid", "left_anti"
    ).select("pid", F.col("pid").alias("cluster_id"))
    core_rows = (
        cc.select(F.col("node").alias("pid"), F.col("component").alias("cluster_id"))
        .unionByName(iso_core)
        .withColumn("role", F.lit("core"))
    )
    border_rows = (
        und.join(core.select(F.col("pid").alias("a")), "a", "left_anti")
        .join(
            core_rows.select(
                F.col("pid").alias("b"), F.col("cluster_id").alias("cid")
            ),
            "b",
        )
        .groupBy(F.col("a").alias("pid"))
        .agg(F.min("cid").alias("cluster_id"))
        .withColumn("role", F.lit("border"))
    )
    return core_rows.unionByName(border_rows).select(
        F.col("pid").cast("long").alias("pid"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "role",
    )


# exact integer square root: float sqrt + ±1 fixup (exact while the
# float lands within ±1, i.e. x ≲ 2^52 — z²·1e6 here is ≤ ~1e9)
_ISQRT = (
    "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    " - CASE WHEN CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    "          * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    "          > ({x}) THEN 1 ELSE 0 END"
    " + CASE WHEN (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
    "          * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
    "          <= ({x}) THEN 1 ELSE 0 END)"
)


def getis_ord_hotspots(
    cells: DataFrame,
    x_col: str = "x",
    cx_col: str = "cx",
    cy_col: str = "cy",
    top_k: int = 20,
) -> DataFrame:
    """Getis-Ord Gi* hot-spot z-scores over grid-cell values (binary
    3×3 neighborhood weights, the cell itself included — the * form).
    With n occupied cells, S = Σx, Q = Σx², W_i = |N(i)| and
    S_N(i) = Σ_{j∈N(i)} x_j:

        z_i = (n·S_N − W·S) / √( (n·Q − S²)·(n·W − W²) / (n−1) )

    — every factor an exact integer, so z ships as sign(A)·isqrt of
    A²·(n−1)·10⁶ / B in milli (exact isqrt via the float-sqrt ±1
    fixup; products in DECIMAL(38,0)). |z| ≳ 1.96 marks a hot/cold
    spot at p < 0.05. The study universe is the OCCUPIED cell set
    (empty cells carry no row — the usual sparse-grid convention;
    document density inferences accordingly).

    Scale shape: the corpus collapsed to cells upstream; the 3×3
    neighborhood is one 9-offset equi-join on cell coordinates over
    the cell table (never a radius cross-join), then 1-row totals
    broadcast back. Returns top_k by |z| desc, ties on (cx, cy).
    """
    base = cells.select(
        F.col(cx_col).alias("cx"),
        F.col(cy_col).alias("cy"),
        F.col(x_col).cast("long").alias("x"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    shifted = None
    for dx, dy in offs:
        part = base.select(
            (F.col("cx") + dx).alias("cx"),
            (F.col("cy") + dy).alias("cy"),
            F.col("x").alias("xn"),
        )
        shifted = part if shifted is None else shifted.unionAll(part)
    neigh = (
        base.join(shifted, ["cx", "cy"])
        .groupBy("cx", "cy", "x")
        .agg(
            F.sum("xn").cast("long").alias("s_n"),
            F.count(F.lit(1)).cast("long").alias("w"),
        )
    )
    scored = neigh.join(F.broadcast(tot)).select(
        "cx",
        "cy",
        "x",
        "s_n",
        "w",
        F.expr(
            "CAST(n AS decimal(38,0)) * s_n - CAST(w AS decimal(38,0)) * s"
        ).alias("a"),
        F.expr(
            "(CAST(n AS decimal(38,0)) * q - CAST(s AS decimal(38,0)) * s)"
            " * (CAST(n AS decimal(38,0)) * w - CAST(w AS decimal(38,0)) * w)"
        ).alias("b"),
        F.col("n"),
    )
    z2 = "CAST(a * a * (n - 1) * 1000000 DIV b AS BIGINT)"
    return (
        scored.filter(F.col("b") > 0)
        .select(
            "cx",
            "cy",
            "x",
            "s_n",
            "w",
            F.expr(
                f"CAST(CASE WHEN a < 0 THEN -{_ISQRT.format(x=z2)}"
                f" ELSE {_ISQRT.format(x=z2)} END AS BIGINT)"
            ).alias("z_milli"),
        )
        .orderBy(F.abs(F.col("z_milli")).desc(), "cx", "cy")
        .limit(top_k)
    )


def knn_outlier_scores(
    df: DataFrame,
    id_col: str,
    lat_col: str = "lat_milli",
    lon_col: str = "lon_milli",
    k: int = 3,
    radius_milli: int = 15_000,
    top_k: int = 20,
) -> DataFrame:
    """R-bounded kNN-distance outliers (Ramaswamy et al. 2000): score =
    distance to the k-th nearest neighbor, computed over the
    radius-bounded neighborhood graph the grid join produces. A point
    with fewer than k in-R neighbors is CENSORED at the radius (its
    true k-dist provably exceeds R, so it ranks above every uncensored
    point) — the explicit semantics that make the blocked plan and a
    brute-force oracle agree exactly. Distances are exact integer
    isqrt of the squared milli-degree metric (d² ≤ 2R² sits far inside
    the float-sqrt ±1 domain).

    Scale shape: `neighbor_pairs_within`'s 3×3 grid join (cell side =
    R guarantees every in-R pair meets), symmetrize, per-point rank
    window bounded by in-cell density, then TakeOrdered for the
    global top_k.
    """
    pairs = neighbor_pairs_within(
        df, id_col, lat_col, lon_col, radius_milli
    )
    sym = pairs.select(
        F.col("a").alias("pid"), F.col("b").alias("nid"), "dist_sq_milli"
    ).unionByName(
        pairs.select(
            F.col("b").alias("pid"), F.col("a").alias("nid"), "dist_sq_milli"
        )
    )
    w = Window.partitionBy("pid").orderBy("dist_sq_milli", "nid")
    kth = (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_in_r"),
            F.max("dist_sq_milli").alias("d2k"),
        )
    )
    isq = (
        "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        " - CASE WHEN CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          > ({x}) THEN 1 ELSE 0 END"
        " + CASE WHEN (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          <= ({x}) THEN 1 ELSE 0 END)"
    )
    all_pts = df.select(F.col(id_col).alias("pid"))
    scored = (
        all_pts.join(kth, "pid", "left")
        .select(
            "pid",
            F.coalesce(F.col("n_in_r"), F.lit(0)).cast("long").alias("n_in_r"),
            F.when(
                F.coalesce(F.col("n_in_r"), F.lit(0)) < k, F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("censored"),
            F.when(
                F.coalesce(F.col("n_in_r"), F.lit(0)) < k,
                F.lit(radius_milli).cast("long"),
            )
            .otherwise(F.expr(isq.format(x="d2k")).cast("long"))
            .alias("kdist_milli"),
        )
    )
    return scored.orderBy(
        F.col("censored").desc(),
        F.col("kdist_milli").desc(),
        F.col("pid"),
    ).limit(top_k)
