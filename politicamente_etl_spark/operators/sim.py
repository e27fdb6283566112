"""Similarity search over embedding columns (SURVEY.md §2.10).

Brute-force cosine top-k is the exact baseline (oracle-checkable: the
sequential fold over doubles is bit-identical in Spark and DuckDB). The
LSH-bucketed variant is the scale path: random-hyperplane signatures bucket
the corpus so each query scores only its bucket — at 100 TB the broadcast
cross-join of the brute force becomes the bottleneck, the bucketed join
does not.

All vector math is expression-level (`transform`/`aggregate` lambdas, JVM
codegen) — no Python UDF in either path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

DOT_DOUBLE = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
NORM2_DOUBLE = (
    "aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
D2_DOUBLE = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def dot(a: str, b: str) -> Column:
    """Sequential-fold dot product in double precision (deterministic;
    left-to-right order matches DuckDB's list_reduce)."""
    return F.expr(DOT_DOUBLE.format(a=a, b=b))


def norm2(a: str) -> Column:
    return F.expr(NORM2_DOUBLE.format(a=a))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set
    against the corpus, score every pair, keep k per query via a rank
    window. Spark turns the `row_number <= k` filter into a per-partition
    top-k (WindowGroupLimit), so only q×k rows survive the shuffle."""
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("q_vec")
    )
    scored = corpus.select(id_col, vec_col).crossJoin(F.broadcast(q))
    scored = scored.withColumn(
        "cos_sim",
        F.expr(DOT_DOUBLE.format(a=vec_col, b="q_vec"))
        / (
            F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col)))
            * F.sqrt(F.expr(NORM2_DOUBLE.format(a="q_vec")))
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact): every (a, b) with a < b and
    cosine(a, b) >= threshold. Norms are computed once per row BEFORE the
    pair join, so each pair costs one dot product, not three folds.

    VERIFIER ONLY — this exact all-pairs form is a quadratic theta-join and
    must not run on a full 100 TB corpus; the scale path is
    `cosine_near_dup_pairs_lsh` below (hyperplane-bucketed candidates, same
    exact cosine filter, recall < 1). The ``max_rows`` guard enforces that:
    it refuses corpora above the cap unless the caller explicitly passes
    ``max_rows=None``. The probe is ``limit(max_rows+1).count()`` so the
    guard job short-circuits after max_rows+1 rows instead of scanning the
    whole input just to check a cap."""
    if max_rows is not None:
        n = df.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"cosine_near_dup_pairs is the quadratic exact verifier; "
                f"input exceeds max_rows={max_rows}. Use "
                "cosine_near_dup_pairs_lsh for full-corpus runs, or pass "
                "max_rows=None to override deliberately."
            )
    base = df.select(id_col, vec_col)
    a = base.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col))).alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col))).alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos_sim",
            F.expr(DOT_DOUBLE.format(a="va", b="vb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def cosine_near_dup_pairs_lsh(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """Embedding-cosine near-dup at scale: candidates meet only inside a
    random-hyperplane bucket (equi-join — shuffle-partitionable, never
    |corpus|²), then the exact cosine filter keeps true near-dups. Recall
    < 1 by construction (close pairs can straddle a hyperplane) — rows-only
    driver check; the exact verifier is cosine_near_dup_pairs."""
    sig = df.select(id_col, vec_col).withColumn(
        "bucket", hyperplane_signature(vec_col, planes)
    )
    a = sig.select(
        F.col("bucket"),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col))).alias("na"),
    )
    b = sig.select(
        F.col("bucket"),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col))).alias("nb"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos_sim",
            F.expr(DOT_DOUBLE.format(a="va", b="vb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat ANN top-k: a coarse quantizer partitions the corpus into
    cells; each query scores only its n_probe nearest cells.

    - Quantizer: either pyspark.ml KMeans over the corpus vectors (at
      100 TB train on a `.sample()` — the quantizer needs thousands of
      points, not all), or a caller-supplied `centroids` DataFrame
      (cell, centroid array<double>). A deterministic hash-sample of the
      corpus itself as centroids ("random quantizer") is standard IVF
      practice and makes the whole query oracle-checkable — the k-means
      seed is engine-internal, a sampled quantizer is plain algebra.
    - Assign: nearest centroid per corpus row. With supplied centroids
      this is one MIN(struct(d2, cell)) hash aggregate over the
      broadcast pair expansion — argmin as an aggregate, map-side
      combining, ties broken by cell id for determinism.
    - Probe: queries × centroids is a broadcast of n_cells rows; the
      candidate join is an equi-join on cell id — the corpus is touched
      only in the probed cells (with a cell-partitioned layout this is
      partition pruning at scan time).
    Recall < 1 by construction (a true neighbor can live in an unprobed
    cell); the exact verifier is cosine_topk."""
    if centroids is not None:
        cent = centroids
        assigned = assign_cells(corpus, cent, id_col, vec_col)
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        dense = corpus.select(id_col, vec_col).withColumn(
            "__v", array_to_vector(F.col(vec_col).cast("array<double>"))
        )
        model = KMeans(
            k=n_cells, seed=42, featuresCol="__v", predictionCol="cell"
        ).fit(dense)
        assigned = model.transform(dense).select(id_col, vec_col, "cell")

        spark = corpus.sparkSession
        cent = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            ["cell", "centroid"],
        )
    q = queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("q_vec"))
    # nearest n_probe cells per query: n_cells is tiny → broadcast + rank
    probed = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__d2", F.expr(D2_DOUBLE.format(a="q_vec", b="centroid")))
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy("__d2", "cell")
            ),
        )
        .filter(F.col("__r") <= n_probe)
        .select(query_id_col, "q_vec", "cell")
    )
    scored = assigned.join(F.broadcast(probed), "cell").withColumn(
        "cos_sim",
        F.expr(DOT_DOUBLE.format(a=vec_col, b="q_vec"))
        / (
            F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col)))
            * F.sqrt(F.expr(NORM2_DOUBLE.format(a="q_vec")))
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean-pool embedding centroid per group — the building block for
    class prototypes, cluster summaries, and IVF retraining. Output is one
    row per (group, dimension): `centroid_val` = mean of that dimension.

    Determinism at scale: a plain SUM(double) over a shuffle is
    order-dependent (IEEE addition does not associate), so each element is
    snapped to an integer first — floor(val·1e9) as BIGINT. Double
    multiply and floor are exactly specified by IEEE, so every engine and
    partition layout produces the same integers, and integer SUM is exact
    and order-independent. (A decimal cast is NOT portable here: Spark
    HALF_UPs the double→decimal conversion while DuckDB differs in the
    last decimal ulp for ~1 element in 10³.) Two double divisions at the
    end, in a fixed order, finish the mean.

    Plan: posexplode (narrow) → one partial-aggregated groupBy on
    (group, pos) — dimension count multiplies rows before the shuffle, but
    map-side combine collapses them to |groups|·dims per partition, so the
    exchange carries aggregates, not elements."""
    ex = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    return (
        ex.groupBy(group_col, "pos")
        .agg(
            (
                F.sum(
                    F.floor(F.col("val").cast("double") * F.lit(1e9)).cast("long")
                ).cast("double")
                / F.lit(1e9)
                / F.count("*")
            ).alias("centroid_val"),
            F.count("*").cast("long").alias("n_members"),
        )
    )


def hyperplane_signature(vec_col: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed into
    a string bucket key. Planes are passed as literals (broadcast with the
    plan) — deterministic, seedable by the caller."""
    bits = []
    for p in planes:
        s = F.expr(
            DOT_DOUBLE.format(a=vec_col, b=f"array({', '.join(str(float(x)) for x in p)})")
        )
        bits.append(F.when(s >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN variant: bucket corpus and queries by hyperplane signature and
    score only same-bucket pairs. Recall < 1.0 by construction (rows-only
    driver check; the exact verifier is cosine_topk). The join is an
    equi-join on the bucket key → shuffle-partitionable, no cross join."""
    sig = hyperplane_signature(vec_col, planes)
    c = corpus.select(id_col, vec_col).withColumn("bucket", sig)
    q = (
        queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("q_vec"))
        .withColumn("bucket", hyperplane_signature("q_vec", planes))
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cos_sim",
        F.expr(DOT_DOUBLE.format(a=vec_col, b="q_vec"))
        / (
            F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col)))
            * F.sqrt(F.expr(NORM2_DOUBLE.format(a="q_vec")))
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query candidate rankings (the
    standard hybrid-retrieval combiner): each list contributes
    1/(rrf_k + rank) for candidates it ranked, the fused list is the
    top-k by summed score. Inputs are (query, id, rank) tables — e.g. a
    lexical top-k and a vector top-k.

    Determinism: ranks are ints, so each contribution is one correctly-
    rounded double division and the score is one fixed-order two-term sum —
    bit-identical across engines; ties break on the candidate id.

    Scale: both inputs are already top-k-per-query (tiny relative to the
    corpus); the fusion is a key-aligned full-outer join + one window —
    cost O(queries × k), independent of corpus size."""
    a = ranked_a.select(query_col, id_col, F.col(rank_col).alias("__rank_a"))
    b = ranked_b.select(query_col, id_col, F.col(rank_col).alias("__rank_b"))
    fused = a.join(b, [query_col, id_col], "full_outer").withColumn(
        "rrf_score",
        F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("__rank_a")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("__rank_b")), F.lit(0.0)
        ),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_col, id_col, "rrf_score", "rank")
    )


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Maximum-inner-product top-k (the retrieval scoring used when
    embeddings are trained with dot-product objectives — no norm
    division): broadcast the query set, one sequential-fold dot product
    per pair, per-query rank window. Same WindowGroupLimit shape as
    cosine_topk; the score is a plain fold → bit-identical to DuckDB's
    list_reduce."""
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("q_vec")
    )
    scored = corpus.select(id_col, vec_col).crossJoin(F.broadcast(q)).withColumn(
        "dot_score", F.expr(DOT_DOUBLE.format(a=vec_col, b="q_vec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dot_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dot_score", "rank")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (the IVF coarse-quantizer step, shared
    by cosine_topk_ivf and semdedup): broadcast the small centroid table,
    argmin squared distance as a MIN(struct(d2, cell, vec)) hash
    aggregate — map-side combined, ties broken by cell id. Returns
    (id, cell, vec).

    The corpus side is spread() first: the distance folds are interpreted
    per element (higher-order functions don't codegen), so the
    |corpus|×|centroids| expansion must fan out across all cores — a
    single-split scan would serialize the whole assignment onto one task
    (measured 4× on the bench corpus)."""
    from politicamente_etl_spark.operators.core import spread

    pairs = spread(corpus.select(id_col, vec_col), id_col).crossJoin(
        F.broadcast(centroids)
    )
    best = (
        pairs.withColumn("__d2", F.expr(D2_DOUBLE.format(a=vec_col, b="centroid")))
        .groupBy(id_col)
        .agg(F.min(F.struct("__d2", "cell", vec_col)).alias("__m"))
    )
    return best.select(
        id_col,
        F.col("__m.cell").alias("cell"),
        F.col(f"__m.{vec_col}").alias(vec_col),
    )


def semdedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a coarse quantizer, then
    inside each cluster drop every item that has a sufficiently-similar
    neighbor with a smaller id (keep-first greedy — the paper keeps one
    representative per semantic-duplicate group; min-id is the
    deterministic representative choice).

    Pipeline shape, all equi-joins:
      1. nearest-centroid assignment (broadcast centroids, argmin agg);
      2. within-cell pair generation — an equi-join ON CELL, never the
         |corpus|² theta-join (the cell structure IS the scale story:
         pairwise cost is sum of per-cell sizes squared, and cells are
         capped by the quantizer's granularity);
      3. exact cosine on candidate pairs, threshold filter;
      4. per-item verdict: dup_of = min smaller-id neighbor, is_kept =
         no such neighbor (left join against the dropped set).

    Returns one row per corpus item: (id, cell, dup_of, is_kept) — the
    admission list a curation pipeline joins against the raw corpus.
    Unlike connected-component dedup (near_dup_clusters) there is no
    iteration: SemDeDup's greedy semantics need only the direct-neighbor
    minimum, one shot. Centroids come from a deterministic hash-sample
    (oracle-reproducible) or pyspark.ml KMeans at the caller's choice.

    The assignment table feeds three consumers (both pair-join sides and
    the final verdict join), so it is localCheckpoint'ed — computed once,
    not re-derived per subtree (the small-scale model of a production
    precomputed cell-assignment table, same rationale as
    dedup.minhash_cross_pairs' signature checkpoints)."""
    # r9 opt: the norm is part of the checkpointed relation. Computed
    # after the barrier it was substituted into BOTH pair-join side
    # projections AND their pushed-down isnotnull filters — four
    # embedding-array passes per row instead of one. Same expression,
    # evaluated once at materialization: bit-identical values.
    # r10: eager=False — the eager form ran the assignment as a separate
    # synchronous job at plan-build time on top of the consuming query's
    # own jobs (A/B at sf0.1: eager 1.63 s, lazy 1.38 s, no barrier
    # 1.63 s — the barrier itself still pays here because THREE consumers
    # re-derive the argmin otherwise). persist(MEMORY_AND_DISK) — the
    # recomputable form VERDICT r9 item 4 asks about — measured 3.6x
    # WORSE (4.94 s): columnar-encoding the 64-dim double arrays into
    # cache batches costs far more than the checkpoint's raw row copy.
    # At cluster scale the production form of this relation is a staged
    # parquet cell-assignment table (see docstring above), not an RDD
    # checkpoint.
    assigned = (
        assign_cells(corpus, centroids, id_col, vec_col)
        .withColumn("__nrm", F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col))))
        .localCheckpoint(eager=False)
    )
    sides = assigned
    a = sides.select(
        F.col("cell"),
        F.col(id_col).alias("__ia"),
        F.col(vec_col).alias("__va"),
        F.col("__nrm").alias("__na"),
    )
    b = sides.select(
        F.col("cell"),
        F.col(id_col).alias("__ib"),
        F.col(vec_col).alias("__vb"),
        F.col("__nrm").alias("__nb"),
    )
    dup_edges = (
        a.join(b, "cell")
        .filter(F.col("__ia") < F.col("__ib"))
        .withColumn(
            "__cos",
            F.expr(DOT_DOUBLE.format(a="__va", b="__vb"))
            / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("__cos") >= threshold)
        .groupBy(F.col("__ib").alias(id_col))
        .agg(F.min("__ia").alias("dup_of"))
    )
    return (
        assigned.join(dup_edges, id_col, "left")
        .select(
            id_col,
            "cell",
            "dup_of",
            F.col("dup_of").isNull().alias("is_kept"),
        )
    )


# Milli-snapped integer dot product: floor(x*1000) per component BEFORE the
# multiply, so every pairwise score is an exact BIGINT sum — order-proof
# and engine-exact (DuckDB twin in plans/extended_r6b.py). Magnitude:
# 64 dims x (10^3)^2 ~ 6.4e7 per pair, far inside BIGINT.
DOT_MILLI = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)"
    " * CAST(floor(CAST(y AS DOUBLE) * 1000) AS BIGINT)),"
    " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 12,
    lam_tenths: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick argmax of
    ``lam*rel(q, c) - (1-lam)*max_{s in selected} sim(c, s)`` — the
    re-ranking step that stops a retrieval page collapsing onto k
    near-duplicates of the best hit.

    Architecture (the standard two-stage re-rank, Spark-first):

    1. CANDIDATE PRUNE — corpus-safe top-``n_candidates`` by relevance per
       query (same broadcast + WindowGroupLimit shape as cosine_topk).
       This stage touches the full corpus; everything after is
       O(queries x n_candidates^2).
    2. GREEDY WALK — per query, candidates and their pairwise-sim matrix
       are packed into arrays and the k-step greedy selection runs as ONE
       ``aggregate(sequence(1, k), ...)`` higher-order fold, entirely
       JVM-side: no driver loop, no per-step join, no lineage growth, and
       every query row folds independently — embarrassingly parallel
       across the query set, which is exactly where MMR parallelism lives
       (the per-query walk is inherently sequential).

    Scoring is all-integer (DOT_MILLI relevance and similarity,
    ``lam_tenths``/10 as the trade-off), so selection order is
    deterministic and oracle-checkable; ties break on ascending id.
    Returns (query_id, step, vec_id, rel_mm) with step = 1..k in
    selection order.
    """
    lam = int(lam_tenths)
    mu = 10 - lam
    mvec = (
        f"transform({vec_col},"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.expr(mvec).alias("q_mvec")
    )
    c = corpus.select(id_col, F.expr(mvec).alias("c_mvec"))
    # Vectors are milli-snapped ONCE above; relevance and pairwise sims
    # are then plain integer dots so both live in the same milli^2 units
    # (DOT_MILLI here would re-floor-and-scale and inflate rel by 1e6,
    # silently degenerating the lambda trade-off to pure relevance).
    int_dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "rel_mm", F.expr(int_dot.format(a="c_mvec", b="q_mvec"))
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("rel_mm").desc(), F.col(id_col)
    )
    cand = (
        scored.withColumn("pos", F.row_number().over(wq))
        .filter(F.col("pos") <= n_candidates)
        .select(query_id_col, "pos", id_col, "rel_mm", "c_mvec")
    )
    # Pack each query's candidates into arrays (position = (rel desc, id)
    # order) and compute the pairwise sim matrix INSIDE the packed row as
    # a nested transform over the already-milli'd vectors — no candidate
    # self-join, so the corpus-scoring subplan above is evaluated exactly
    # once (a cand x cand join would re-run the corpus cross three times:
    # Catalyst does not CSE repeated subplans).
    idot = lambda a, b: F.aggregate(  # noqa: E731 — integer dot, exact
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    packed = (
        cand.groupBy(query_id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", id_col, "rel_mm", "c_mvec"))
            ).alias("cs")
        )
        .select(
            query_id_col,
            F.transform("cs", lambda s: s[id_col]).alias("ids"),
            F.transform("cs", lambda s: s["rel_mm"]).alias("rels"),
            F.transform(
                "cs",
                lambda a: F.transform(
                    F.col("cs"), lambda b: idot(a["c_mvec"], b["c_mvec"])
                ),
            ).alias("simmat"),
        )
    )
    # The greedy fold. State: array of selected positions (1-based).
    # Each step scores every unselected candidate p as
    #   lam*rels[p] - mu*max(simmat[p][s] for s in state)   (x10 units)
    # and appends the argmax; struct(negscore, id, p) + array_min gives
    # max-score-then-min-id in one comparison.
    walk = f"""
    aggregate(
      sequence(1, {k}),
      CAST(array() AS array<int>),
      (sel, step) -> array_append(sel,
        array_min(
          filter(
            transform(sequence(1, size(ids)), p ->
              IF(array_contains(sel, p), NULL,
                 named_struct(
                   'negscore',
                   IF(size(sel) = 0,
                      -{lam} * element_at(rels, p),
                      -{lam} * element_at(rels, p)
                        + {mu} * array_max(transform(sel,
                            s -> element_at(element_at(simmat, p), s)))),
                   'id', element_at(ids, p),
                   'p', p))),
            x -> x IS NOT NULL)
        ).p)
    )
    """
    sel = packed.select(
        query_id_col,
        "ids",
        "rels",
        F.expr(walk).alias("sel_pos"),
    )
    out = sel.select(
        query_id_col, "ids", "rels", F.posexplode("sel_pos").alias("step0", "p")
    )
    return out.filter(F.col("p").isNotNull()).select(
        # p is NULL past the candidate count (k > candidates: the greedy
        # fold's argmin over an empty remainder) — stop, don't emit NULLs
        query_id_col,
        (F.col("step0") + 1).cast("int").alias("step"),
        F.element_at("ids", F.col("p")).alias(id_col),
        F.element_at("rels", F.col("p")).alias("rel_mm"),
    )


def cosine_topk_lsh_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB'07): each query probes its
    own hyperplane bucket PLUS every one-bit-flip neighbor — the buckets
    a near-boundary neighbor most likely fell into — trading |planes|
    extra candidate lookups for recall that single-probe LSH loses at
    bucket boundaries. The standard way to buy ANN recall without
    growing the index: same corpus bucketing, more probes per query.

    Plan shape: corpus is signature-bucketed ONCE (identical to
    cosine_topk_lsh); the probe fan-out multiplies only the tiny
    broadcast query side (queries x (1+|planes|) rows). A candidate
    reached through several probes is deduped by (query, id) BEFORE
    scoring via a min aggregate, so each pair is scored exactly once."""
    sig = hyperplane_signature(vec_col, planes)
    c = corpus.select(id_col, vec_col).withColumn("bucket", sig)
    nb = len(planes)
    probes = F.array(
        F.col("q_sig"),
        *[
            F.concat(
                F.substring("q_sig", 1, i - 1),
                F.when(
                    F.substring("q_sig", i, 1) == "1", F.lit("0")
                ).otherwise(F.lit("1")),
                F.substring("q_sig", i + 1, nb - i),
            )
            for i in range(1, nb + 1)
        ],
    )
    q = (
        queries.select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).alias("q_vec"),
        )
        .withColumn("q_sig", hyperplane_signature("q_vec", planes))
        .withColumn("bucket", F.explode(probes))
        .drop("q_sig")
    )
    cand = (
        c.join(F.broadcast(q), "bucket")
        .groupBy(query_id_col, id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.first("q_vec").alias("q_vec"),
        )
    )
    scored = cand.withColumn(
        "cos_sim",
        F.expr(DOT_DOUBLE.format(a=vec_col, b="q_vec"))
        / (
            F.sqrt(F.expr(NORM2_DOUBLE.format(a=vec_col)))
            * F.sqrt(F.expr(NORM2_DOUBLE.format(a="q_vec")))
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def rbo_suffix_weights(k: int = 10, p: float = 0.9) -> list[int]:
    """Micro-snapped suffix weights for truncated Rank-Biased Overlap
    (Webber et al. 2010): RBO@k = (1-p) * sum_{d=1..k} p^(d-1)/d * ov_d
    with ov_d = |exact@d intersect approx@d|. Because ov_d counts a
    common doc at every depth d >= max(exact_rank, approx_rank), the sum
    regroups per COMMON DOC as one weight CW(m) = sum_{d=m..k} w_d at
    m = max of its two ranks — so the whole metric is one join + one
    weighted sum, no per-depth pass. Weights are precomputed in Python
    and embedded as identical integer literals on both engines."""
    w = [(1 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    return [round(1e6 * sum(w[m - 1:])) for m in range(1, k + 1)]


def rbo_compare(
    exact: DataFrame,
    approx: DataFrame,
    k: int = 10,
    p: float = 0.9,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Truncated RBO@k between two (query_id, id, rank) rankings, as an
    exact integer micro score per query — the top-weighted agreement
    metric for comparing an ANN index against ground truth (recall@k
    treats rank 1 and rank k alike; RBO does not). Both inputs must
    carry ranks 1..k. One equi-join on (query, id) + a literal-array
    weight lookup + one aggregate; queries with zero overlap keep a row
    (left join from the exact side's query list would lose the metric's
    zero — aggregate over the exact side instead)."""
    wts = F.array(*[F.lit(w) for w in rbo_suffix_weights(k, p)])
    e = exact.select(
        query_id_col, id_col, F.col("rank").alias("__re")
    )
    a = approx.select(
        query_id_col, id_col, F.col("rank").alias("__ra")
    )
    joined = e.join(a, [query_id_col, id_col], "left").withColumn(
        "__w",
        F.when(
            F.col("__ra").isNull(), F.lit(0)
        ).otherwise(
            F.element_at(
                wts, F.greatest(F.col("__re"), F.col("__ra")).cast("int")
            )
        ),
    )
    return joined.groupBy(query_id_col).agg(
        F.count("__ra").cast("long").alias("n_overlap"),
        F.sum("__w").cast("long").alias("rbo_micro"),
    )


def jl_sign_matrix(m: int = 16, d: int = 64, seed: str = "jl-v1") -> list[list[int]]:
    """Deterministic ±1 sign-projection matrix (Achlioptas 2003's
    database-friendly Johnson-Lindenstrauss variant): entry (j, i) is
    the parity of md5(seed:j:i). Generated driver-side once (m*d
    entries, a literal) so Spark and the DuckDB oracle share the exact
    matrix — the projection itself is then pure integer arithmetic."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:15], 16
            )
            % 2
            == 0
            else -1
            for i in range(d)
        ]
        for j in range(m)
    ]


def _matrix_expr(matrix: list[list[int]]) -> str:
    rows = ", ".join(
        "array(" + ", ".join(str(v) for v in row) + ")" for row in matrix
    )
    return f"array({rows})"


def sql_matrix_literal(matrix: list[list[int]]) -> str:
    """DuckDB list-of-lists literal of the same matrix."""
    return (
        "["
        + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in matrix)
        + "]"
    )


def jl_project(
    df: DataFrame,
    matrix: list[list[int]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Project milli-snapped embeddings through the ±1 JL matrix:
    proj[j] = sum_i sign(j,i) * floor(x_i * 1000) — exact BIGINT sums
    (64 dims x 10^3-scaled values stay far inside the range), one
    narrow codegen'd expression per row, no shuffle, no Python.
    Adds `proj: array<bigint>` of length m."""
    return df.withColumn(
        "proj",
        F.expr(
            f"transform({_matrix_expr(matrix)}, row ->"
            f" aggregate(zip_with(row, transform({vec_col},"
            "  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)),"
            "  (s, v) -> s * v), CAST(0 AS BIGINT), (a, x) -> a + x))"
        ),
    )


def jl_distance_pairs(
    df: DataFrame,
    matrix: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_buckets: int = 500,
) -> DataFrame:
    """Distance-preservation audit for the JL sign projection: on a
    deterministic ~5% hash sample of vectors, emit every pair's exact
    squared distance in the ORIGINAL milli space and in the PROJECTED
    space — the two integers whose read-time ratio distribution is the
    JL distortion report (concentrated around m within the
    Johnson-Lindenstrauss bound for sign projections).

    The sample is bounded by construction (sample_buckets of the 10^4
    md5 buckets), so the pair join broadcasts one side; at any corpus
    scale the audit cost is |sample|², a dial independent of |corpus|.

    Returns (a, b, d2_orig, d2_proj).
    """
    from politicamente_etl_spark.operators.sampling import hash_bucket

    sampled = df.filter(
        hash_bucket(id_col, "jl-v1") < F.lit(sample_buckets)
    )
    pr = jl_project(sampled, matrix, vec_col).select(
        F.col(id_col).alias("pid"),
        F.expr(
            f"transform({vec_col},"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("vm"),
        "proj",
    )
    a = pr.select(
        F.col("pid").alias("a"), F.col("vm").alias("va"), F.col("proj").alias("pa")
    )
    b = pr.select(
        F.col("pid").alias("b"), F.col("vm").alias("vb"), F.col("proj").alias("pb")
    )
    d2 = (
        "aggregate(zip_with({x}, {y}, (p, q) -> (p - q) * (p - q)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return (
        a.join(F.broadcast(b), F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.expr(d2.format(x="va", y="vb")).alias("d2_orig"),
            F.expr(d2.format(x="pa", y="pb")).alias("d2_proj"),
        )
    )


def item_cooccurrence_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_co: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Item-item collaborative-filtering similarity (the classic
    Sarwar et al. 2001 co-occurrence form): cosine over binary basket
    incidence vectors, sim(i,j) = c_ij / sqrt(c_i * c_j), emitted as
    exact integers — (c_ab, c_a, c_b) plus
    sim_sq_ppm = c_ab^2 * 1e6 div (c_a * c_b) so no float sqrt exists
    anywhere. Top-k pairs by (sim_sq_ppm desc, a, b).

    Scale shape: per-basket pair explode (bounded by basket size — the
    same hot-order skew envelope as the co-purchase graph), one pair
    aggregate, item-count broadcasts back, TakeOrdered for top-k. The
    min_co floor keeps the pair table sparse at corpus scale.
    """
    bi = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    a, b = bi.alias("a"), bi.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.it") < F.col("b.it")),
        )
        .groupBy(
            F.col("a.it").alias("ia"), F.col("b.it").alias("ib")
        )
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= min_co)
    )
    cnt = bi.groupBy(F.col("it")).agg(F.count("*").cast("long").alias("c"))
    return (
        co.join(F.broadcast(cnt.select(F.col("it").alias("ia"), F.col("c").alias("c_a"))), "ia")
        .join(F.broadcast(cnt.select(F.col("it").alias("ib"), F.col("c").alias("c_b"))), "ib")
        .withColumn(
            "sim_sq_ppm",
            # DECIMAL(38,0) intermediates: c_ab^2*1e6 outgrows BIGINT once
            # a pair co-occurs in ~3e6 baskets (code-review finding) —
            # values are unchanged wherever the old BIGINT form was exact
            F.expr(
                "CAST((CAST(c_ab AS decimal(38,0)) * c_ab * 1000000)"
                " DIV (CAST(c_a AS decimal(38,0)) * c_b) AS BIGINT)"
            ),
        )
        .select(
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            "c_ab",
            "c_a",
            "c_b",
            "sim_sq_ppm",
        )
        .orderBy(F.desc("sim_sq_ppm"), "item_a", "item_b")
        .limit(top_k)
    )


def mutual_knn_pairs(
    dots: DataFrame,
    a_col: str = "va",
    b_col: str = "vb",
    dot_col: str = "dot",
    k: int = 5,
) -> DataFrame:
    """Mutual-kNN filter over a candidate-pair table: keep (a, b) only
    when b is among a's k most-similar candidates AND a is among b's —
    the reciprocal-neighbor criterion that semantic dedup and
    hubness-robust retrieval use to kill asymmetric hub matches (a hub
    vector is in everyone's top-k, but almost nobody is in its).

    `dots` holds canonical candidate pairs (a < b) with an exact
    integer similarity (`dot_col`). Candidate generation stays the
    caller's choice — the exact all-pairs form is the small-corpus
    audit twin, the LSH/IVF bucket joins are the 100 TB path, and the
    mutual filter is IDENTICAL over either (it only re-ranks what the
    generator admits, so rank-k is "rank among candidates": the
    production contract, exact when the generator recalls the true
    top-k).

    Shape: symmetrize (2× candidate rows), one per-node window keeps
    rank ≤ k (WindowGroupLimit — partial top-k on the map side, no
    global sort), then the reciprocal check is a self-join of that
    bounded (≤ n·k rows) relation on the swapped key pair.

    Returns (node_a, node_b, dot, rank_ab, rank_ba), node_a < node_b.
    """
    sym = dots.select(
        F.col(a_col).alias("v"), F.col(b_col).alias("u"), F.col(dot_col).alias("dt")
    ).unionByName(
        dots.select(
            F.col(b_col).alias("v"), F.col(a_col).alias("u"), F.col(dot_col).alias("dt")
        )
    )
    w = Window.partitionBy("v").orderBy(F.col("dt").desc(), F.col("u"))
    topk = (
        sym.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("v", "u", "dt", "rnk")
    )
    fwd = topk.filter(F.col("v") < F.col("u"))
    rev = topk.filter(F.col("v") > F.col("u")).select(
        F.col("u").alias("v"), F.col("v").alias("u"), F.col("rnk").alias("rnk_ba")
    )
    return (
        fwd.join(rev, ["v", "u"])
        .select(
            F.col("v").alias("node_a"),
            F.col("u").alias("node_b"),
            F.col("dt").alias("dot"),
            F.col("rnk").cast("long").alias("rank_ab"),
            F.col("rnk_ba").cast("long").alias("rank_ba"),
        )
    )
