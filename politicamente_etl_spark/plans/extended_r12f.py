"""Round-7 batch F: contiguous global ID assignment without a global
sort, and Matryoshka-style truncated-dimension recall for embeddings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politicamente_etl_spark.operators import sim

_MRL_DIMS = (8, 16, 32)

# DuckDB sequential-fold dot/norm (the exact idiom the green cosine
# queries use — bit-identical to Spark's F.aggregate fold).
_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(list_reduce(list_transform({a},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
)


def _topk_cte(tag: str, vec: str) -> str:
    """Top-10 cosine CTE body over embeddings with query vec_id < 8,
    scoring on `vec` (a possibly-sliced embedding expression)."""
    return f"""
        scored_{tag} AS (
            SELECT q.vec_id AS query_id, e.vec_id,
                   {_DOT.format(a=f'e.{vec}', b=f'q.{vec}')}
                   / ({_NORM.format(a=f'e.{vec}')}
                      * {_NORM.format(a=f'q.{vec}')}) AS cos_sim
            FROM emb e CROSS JOIN (SELECT * FROM emb WHERE vec_id < 8) q
        ), top_{tag} AS (
            SELECT query_id, vec_id
            FROM scored_{tag}
            QUALIFY row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, vec_id) <= 10
        )"""


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "contiguous_id_assignment",
        sql="""
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT)
                   AS global_id
        FROM documents
        """,
        tags=("ext-core", "ext-sampling"),
    )
    def q_contiguous_id_assignment(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Dense contiguous global IDs (1..N in doc_id order) WITHOUT a
        single-reducer global sort — the pattern every 'number my 100
        billion rows' task needs. A naive row_number() with no
        PARTITION BY collapses the table through ONE task; here the
        rows are split into explicit doc_id ranges (boundaries derived
        from one min/max aggregate — deterministic integer math, no
        sampled RangePartitioner), each range numbers independently
        under a per-range window, and a prefix-sum over the TINY
        per-range counts (a window over n_ranges rows) shifts each
        range by its offset. Cost: one pass for min/max + one shuffle
        on the range key with n_ranges-way parallelism; the only
        single-task work is the n_ranges-row prefix sum. The oracle IS
        the naive global row_number — equality proves the two-pass
        decomposition exact, including at range boundaries and for
        ranges the id distribution leaves empty."""
        n_ranges = 8
        docs = T(spark, sf_dir, "documents").select("doc_id")
        mm = docs.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        )
        parts = docs.crossJoin(F.broadcast(mm)).withColumn(
            "pid",
            F.floor(
                (F.col("doc_id") - F.col("lo"))
                * n_ranges
                / (F.col("hi") - F.col("lo") + 1)
            ).cast("int"),
        )
        counts = parts.groupBy("pid").agg(F.count("*").alias("n"))
        w_off = Window.orderBy("pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = counts.withColumn(
            "off", F.coalesce(F.sum("n").over(w_off), F.lit(0))
        ).select("pid", "off")
        w_in = Window.partitionBy("pid").orderBy("doc_id")
        return (
            parts.join(F.broadcast(offsets), "pid")
            .withColumn(
                "global_id",
                (F.col("off") + F.row_number().over(w_in)).cast("long"),
            )
            .select("doc_id", "global_id")
        )

    _ctes = [_topk_cte("full", "embedding")]
    for d in _MRL_DIMS:
        _ctes.append(_topk_cte(f"d{d}", f"v{d}"))
    _overlap_rows = "\n            UNION ALL\n".join(
        f"""            SELECT {d} AS dims,
                   CAST(COUNT(*) AS BIGINT) AS overlap,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM top_full)
                       AS n_pairs
            FROM top_d{d} t JOIN top_full f
              ON t.query_id = f.query_id AND t.vec_id = f.vec_id"""
        for d in _MRL_DIMS
    )

    @register(
        "mrl_truncation_recall",
        sql=f"""
        WITH emb AS (
            SELECT vec_id, embedding,
                   {", ".join(f"embedding[1:{d}] AS v{d}" for d in _MRL_DIMS)}
            FROM embeddings
        ),{",".join(_ctes)}
        SELECT dims, overlap, n_pairs,
               CAST(overlap AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                   AS recall_at_10
        FROM (
{_overlap_rows}
        )
        """,
        tags=("ext-sim",),
    )
    def q_mrl_truncation_recall(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Matryoshka-style dimension-truncation study (Kusupati et al.
        2022: nested prefixes of an embedding as cheaper indexes): exact
        cosine top-10 recall of the FIRST-d dimensions (d=8,16,32)
        against the full 64-d top-10, for 8 query vectors. The brute
        force twin runs per d on a prefix-SLICED vector column — at
        100 TB the point is the memory/IO algebra: a d=16 prefix index
        is 4× smaller than full vectors with recall measured (not
        assumed) by this query, and the slice pushes into the scan
        projection so the truncated index never materializes the tail
        dims. Overlap counting is integer; ranks tie-break on vec_id —
        both topk sets are engine-deterministic (sequential-fold dot
        products, the proven cosine_topk idiom)."""
        emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        queries = emb.filter(F.col("vec_id") < 8)
        full = sim.cosine_topk(emb, queries, k=10).select(
            "query_id", "vec_id"
        )
        out = None
        n_pairs = full.count()
        for d in _MRL_DIMS:
            embd = emb.select(
                "vec_id", F.slice("embedding", 1, d).alias("embedding")
            )
            qd = queries.select(
                "vec_id", F.slice("embedding", 1, d).alias("embedding")
            )
            topd = sim.cosine_topk(embd, qd, k=10).select(
                "query_id", "vec_id"
            )
            row = (
                topd.join(full, ["query_id", "vec_id"])
                .agg(F.count("*").cast("long").alias("overlap"))
                .select(
                    F.lit(d).cast("int").alias("dims"),
                    "overlap",
                    F.lit(n_pairs).cast("long").alias("n_pairs"),
                )
            )
            out = row if out is None else out.unionByName(row)
        return out.withColumn(
            "recall_at_10",
            F.col("overlap").cast("double") / F.col("n_pairs").cast("double"),
        )


_register()
