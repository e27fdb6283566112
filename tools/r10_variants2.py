"""r10 experiment phase 2: semdedup / chunk_dedup / bloom / flagship shapes.

Same methodology as r10_variants.py (warm, best-of-3 noop, clearCache
between variants).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.operators import sim, text  # noqa: E402
from politicamente_etl_spark.operators.core import spread  # noqa: E402
from politicamente_etl_spark.operators.joins import bloom_prefilter  # noqa: E402
from politicamente_etl_spark.operators.sim import (  # noqa: E402
    DOT_DOUBLE,
    NORM2_DOUBLE,
    assign_cells,
)
from politicamente_etl_spark.session import get_spark  # noqa: E402
from politicamente_etl_spark.sources.readers import load_table  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="r10-variants2")
spark.sparkContext.setLogLevel("ERROR")

results: dict[str, float] = {}


def bench(name, build):
    try:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass
    spark.sparkContext.setJobDescription(name)
    build().write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    results[name] = round(best, 4)
    print(f"{name:22s} {best:.4f}", flush=True)


def T(name):
    return load_table(spark, sf_dir, name)


# -------------------------------------------------------------- semdedup --


def semdedup_shape(barrier: str, threshold=0.45):
    emb = T("embeddings")
    cent = emb.filter(F.col("vec_id") % 125 == 0).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    assigned = assign_cells(emb, cent, "vec_id", "embedding").withColumn(
        "__nrm", F.sqrt(F.expr(NORM2_DOUBLE.format(a="embedding")))
    )
    if barrier == "lc_eager":
        assigned = assigned.localCheckpoint()
    elif barrier == "lc_lazy":
        assigned = assigned.localCheckpoint(eager=False)
    a = assigned.select(
        F.col("cell"),
        F.col("vec_id").alias("__ia"),
        F.col("embedding").alias("__va"),
        F.col("__nrm").alias("__na"),
    )
    b = assigned.select(
        F.col("cell"),
        F.col("vec_id").alias("__ib"),
        F.col("embedding").alias("__vb"),
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
        .groupBy(F.col("__ib").alias("vec_id"))
        .agg(F.min("__ia").alias("dup_of"))
    )
    return assigned.join(dup_edges, "vec_id", "left").select(
        "vec_id", "cell", "dup_of", F.col("dup_of").isNull().alias("is_kept")
    )


def run_semdedup():
    bench("sd_cur_lceager", lambda: semdedup_shape("lc_eager"))
    bench("sd_lc_lazy", lambda: semdedup_shape("lc_lazy"))
    bench("sd_nobar", lambda: semdedup_shape("none"))


# ------------------------------------------------------------ chunk dedup --

CHUNK_W = 8


def chunks_shape(do_spread: bool):
    docs = T("documents").select("doc_id", "source", "text")
    if do_spread:
        docs = spread(docs, "doc_id")
    ch = text.chunk_documents(docs, window=CHUNK_W, stride=CHUNK_W)
    return ch.select(
        "doc_id",
        F.md5("chunk_text").alias("h"),
        F.col("chunk_idx").cast("long").alias("ci"),
    )


def chunk_report(f):
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id", "ci")
    r = f.withColumn("rn", F.row_number().over(w))
    return (
        r.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("rn") > 1).cast("bigint")).alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_ppm",
            F.expr("n_dup_chunks * 1000000 div n_chunks").cast("bigint"),
        )
    )


def run_chunk():
    bench("ck_spread", lambda: chunk_report(chunks_shape(True)))
    bench("ck_nospread", lambda: chunk_report(chunks_shape(False)))


# ------------------------------------------------------------------ bloom --


def bloom_shape(mode: str):
    li = T("lineitem")
    if mode == "spread_pre":
        li = spread(li, "l_orderkey")
    build = T("orders").filter(F.col("o_orderpriority") == "1-URGENT")
    pruned = bloom_prefilter(
        li, build, "l_orderkey", "o_orderkey", num_bits=1 << 20, num_hashes=5
    )
    if mode == "spread_post":
        pruned = spread(pruned, "l_orderkey")
    return (
        pruned.join(build, pruned.l_orderkey == build.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


def run_bloom():
    bench("bl_spread_pre", lambda: bloom_shape("spread_pre"))
    bench("bl_nospread", lambda: bloom_shape("none"))
    bench("bl_spread_post", lambda: bloom_shape("spread_post"))


# --------------------------------------------------------------- flagship --


def flagship_shape(do_spread: bool):
    li = T("lineitem")
    if do_spread:
        li = spread(li, "l_orderkey")
    o = T("orders")
    c = T("customer")
    n = T("nation")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).alias("revenue"),
            F.count("*").alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


def run_flagship():
    bench("fl_spread", lambda: flagship_shape(True))
    bench("fl_nospread", lambda: flagship_shape(False))


if __name__ == "__main__":
    which = sys.argv[1:] or ["semdedup", "chunk", "bloom", "flagship"]
    fns = {
        "semdedup": run_semdedup,
        "chunk": run_chunk,
        "bloom": run_bloom,
        "flagship": run_flagship,
    }
    for w in which:
        fns[w]()
    print(json.dumps(results))
