"""r10 experiment: TIME candidate shapes for the six r9-regressed slots.

Each variant is built inline (same expressions as the operators) and timed
with bench.py's methodology: warm once, best-of-3 noop writes, clearCache
between variants. Usage:

    python tools/r10_variants.py [ngram|minhash|boiler] ...

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.operators.core import spread  # noqa: E402
from politicamente_etl_spark.operators.text import shingles_regex  # noqa: E402
from politicamente_etl_spark.session import get_spark  # noqa: E402
from politicamente_etl_spark.sources.readers import load_table  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="r10-variants")
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


def docs():
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------- ngram --


def ngram_posting(outer: bool, nn_size: bool):
    d = spread(docs().select("doc_id", "text"), "doc_id").select(
        F.col("doc_id"), F.array_distinct(shingles_regex("text")).alias("shs")
    )
    n_sh = F.size("shs")
    if nn_size:
        n_sh = F.coalesce(n_sh, F.lit(0))
    ex = F.explode_outer("shs") if outer else F.explode("shs")
    p = d.select(F.col("doc_id"), n_sh.alias("n_sh"), ex.alias("sh"))
    if outer:
        p = p.filter(F.col("sh").isNotNull())
    return p.withColumn("sh", F.xxhash64("sh"))


def ngram_pairs(sh, threshold=0.4):
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def run_ngram():
    bench("ng_cur_lc", lambda: ngram_pairs(
        ngram_posting(False, False).localCheckpoint(eager=False)))
    bench("ng_nobar", lambda: ngram_pairs(ngram_posting(False, False)))
    bench("ng_outer_nn", lambda: ngram_pairs(ngram_posting(True, True)))
    bench("ng_outer_nn_rep", lambda: ngram_pairs(
        ngram_posting(True, True).repartition("sh")))
    bench("ng_persist", lambda: ngram_pairs(
        ngram_posting(False, False).persist()))


# --------------------------------------------------------------- minhash --

from politicamente_etl_spark.operators.dedup import (  # noqa: E402
    N_MINHASH,
    BAND_SIZE,
    _explode_bands,
    with_minhash_signature,
)


def mh_sig(prefilter: bool):
    d = docs().select("doc_id", "text")
    if prefilter:
        d = d.filter(F.col("text").rlike(r"\S+ \S+ \S+"))
    sig = with_minhash_signature(spread(d, "doc_id"), "text", N_MINHASH).drop(
        "text"
    )
    if not prefilter:
        sig = sig.filter(F.col("mh_0").isNotNull())
    n_bands = N_MINHASH // BAND_SIZE
    sig = sig.select(
        "doc_id",
        *[F.xxhash64(f"mh_{i}").alias(f"mh_{i}") for i in range(N_MINHASH)],
        *[
            F.xxhash64(
                *[F.col(f"mh_{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
            ).alias(f"band_{b}")
            for b in range(n_bands)
        ],
    )
    return _explode_bands(
        sig, "doc_id", n_bands, carry=[f"mh_{i}" for i in range(N_MINHASH)]
    )


def mh_pairs(ex):
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = a.join(
        b.hint("shuffle_hash"),
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        *[F.col(f"a.mh_{i}").alias(f"a_mh_{i}") for i in range(N_MINHASH)],
        *[F.col(f"b.mh_{i}").alias(f"b_mh_{i}") for i in range(N_MINHASH)],
    )
    agree = sum(
        F.when(F.col(f"a_mh_{i}") == F.col(f"b_mh_{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    return (
        pairs.withColumn(
            "est_jaccard", (agree.cast("double") / F.lit(float(N_MINHASH)))
        )
        .select("doc_a", "doc_b", "est_jaccard")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def run_minhash():
    bench("mh_cur_lc", lambda: mh_pairs(mh_sig(False).localCheckpoint(eager=False)))
    bench("mh_nobar", lambda: mh_pairs(mh_sig(False)))
    bench("mh_prefilter", lambda: mh_pairs(mh_sig(True)))
    bench("mh_pre_rep", lambda: mh_pairs(
        mh_sig(True).repartition("band_id", "band_key")))
    bench("mh_persist", lambda: mh_pairs(mh_sig(False).persist()))


# ----------------------------------------------------------- boilerplate --


def boiler_sh(outer: bool):
    d = spread(docs().select("doc_id", "text"), "doc_id")
    arr = F.array_distinct(shingles_regex("text", 5))
    ex = F.explode_outer(arr) if outer else F.explode(arr)
    p = d.select(F.col("doc_id"), ex.alias("sh"))
    if outer:
        p = p.filter(F.col("sh").isNotNull())
    return p.withColumn("sh", F.xxhash64("sh"))


def boiler_score(sh, hot_doc_count=10):
    doc_freq = sh.groupBy("sh").agg(F.count("*").alias("doc_freq"))
    return (
        sh.join(doc_freq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("doc_freq") > hot_doc_count).cast("bigint")).alias(
                "n_boiler"
            ),
        )
        .withColumn(
            "boiler_ratio",
            F.col("n_boiler").cast("double") / F.col("n_shingles").cast("double"),
        )
    )


def boiler_window(sh, hot_doc_count=10):
    from pyspark.sql import Window

    w = Window.partitionBy("sh")
    return (
        sh.withColumn("doc_freq", F.count("*").over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("doc_freq") > hot_doc_count).cast("bigint")).alias(
                "n_boiler"
            ),
        )
        .withColumn(
            "boiler_ratio",
            F.col("n_boiler").cast("double") / F.col("n_shingles").cast("double"),
        )
    )


def run_boiler():
    bench("bp_cur_lc", lambda: boiler_score(
        boiler_sh(False).localCheckpoint(eager=False)))
    bench("bp_nobar", lambda: boiler_score(boiler_sh(False)))
    bench("bp_outer", lambda: boiler_score(boiler_sh(True)))
    bench("bp_outer_rep", lambda: boiler_score(
        boiler_sh(True).repartition("sh")))
    bench("bp_window", lambda: boiler_window(boiler_sh(True)))
    bench("bp_persist", lambda: boiler_score(boiler_sh(False).persist()))


if __name__ == "__main__":
    which = sys.argv[1:] or ["ngram", "minhash", "boiler"]
    for w in which:
        {"ngram": run_ngram, "minhash": run_minhash, "boiler": run_boiler}[w]()
    print(json.dumps(results))
