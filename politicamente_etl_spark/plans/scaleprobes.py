"""Bench-only SCALING PROBES (VERDICT r9 item 6).

At sf0.1 every bench slot's parallel work is so small that per-slot fixed
overhead (job scheduling, broadcast builds, stream machinery) dominates,
so the driver's 8-core vs 32-core comparison cannot falsify any §2
fan-out claim: measured ratios sat at 0.66-1.30 for every slot in
PERF_r09, several FASTER at 8 cores. These probes run the same
expression-bound operators the fan-out (`spread`) claims to parallelize
— the regex shingle posting-list build and the md5 MinHash signature —
over the documents corpus replicated 8x (row-level explode at read time;
nothing is cached or precomputed, every run derives from the parquet
input), which puts seconds of single-core-equivalent expression work on
the clock so the core-count ratio measures compute scaling, not
overhead.

Measured (alternating 32/8-core sessions, best-of-3 each):
- minhash signature probe: 1.6-2.4x at 32 vs 8 cores — the md5-fold
  pipeline is compute-bound and the fan-out pays.
- shingle posting probe: ~0.8-1.2x — the explode-to-millions-of-small-
  rows posting build SATURATES at ~8 threads in one local-mode JVM
  (allocation/GC contention on the shared heap; separate executors at
  cluster scale each own a heap, so this ceiling is a local-mode
  artifact worth knowing, not a fan-out refutation). Keeping the probe
  is deliberate: it characterizes the ceiling instead of hiding it.

These are NOT catalog queries (no oracle, not in queries()/oracle_sql(),
no new feature surface): bench.py times them as extra labeled
`scaleprobe_*` entries in its JSON `queries` map, which the driver's
contract explicitly allows ("you may ADD entries"). They call the real
operator code paths (politicamente_etl_spark.operators.dedup), so a
regression in the fan-out machinery shows up here as a collapsed ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.sources.readers import load_table

REPLICATION_SHINGLE = 8
REPLICATION_MINHASH = 8


def _docs_x(spark: SparkSession, sf_dir: str, times: int) -> DataFrame:
    """The documents corpus replicated `times` x with distinct doc_ids —
    a row-level explode over the parquet scan, derived fresh per run.

    The BASE corpus is spread() BEFORE the explode: replicating on the
    single-split scan task would make the replication itself the serial
    fraction and compress the core ratio the probe exists to measure
    (Amdahl)."""
    from politicamente_etl_spark.operators.core import spread

    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    return d.select(
        F.explode(F.sequence(F.lit(0), F.lit(times - 1))).alias("__rep"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * times + F.col("__rep")).alias("doc_id"), "text"
    )


def probe_shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ngram/containment posting-list build (regex shingling +
    explode + xxhash64) over the replicated corpus, reduced to one
    checksum row so the timed work is the expression pipeline, not a
    quadratic pair join."""
    from politicamente_etl_spark.operators.dedup import _hashed_posting_list

    sh = _hashed_posting_list(
        _docs_x(spark, sf_dir, REPLICATION_SHINGLE), "text", "doc_id"
    )
    return sh.agg(
        F.count("*").alias("n_postings"),
        F.sum(F.pmod(F.col("sh"), F.lit(1_000_000_007))).alias("sh_checksum"),
    )


def probe_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8-permutation md5 MinHash signature pass (the most
    expression-expensive operator the fan-out serves) over the
    replicated corpus, reduced to per-permutation checksums."""
    from politicamente_etl_spark.operators.core import spread
    from politicamente_etl_spark.operators.dedup import (
        N_MINHASH,
        with_minhash_signature,
    )

    sig = with_minhash_signature(
        spread(_docs_x(spark, sf_dir, REPLICATION_MINHASH), "doc_id"),
        "text",
        N_MINHASH,
    ).drop("text")
    return sig.agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum(F.pmod(F.xxhash64(f"mh_{i}"), F.lit(1_000_000_007))).alias(f"chk_{i}")
            for i in range(N_MINHASH)
        ],
    )


SCALE_PROBES = {
    "scaleprobe_shingle_postings_x8": probe_shingle_postings,
    "scaleprobe_minhash_signatures_x8": probe_minhash_signatures,
}
