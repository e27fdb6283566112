"""Join operators (SURVEY.md §2.3, J1-J5).

The reference implements every join as a driver-side Python dict probe
(`load.py:56-57,66,73-75`) — semantically a broadcast hash inner join. Here
each is a declarative Spark join; dimension sides get an explicit
`F.broadcast` hint so the fact table never shuffles (at 100 TB a shuffled
fact join is the difference between minutes and hours). When a "dimension"
outgrows the broadcast threshold, dropping the hint lets AQE pick
sort-merge/shuffled-hash — the call sites don't change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J1-J3 — broadcast hash equi-join against a dimension.

    J1 single int key (`load.py:56,75`), J2 composite 2-col key
    (`load.py:57,71,74` — multi-column, NOT the reference's collision-prone
    string concat, SURVEY.md §2.9.4), J3 3-part derived key
    (`load.py:66,70,73`). Inner `how` reproduces the miss-drop at
    `load.py:77`."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def anti_join_absent(
    new: DataFrame, existing: DataFrame, keys: list[str]
) -> DataFrame:
    """J4 — insert-if-absent semantics (`INSERT … ON CONFLICT DO NOTHING`,
    `load.py:40,63,88`): rows of `new` whose key is not in `existing`.
    LEFT ANTI join — Spark broadcasts `existing`'s keys when small; at scale
    AQE converts to a shuffled anti join."""
    return new.join(existing.select(*keys), on=keys, how="left_anti")


def join_update(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    set_cols: list[str],
) -> DataFrame:
    """J5 — keyed UPDATE as a left join + coalesce (`UPDATE … WHERE key=:k`,
    `load.py:115-125`). Target rows with a matching update take the new
    values; unmatched rows pass through unchanged. The update side is
    typically small (aggregated) → broadcast."""
    upd = updates.select(
        *keys, *[F.col(c).alias(f"__new_{c}") for c in set_cols]
    )
    out = target.join(F.broadcast(upd), on=keys, how="left")
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c)))
    return out.drop(*[f"__new_{c}" for c in set_cols])


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: list[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Skew-breaking equi-join (SURVEY.md §7.2 scale pass): the skewed side
    gets a synthetic salt, the small side is replicated once per salt value,
    and the join runs on (keys + salt) — a hot key's rows spread across
    n_salts shuffle partitions instead of melting one executor.

    Use when a single key is so hot that even AQE's skew-join split (on in
    session.py) leaves an oversized partition; n_salts multiplies the small
    side's shuffle volume, so keep it near the observed skew factor. The
    salt derives from a per-row id, not rand(), so retried tasks re-salt
    identically. Join RESULTS are identical to the unsalted join."""
    salted = skewed.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, on=[*keys, "__salt"], how=how).drop("__salt")


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    batch_id: int,
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply a batch of attribute
    updates to a versioned dimension, closing superseded rows and opening
    new versions — the warehouse-side history-keeping MERGE that plain
    parquet lacks (Delta/Iceberg express it as MERGE WHEN MATCHED; this is
    the engine-portable join algebra with identical output).

    Inputs: `current` carries (keys, attrs, version_col, current_col);
    `updates` carries (keys, tracked attrs) for this batch. Semantics:
    - key absent from updates            → row passes through unchanged;
    - key matched, all tracked equal     → row passes through unchanged
      (no spurious version churn);
    - key matched, any tracked differs   → the open row closes
      (current_col=false, version kept) AND a new open row appends with
      version_col=batch_id;
    - key new (not in current)           → inserted open at batch_id.
    Closed historical rows (current_col already false) never rejoin the
    update — they pass through on the cheap side of the union.

    Plan shape: ONE equi-join between the open slice and the updates (the
    update batch is the small side → planner broadcast), a change flag as
    an expression, and a three-way unionByName (history ∥ survivors+closed
    ∥ openings). Nothing shuffles except the join itself; at 100 TB with a
    key-partitioned dimension layout this is a map-side merge per
    partition. Delta's MERGE compiles to exactly this shape + a
    transactional commit; see sinks.merge_upsert for the slot-in."""
    attrs = [c for c in current.columns if c not in (version_col, current_col)]
    closed_hist = current.filter(~F.col(current_col))
    open_now = current.filter(F.col(current_col))

    upd = updates.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
        F.lit(1).alias("__u_hit"),  # NULL-safe match marker
    )
    joined = open_now.join(F.broadcast(upd), on=keys, how="left")
    matched = F.col("__u_hit").isNotNull()
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    changed = matched & ~same

    # unchanged / unmatched open rows survive as-is; changed rows close
    survivors = joined.select(
        *attrs,
        F.col(version_col),
        F.when(changed, F.lit(False)).otherwise(F.col(current_col)).alias(current_col),
    )
    # new versions for changed keys
    openings = joined.filter(changed).select(
        *[
            F.col(f"__u_{c}").alias(c) if c in tracked else F.col(c)
            for c in attrs
        ],
        F.lit(batch_id).cast(current.schema[version_col].dataType).alias(version_col),
        F.lit(True).alias(current_col),
    )
    # brand-new keys
    inserts = (
        updates.join(current.select(*keys).distinct(), on=keys, how="left_anti")
        .select(
            *[
                F.col(c)
                if c in keys or c in tracked
                else F.lit(None).cast(current.schema[c].dataType).alias(c)
                for c in attrs
            ],
            F.lit(batch_id).cast(current.schema[version_col].dataType).alias(version_col),
            F.lit(True).alias(current_col),
        )
    )
    return (
        closed_hist.select(*attrs, version_col, current_col)
        .unionByName(survivors)
        .unionByName(openings)
        .unionByName(inserts)
    )


def update_match_accounting(
    target: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """J5/K5 — match accounting (`load.py:123-124`: rowcount checked, misses
    logged). Returns one lazy row: (matched, unmatched) update keys — a left
    join + conditional count, no driver-side action, works at any scale."""
    upd_keys = updates.select(*keys).distinct()
    tgt_keys = target.select(*keys).distinct().withColumn("__hit", F.lit(1))
    flagged = upd_keys.join(F.broadcast(tgt_keys), on=keys, how="left")
    return flagged.agg(
        F.count("__hit").alias("matched_keys"),
        F.count(F.when(F.col("__hit").isNull(), 1)).alias("unmatched_keys"),
    )


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Bloom-filter join pruning: drop probe rows whose key cannot exist
    on the build side BEFORE the join's shuffle ever moves them.

    The scale problem this solves: a selective dimension filter (say 2%
    of orders) joined to a 100 TB fact table still shuffles the FULL fact
    table if the build side is too big to broadcast — the rows that will
    never match are discovered only after the exchange. A Bloom filter of
    the build keys is small no matter how many keys it summarizes
    (`num_bits` is fixed: 1M bits = 128 KB at any build cardinality), so
    it can always be broadcast, and probe rows failing the membership
    test die at the scan, shrinking the shuffle by the filter's true
    negative rate. This is exactly what Spark's own runtime filter
    (spark.sql.optimizer.runtime.bloomFilter.enabled) injects; the
    explicit operator form works on any plan shape, makes the pruning
    testable, and lets the caller size bits/hashes to the build count
    (~10 bits/key + 5 hashes ≈ 1% false positives).

    Mechanics, all JVM-side: build bits = groupBy(word index).bit_or over
    the k per-key positions `xxhash64(key, seed_i) % num_bits` — a
    partial-aggregated exchange of at most `num_bits/64` longs — packed
    into ONE array<long> row and broadcast; the probe side evaluates the
    k membership tests against `element_at` on that array. False
    positives only — the subsequent real join removes them, so
    join(bloom_prefilter(probe), build) ≡ join(probe, build) exactly.
    """
    n_words = (num_bits + 63) // 64
    pos = [
        F.expr(f"pmod(xxhash64({build_key}, {i}), {num_bits})")
        for i in range(num_hashes)
    ]
    words = (
        build.select(
            F.explode(F.array(*pos)).alias("p")
        )
        .select(
            F.expr("cast(p div 64 as int)").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    # Materialize the sparse (word, bits) rows and densify at the driver:
    # the structure is BOUNDED by num_bits/64 longs (128 KB at 2^20 bits)
    # regardless of build cardinality — the same driver-side materialize+
    # broadcast Spark's own runtime bloom filter performs. (A pure-plan
    # densify via map element_at is quadratic in words: map lookups are
    # linear scans, measured 20 s vs 0.6 s at sf0.1.)
    dense = [0] * n_words
    for row in words.collect():
        dense[row["w"]] = row["bits"]
    spark = probe.sparkSession
    packed = spark.createDataFrame(
        [(dense,)], schema="bloom_bits: array<long>"
    )
    tests = [
        F.expr(
            f"(element_at(bloom_bits, cast(pmod(xxhash64({probe_key}, {i}), {num_bits}) div 64 as int) + 1)"
            f" & shiftleft(1L, cast(pmod(xxhash64({probe_key}, {i}), {num_bits}) % 64 as int))) != 0"
        )
        for i in range(num_hashes)
    ]
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return (
        probe.join(F.broadcast(packed), how="cross")
        .filter(cond)
        .drop("bloom_bits")
    )
