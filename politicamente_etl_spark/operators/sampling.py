"""Deterministic sampling and dataset-split operators for the
training-data-pipeline surface (SURVEY.md §2.10 extension).

Everything keys off a salted md5 hash bucket, NOT `rand()` or
`DataFrame.sample`, for three properties a 100 TB pipeline needs:

- **Reproducible across runs/engines**: the split of a given doc_id is a
  pure function of (seed, doc_id) — re-running the pipeline, adding data,
  or moving to another engine never reshuffles existing assignments.
  (`DataFrame.sample` depends on partitioning and seed plumbing; md5
  doesn't.)
- **Join-free leakage control**: near-duplicate handling can hash the
  CLUSTER id instead of the doc id so a whole near-dup cluster lands in
  one split (no train/test contamination).
- **Oracle-checkable**: md5 is identical hex on Spark and DuckDB, so the
  driver verifies every assignment, not just the sample rate.

Narrow per-row expressions only — no shuffle, no UDF, codegen end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000  # 0.01% split granularity


def hash_bucket(col: Column | str, seed: str = "v1", n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 hex chars of
    md5(seed:value) as an integer, mod n_buckets. 32 bits of hash for
    ≤10^4 buckets keeps the modulo bias < 10^-5 of a bucket width."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (h % n_buckets).alias("bucket")


def sql_hash_bucket(expr: str, seed: str = "v1", n_buckets: int = N_BUCKETS) -> str:
    """DuckDB twin of `hash_bucket` for oracle queries."""
    return (
        f"(CAST(('0x' || substring(md5(concat_ws(':', '{seed}', "
        f"CAST({expr} AS VARCHAR))), 1, 8)) AS BIGINT) % {n_buckets})"
    )


def with_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    seed: str = "split-v1",
) -> DataFrame:
    """Assign train/val/test by hash bucket: [0, train) → train,
    [train, train+val) → val, rest → test. Pass the near-dup cluster id
    as `key_col` to keep whole clusters in one split."""
    n_train = int(train * N_BUCKETS)
    n_val = int((train + val) * N_BUCKETS)
    b = hash_bucket(key_col, seed)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < n_train, "train")
        .when(F.col("bucket") < n_val, "val")
        .otherwise("test"),
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: str = "sample-v1"
) -> DataFrame:
    """Deterministic ~rate sample: keep rows whose bucket falls below
    rate·N_BUCKETS. Unlike `DataFrame.sample`, membership is stable under
    re-runs, repartitioning, and incremental appends."""
    return df.filter(hash_bucket(key_col, seed) < int(rate * N_BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = "strata-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling — the language-rebalancing
    primitive for pretraining mixes (e.g. downsample the dominant
    language). Rows in strata absent from `rates` keep `default_rate`.
    Pure per-row predicate: the plan is scan → filter, fully pushdown-
    and codegen-friendly at any scale."""
    rate = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return df.filter(
        hash_bucket(key_col, seed).cast("double") < rate * float(N_BUCKETS)
    )


def order_hash(col: Column | str, seed: str = "pack-v1") -> Column:
    """Deterministic 60-bit ordering hash (15 hex chars of md5(seed:value)
    as bigint) — a reproducible, engine-portable global shuffle order.
    Distinct from `hash_bucket`: full-width, no modulo."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    budget: int = 8192,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    seed: str = "pack-v1",
    mode: str = "closed_form",
) -> DataFrame:
    """Greedy sequence packing: stream documents in a deterministic
    pseudo-random order and cut a new pack every time the running token
    count crosses the budget — the step that turns a cleaned corpus into
    fixed-token-budget training sequences (packing efficiency is why
    pretraining data loaders concatenate documents instead of padding).

    Scale design: packing is a running sum, which is inherently
    sequential — a single global window would serialize the corpus
    through one task. Instead documents are salted into `n_buckets`
    independent streams (md5 bucket) and packed per bucket:
    `Window.partitionBy(bucket)` keeps every partition's state local, so
    the only shuffle is the hash partition and each bucket packs in
    parallel. Pack ids are globally unique via bucket · 2^32 + local id.
    Within a bucket the order (order_hash, id) is total and
    deterministic, so the same corpus packs identically on any engine —
    every row is oracle-checkable, not just the pack-fill statistics.

    Two packing rules (round-4 fix #3):
    - ``mode="closed_form"`` (default, the oracle-exact path): pack =
      floor((cumsum-1)/budget), a pure window expression. A pack here is
      a BUDGET-ALIGNED SLICE of the concatenated stream, so a document
      straddling a boundary contributes to two packs; equivalently, a
      pack's own token total can reach 2·budget-2 when its first doc
      carries overflow from the previous slice. Right when the loader
      concatenates-then-splits (GPT-style pretraining packing).
    - ``mode="greedy"`` (true bin-capped): a sequential walk per bucket
      (applyInPandas — the per-partition imperative tier; the bucket is
      the existing parallel unit) that CLOSES the pack before adding a
      doc that would overflow, so every pack's token total is ≤ budget
      (a single doc larger than the budget still gets its own pack).
      Right when documents must not be split across sequences.
      `cum_tokens` is then the running total WITHIN the pack."""
    from pyspark.sql import Window

    out_df = (
        df.withColumn(
            "pack_bucket", hash_bucket(id_col, seed, n_buckets).cast("bigint")
        )
        .withColumn("pack_order", order_hash(id_col, seed))
    )
    if mode == "greedy":
        import pandas as pd

        schema_str = (
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_df.schema.fields)
            + ", cum_tokens bigint, pack_id bigint"
        )

        def pack_bucket_walk(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(
                ["pack_order", id_col], kind="mergesort"
            ).reset_index(drop=True)
            bucket = int(pdf["pack_bucket"].iloc[0]) if len(pdf) else 0
            packs, cums = [], []
            pid, run = 0, 0
            for nt in pdf[n_tokens_col].astype("int64"):
                if run > 0 and run + nt > budget:
                    pid += 1
                    run = 0
                run += int(nt)
                packs.append(bucket * (1 << 32) + pid)
                cums.append(run)
            pdf["cum_tokens"] = pd.Series(cums, dtype="int64")
            pdf["pack_id"] = pd.Series(packs, dtype="int64")
            return pdf

        return out_df.groupBy("pack_bucket").applyInPandas(
            pack_bucket_walk, schema=schema_str
        )
    if mode != "closed_form":
        raise ValueError(f"pack_sequences: unknown mode {mode!r}")
    nt = F.col(n_tokens_col)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy("pack_order", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(nt).over(w)
    local_pack = F.floor(
        (F.greatest(cum, F.lit(1)) - F.lit(1)) / F.lit(float(budget))
    ).cast("bigint")
    return (
        out_df.withColumn("cum_tokens", cum.cast("bigint"))
        .withColumn(
            "pack_id", F.col("pack_bucket") * F.lit(1 << 32) + local_pack
        )
    )


def consistent_sample_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: str = "v1",
) -> DataFrame:
    """Exact-k deterministic sample: the k rows whose salted md5 rank
    lowest — the distributed replacement for reservoir sampling. The
    chosen set is a pure function of (seed, id): stable across runs,
    engines, partitionings, AND appends (a new row only enters by
    displacing the current max — the 'bottom-k sketch' property, which
    also makes per-partition bottom-k merges exact at 100 TB: Spark plans
    the global-sort + limit as per-partition TakeOrdered, so only k rows
    per partition reach the driver stage).

    `DataFrame.sample` cannot do this: it's probabilistic (no exact k),
    partitioning-dependent, and engine-private. Ties are impossible modulo
    md5 collisions."""
    c = F.col(id_col)
    key = F.md5(F.concat_ws(":", F.lit(seed), c.cast("string"))).alias("__sk")
    return (
        df.select("*", key)
        .orderBy("__sk")
        .limit(k)
        .drop("__sk")
    )


def oov_rate(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate of a NEW batch against the
    EXISTING corpus's token vocabulary — the tokenizer-drift signal a
    training pipeline checks before admitting a new data source (a spike
    means new language/domain/encoding, not more of the same).

    Shape: the corpus collapses to its distinct vocab, the batch token
    stream left-joins it, one per-doc aggregate. The vocab join carries NO
    broadcast hint: `F.broadcast()` is mandatory (an oversized build side
    OOMs — it does not fall back), and a 100 TB web corpus's distinct-token
    vocab (typos, URLs, IDs) can run to 10⁹ rows. Natural-language vocabs
    are small, so the planner's size estimate / AQE picks a broadcast hash
    join on its own; past the threshold it degrades to a shuffle join —
    still linear, never a failure. Exact integer counts → oracle-exact."""
    from politicamente_etl_spark.operators.text import tokens

    vocab = (
        corpus.select(F.explode(tokens(text_col)).alias("term"))
        .distinct()
        .withColumn("__in_vocab", F.lit(1))
    )
    toks = batch.select(id_col, F.explode(tokens(text_col)).alias("term"))
    return (
        toks.join(vocab, "term", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


def length_bucketed_batches(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    batch_size: int = 16,
    bucket_edges: tuple[int, ...] = (32, 64, 128),
    id_col: str = "doc_id",
    n_sub_buckets: int = 64,
    seed: str = "lenbatch-v1",
) -> DataFrame:
    """Length-bucketed inference batching: documents are banded by token
    length (padding waste is bounded by the band width, the standard
    dynamic-batching trick), then numbered into fixed-size batches within
    each band. Output adds (len_bucket, len_sub, batch_id, pos_in_batch).

    Scale design: the bucket assignment is a narrow expression; the only
    shuffle is the batching window. Band cardinality alone is tiny
    (len(edges)+1), so a window partitioned by band would be a ≤4-way
    parallel full sort of the corpus at any scale. Instead — exactly the
    `pack_sequences` shape — each band is salted into ``n_sub_buckets``
    independent md5 sub-streams and the window partitions by
    (len_bucket, len_sub): (bands · n_sub_buckets)-way parallelism, each
    partition sorting only its own slice. Batches never span sub-streams
    (at most bands · n_sub_buckets ragged tail batches — noise at corpus
    scale), documents within a batch are still length-adjacent, and batch
    ids are globally unique: (band · n_sub + sub) · 2^32 + local.

    The sub-bucket is md5-deterministic (`hash_bucket`), so every row —
    not just the band histogram — stays oracle-checkable integer
    arithmetic. ``n_sub_buckets=1`` (or 0) recovers the strict global
    per-band order if a consumer's contract needs it."""
    from pyspark.sql import Window

    nt = F.col(n_tokens_col)
    bucket = F.lit(0)
    for i, edge in enumerate(bucket_edges):
        bucket = F.when(nt >= edge, i + 1).otherwise(bucket)
    n_sub = max(1, int(n_sub_buckets))
    w = Window.partitionBy("len_bucket", "len_sub").orderBy(nt, id_col)
    rn = F.row_number().over(w) - F.lit(1)
    return (
        df.withColumn("len_bucket", bucket.cast("int"))
        .withColumn(
            "len_sub", hash_bucket(id_col, seed, n_sub).cast("int")
        )
        .withColumn(
            "batch_id",
            (
                (
                    F.col("len_bucket").cast("bigint") * F.lit(n_sub)
                    + F.col("len_sub").cast("bigint")
                )
                * F.lit(1 << 32)
                + F.floor(rn / F.lit(batch_size))
            ).cast("bigint"),
        )
        .withColumn("pos_in_batch", (rn % F.lit(batch_size)).cast("int"))
    )


def temperature_mix_weights(
    df: DataFrame,
    strata_col: str = "source",
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-scaled source mixing weights — the standard multilingual
    /multi-source rebalancing rule (share^(1/T), renormalized; T>1 upsamples
    the tail, T=1 is proportional). Output per stratum: n_docs, share, and
    the normalized sampling weight; feed the weights into
    `stratified_hash_sample` rates to materialize the mix.

    Scale shape: one partial-agg'd groupBy(strata) — the only corpus-sized
    pass — then two broadcast cross-joins of single-row totals; the strata
    table itself is tiny at any corpus size.

    Cross-engine determinism: share^(1/T) for T=2 is sqrt() (correctly
    rounded in IEEE-754 on every engine, unlike pow(), which is
    implementation-defined in the last ulp); the powered weight is snapped
    to integer micro-units (floor·1e9) so the renormalizing SUM is an
    exact integer sum, and the final weight is one exact double division.
    Non-default temperatures use pow() — document the last-ulp caveat or
    snap harder if an oracle needs them."""
    powered = (
        F.sqrt(F.col("share"))
        if float(temperature) == 2.0
        else F.pow(F.col("share"), F.lit(1.0 / float(temperature)))
    )
    counts = df.groupBy(strata_col).agg(F.count("*").cast("long").alias("n_docs"))
    total = counts.groupBy().agg(F.sum("n_docs").alias("__n_total"))
    shared = (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "share",
            F.col("n_docs").cast("double") / F.col("__n_total").cast("double"),
        )
        .withColumn("__w_micro", F.floor(powered * F.lit(1e9)).cast("long"))
    )
    wtotal = shared.groupBy().agg(F.sum("__w_micro").alias("__w_total"))
    return (
        shared.crossJoin(F.broadcast(wtotal))
        .withColumn(
            "weight",
            F.col("__w_micro").cast("double") / F.col("__w_total").cast("double"),
        )
        .select(strata_col, "n_docs", "share", "weight")
    )


def realize_epoch_mix(
    df: DataFrame,
    weights: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    epoch_frac: float = 1.0,
    seed: str = "epoch-v1",
) -> DataFrame:
    """Materialize a temperature-mixed training epoch: given the per-source
    `weights` table from `temperature_mix_weights`, keep each row with
    probability rate_s = min(1, weight_s · N_total · epoch_frac / n_s) —
    the acceptance rate that makes the REALIZED epoch composition match the
    target mix (upsampled tail sources saturate at rate 1; true upsampling
    beyond 1 is a loader-side repeat, not a filter).

    Membership is the deterministic md5 acceptance of `hash_sample`
    (stable under re-runs, repartitioning, appends — a re-run of the same
    epoch seed reproduces the same dataset bit-for-bit; vary `seed` per
    epoch for fresh draws). The weights table is strata-sized (tiny) so
    the join broadcasts; the filter itself is a pure per-row predicate.

    Rate determinism: weight comes out of integer micro-unit
    renormalization (see temperature_mix_weights), n/N are exact longs,
    and the rate expression is a fixed sequence of double ops — identical
    on any engine, so the oracle reproduces the exact membership."""
    totals = weights.groupBy().agg(F.sum("n_docs").alias("__n_total"))
    w = weights.crossJoin(F.broadcast(totals)).select(
        strata_col,
        F.least(
            F.lit(1.0),
            F.col("weight")
            * F.col("__n_total").cast("double")
            * F.lit(float(epoch_frac))
            / F.col("n_docs").cast("double"),
        ).alias("accept_rate"),
    )
    return df.join(F.broadcast(w), strata_col).filter(
        hash_bucket(key_col, seed).cast("double")
        < F.col("accept_rate") * float(N_BUCKETS)
    )


def epoch_shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_epochs: int = 3,
    n_shards: int = 8,
    seed: str = "epoch-v1",
) -> DataFrame:
    """Deterministic per-epoch training shards: every epoch e assigns
    each row to shard md5(seed:e:id) % n_shards, so (a) reruns of the
    same epoch produce byte-identical shards (resumable training, no
    RNG state to checkpoint), (b) each epoch is an independent
    reshuffle of the SAME corpus (the per-epoch n_docs/id_sum totals
    are invariant — the built-in permutation proof), and (c) a loader
    can seek straight to (epoch, shard) without materializing E copies.
    min_ord is the shard's deterministic stream head (the 60-bit hash
    is also the intra-shard read order).

    Plan/scale: the epoch fan-out is a narrow explode of a literal
    sequence (no data copy until the single groupBy(epoch, shard)
    shuffle, which map-side-combines to E*S rows per partition). A real
    writer swaps the rollup for repartition(epoch, shard) + write —
    same single shuffle, deterministic file contents across retries.

    `id_col` must be NUMERIC for the id_sum permutation proof —
    a string id silently casts to NULL inside SUM and the
    invariant stops proving anything (code-review finding); hash
    string ids to a long first.
    """
    e = F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch")
    rows = df.select(F.col(id_col), e)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("epoch").cast("string"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        rows.withColumn("ord", h)
        .withColumn("shard", (F.col("ord") % n_shards).cast("int"))
        .groupBy(F.col("epoch").cast("int").alias("epoch"), "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(id_col).cast("long").alias("id_sum"),
            F.min("ord").alias("min_ord"),
        )
    )


def select_by_token_budget(
    df: DataFrame,
    budget_tokens: int | None = None,
    group_col: str = "source",
    token_col: str = "n_tokens",
    quality_col: str = "q_milli",
    id_col: str = "doc_id",
    budget_col: str | None = None,
) -> DataFrame:
    """Corpus curation under a token budget: within each group (source/
    domain/language), rank documents best-quality-first and keep them
    until the group's cumulative token count reaches the budget — the
    selection step that turns "we can afford B tokens from this domain"
    into an exact, reproducible document list (the greedy solution to
    the budgeted-selection problem, optimal when quality is the value
    and tokens the cost ratio is already folded into the rank).

    Emits the kept rows with their rank and running total, so the
    selection is auditable (the last kept doc shows how much budget
    remained). A doc is kept iff its whole token count fits: cum <=
    budget with cum including itself — no partial documents.

    Determinism: the order is (quality desc, id) — a total order — and
    the running sum is pinned to ROWS BETWEEN UNBOUNDED PRECEDING AND
    CURRENT ROW on both engines (with a total order, RANGE would equal
    ROWS, but pinning removes the tie hazard by construction).

    Plan/scale: one window partitioned by group — per-group sort, the
    right shape when groups are domains (thousands of them, each a
    shard of the corpus). For a corpus where ONE group dominates, the
    two-pass alternative is an approx-quantile quality threshold
    (`stats.ntile_buckets`'s approx mode) to pre-drop the bulk below
    the cut, then this exact pass on the survivors."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rw = Window.partitionBy(group_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    )
    cols = [group_col, id_col, quality_col, token_col]
    if budget_col is not None:
        cols.append(budget_col)
    out = df.select(
        *cols,
        F.sum(token_col).over(w).cast("long").alias("cum_tokens"),
        F.row_number().over(rw).cast("int").alias("q_rank"),
    )
    # budget_col: per-group budgets (e.g. a temperature-mix allocation)
    # joined onto the rows upstream; scalar budget_tokens otherwise.
    if budget_col is not None:
        return out.filter(F.col("cum_tokens") <= F.col(budget_col))
    return out.filter(F.col("cum_tokens") <= budget_tokens)


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 50,
    id_col: str = "doc_id",
    seed: str = "aes-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    A-ES priority (2006): each row draws u ~ Uniform(0,1] and the top-k
    by u^(1/w) is an exact weighted sample — the one-pass, mergeable
    formulation (union two candidate sets, re-rank, cut at k), which is
    what makes it the distributed/streaming standard for
    quality-weighted corpus subsampling.

    Determinism: u = (h+1)/2^60 from the 60-bit md5 of (seed, id) — no
    RNG state, append-stable like consistent_sample_k, reproducible
    across engines. Ranking uses the log-space key ln(u)/w (monotone in
    u^(1/w)), snapped to integer nano-units so the order is
    engine-exact; ties (astronomically unlikely) break on id.

    Scale shape: narrow scan -> per-row key -> global top-k, which Spark
    plans as TakeOrdered (per-partition heaps of k rows; only k rows per
    partition ever move). Zero-weight/null rows are excluded (their
    sampling probability is 0)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(seed), F.col(id_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.round(
        F.log(u) / F.col(weight_col).cast("double") * F.lit(1e9), 0
    ).cast("long")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            id_col,
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("key_nano"),
        )
        .orderBy(F.col("key_nano").desc(), F.col(id_col))
        .limit(k)
    )


def ipw_telemetry_estimates(
    events: DataFrame,
    rates_buckets: dict[str, int],
    value_col: str = "value",
    type_col: str = "event_type",
    key_col: str = "event_id",
    seed: str = "ipw-v1",
    default_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Inverse-propensity-weighted totals over deterministically sampled
    telemetry: each event type is kept at its own rate (rate_buckets out
    of N_BUCKETS, via the stable md5 bucket of `hash_bucket` — the same
    predicate an edge collector would apply BEFORE shipping, which is
    the point: at 100 TB/day you sample at the source and correct at
    query time), and the estimator re-inflates each stratum by
    N_BUCKETS/rate. Horvitz-Thompson with deterministic, re-run-stable
    membership — no RNG, so the estimate is engine-exact.

    One conditional-aggregation pass emits truth and estimate side by
    side (the sf-scale audit a pipeline runs to validate its rates):
    (event_type, rate_buckets, n_true, n_sampled, true_sum_milli,
    est_sum_milli) where est_sum_milli = sampled_sum * N_BUCKETS div
    rate — integer arithmetic throughout; the read-time error ratio is
    (est - true) / true over two emitted integers.

    Scale shape: scan → per-row hash predicate → one partial-agg'd
    groupBy(type). Nothing else moves.
    """
    rate = F.lit(default_buckets)
    for t, r in sorted(rates_buckets.items()):
        rate = F.when(F.col(type_col) == t, F.lit(r)).otherwise(rate)
    b = hash_bucket(key_col, seed)
    kept = b < rate
    vm = F.floor(F.col(value_col) * 1000).cast("long")
    return (
        events.select(
            F.col(type_col).alias("event_type"),
            rate.cast("long").alias("rate_buckets"),
            vm.alias("vm"),
            kept.cast("long").alias("k"),
        )
        .groupBy("event_type", "rate_buckets")
        .agg(
            F.count("*").cast("long").alias("n_true"),
            F.sum("k").cast("long").alias("n_sampled"),
            F.sum("vm").cast("long").alias("true_sum_milli"),
            F.expr(f"(sum(k * vm) * {N_BUCKETS}) div rate_buckets")
            .cast("long")
            .alias("est_sum_milli"),
        )
    )


def consistent_hash_rebalance(
    df: DataFrame,
    key_col: str,
    n_shards_before: int,
    n_shards_after: int,
    vnodes: int = 16,
    seed: str = "ring-v1",
) -> DataFrame:
    """Consistent-hashing shard assignment audit: place `vnodes` virtual
    nodes per shard on a 2^60 md5 ring, assign every key to the first
    vnode clockwise from its own ring point, and report — per
    before-shard — how many keys MOVE when the ring grows from
    `n_shards_before` to `n_shards_after` shards. Classic Karger ring:
    the moved fraction concentrates around 1 - before/after (≈1/9 for
    8→9) versus ~1 - 1/after under naive modulo resharding; this audit
    is the number a storage migration plan is costed from.

    Engine-exact: ring points are 60-bit integers from md5 hex (the
    repo's conv/CAST idiom), assignment is an integer argmin with
    wraparound handled by +2^61 on vnodes behind the key.

    Scale shape: both vnode tables are bounded by construction
    (shards × vnodes rows) and broadcast; each key scans its candidate
    list map-side (no shuffle), then one groupBy(shard) rollup. The
    keys table never moves.
    """
    spark = df.sparkSession

    def ring(n: int) -> DataFrame:
        rows = [(s, v) for s in range(n) for v in range(vnodes)]
        vn = spark.createDataFrame(rows, ["shard", "vnode"])
        return vn.select(
            "shard",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(seed),
                            F.col("shard").cast("string"),
                            F.col("vnode").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("pt"),
        )

    keys = df.select(
        F.col(key_col).alias("key"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(seed + ":key"), F.col(key_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("kpt"),
    )

    def assign(keys_df: DataFrame, vn: DataFrame, out: str) -> DataFrame:
        c = keys_df.join(F.broadcast(vn))
        eff = F.when(F.col("pt") >= F.col("kpt"), F.col("pt")).otherwise(
            F.col("pt") + F.lit(2**61)
        )
        # min over (eff, shard) structs: deterministic under ring-point
        # ties on both engines (the oracle uses the same lexicographic
        # order via row_number), unlike min_by/arg_min tie behavior.
        return (
            c.withColumn("eff", eff)
            .groupBy("key", "kpt")
            .agg(
                F.min(F.struct("eff", "shard"))["shard"]
                .cast("long")
                .alias(out)
            )
        )

    before = assign(keys, ring(n_shards_before), "shard_before")
    after = assign(keys, ring(n_shards_after), "shard_after")
    return (
        before.join(after, ["key", "kpt"])
        .groupBy("shard_before")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum(
                (F.col("shard_after") != F.col("shard_before")).cast("long")
            )
            .cast("long")
            .alias("n_moved"),
        )
    )


def consistent_sample_k_grouped(
    df: DataFrame,
    k: int,
    group_col: str,
    id_col: str = "doc_id",
    seed: str = "v1",
) -> DataFrame:
    """Per-group exact-k deterministic sample: within every group, the k
    rows whose salted md5 ranks lowest — `consistent_sample_k`'s
    stratified sibling (same bottom-k-sketch stability: run/engine/
    partitioning/append-stable per group, a new row only enters by
    displacing its group's current max).

    Shape: one window partitioned by the group over the md5 key, cut at
    row_number ≤ k — Spark plans it as WindowGroupLimit, i.e. a
    map-side partial bottom-k per (partition, group) before the single
    group shuffle; no global sort, no per-group TakeOrdered fan-out.

    Returns the sampled rows plus their 1-based `sample_rank`.
    """
    from pyspark.sql import Window

    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(key.alias("__sk"))
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def domain_mw_weights(
    losses: DataFrame,
    source_col: str = "source",
    loss_col: str = "loss_micro",
    eta_micro: int = 1_000_000,
) -> DataFrame:
    """One multiplicative-weights (hedge / DoReMi-flavored) update of
    per-domain mixture weights from per-domain losses: domains with
    EXCESS loss over the best domain gain weight proportional to
    exp(η · excess) — the reweighting step of distributionally-robust
    data mixing (Xie et al. 2023), where the next training mixture
    upweights domains the proxy model handles worst.

    Determinism: losses arrive as micro-nat integers; the excess is an
    exact integer; exp() is evaluated once per DOMAIN (a handful of
    rows) on the identical double in both engines and immediately
    snapped to micro units — the same accepted-risk profile as the
    ln() snaps throughout the repo, applied to a bounded row count.
    The normalization is integer ppm division.

    Shape: |domains| rows end-to-end after one broadcast of the 1-row
    min-loss aggregate; nothing corpus-sized happens here (the LOSSES
    are the corpus-sized pass, produced upstream).

    Returns (source, loss_micro, excess_micro, raw_micro, weight_ppm).
    """
    lo = losses.agg(F.min(loss_col).alias("__lo"))
    raw = (
        losses.crossJoin(F.broadcast(lo))
        .select(
            F.col(source_col),
            F.col(loss_col),
            (F.col(loss_col) - F.col("__lo")).cast("long").alias("excess_micro"),
        )
        .withColumn(
            "raw_micro",
            # η·excess is clamped at 12 nats so the ppm normalization
            # (raw_micro·1e6) stays inside BIGINT with wide headroom
            # (e^12·1e6 ≈ 1.6e11); a domain 12 nats worse than the best
            # already takes ~all the weight
            F.expr(
                "CAST(round(exp(least(CAST(excess_micro AS DOUBLE)"
                f" * {eta_micro} / 1e12, 1.2e1)) * 1e6) AS BIGINT)"
            ),
        )
    )
    tot = raw.agg(F.sum("raw_micro").alias("__tot"))
    return raw.crossJoin(F.broadcast(tot)).select(
        source_col,
        loss_col,
        "excess_micro",
        "raw_micro",
        F.expr("raw_micro * 1000000 DIV __tot").cast("long").alias("weight_ppm"),
    )
