"""Round-5 prep batch B: corpus novelty profiling (first-occurrence
8-gram shingles), character-class composition, prefix-duplicate group
detection, deterministic PPS (probability-proportional-to-size)
sampling, int8 embedding-quantization error accounting, binary
changepoint detection on the daily revenue series, and the stationary
distribution of the event-type Markov chain.

Registers beyond the round-5 driver window; parity-checked locally and
rotated into later windows. House rules: integer ppm/milli snapping at
birth, md5 (not rand) for any sampling decision, DECIMAL(38,0)/HUGEINT
for squared statistics, exact-multiple decimal floors instead of DIV
where quotients can exceed BIGINT (Spark DIV always returns LONG)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _register():
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    # -- corpus novelty ------------------------------------------------------

    @register(
        "ngram_novelty_by_source",
        sql="""
        WITH w AS (
            SELECT doc_id, source, string_split(text, ' ') AS words
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, source,
                   md5(array_to_string(words[i:i+7], ' ')) AS h
            FROM w, unnest(generate_series(1, len(words) - 7)) AS t(i)
            WHERE len(words) >= 8
        ), first_seen AS (
            SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h
        )
        SELECT sh.source,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(SUM(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
        FROM sh JOIN first_seen f ON sh.h = f.h
        GROUP BY sh.source
        """,
        tags=("ext-text", "ext-dedup"),
    )
    def q_ngram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Corpus novelty profile: per source, the fraction of its
        distinct 8-gram shingles whose FIRST occurrence (min doc_id
        order) lies in that document — the memorization/duplication
        axis a pretraining pipeline tracks per ingest batch (a source
        whose novelty collapses is re-crawling known text). Shingles
        travel as md5 hashes, never strings.

        Scale shape: one explode + distinct keyed by (doc, hash), one
        min-agg keyed by hash (16-byte shuffle payloads), one hash
        equi-join back, then a bounded per-source rollup — the exact
        shape of the repo's exact-substring dedup costing, reused for
        an audit metric."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
        w = docs.withColumn("words", F.split("text", " ")).filter(
            F.size("words") >= 8
        )
        sh = (
            w.select(
                "doc_id",
                "source",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(words) - 7),"
                        " i -> md5(array_join(slice(words, i, 8), ' ')))"
                    )
                ).alias("h"),
            )
            .distinct()
        )
        first_seen = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
        novel = F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
        return (
            sh.join(first_seen, "h")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_shingles"),
                F.sum(novel).cast("long").alias("n_novel"),
                F.expr(
                    "sum(case when doc_id = first_doc then 1 else 0 end)"
                    " * 1000000 DIV count(*)"
                )
                .cast("long")
                .alias("novelty_ppm"),
            )
        )

    # -- character-class composition ----------------------------------------

    @register(
        "char_class_profile",
        sql="""
        WITH c AS (
            SELECT source,
                   CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                   CAST(SUM(length(text)
                        - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                        AS BIGINT) AS n_letters,
                   CAST(SUM(length(text)
                        - length(regexp_replace(text, '[0-9]', '', 'g')))
                        AS BIGINT) AS n_digits,
                   CAST(SUM(length(text)
                        - length(regexp_replace(text, ' ', '', 'g')))
                        AS BIGINT) AS n_spaces
            FROM documents GROUP BY source
        )
        SELECT source, n_chars,
               CAST(n_letters * 1000000 // n_chars AS BIGINT) AS letter_ppm,
               CAST(n_digits * 1000000 // n_chars AS BIGINT) AS digit_ppm,
               CAST(n_spaces * 1000000 // n_chars AS BIGINT) AS space_ppm,
               CAST((n_chars - n_letters - n_digits - n_spaces) * 1000000
                    // n_chars AS BIGINT) AS other_ppm
        FROM c
        """,
        tags=("ext-text", "ext-quality"),
    )
    def q_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Character-class composition per source (letters / digits /
        spaces / other, integer ppm of total chars) — the script-mix
        audit that catches binary-junk, table-dump, and
        numeric-boilerplate sources before tokenization. Pure codegen'd
        length/regexp expressions, zero-shuffle up to the per-source
        rollup."""
        docs = T(spark, sf_dir, "documents").select("source", "text")
        ln = F.length("text")
        letters = ln - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
        digits = ln - F.length(F.regexp_replace("text", "[0-9]", ""))
        spaces = ln - F.length(F.regexp_replace("text", " ", ""))
        c = docs.groupBy("source").agg(
            F.sum(ln).cast("long").alias("n_chars"),
            F.sum(letters).cast("long").alias("n_letters"),
            F.sum(digits).cast("long").alias("n_digits"),
            F.sum(spaces).cast("long").alias("n_spaces"),
        )
        return c.select(
            "source",
            "n_chars",
            F.expr("n_letters * 1000000 DIV n_chars").cast("long").alias(
                "letter_ppm"
            ),
            F.expr("n_digits * 1000000 DIV n_chars").cast("long").alias(
                "digit_ppm"
            ),
            F.expr("n_spaces * 1000000 DIV n_chars").cast("long").alias(
                "space_ppm"
            ),
            F.expr(
                "(n_chars - n_letters - n_digits - n_spaces) * 1000000"
                " DIV n_chars"
            )
            .cast("long")
            .alias("other_ppm"),
        )

    # -- prefix-duplicate groups --------------------------------------------

    @register(
        "doc_prefix_dup_groups",
        sql="""
        SELECT md5(substring(text, 1, 32)) AS prefix_md5,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(SUM(doc_id) AS BIGINT) AS doc_checksum
        FROM documents
        GROUP BY 1 HAVING COUNT(*) > 1
        """,
        tags=("ext-dedup", "ext-text"),
    )
    def q_doc_prefix_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Shared-prefix duplicate groups: documents whose first 32
        characters coincide (boilerplate headers, template intros, split
        artifacts) — the cheap screen that routes candidates into the
        full MinHash/substring dedup passes. Groups travel as md5 of
        the prefix; the aggregate is one narrow hash-keyed shuffle and
        the HAVING floor keeps output to actual groups."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        return (
            docs.groupBy(
                F.md5(F.substring("text", 1, 32)).alias("prefix_md5")
            )
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.min("doc_id").cast("long").alias("first_doc"),
                F.sum("doc_id").cast("long").alias("doc_checksum"),
            )
            .filter(F.col("n_docs") > 1)
        )

    # -- deterministic PPS sampling -----------------------------------------

    @register(
        "pps_systematic_sample",
        sql="""
        WITH o AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)
                       AS cents,
                   CAST(('0x' || substring(md5(concat_ws(':', 'pps-v1',
                        CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)
                       % 1000000 AS u_ppm
            FROM orders
        ), tot AS (
            SELECT SUM(cents) AS total_cents FROM o
        ), kept AS (
            SELECT o.* FROM o CROSS JOIN tot
            WHERE CAST(o.u_ppm AS HUGEINT) * tot.total_cents
                  < CAST(1000 AS HUGEINT) * o.cents * 1000000
        )
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(cents) AS BIGINT) AS cents_sampled,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
        FROM kept GROUP BY 1
        """,
        tags=("ext-sampling",),
    )
    def q_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Probability-proportional-to-size sample of orders (target
        ~1000): keep an order iff u < T·cents/total, with u a
        deterministic md5 ppm draw keyed by orderkey — the
        weighted-data selection primitive (sample big-ticket rows more)
        with the house no-rand() guarantee: append-stable, re-runnable,
        oracle-checkable. The inclusion test cross-multiplies in
        HUGEINT/LONG so no float threshold exists at all.

        Scale shape: one 1-row broadcast total rides a scan-level
        filter — no shuffle beyond the final bounded rollup; at 100 TB
        the sample emits in one pass over the fact table."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("o_totalprice").cast("decimal(27,2)") * 100)
            .cast("long")
            .alias("cents"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit("pps-v1"),
                                F.col("o_orderkey").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % MICRO
            ).alias("u_ppm"),
        )
        tot = o.agg(F.sum("cents").alias("total_cents"))
        kept = o.join(F.broadcast(tot)).filter(
            F.col("u_ppm").cast("decimal(38,0)") * F.col("total_cents")
            < F.lit(1000).cast("decimal(38,0)") * F.col("cents") * MICRO
        )
        return kept.groupBy("o_orderstatus").agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum("cents").cast("long").alias("cents_sampled"),
            F.sum("o_orderkey").cast("long").alias("key_checksum"),
        )

    # -- int8 quantization error --------------------------------------------

    @register(
        "int8_quantization_report",
        sql="""
        WITH m AS (
            SELECT label, i,
                   CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                       AS mv
            FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
        ), rng AS (
            SELECT label, i, MIN(mv) AS mn, MAX(mv) AS mx
            FROM m GROUP BY 1, 2
        ), err AS (
            SELECT m.label, m.mv, r.mn, r.mx,
                   CASE WHEN r.mx > r.mn THEN
                       m.mv - (r.mn + ((m.mv - r.mn) * 255 // (r.mx - r.mn))
                               * (r.mx - r.mn) // 255)
                   ELSE 0 END AS e
            FROM m JOIN rng r ON m.label = r.label AND m.i = r.i
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(e * e) AS BIGINT) AS sse_milli2,
               CAST(MAX(abs(e)) AS BIGINT) AS max_abs_err_milli
        FROM err GROUP BY label
        """,
        tags=("ext-sim", "ext-embeddings"),
    )
    def q_int8_quantization_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Scalar int8 quantization error accounting per label: embed
        components snap to milli ints at birth (house embedding rule),
        each (label, dim) quantizes to 256 levels over its own
        min-max range, and the report sums the squared reconstruction
        error — the storage-vs-recall tradeoff input for ANN index
        sizing (pairs with the PQ code path, which quantizes
        subvectors instead of scalars). Every step is integer floor
        arithmetic; no float round-trip exists on either engine.

        Scale shape: one posexplode, one (label, dim) min/max agg (640
        groups), one equi-join back, one bounded rollup."""
        emb = T(spark, sf_dir, "embeddings").select("label", "embedding")
        m = emb.select(
            "label", F.posexplode("embedding").alias("i0", "e")
        ).select(
            "label",
            (F.col("i0") + 1).alias("i"),
            F.floor(F.col("e").cast("double") * 1000).cast("long").alias("mv"),
        )
        rng = m.groupBy("label", "i").agg(
            F.min("mv").alias("mn"), F.max("mv").alias("mx")
        )
        err = m.join(rng, ["label", "i"]).select(
            "label",
            F.expr(
                "case when mx > mn then"
                " mv - (mn + ((mv - mn) * 255 DIV (mx - mn))"
                "       * (mx - mn) DIV 255)"
                " else 0 end"
            ).alias("e"),
        )
        return err.groupBy("label").agg(
            F.count("*").cast("long").alias("n_values"),
            F.sum(F.col("e") * F.col("e")).cast("long").alias("sse_milli2"),
            F.max(F.abs("e")).cast("long").alias("max_abs_err_milli"),
        )

    # -- changepoint: binary segmentation, one split ------------------------

    @register(
        "binary_changepoint_daily",
        sql="""
        WITH d AS (
            SELECT date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), pre AS (
            SELECT day, cents,
                   CAST(SUM(cents) OVER (ORDER BY day) AS HUGEINT) AS s,
                   ROW_NUMBER() OVER (ORDER BY day) AS i
            FROM d
        ), tot AS (
            SELECT CAST(SUM(cents) AS HUGEINT) AS stot,
                   COUNT(*) AS n FROM d
        ), gain AS (
            SELECT p.day, p.i, tot.n,
                   (p.s * tot.n - tot.stot * p.i)
                   * (p.s * tot.n - tot.stot * p.i)
                   // (p.i * (tot.n - p.i)) AS f,
                   p.s, tot.stot
            FROM pre p CROSS JOIN tot
            WHERE p.i < tot.n
        )
        SELECT CAST(day AS BIGINT) AS split_day,
               CAST(n AS BIGINT) AS n_days,
               CAST(i AS BIGINT) AS left_days,
               CAST(f // 1000000000000 AS BIGINT) AS gain_e12,
               CAST(s // i AS BIGINT) AS left_mean_cents,
               CAST((stot - s) // (n - i) AS BIGINT) AS right_mean_cents
        FROM gain
        ORDER BY f DESC, day
        LIMIT 1
        """,
        tags=("ext-stats", "ext-temporal"),
    )
    def q_binary_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Single binary-segmentation changepoint on the daily-revenue
        series: the split day maximizing the between-segment
        sum-of-squares gain, via the prefix-sum identity
        gain ∝ (S_i·n − S·i)² / (i·(n−i)) — evaluated entirely in
        DECIMAL(38,0)/HUGEINT (the squared numerator reaches ~1e29;
        Spark's DIV would overflow LONG, so the exact-multiple decimal
        floor (x − pmod(x, d)) / d divides instead, per the house
        DIV-overflow rule). Deterministic argmax (gain desc, day asc).

        Scale shape: the daily aggregate is the data pass; the gain
        scan is one window over the bounded calendar series."""
        o = T(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
        d = (
            o.groupBy(F.unix_date(F.to_date("o_orderdate")).alias("day"))
            .agg(
                (F.sum(F.col("o_totalprice").cast("decimal(27,2)")) * 100)
                .cast("long")
                .alias("cents")
            )
        )
        w = Window.orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        pre = d.select(
            "day",
            "cents",
            F.sum("cents").over(w).cast("decimal(38,0)").alias("s"),
            F.row_number().over(Window.orderBy("day")).alias("i"),
        )
        tot = d.agg(
            F.sum("cents").cast("decimal(38,0)").alias("stot"),
            F.count("*").alias("n"),
        )
        gain = (
            pre.join(F.broadcast(tot))
            .filter(F.col("i") < F.col("n"))
            .withColumn(
                "diff", F.col("s") * F.col("n") - F.col("stot") * F.col("i")
            )
            .withColumn("dsq", F.col("diff") * F.col("diff"))
            .withColumn(
                "den", (F.col("i") * (F.col("n") - F.col("i"))).cast(
                    "decimal(38,0)"
                )
            )
            # exact-multiple decimal floor: dsq ~1e29 exceeds LONG, so
            # (x - pmod(x, d)) / d, never DIV
            .withColumn(
                "f",
                (F.col("dsq") - F.pmod(F.col("dsq"), F.col("den")))
                / F.col("den"),
            )
        )
        first = gain.orderBy(F.col("f").desc(), "day").limit(1)
        e12 = F.lit(1_000_000_000_000).cast("decimal(38,0)")
        return first.select(
            F.col("day").cast("long").alias("split_day"),
            F.col("n").cast("long").alias("n_days"),
            F.col("i").cast("long").alias("left_days"),
            ((F.col("f") - F.pmod(F.col("f"), e12)) / e12)
            .cast("long")
            .alias("gain_e12"),
            F.expr("CAST(s AS BIGINT) DIV i").cast("long").alias(
                "left_mean_cents"
            ),
            F.expr("CAST(stot - s AS BIGINT) DIV (n - i)")
            .cast("long")
            .alias("right_mean_cents"),
        )

    # -- Markov stationary distribution -------------------------------------

    _PI_STEP = """
        pi{n} AS (
            SELECT p.nxt AS state,
                   CAST(SUM(pi{p}.pi_ppm * p.p_ppm) // 1000000 AS BIGINT)
                       AS pi_ppm
            FROM pi{p} JOIN p ON pi{p}.state = p.cur
            GROUP BY p.nxt
        )"""

    @register(
        "markov_stationary_ppm",
        sql="""
        WITH seq AS (
            SELECT event_type AS cur,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
            FROM events
        ), hops AS (
            SELECT cur, nxt, COUNT(*) AS c
            FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
        ), p0 AS (
            SELECT cur, nxt,
                   CAST(c * 1000000 // SUM(c) OVER (PARTITION BY cur)
                        AS BIGINT) AS p_ppm
            FROM hops
        ), states AS (
            SELECT DISTINCT cur AS state FROM p0
            UNION
            SELECT DISTINCT nxt AS state FROM p0
        ), p AS (
            -- sink states (observed only as a target) self-loop, so the
            -- chain conserves mass — the PageRank dangling-node rule
            SELECT cur, nxt, p_ppm FROM p0
            UNION ALL
            SELECT s.state, s.state, CAST(1000000 AS BIGINT)
            FROM states s
            WHERE s.state NOT IN (SELECT DISTINCT cur FROM p0)
        ), pi0 AS (
            SELECT state,
                   CAST(1000000 // (SELECT COUNT(*) FROM states) AS BIGINT)
                       AS pi_ppm
            FROM states
        ), """
        + ",".join(_PI_STEP.format(n=i, p=i - 1) for i in (1, 2, 3))
        + """
        SELECT state, pi_ppm FROM pi3
        """,
        tags=("ext-events", "ext-stats"),
    )
    def q_markov_stationary_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Stationary distribution of the event-type Markov chain by 3
        integer power-iteration steps from uniform: π' = πP with P in
        row-stochastic ppm and every step floored back to ppm — the
        long-run behavior fingerprint that complements the raw
        transition matrix already in the catalog. Sink states (observed
        only as targets) get a self-loop so the chain conserves mass —
        the PageRank dangling-node rule; without it an absorbing state
        drains π to zero (found by the hypothesis mass-conservation
        property). All arithmetic is integer; the ≤k-ppm floor leakage
        per step is deterministic and identical on both engines.

        Scale shape: the per-user lead window is the data pass; the
        chain itself is |event types|² (tiny) and iterates as
        broadcast-sized joins."""
        ev = load_events(spark, sf_dir)
        seq = ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type")
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("nxt"),
        ).filter(F.col("nxt").isNotNull())
        hops = seq.groupBy("cur", "nxt").agg(F.count("*").alias("c"))
        p0 = hops.select(
            "cur",
            "nxt",
            F.expr(
                "c * 1000000 DIV sum(c) OVER (PARTITION BY cur)"
            )
            .cast("long")
            .alias("p_ppm"),
        )
        states = (
            p0.select(F.col("cur").alias("state"))
            .unionByName(p0.select(F.col("nxt").alias("state")))
            .distinct()
        )
        sinks = states.join(
            p0.select(F.col("cur").alias("state")).distinct(),
            "state",
            "left_anti",
        )
        p = p0.unionByName(
            sinks.select(
                F.col("state").alias("cur"),
                F.col("state").alias("nxt"),
                F.lit(MICRO).cast("long").alias("p_ppm"),
            )
        )
        k = states.agg(F.count("*").alias("k"))
        pi = states.join(F.broadcast(k)).select(
            "state", F.expr("1000000 DIV k").cast("long").alias("pi_ppm")
        )
        for _ in range(3):
            pi = (
                pi.join(p, pi.state == p.cur)
                .groupBy(F.col("nxt").alias("state"))
                .agg(
                    F.expr("sum(pi_ppm * p_ppm) DIV 1000000")
                    .cast("long")
                    .alias("pi_ppm")
                )
            )
        return pi.select("state", "pi_ppm")


_register()
