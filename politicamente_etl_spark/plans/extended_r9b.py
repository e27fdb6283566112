"""Round-9 prep, second wave: custom stateful sessionization (gap
semantics in explicit GroupState, cross-batch continuity proven),
Getis-Ord Gi* spatial hotspots, int8 embedding-quantization recall,
and purged walk-forward time splits.

Engine-parity rules as extended_r9: integer snaps at birth, sign-safe
pmod floors, squared statistics in DECIMAL(38,0)/HUGEINT, exact
integer square roots via the float-sqrt ±1 fixup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register_wave2():
    from politicamente_etl_spark.plans.catalog import register

    @register(
        "streaming_custom_sessions",
        sql="""
        WITH o AS (
            SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS prev_t
            FROM events
        ), marked AS (
            SELECT user_id, t,
                   CASE WHEN prev_t IS NULL OR t - prev_t > 21600000000
                        THEN 1 ELSE 0 END AS new_s
            FROM o
        ), sid AS (
            SELECT user_id, t,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sess
            FROM marked
        ), sessions AS (
            SELECT user_id, sess,
                   CAST(MIN(t) AS BIGINT) AS start_us,
                   CAST(MAX(t) AS BIGINT) AS end_us,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM sid GROUP BY 1, 2
        ), last_s AS (
            SELECT user_id, MAX(sess) AS last_sess
            FROM sessions GROUP BY 1
        )
        SELECT s.user_id, s.start_us, s.end_us, s.n_events
        FROM sessions s JOIN last_s USING (user_id)
        WHERE s.sess < last_s.last_sess
        """,
        tags=("ext-stream", "ext-temporal", "ext-events"),
    )
    def q_streaming_custom_sessions(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Gap-based sessions maintained in explicit GroupState across
        two time-ordered micro-batches
        (`streaming.windows.stateful_custom_sessions`, 6 h gap): a
        session spanning the batch boundary must NOT split — the state
        hand-off is the thing under test. Emitted sessions are exactly
        the gap-CLOSED ones (each user's final session stays open in
        state), so the oracle is the batch sessionization minus every
        user's last session — deterministic whatever the trigger
        cadence, unlike timeout-flush designs."""
        from politicamente_etl_spark.streaming import windows as W

        out = W.run_stream_to_table(
            W.stateful_custom_sessions(
                W.stream_events_time_halves(spark, sf_dir)
            ),
            mode="append",
        )
        return out.select("user_id", "start_us", "end_us", "n_events")


_register_wave2()


def _register_wave2b():
    """Getis-Ord Gi* hot spots over the synthetic customer grid."""
    from politicamente_etl_spark.operators import geo
    from politicamente_etl_spark.operators.geo import sql_synth_coords
    from politicamente_etl_spark.plans.catalog import T, register

    lat_sql, lon_sql = sql_synth_coords("c_custkey")
    _fd = "(({v}) - ((({v}) % 20000) + 20000) % 20000) // 20000"
    _isq = (
        "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        " - CASE WHEN CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          > ({x}) THEN 1 ELSE 0 END"
        " + CASE WHEN (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          <= ({x}) THEN 1 ELSE 0 END)"
    )
    _z2 = "CAST(a * a * (n - 1) * 1000000 // b AS BIGINT)"

    @register(
        "getis_ord_hotspots",
        sql=f"""
        WITH pts AS (
            SELECT {lat_sql} AS lat, {lon_sql} AS lon FROM customer
        ), cells AS (
            SELECT CAST({_fd.format(v='lat')} AS BIGINT) AS cx,
                   CAST({_fd.format(v='lon')} AS BIGINT) AS cy,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM pts GROUP BY 1, 2
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q
            FROM cells
        ), offs AS (
            SELECT dx.v AS dx, dy.v AS dy
            FROM (VALUES (-1), (0), (1)) dx(v), (VALUES (-1), (0), (1)) dy(v)
        ), neigh AS (
            SELECT b.cx, b.cy, b.x,
                   CAST(SUM(s2.x) AS BIGINT) AS s_n,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM cells b
            JOIN offs ON TRUE
            JOIN cells s2 ON s2.cx = b.cx - offs.dx AND s2.cy = b.cy - offs.dy
            GROUP BY 1, 2, 3
        ), scored AS (
            SELECT cx, cy, x, s_n, w,
                   CAST(n AS HUGEINT) * s_n - CAST(w AS HUGEINT) * s AS a,
                   (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
                   * (CAST(n AS HUGEINT) * w - CAST(w AS HUGEINT) * w) AS b,
                   n
            FROM neigh CROSS JOIN tot
        )
        SELECT cx, cy, x, s_n, w,
               CAST(CASE WHEN a < 0 THEN -{_isq.format(x=_z2)}
                    ELSE {_isq.format(x=_z2)} END AS BIGINT) AS z_milli
        FROM scored WHERE b > 0
        ORDER BY abs(CAST(CASE WHEN a < 0 THEN -{_isq.format(x=_z2)}
                     ELSE {_isq.format(x=_z2)} END AS BIGINT)) DESC, cx, cy
        LIMIT 20
        """,
        tags=("ext-geo", "ext-stats"),
    )
    def q_getis_ord_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Getis-Ord Gi* hot-spot detection over the synthetic customer
        point grid (20°-cell counts): which cells hold significantly
        more customers than chance, given their 3×3 neighborhood —
        the spatial-statistics classic completing the geo family
        (blocking pairs, DBSCAN, now significance). z in exact milli
        via integer sufficient statistics + exact isqrt; top-20 |z|."""
        cust = T(spark, sf_dir, "customer")
        lat, lon = geo.synth_coords(F.col("c_custkey"))
        cells = (
            cust.select(lat.alias("lat"), lon.alias("lon"))
            .select(
                F.expr(
                    "((lat - pmod(lat, 20000)) DIV 20000)"
                ).cast("long").alias("cx"),
                F.expr(
                    "((lon - pmod(lon, 20000)) DIV 20000)"
                ).cast("long").alias("cy"),
            )
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).cast("long").alias("x"))
        )
        return geo.getis_ord_hotspots(cells)


_register_wave2b()


def _register_wave2c():
    """int8 scalar-quantization recall: how much retrieval quality does
    8-bit embedding compression cost? (The memory-bandwidth lever every
    vector store pulls; PQ covers codebooks, this covers scalar int8.)"""
    from politicamente_etl_spark.operators import sim
    from politicamente_etl_spark.plans.catalog import T, register

    # milli-int embeddings, per-vector max-abs scale to int8 (floor),
    # signed-square cosine sort key: all exact integers
    _M = "list_transform({v}, x -> CAST(floor(x * 1000) AS BIGINT))"
    _MAXABS = "greatest(list_max(list_transform({m}, x -> abs(x))), 1)"
    _QD = (
        "list_transform({m}, x -> (x * 127 - ((x * 127 % {s})"
        " + {s}) % {s}) // {s})"
    )
    _IDOT = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " s -> s[1] * s[2]), (acc, v) -> acc + v)"
    )

    @register(
        "int8_quantization_recall",
        sql=f"""
        WITH m AS (
            SELECT vec_id, {_M.format(v='embedding')} AS mv, embedding
            FROM embeddings
        ), qz AS (
            SELECT vec_id, embedding,
                   {_QD.format(m='mv', s=_MAXABS.format(m='mv'))} AS qv
            FROM m
        ), qs AS (
            SELECT vec_id AS query_id, qv AS q_qv
            FROM qz WHERE vec_id < 8
        ), pair AS (
            SELECT qs.query_id, c.vec_id,
                   CAST({_IDOT.format(a='c.qv', b='qs.q_qv')} AS HUGEINT)
                       AS dot,
                   CAST({_IDOT.format(a='c.qv', b='c.qv')} AS HUGEINT)
                       AS n2c,
                   CAST({_IDOT.format(a='qs.q_qv', b='qs.q_qv')} AS HUGEINT)
                       AS n2q
            FROM qz c CROSS JOIN qs
        ), keyed AS (
            SELECT query_id, vec_id,
                   CASE WHEN n2c = 0 OR n2q = 0 THEN 0
                        ELSE dot * abs(dot) * 1000000 // (n2c * n2q)
                   END AS skey
            FROM pair
        ), approx AS (
            SELECT query_id, vec_id
            FROM keyed
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY skey DESC, vec_id) <= 10
        ), q8 AS (
            SELECT vec_id AS query_id, embedding AS q_vec
            FROM embeddings WHERE vec_id < 8
        ), ex AS (
            SELECT q8.query_id, e.vec_id,
                   list_reduce(list_transform(list_zip(e.embedding, q8.q_vec),
                       s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)),
                       (acc, v) -> acc + v)
                   / (sqrt(list_reduce(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                        (acc, v) -> acc + v))
                      * sqrt(list_reduce(list_transform(q8.q_vec,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                        (acc, v) -> acc + v))) AS cos_sim
            FROM embeddings e CROSS JOIN q8
        ), truth AS (
            SELECT query_id, vec_id
            FROM ex
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) <= 10
        )
        SELECT a.query_id,
               CAST(COUNT(t.vec_id) AS BIGINT) AS n_hits,
               CAST(COUNT(t.vec_id) * 1000 // 10 AS BIGINT) AS recall_milli
        FROM approx a
        LEFT JOIN truth t
          ON t.query_id = a.query_id AND t.vec_id = a.vec_id
        GROUP BY a.query_id
        """,
        tags=("ext-sim", "ext-quality"),
    )
    def q_int8_quantization_recall(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Recall@10 of int8-quantized cosine retrieval against the
        float exact top-10: per-vector max-abs scalar quantization to
        [−127, 127] (floor), ranking by the exact-integer signed-square
        cosine key dot·|dot|·10⁶/(‖q‖²·‖c‖²) — no float creeps into
        the approximate path, so even the quantized ranking
        hash-matches the oracle. The eval every vector store runs
        before flipping on 8-bit storage (4× memory ÷, SIMD dots)."""
        emb = T(spark, sf_dir, "embeddings")
        m = emb.select(
            "vec_id",
            "embedding",
            F.expr(
                "transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))"
            ).alias("mv"),
        )
        qz = m.withColumn(
            "s", F.expr("greatest(array_max(transform(mv, x -> abs(x))), 1L)")
        ).select(
            "vec_id",
            "embedding",
            F.expr(
                "transform(mv, x ->"
                " (x * 127 - pmod(x * 127, s)) DIV s)"
            ).alias("qv"),
        )
        qs = qz.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
        )

        # Spark twin of the integer dot: zip_with + aggregate
        def sdot(a, b):
            return (
                f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
                " 0L, (acc, v) -> acc + v)"
            )

        pair = qz.crossJoin(F.broadcast(qs)).select(
            "query_id",
            "vec_id",
            F.expr(sdot("qv", "q_qv")).cast("decimal(38,0)").alias("dot"),
            F.expr(sdot("qv", "qv")).cast("decimal(38,0)").alias("n2c"),
            F.expr(sdot("q_qv", "q_qv")).cast("decimal(38,0)").alias("n2q"),
        )
        keyed = pair.select(
            "query_id",
            "vec_id",
            F.expr(
                "CASE WHEN n2c = 0 OR n2q = 0 THEN CAST(0 AS decimal(38,0))"
                " ELSE dot * abs(dot) * 1000000 DIV (n2c * n2q) END"
            ).alias("skey"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("skey").desc(), F.col("vec_id")
        )
        approx = (
            keyed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("query_id", "vec_id")
        )
        truth = sim.cosine_topk(
            emb, emb.filter(F.col("vec_id") < 8), k=10
        ).select("query_id", "vec_id", F.lit(1).alias("hit"))
        return (
            approx.join(truth, ["query_id", "vec_id"], "left")
            .groupBy("query_id")
            .agg(
                F.count("hit").cast("long").alias("n_hits"),
                F.expr("CAST(count(hit) * 1000 DIV 10 AS BIGINT)").alias(
                    "recall_milli"
                ),
            )
        )


_register_wave2c()


def _register_wave2d():
    """Purged walk-forward time splits (de Prado-style embargo): the
    leakage-safe backtest folds a temporal model trains on."""
    from politicamente_etl_spark.plans.catalog import load_events, register

    @register(
        "purged_walkforward_folds",
        sql="""
        WITH d AS (
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
            FROM events
        ), rng AS (
            SELECT MIN(day) AS dmin, MAX(day) AS dmax,
                   MAX(day) - MIN(day) + 1 AS span
            FROM d
        ), folds AS (
            SELECT k,
                   dmin + (span * k) // 4 AS b_lo,
                   CASE WHEN k = 3 THEN dmax + 1
                        ELSE dmin + (span * (k + 1)) // 4 END AS b_hi
            FROM rng, (VALUES (1), (2), (3)) t(k)
        )
        SELECT CAST(k AS BIGINT) AS fold,
               CAST(SUM(CASE WHEN day < b_lo - 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train,
               CAST(SUM(CASE WHEN day >= b_lo - 2 AND day < b_lo
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_embargoed,
               CAST(SUM(CASE WHEN day >= b_lo AND day < b_hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
               CAST(MAX(CASE WHEN day < b_lo - 2 THEN day END) AS BIGINT)
                   AS train_max_day,
               CAST(MIN(CASE WHEN day >= b_lo AND day < b_hi THEN day END)
                    AS BIGINT) AS val_min_day
        FROM d CROSS JOIN folds
        GROUP BY k
        """,
        tags=("ext-sampling", "ext-temporal", "ext-events"),
    )
    def q_purged_walkforward_folds(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Walk-forward backtest folds with a 2-day EMBARGO purge
        (López de Prado): validation quartiles k = 1..3, training =
        strictly earlier days minus the embargo band, so labels whose
        horizon straddles the boundary can't leak — the time-series
        counterpart of stratified_kfold_assign (which shuffles, and
        therefore must never be used on temporal data). Emits per-fold
        counts plus the realized train/val day gap as the in-plan
        proof train_max_day ≤ val_min_day − 3. One 3-row fold table
        broadcast onto a single events pass; conditional aggregation,
        no window."""
        ev = load_events(spark, sf_dir)
        d = ev.select(
            F.expr("unix_micros(ts) div 86400000000")
            .cast("long")
            .alias("day")
        )
        rng = d.agg(
            F.min("day").alias("dmin"),
            F.max("day").alias("dmax"),
            (F.max("day") - F.min("day") + 1).alias("span"),
        )
        folds = (
            spark.range(1, 4)
            .select(F.col("id").cast("int").alias("k"))
            .join(F.broadcast(rng))
            .select(
                "k",
                F.expr("dmin + (span * k) DIV 4").alias("b_lo"),
                F.expr(
                    "CASE WHEN k = 3 THEN dmax + 1"
                    " ELSE dmin + (span * (k + 1)) DIV 4 END"
                ).alias("b_hi"),
            )
        )
        return (
            d.join(F.broadcast(folds))
            .groupBy(F.col("k").cast("long").alias("fold"))
            .agg(
                F.sum((F.col("day") < F.col("b_lo") - 2).cast("long"))
                .cast("long")
                .alias("n_train"),
                F.sum(
                    (
                        (F.col("day") >= F.col("b_lo") - 2)
                        & (F.col("day") < F.col("b_lo"))
                    ).cast("long")
                )
                .cast("long")
                .alias("n_embargoed"),
                F.sum(
                    (
                        (F.col("day") >= F.col("b_lo"))
                        & (F.col("day") < F.col("b_hi"))
                    ).cast("long")
                )
                .cast("long")
                .alias("n_val"),
                F.max(
                    F.when(F.col("day") < F.col("b_lo") - 2, F.col("day"))
                )
                .cast("long")
                .alias("train_max_day"),
                F.min(
                    F.when(
                        (F.col("day") >= F.col("b_lo"))
                        & (F.col("day") < F.col("b_hi")),
                        F.col("day"),
                    )
                )
                .cast("long")
                .alias("val_min_day"),
            )
        )


_register_wave2d()


def _register_wave3():
    """Wave 3: word2vec negative-sampling weights (exact integer
    fourth root — c^0.75 with no float exp/ln), the A/B sample-ratio-
    mismatch gate, and inter-arrival burstiness (Goh-Barabási)."""
    from politicamente_etl_spark.operators.sampling import (
        hash_bucket,
        sql_hash_bucket,
    )
    from politicamente_etl_spark.plans.catalog import (
        T,
        load_events,
        register,
    )

    _ISQ = (
        "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        " - CASE WHEN CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          > ({x}) THEN 1 ELSE 0 END"
        " + CASE WHEN (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          <= ({x}) THEN 1 ELSE 0 END)"
    )

    @register(
        "negative_sampling_weights",
        sql=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ), c AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM toks GROUP BY 1
        ), w AS (
            SELECT tok, cnt,
                   {_ISQ.format(x=_ISQ.format(x="cnt * cnt * cnt"))} AS w_h
            FROM c
        ), tot AS (
            SELECT CAST(SUM(w_h) AS BIGINT) AS w_sum FROM w
        )
        SELECT tok, cnt, CAST(w_h AS BIGINT) AS w_h,
               CAST(w_h * 1000000 // w_sum AS BIGINT) AS p_ppm
        FROM w, tot
        ORDER BY cnt DESC, tok
        LIMIT 100
        """,
        tags=("ext-text", "ext-sampling", "ext-docs"),
    )
    def q_negative_sampling_weights(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """word2vec negative-sampling distribution: p(w) ∝ count^0.75
        (Mikolov et al. 2013) computed EXACTLY in integers — c^0.75 =
        ⌊⁴√c³⌋ via two composed exact isqrts (⌊√⌊√x⌋⌋ = ⌊x^¼⌋, so no
        float pow/exp/ln enters the weights). Top-100 tokens with
        floored-ppm sampling mass; one token aggregate, |vocab|-sized
        arithmetic after. c³ bounds the exact-isqrt domain at
        c ≲ 1.6e5 per token at this fixture's double-sqrt precision —
        past that, snap counts to kilo-units first (documented)."""
        toks = T(spark, sf_dir, "documents").select(
            F.explode(F.split("text", " ")).alias("tok")
        )
        c = toks.groupBy("tok").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        isq = _ISQ.replace("//", "DIV")
        w = c.select(
            "tok",
            "cnt",
            F.expr(isq.format(x=isq.format(x="cnt * cnt * cnt")))
            .cast("long")
            .alias("w_h"),
        )
        tot = w.agg(F.sum("w_h").cast("long").alias("w_sum"))
        return (
            w.join(F.broadcast(tot))
            .select(
                "tok",
                "cnt",
                "w_h",
                F.expr("w_h * 1000000 DIV w_sum").cast("long").alias("p_ppm"),
            )
            .orderBy(F.col("cnt").desc(), "tok")
            .limit(100)
        )

    _split_sql = sql_hash_bucket("doc_id", seed="split-v1", n_buckets=10_000)

    @register(
        "ab_split_srm_check",
        sql=f"""
        WITH b AS (
            SELECT CASE WHEN {_split_sql} < 9000 THEN 'train'
                        WHEN {_split_sql} < 9500 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        ), o AS (
            SELECT split, CAST(COUNT(*) AS BIGINT) AS obs FROM b GROUP BY 1
        ), e AS (
            SELECT * FROM (VALUES ('train', 9000), ('val', 500),
                                  ('test', 500)) t(split, k)
        ), n AS (
            SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o
        ), terms AS (
            SELECT o.split, o.obs, e.k, n.n,
                   CAST((10000 * o.obs - n.n * e.k)
                        * (10000 * o.obs - n.n * e.k) * 1000
                        // (10000 * CAST(n.n AS HUGEINT) * e.k) AS BIGINT)
                       AS term_milli
            FROM o JOIN e USING (split) CROSS JOIN n
        )
        SELECT split, obs, CAST(k AS BIGINT) AS expected_per_10k,
               term_milli,
               CAST(SUM(term_milli) OVER () AS BIGINT) AS chi2_milli,
               CAST(SUM(term_milli) OVER () > 13816 AS INT) AS srm_alarm
        FROM terms
        """,
        tags=("ext-sampling", "ext-stats", "ext-docs"),
    )
    def q_ab_split_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sample-ratio-mismatch gate on the 90/5/5 hash split: χ²
        goodness-of-fit of observed split counts against the intended
        proportions — THE first check before reading any experiment
        (a biased assignment invalidates everything downstream).
        Exact integer terms via 10⁴-scaled expected mass; χ²₂ > 13.816
        milli-threshold flags at p < 0.001. The 3-row window is over
        the split summary, not data."""
        docs = T(spark, sf_dir, "documents").select("doc_id")
        b = docs.select(
            F.when(
                hash_bucket("doc_id", seed="split-v1", n_buckets=10_000)
                < 9000,
                "train",
            )
            .when(
                hash_bucket("doc_id", seed="split-v1", n_buckets=10_000)
                < 9500,
                "val",
            )
            .otherwise("test")
            .alias("split")
        )
        o = b.groupBy("split").agg(
            F.count(F.lit(1)).cast("long").alias("obs")
        )
        e = spark.createDataFrame(
            [("train", 9000), ("val", 500), ("test", 500)],
            "split string, k long",
        )
        n = o.agg(F.sum("obs").cast("long").alias("n"))
        from pyspark.sql import Window

        terms = (
            o.join(F.broadcast(e), "split")
            .join(F.broadcast(n))
            .select(
                "split",
                "obs",
                F.col("k").alias("expected_per_10k"),
                F.expr(
                    "CAST((10000 * obs - n * k) * (10000 * obs - n * k)"
                    " * 1000 DIV (10000 * CAST(n AS decimal(38,0)) * k)"
                    " AS BIGINT)"
                ).alias("term_milli"),
            )
        )
        w = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return terms.select(
            "split",
            "obs",
            "expected_per_10k",
            "term_milli",
            F.sum("term_milli").over(w).cast("long").alias("chi2_milli"),
            (F.sum("term_milli").over(w) > 13816).cast("int").alias(
                "srm_alarm"
            ),
        )

    @register(
        "user_burstiness_profile",
        sql=f"""
        WITH g AS (
            SELECT user_id,
                   (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id)) // 1000000 AS gap_s
            FROM events
        ), st AS (
            SELECT user_id,
                   CAST(COUNT(gap_s) AS BIGINT) AS m,
                   CAST(SUM(gap_s) AS BIGINT) AS s,
                   CAST(SUM(gap_s * gap_s) AS BIGINT) AS q
            FROM g WHERE gap_s IS NOT NULL
            GROUP BY 1 HAVING COUNT(gap_s) >= 2
        )
        SELECT user_id, m, s, q,
               CAST({_ISQ.format(x="m * q - s * s")} AS BIGINT) AS r,
               CAST(CASE WHEN {_ISQ.format(x="m * q - s * s")} + s = 0
                    THEN 0 ELSE
                    (({_ISQ.format(x="m * q - s * s")} - s) * 1000
                     - ((({_ISQ.format(x="m * q - s * s")} - s) * 1000)
                        % ({_ISQ.format(x="m * q - s * s")} + s)
                        + ({_ISQ.format(x="m * q - s * s")} + s))
                       % ({_ISQ.format(x="m * q - s * s")} + s))
                    // ({_ISQ.format(x="m * q - s * s")} + s)
                    END AS BIGINT) AS b_milli
        FROM st
        """,
        tags=("ext-events", "ext-stats", "ext-temporal"),
    )
    def q_user_burstiness_profile(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Goh-Barabási burstiness of each user's inter-event gaps:
        B = (σ−μ)/(σ+μ) ∈ (−1, 1] — +1 bursty, 0 Poisson, −1 metronome.
        The m's cancel, so B = (√(mQ−S²) − S)/(√(mQ−S²) + S) over the
        integer gap sufficient statistics (seconds — the unit keeps
        mQ inside the exact-isqrt domain; micros would not), one exact
        isqrt + one sign-safe floor division. Gap extraction is one
        user-partitioned lag window; stats are one aggregate."""
        ev = load_events(spark, sf_dir)
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.expr("unix_micros(ts)"), "event_id"
        )
        g = ev.select(
            "user_id",
            F.expr(
                "(unix_micros(ts) - lag(unix_micros(ts)) OVER ("
                "PARTITION BY user_id ORDER BY unix_micros(ts), event_id))"
                " div 1000000"
            ).alias("gap_s"),
        )
        st = (
            g.filter(F.col("gap_s").isNotNull())
            .groupBy("user_id")
            .agg(
                F.count("gap_s").cast("long").alias("m"),
                F.sum("gap_s").cast("long").alias("s"),
                F.sum(F.col("gap_s") * F.col("gap_s"))
                .cast("long")
                .alias("q"),
            )
            .filter(F.col("m") >= 2)
        )
        isq = _ISQ.replace("//", "DIV")
        r = isq.format(x="m * q - s * s")
        fd = (
            f"((({r} - s) * 1000"
            f" - pmod(({r} - s) * 1000, {r} + s)) DIV ({r} + s))"
        )
        return st.select(
            "user_id",
            "m",
            "s",
            "q",
            F.expr(r).cast("long").alias("r"),
            F.expr(
                f"CAST(CASE WHEN {r} + s = 0 THEN 0 ELSE {fd} END AS BIGINT)"
            ).alias("b_milli"),
        )


_register_wave3()
