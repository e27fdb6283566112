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


def _register_wave4():
    """Wave 4: multimodal frame-fingerprint near-dup — the video-dedup
    shape (sample frames → fingerprint → inverted-index pair join) run
    end-to-end through the REAL mapInPandas frame-sampling seam with an
    injected deterministic extractor (the documented codec slot)."""
    from politicamente_etl_spark.operators import multimodal
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "frame_hash_dedup_pairs",
        sql="""
        WITH f AS (
            SELECT doc_id, md5(substr(text, 1 + i * 64, 64)) AS fh
            FROM documents,
                 UNNEST(generate_series(0,
                     CAST(length(text) // 64 AS BIGINT) - 1)) u(i)
        ), d AS (
            SELECT DISTINCT doc_id, fh FROM f
        ), nf AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
        ), p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM d a JOIN d b ON a.fh = b.fh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT p.doc_a, p.doc_b, p.n_common,
               na.n AS n_frames_a, nb.n AS n_frames_b,
               CAST(p.n_common * 1000000 // least(na.n, nb.n) AS BIGINT)
                   AS overlap_ppm
        FROM p
        JOIN nf na ON na.doc_id = p.doc_a
        JOIN nf nb ON nb.doc_id = p.doc_b
        """,
        tags=("ext-multimodal", "ext-dedup"),
    )
    def q_frame_hash_dedup_pairs(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Cross-video near-duplicate detection by frame fingerprints —
        the standard video-dedup pipeline shape: sample frames
        (`multimodal.sample_frames`, the real mapInPandas 1→N explode
        with the codec slot INJECTED as a deterministic 64-byte
        chunker, media = the documents' byte payloads), fingerprint
        each frame (JVM md5 over the binary — the decode pass is the
        only Python), then an inverted-index equi-join on frame hash
        (never |videos|² — the same shape as ngram_jaccard_pairs).
        Emits sharing pairs with the overlap share of the smaller
        frame set."""
        docs = multimodal.with_binary_payload(
            T(spark, sf_dir, "documents").select("doc_id", "text")
        )

        def chunker(payload: bytes, every_n: int) -> list:
            usable = (len(payload) // 64) * 64
            return [
                payload[i : i + 64] for i in range(0, usable, 64 * every_n)
            ]

        frames = multimodal.sample_frames(
            docs, every_n=1, frame_extractor=chunker
        )
        d = frames.select(
            "doc_id", F.md5(F.col("frame")).alias("fh")
        ).distinct()
        nf = d.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        a = d.select(F.col("doc_id").alias("doc_a"), "fh")
        b = d.select(F.col("doc_id").alias("doc_b"), "fh")
        p = (
            a.join(b, "fh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        )
        na = nf.select(
            F.col("doc_id").alias("doc_a"), F.col("n").alias("n_frames_a")
        )
        nb = nf.select(
            F.col("doc_id").alias("doc_b"), F.col("n").alias("n_frames_b")
        )
        return (
            p.join(F.broadcast(na), "doc_a")
            .join(F.broadcast(nb), "doc_b")
            .select(
                "doc_a",
                "doc_b",
                "n_common",
                "n_frames_a",
                "n_frames_b",
                F.expr(
                    "n_common * 1000000 DIV least(n_frames_a, n_frames_b)"
                )
                .cast("long")
                .alias("overlap_ppm"),
            )
        )


_register_wave4()


def _register_wave4b():
    """Seasonal-naive backtest with MASE — the scale-free forecast
    error (Hyndman & Koehler 2006) that lets per-nation errors be
    compared and averaged, completing holt_backtest_report's absolute
    errors."""
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "seasonal_naive_mase",
        sql="""
        WITH o AS (
            SELECT c_nationkey AS nation,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS day,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), rng AS (
            SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM o
        ), cal AS (
            SELECT n.nation, u.d AS day
            FROM (SELECT DISTINCT nation FROM o) n,
                 rng, UNNEST(generate_series(rng.dmin, rng.dmax)) u(d)
        ), daily AS (
            SELECT cal.nation, cal.day,
                   CAST(COALESCE(SUM(o.cents), 0) AS BIGINT) AS y
            FROM cal LEFT JOIN o
              ON o.nation = cal.nation AND o.day = cal.day
            GROUP BY 1, 2
        ), lagged AS (
            SELECT nation, day, y,
                   lag(y, 1) OVER (PARTITION BY nation ORDER BY day) AS y1,
                   lag(y, 7) OVER (PARTITION BY nation ORDER BY day) AS y7,
                   MAX(day) OVER () AS dmax
            FROM daily
        ), parts AS (
            SELECT nation,
                   CAST(SUM(CASE WHEN day <= dmax - 7 AND y1 IS NOT NULL
                                 THEN abs(y - y1) END) AS BIGINT)
                       AS train_abs_diff,
                   CAST(SUM(CASE WHEN day <= dmax - 7 AND y1 IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS m_train,
                   CAST(SUM(CASE WHEN day > dmax - 7
                                 THEN abs(y - y7) END) AS BIGINT)
                       AS test_abs_err
            FROM lagged
            GROUP BY 1
        )
        SELECT nation, m_train, train_abs_diff, test_abs_err,
               CAST(CASE WHEN train_abs_diff = 0 THEN NULL
                    ELSE CAST(test_abs_err AS HUGEINT) * m_train * 1000
                         // (7 * CAST(train_abs_diff AS HUGEINT)) END
                    AS BIGINT) AS mase_milli
        FROM parts
        """,
        tags=("ext-temporal", "ext-stats"),
    )
    def q_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Seasonal-naive (lag-7) forecast of each nation's last week
        of daily revenue, scored by MASE: test MAE over the in-sample
        one-step naive MAE — scale-free, so a 25-nation error sheet is
        comparable row to row (mase_milli < 1000 beats the naive).
        Zero-filled calendar per nation (the grid is bounded by
        wall-clock days × nations); lag windows walk that grid, and the
        corpus-sized work is the one daily rollup."""
        from pyspark.sql import Window

        o = (
            T(spark, sf_dir, "orders")
            .join(
                F.broadcast(
                    T(spark, sf_dir, "customer").select(
                        "c_custkey", "c_nationkey"
                    )
                ),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select(
                F.col("c_nationkey").alias("nation"),
                F.unix_date(F.to_date("o_orderdate"))
                .cast("long")
                .alias("day"),
                F.floor(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
        )
        rng = o.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
        cal = (
            o.select("nation")
            .distinct()
            .join(F.broadcast(rng))
            .select(
                "nation",
                F.explode(F.expr("sequence(dmin, dmax)")).alias("day"),
            )
        )
        daily = (
            cal.join(o, ["nation", "day"], "left")
            .groupBy("nation", "day")
            .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("y"))
        )
        w = Window.partitionBy("nation").orderBy("day")
        wall = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        lagged = daily.select(
            "nation",
            "day",
            "y",
            F.lag("y", 1).over(w).alias("y1"),
            F.lag("y", 7).over(w).alias("y7"),
            F.max("day").over(wall).alias("dmax"),
        )
        parts = lagged.groupBy("nation").agg(
            F.sum(
                F.when(
                    (F.col("day") <= F.col("dmax") - 7)
                    & F.col("y1").isNotNull(),
                    F.abs(F.col("y") - F.col("y1")),
                )
            )
            .cast("long")
            .alias("train_abs_diff"),
            F.sum(
                (
                    (F.col("day") <= F.col("dmax") - 7)
                    & F.col("y1").isNotNull()
                ).cast("long")
            )
            .cast("long")
            .alias("m_train"),
            F.sum(
                F.when(
                    F.col("day") > F.col("dmax") - 7,
                    F.abs(F.col("y") - F.col("y7")),
                )
            )
            .cast("long")
            .alias("test_abs_err"),
        )
        return parts.select(
            "nation",
            "m_train",
            "train_abs_diff",
            "test_abs_err",
            F.expr(
                "CAST(CASE WHEN train_abs_diff = 0 THEN NULL"
                " ELSE CAST(test_abs_err AS decimal(38,0)) * m_train * 1000"
                " DIV (7 * CAST(train_abs_diff AS decimal(38,0))) END"
                " AS BIGINT)"
            ).alias("mase_milli"),
        )


_register_wave4b()


def _register_wave5():
    """Wave 5: shingle containment (the asymmetric dedup measure
    Jaccard misses) and 1-D Wasserstein drift (the integral ECDF gap
    next to KS's max gap)."""
    from politicamente_etl_spark.operators import dedup
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "shingle_containment_pairs",
        sql="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   unnest([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                           for i in range(1, len(toks) - 1)]) AS sh
            FROM t
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
            FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, n_common,
               na.n_sh AS n_a, nb.n_sh AS n_b,
               CAST(n_common * 1000000 // na.n_sh AS BIGINT)
                   AS contain_a_ppm,
               CAST(n_common * 1000000 // nb.n_sh AS BIGINT)
                   AS contain_b_ppm
        FROM inter
        JOIN sizes na ON inter.doc_a = na.doc_id
        JOIN sizes nb ON inter.doc_b = nb.doc_id
        WHERE greatest(n_common * 1000000 // na.n_sh,
                       n_common * 1000000 // nb.n_sh) >= 600000
        """,
        tags=("ext-dedup", "ext-docs"),
    )
    def q_shingle_containment_pairs(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Asymmetric 3-gram containment pairs
        (`dedup.containment_pairs`): C(A→B) = |A∩B|/|A| in floored ppm,
        both directions, pairs kept when the larger direction ≥ 0.6 —
        catches the short-doc-inside-long-doc inclusion that Jaccard's
        symmetric denominator dilutes below any usable threshold. Same
        inverted-index join as the Jaccard verifier."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        return dedup.containment_pairs(docs)

    @register(
        "wasserstein_length_drift",
        sql="""
        WITH base AS (
            SELECT source AS g,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS v
            FROM documents
        ), gv AS (
            SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2
        ), pv AS (
            SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM gv GROUP BY 1
        ), vals AS (
            SELECT v,
                   CAST(SUM(cv) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS ct,
                   lead(v) OVER (ORDER BY v) AS v_next
            FROM pv
        ), grps AS (
            SELECT g, CAST(SUM(c) AS BIGINT) AS n1 FROM gv GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(n1) AS BIGINT) AS n FROM grps
        ), cum AS (
            SELECT grps.g, grps.n1, tot.n, vals.v, vals.ct, vals.v_next,
                   CAST(SUM(COALESCE(gv.c, 0)) OVER (
                        PARTITION BY grps.g ORDER BY vals.v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS c1
            FROM grps CROSS JOIN vals CROSS JOIN tot
            LEFT JOIN gv ON grps.g = gv.g AND vals.v = gv.v
        )
        SELECT g AS source, MIN(n1) AS n1, MIN(n - n1) AS n2,
               CAST(SUM(CASE WHEN v_next IS NULL THEN 0
                        ELSE abs(CAST(c1 AS HUGEINT) * (n - n1)
                                 - CAST(ct - c1 AS HUGEINT) * n1)
                             * (v_next - v) END) AS BIGINT) AS w1_num,
               CAST(MIN(CAST(n1 AS HUGEINT) * (n - n1)) AS BIGINT) AS w1_den,
               CAST(SUM(CASE WHEN v_next IS NULL THEN 0
                        ELSE abs(CAST(c1 AS HUGEINT) * (n - n1)
                                 - CAST(ct - c1 AS HUGEINT) * n1)
                             * (v_next - v) END) * 1000
                    // MIN(CAST(n1 AS HUGEINT) * (n - n1)) AS BIGINT)
                   AS w1_milli_tokens
        FROM cum GROUP BY g
        """,
        tags=("ext-stats", "ext-docs"),
    )
    def q_wasserstein_length_drift(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """1-D Wasserstein (earth-mover) distance between each source's
        token-count distribution and the rest — the INTEGRAL of the
        ECDF gap (how far mass must move, in tokens), complementing
        KS's max gap (a distribution can pass KS yet carry large
        transport cost in a long tail). Exact integers: W₁ = Σ over
        the merged value grid of |c1·n2 − c2·n1|·Δv / (n1·n2), emitted
        as the (num, den) pair + floored milli-tokens. Same bounded
        (source, value) grid and windows as ks_one_vs_rest."""
        from pyspark.sql import Window

        docs = T(spark, sf_dir, "documents").select(
            "source",
            F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("v"),
        )
        gv = docs.groupBy(F.col("source").alias("g"), "v").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        pv = gv.groupBy("v").agg(F.sum("c").alias("cv"))
        w_all = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        vals = pv.select(
            "v",
            F.sum("cv").over(w_all).cast("long").alias("ct"),
            F.lead("v").over(Window.orderBy("v")).alias("v_next"),
        )
        grps = gv.groupBy("g").agg(F.sum("c").cast("long").alias("n1"))
        tot = grps.agg(F.sum("n1").cast("long").alias("n"))
        w_g = (
            Window.partitionBy("g")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            grps.join(F.broadcast(vals))
            .join(F.broadcast(tot))
            .join(gv, ["g", "v"], "left")
            .withColumn(
                "c1", F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w_g)
            )
        )
        return (
            cum.groupBy(F.col("g").alias("source"))
            .agg(
                F.min("n1").cast("long").alias("n1"),
                F.min(F.col("n") - F.col("n1")).cast("long").alias("n2"),
                F.sum(
                    F.expr(
                        "CASE WHEN v_next IS NULL THEN CAST(0 AS decimal(38,0))"
                        " ELSE abs(CAST(c1 AS decimal(38,0)) * (n - n1)"
                        "          - CAST(ct - c1 AS decimal(38,0)) * n1)"
                        "      * (v_next - v) END"
                    )
                ).alias("w1_num_d"),
                F.min(
                    F.expr("CAST(n1 AS decimal(38,0)) * (n - n1)")
                ).alias("w1_den_d"),
            )
            .select(
                "source",
                "n1",
                "n2",
                F.col("w1_num_d").cast("long").alias("w1_num"),
                F.col("w1_den_d").cast("long").alias("w1_den"),
                F.expr(
                    "CAST(w1_num_d * 1000 DIV w1_den_d AS BIGINT)"
                ).alias("w1_milli_tokens"),
            )
        )


_register_wave5()


def _register_wave5b():
    """kNN-distance outliers over the synthetic customer point cloud —
    the blocked plan vs a brute-force-oracle pairing, same contract as
    geo_neighbor_pairs."""
    from politicamente_etl_spark.operators import geo
    from politicamente_etl_spark.operators.geo import sql_synth_coords
    from politicamente_etl_spark.plans.catalog import T, register

    lat_sql, lon_sql = sql_synth_coords("c_custkey")
    _isq = (
        "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        " - CASE WHEN CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          > ({x}) THEN 1 ELSE 0 END"
        " + CASE WHEN (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          <= ({x}) THEN 1 ELSE 0 END)"
    )

    @register(
        "knn_outlier_customers",
        sql=f"""
        WITH pts AS (
            SELECT c_custkey AS pid, {lat_sql} AS lat, {lon_sql} AS lon
            FROM customer
        ), pairs AS (
            SELECT a.pid, b.pid AS nid,
                   (a.lat - b.lat) * (a.lat - b.lat)
                   + (a.lon - b.lon) * (a.lon - b.lon) AS d2
            FROM pts a JOIN pts b ON a.pid <> b.pid
            WHERE (a.lat - b.lat) * (a.lat - b.lat)
                  + (a.lon - b.lon) * (a.lon - b.lon)
                  <= 15000 * 15000
        ), kth AS (
            SELECT pid, CAST(COUNT(*) AS BIGINT) AS n_in_r,
                   CAST(MAX(d2) AS BIGINT) AS d2k
            FROM (
                SELECT pid, nid, d2,
                       row_number() OVER (PARTITION BY pid
                           ORDER BY d2, nid) AS rn
                FROM pairs
            ) WHERE rn <= 3
            GROUP BY pid
        ), scored AS (
            SELECT p.pid,
                   CAST(COALESCE(k.n_in_r, 0) AS BIGINT) AS n_in_r,
                   CAST(CASE WHEN COALESCE(k.n_in_r, 0) < 3
                             THEN 1 ELSE 0 END AS INT) AS censored,
                   CASE WHEN COALESCE(k.n_in_r, 0) < 3
                        THEN CAST(15000 AS BIGINT)
                        ELSE CAST({_isq.format(x='k.d2k')} AS BIGINT)
                   END AS kdist_milli
            FROM pts p LEFT JOIN kth k USING (pid)
        )
        SELECT pid, n_in_r, censored, kdist_milli
        FROM scored
        ORDER BY censored DESC, kdist_milli DESC, pid
        LIMIT 20
        """,
        tags=("ext-geo", "ext-stats"),
    )
    def q_knn_outlier_customers(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Top-20 spatial outliers by R-bounded kNN distance (k = 3,
        R = 15° milli): sparse customers whose 3rd neighbor is far —
        or provably beyond R (censored, ranked first). The Spark plan
        is the 3×3 grid blocking join; the oracle runs the OPPOSITE
        algorithm (brute-force O(n²)) with identical censor semantics,
        so the blocking's no-missed-pair guarantee is what's actually
        verified."""
        cust = T(spark, sf_dir, "customer")
        lat, lon = geo.synth_coords(F.col("c_custkey"))
        pts = cust.select(
            F.col("c_custkey").alias("pid"),
            lat.alias("lat_milli"),
            lon.alias("lon_milli"),
        )
        return geo.knn_outlier_scores(
            pts, "pid", k=3, radius_milli=15_000, top_k=20
        )


_register_wave5b()
