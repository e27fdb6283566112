"""Round-7 prep batch 1: the unigram-LM tokenizer segmentation step
(SentencePiece's E-step, completing the tokenizer-training family next
to the BPE pair-count and merge-apply passes), U-shaped multi-touch
attribution (the position-based complement of the last-touch as-of
join), and an STL-lite seasonal decomposition of the hourly event
series (trend / seasonal / residual as exact integer sufficient
statistics).

New oracle technique: the Viterbi DP is a Spark sequential `aggregate`
fold with a NESTED argmax `aggregate` over candidate edges (outer
lambda variables captured inside the inner lambda), mirrored in DuckDB
by a recursive CTE whose step JOINs pre-grouped per-position edge lists
and folds them with list_transform + list_reduce — the max-likelihood
VALUE (score, piece count) is engine-deterministic because scores are
micro-nat-snapped integers and ties on the full (score, pieces) tuple
emit the same tuple whichever path wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _register():
    from politicamente_etl_spark.operators import stats, temporal, text
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    # -- unigram-LM Viterbi segmentation ------------------------------------

    @register(
        "unigram_viterbi_segmentation",
        sql="""
        WITH RECURSIVE w AS MATERIALIZED (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE length(w) >= 1
            GROUP BY w
        ), subs AS MATERIALIZED (
            SELECT w.w, w.wf, ii.i AS i, kk.k AS k,
                   substr(w.w, ii.i, kk.k) AS p
            FROM w,
                 unnest(generate_series(1, least(4, length(w.w)))) AS kk(k),
                 unnest(generate_series(1, length(w.w) - kk.k + 1)) AS ii(i)
        ), pc AS MATERIALIZED (
            SELECT p, CAST(SUM(wf) AS BIGINT) AS cnt FROM subs GROUP BY p
        ), vocab AS (
            -- UNION ALL + GROUP BY dedup, NOT plain UNION: under WITH
            -- RECURSIVE, DuckDB 1.0 parses a UNION inside ANY listed CTE
            -- as the recursive-union form, which does NOT dedupe.
            SELECT p, MAX(cnt) AS cnt FROM (
                SELECT p, cnt FROM
                    (SELECT p, cnt FROM pc ORDER BY cnt DESC, p LIMIT 200)
                UNION ALL
                SELECT p, cnt FROM pc WHERE length(p) = 1
            ) GROUP BY p
        ), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM vocab),
        pieces AS (
            SELECT p, CAST(round(ln(CAST(cnt AS DOUBLE)
                                    / CAST(t AS DOUBLE)) * 1e6)
                           AS BIGINT) AS sc
            FROM vocab, tot
        ), epos AS MATERIALIZED (
            -- candidate edges grouped per (word, end position): the DP
            -- step below is a pure lambda fold over this list, mirroring
            -- the Spark nested-aggregate argmax (correlated subqueries
            -- inside a recursive step are flaky in DuckDB 1.0).
            SELECT s.w, s.i + s.k - 1 AS pos,
                   list({'st': s.i, 'sc': pieces.sc} ORDER BY s.k) AS el
            FROM subs s JOIN pieces USING (p)
            GROUP BY s.w, s.i + s.k - 1
        ), rec AS (
            SELECT w.w, w.wf, length(w.w) AS L, 0 AS i,
                   [CAST(0 AS BIGINT)] AS scs, [CAST(0 AS BIGINT)] AS nps
            FROM w
            UNION ALL
            SELECT r.w, r.wf, r.L, r.i + 1,
                   list_append(r.scs,
                       list_reduce(
                           list_transform(e.el,
                               x -> {'s': r.scs[x.st] + x.sc,
                                     'n': r.nps[x.st] + 1}),
                           (a, c) -> CASE WHEN c.s > a.s
                                          OR (c.s = a.s AND c.n < a.n)
                                     THEN c ELSE a END).s),
                   list_append(r.nps,
                       list_reduce(
                           list_transform(e.el,
                               x -> {'s': r.scs[x.st] + x.sc,
                                     'n': r.nps[x.st] + 1}),
                           (a, c) -> CASE WHEN c.s > a.s
                                          OR (c.s = a.s AND c.n < a.n)
                                     THEN c ELSE a END).n)
            FROM rec r JOIN epos e ON e.w = r.w AND e.pos = r.i + 1
            WHERE r.i < r.L
        )
        SELECT w, wf, CAST(L AS BIGINT) AS n_chars,
               CAST(nps[L + 1] AS BIGINT) AS n_pieces,
               CAST(-scs[L + 1] AS BIGINT) AS total_cost_micro
        FROM rec WHERE i = L
        """,
        tags=("ext-text", "ext-tokenizer"),
    )
    def q_unigram_viterbi_segmentation(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """SentencePiece-style unigram-LM segmentation (Kudo 2018): score
        char n-gram pieces by corpus log-probability (micro-nat integer
        snap), Viterbi-segment every vocabulary word via exact DP — a
        per-row sequential fold with a nested argmax, no shuffle past
        the word-frequency aggregate. The DuckDB oracle replays the
        identical recurrence as a recursive CTE joining pre-grouped
        edge lists, folded per position with list_reduce."""
        docs = T(spark, sf_dir, "documents").select("text")
        return text.unigram_viterbi_segmentation(docs)

    # -- U-shaped multi-touch attribution -----------------------------------

    @register(
        "u_shaped_attribution",
        sql="""
        WITH t AS (
            SELECT user_id, epoch_us(ts) AS t_us, event_id AS touch_id
            FROM events WHERE event_type = 'click'
        ), c AS (
            SELECT user_id, epoch_us(ts) AS c_us, event_id AS conv_id,
                   CAST(floor(value * 1000) AS BIGINT) AS v_milli
            FROM events WHERE event_type = 'purchase'
        ), p AS (
            SELECT c.conv_id, t.touch_id, c.user_id, c.v_milli,
                   row_number() OVER (PARTITION BY c.conv_id
                       ORDER BY t.t_us, t.touch_id) AS pos,
                   COUNT(*) OVER (PARTITION BY c.conv_id) AS n
            FROM t JOIN c ON t.user_id = c.user_id
                AND t.t_us <= c.c_us
                AND t.t_us >= c.c_us - 259200000000
        ), cr AS (
            SELECT conv_id, touch_id, user_id, v_milli,
                   CAST(pos AS BIGINT) AS pos,
                   CAST(n AS BIGINT) AS n_touches,
                   CAST(CASE WHEN n = 1 THEN 1000000
                             WHEN n = 2 THEN 500000
                             WHEN pos = 1 OR pos = n THEN 400000
                             ELSE 200000 // (n - 2) END AS BIGINT)
                       AS credit_ppm
            FROM p
        )
        SELECT conv_id, touch_id, user_id, pos, n_touches, credit_ppm,
               CAST(credit_ppm * v_milli AS BIGINT)
                   AS credited_value_milli_ppm
        FROM cr
        """,
        tags=("ext-temporal", "ext-events"),
    )
    def q_u_shaped_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Position-based multi-touch attribution: each purchase's value
        credited 40/20/40 (ppm-exact) across the clicks in its 72-hour
        lookback — one user_id co-located join, per-conversion windows,
        integer credits."""
        ev = load_events(spark, sf_dir)
        return temporal.u_shaped_attribution(ev)

    # -- STL-lite hourly seasonal decomposition -----------------------------

    @register(
        "seasonal_decomposition_hourly",
        sql="""
        WITH hourly AS (
            SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                        AS BIGINT) AS v_milli
            FROM events GROUP BY 1
        ), w AS (
            SELECT h, v_milli,
                   SUM(v_milli) OVER (ORDER BY h RANGE BETWEEN 12 PRECEDING
                       AND 12 FOLLOWING) AS w_sum,
                   COUNT(*) OVER (ORDER BY h RANGE BETWEEN 12 PRECEDING
                       AND 12 FOLLOWING) AS w_cnt
            FROM hourly
        ), tt AS (
            SELECT h, CAST(h % 24 AS BIGINT) AS hod, v_milli,
                   CAST(CASE WHEN w_cnt = 25 THEN w_sum END AS BIGINT)
                       AS trend_sum
            FROM w
        ), seas AS (
            SELECT hod,
                   CAST(SUM(25 * v_milli - trend_sum) AS BIGINT) AS seas_num,
                   CAST(COUNT(*) AS BIGINT) AS seas_den
            FROM tt WHERE trend_sum IS NOT NULL GROUP BY hod
        )
        SELECT tt.h, tt.hod, tt.v_milli, tt.trend_sum,
               seas.seas_num, seas.seas_den
        FROM tt LEFT JOIN seas USING (hod)
        """,
        tags=("ext-stats", "ext-events", "ext-temporal"),
    )
    def q_seasonal_decomposition_hourly(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Classical additive decomposition of the hourly event series:
        centered 25-hour moving-average trend, per-hour-of-day seasonal
        means over the detrended rows, residual at read time — all as
        exact integer num/den statistics. The unpartitioned RANGE
        window runs on the calendar series (rows bounded by wall-clock
        hours, not data volume), after one corpus-sized partial agg."""
        ev = load_events(spark, sf_dir)
        return stats.seasonal_decomposition_hourly(ev)


_register()


def _register_batch2():
    from politicamente_etl_spark.operators import sampling
    from politicamente_etl_spark.plans.catalog import T, load_events, register
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    _IPW_RATES = {"click": 1000, "error": 2500, "view": 500}
    _rate_sql = (
        "CASE WHEN event_type = 'click' THEN 1000"
        " WHEN event_type = 'error' THEN 2500"
        " WHEN event_type = 'view' THEN 500 ELSE 10000 END"
    )

    @register(
        "ipw_telemetry_estimates",
        sql=f"""
        WITH v AS (
            SELECT event_type,
                   {_rate_sql} AS rate_buckets,
                   CAST(floor(value * 1000) AS BIGINT) AS vm,
                   {sampling.sql_hash_bucket("event_id", "ipw-v1")} AS b
            FROM events
        ), k AS (
            SELECT event_type, rate_buckets, vm,
                   CASE WHEN b < rate_buckets THEN 1 ELSE 0 END AS k
            FROM v
        )
        SELECT event_type,
               CAST(rate_buckets AS BIGINT) AS rate_buckets,
               CAST(COUNT(*) AS BIGINT) AS n_true,
               CAST(SUM(k) AS BIGINT) AS n_sampled,
               CAST(SUM(vm) AS BIGINT) AS true_sum_milli,
               CAST((SUM(k * vm) * 10000) // rate_buckets AS BIGINT)
                   AS est_sum_milli
        FROM k GROUP BY event_type, rate_buckets
        """,
        tags=("ext-sampling", "ext-events", "ext-stats"),
    )
    def q_ipw_telemetry_estimates(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Horvitz-Thompson corrected telemetry totals under per-type
        deterministic sampling (click 10%, view 5%, error 25%, rest
        unsampled): truth and IPW estimate side by side from one
        conditional-aggregation pass — the audit that validates a
        sample-at-the-source collection design. md5-bucket membership
        makes the 'sample' engine-exact."""
        ev = load_events(spark, sf_dir)
        return sampling.ipw_telemetry_estimates(ev, _IPW_RATES)

    @register(
        "consistent_hash_rebalance",
        sql="""
        WITH vb AS MATERIALIZED (
            SELECT s.range AS shard,
                   CAST(('0x' || substring(md5(concat_ws(':', 'ring-v1',
                        CAST(s.range AS VARCHAR), CAST(v.range AS VARCHAR))),
                        1, 15)) AS BIGINT) AS pt
            FROM range(0, 8) s, range(0, 16) v
        ), va AS MATERIALIZED (
            SELECT s.range AS shard,
                   CAST(('0x' || substring(md5(concat_ws(':', 'ring-v1',
                        CAST(s.range AS VARCHAR), CAST(v.range AS VARCHAR))),
                        1, 15)) AS BIGINT) AS pt
            FROM range(0, 9) s, range(0, 16) v
        ), keys AS (
            SELECT doc_id AS key,
                   CAST(('0x' || substring(md5(concat_ws(':', 'ring-v1:key',
                        CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS kpt
            FROM documents
        ), ab AS (
            SELECT k.key, k.kpt,
                   (SELECT v.shard FROM vb v
                    ORDER BY CASE WHEN v.pt >= k.kpt THEN v.pt
                             ELSE v.pt + 2305843009213693952 END, v.shard
                    LIMIT 1) AS shard_before
            FROM keys k
        ), aa AS (
            SELECT k.key, k.kpt,
                   (SELECT v.shard FROM va v
                    ORDER BY CASE WHEN v.pt >= k.kpt THEN v.pt
                             ELSE v.pt + 2305843009213693952 END, v.shard
                    LIMIT 1) AS shard_after
            FROM keys k
        )
        SELECT CAST(ab.shard_before AS BIGINT) AS shard_before,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN aa.shard_after <> ab.shard_before
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
        FROM ab JOIN aa ON ab.key = aa.key
        GROUP BY 1
        """,
        tags=("ext-sampling", "ext-docs"),
    )
    def q_consistent_hash_rebalance(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Karger-ring resharding audit on the documents table: per
        before-shard key counts and how many keys move growing the ring
        8 -> 9 shards (16 vnodes each; moved fraction concentrates near
        1/9, vs ~8/9 under modulo resharding) — the migration-costing
        number. Bounded vnode tables broadcast; keys never shuffle
        before the final rollup."""
        docs = T(spark, sf_dir, "documents").select("doc_id")
        return sampling.consistent_hash_rebalance(docs, "doc_id", 8, 9)

    @register(
        "corpus_datasheet",
        sql="""
        WITH base AS (
            SELECT source, lang, md5(text) AS digest,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
        ), per_source AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique,
                   CAST(SUM(toks) AS BIGINT) AS tokens_total,
                   CAST(SUM(n_chars) AS BIGINT) AS chars_total,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
            FROM base GROUP BY source
        ), lc AS (
            SELECT source, lang, COUNT(*) AS cnt,
                   row_number() OVER (PARTITION BY source
                       ORDER BY COUNT(*) DESC, lang) AS rn
            FROM base GROUP BY source, lang
        )
        SELECT p.source, p.n_docs, p.n_unique,
               CAST(((p.n_docs - p.n_unique) * 1000000) // p.n_docs
                    AS BIGINT) AS dup_ppm,
               p.tokens_total, p.chars_total, p.n_langs,
               lc.lang AS top_lang
        FROM per_source p JOIN lc ON p.source = lc.source AND lc.rn = 1
        """,
        tags=("ext-docs", "ext-text", "ext-quality"),
    )
    def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Dataset-card rollup per source (Gebru et al. 2021's datasheet
        numbers a corpus release ships): docs, exact-dup rate (md5
        digests), token/char volume, language spread and modal language
        — one partial-agg pass plus a vocabulary-sized mode window.
        The per-source mode is deterministic (count desc, lang asc)."""
        docs = T(spark, sf_dir, "documents").select(
            "source", "lang", "text", "n_chars"
        )
        base = docs.select(
            "source",
            "lang",
            F.md5("text").alias("digest"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        per_source = base.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("digest").cast("long").alias("n_unique"),
            F.sum("toks").cast("long").alias("tokens_total"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        w = Window.partitionBy("source").orderBy(
            F.col("cnt").desc(), F.col("lang").asc()
        )
        top = (
            base.groupBy("source", "lang")
            .agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("source", F.col("lang").alias("top_lang"))
        )
        return per_source.join(F.broadcast(top), "source").select(
            "source",
            "n_docs",
            "n_unique",
            F.expr("((n_docs - n_unique) * 1000000) div n_docs")
            .cast("long")
            .alias("dup_ppm"),
            "tokens_total",
            "chars_total",
            "n_langs",
            "top_lang",
        )


_register_batch2()


def _register_batch3():
    from politicamente_etl_spark.operators import geo, stats
    from politicamente_etl_spark.plans.catalog import T, load_events, register
    from pyspark.sql import functions as F

    lat_sql, lon_sql = geo.sql_synth_coords("c_custkey")

    @register(
        "geo_neighbor_pairs",
        sql=f"""
        WITH pts AS (
            SELECT c_custkey AS pid,
                   {lat_sql} AS plat,
                   {lon_sql} AS plon
            FROM customer
        )
        SELECT a.pid AS a, b.pid AS b,
               CAST((a.plat - b.plat) * (a.plat - b.plat)
                    + (a.plon - b.plon) * (a.plon - b.plon) AS BIGINT)
                   AS dist_sq_milli
        FROM pts a JOIN pts b ON a.pid < b.pid
        WHERE (a.plat - b.plat) * (a.plat - b.plat)
              + (a.plon - b.plon) * (a.plon - b.plon) <= 490000
        """,
        tags=("ext-geo", "ext-rel"),
    )
    def q_geo_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Spatial proximity self-join: customer points (deterministic
        synthetic milli-degree coords) within 700 milli-degrees, via the
        3x3 grid-cell equi-join of geo.neighbor_pairs_within — never an
        all-pairs product. The oracle deliberately runs the OPPOSITE
        algorithm (brute-force O(n^2) inequality join, fine at sf) so
        the grid blocking is verified against an independent method,
        not a mirror of itself."""
        cust = T(spark, sf_dir, "customer").select("c_custkey")
        lat, lon = geo.synth_coords(F.col("c_custkey"))
        pts = cust.select(
            "c_custkey",
            lat.alias("lat_milli"),
            lon.alias("lon_milli"),
        )
        return geo.neighbor_pairs_within(pts, "c_custkey", radius_milli=700)

    @register(
        "seq_pattern_support",
        sql="""
        WITH seqs AS (
            -- sequence carried as a space-joined string: subsequence
            -- containment is then LIKE '%tok1%tok2%...%' — valid because
            -- no event type is a substring of another (greedy leftmost
            -- LIKE consumption == subsequence semantics). The fold-based
            -- containment (the Spark side) is NOT mirrored here: DuckDB
            -- 1.0's vectorized list_reduce returns context-dependent
            -- results over grouped list columns (verified: same row,
            -- same lambda, different answer with/without a WHERE) — the
            -- LIKE oracle is also a stronger check by being a different
            -- algorithm.
            SELECT user_id AS u, epoch_us(ts) // 86400000000 AS d,
                   string_agg(event_type, ' '
                       ORDER BY epoch_us(ts), event_id) AS seq
            FROM events GROUP BY user_id, epoch_us(ts) // 86400000000
        ), types AS (
            -- top-K frequent types (K=64, ties by name) mirrors the
            -- operator's max_types broadcast guard; inert at test scale
            -- (|types| ~ 5) but load-bearing at a 10^3 taxonomy.
            SELECT event_type AS t FROM events
            GROUP BY event_type
            ORDER BY COUNT(*) DESC, event_type LIMIT 64
        ),
        pats AS (
            SELECT t AS pattern FROM types
            UNION ALL
            SELECT t1.t || ' ' || t2.t FROM types t1, types t2
            UNION ALL
            SELECT t1.t || ' ' || t2.t || ' ' || t3.t
            FROM types t1, types t2, types t3
        ), m AS (
            SELECT p.pattern, s.u,
                   CASE WHEN s.seq LIKE
                        '%' || replace(p.pattern, ' ', '%') || '%'
                   THEN 1 ELSE 0 END AS hit
            FROM seqs s, pats p
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_sequences_total FROM seqs
        )
        SELECT pattern,
               CAST(len(string_split(pattern, ' ')) AS BIGINT) AS plen,
               CAST(SUM(hit) AS BIGINT) AS n_support,
               tot.n_sequences_total
        FROM m, tot GROUP BY pattern, tot.n_sequences_total
        """,
        tags=("ext-events", "ext-stats", "ext-temporal"),
    )
    def q_seq_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
        """GSP-style sequential-pattern support: subsequence containment
        of every 1-3-long event-type pattern across per-user ordered
        (user, day) session sequences — greedy remaining-pattern string
        fold (Spark aggregate == DuckDB list_reduce with the
        list_prepend init trick). Pattern table capped at the top-64
        most frequent types (max_types guard, VERDICT r5 item 2) so
        the broadcast grid stays ≤ ~266k rows at ANY taxonomy size."""
        ev = load_events(spark, sf_dir)
        return stats.seq_pattern_support(ev)


_register_batch3()


def _register_batch4():
    from politicamente_etl_spark.operators import geo, text
    from politicamente_etl_spark.plans.catalog import T, register
    from pyspark.sql import functions as F

    lat_sql, lon_sql = geo.sql_synth_coords("c_custkey")

    @register(
        "unigram_mstep_piece_counts",
        sql="""
        WITH RECURSIVE w AS MATERIALIZED (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE length(w) >= 1
            GROUP BY w
        ), subs AS MATERIALIZED (
            SELECT w.w, w.wf, ii.i AS i, kk.k AS k,
                   substr(w.w, ii.i, kk.k) AS p
            FROM w,
                 unnest(generate_series(1, least(4, length(w.w)))) AS kk(k),
                 unnest(generate_series(1, length(w.w) - kk.k + 1)) AS ii(i)
        ), pc AS MATERIALIZED (
            SELECT p, CAST(SUM(wf) AS BIGINT) AS cnt FROM subs GROUP BY p
        ), vocab AS (
            SELECT p, MAX(cnt) AS cnt FROM (
                SELECT p, cnt FROM
                    (SELECT p, cnt FROM pc ORDER BY cnt DESC, p LIMIT 200)
                UNION ALL
                SELECT p, cnt FROM pc WHERE length(p) = 1
            ) GROUP BY p
        ), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM vocab),
        pieces AS (
            SELECT p, CAST(round(ln(CAST(cnt AS DOUBLE)
                                    / CAST(t AS DOUBLE)) * 1e6)
                           AS BIGINT) AS sc
            FROM vocab, tot
        ), ed AS MATERIALIZED (
            SELECT s.w, s.i + s.k - 1 AS pos, s.k, pieces.sc
            FROM subs s JOIN pieces USING (p)
        ), epos AS MATERIALIZED (
            SELECT e.w, e.pos,
                   list({'st': e.pos - e.k + 1, 'sc': e.sc}
                        ORDER BY e.k) AS el
            FROM ed e GROUP BY e.w, e.pos
        ), rec AS (
            SELECT w.w, w.wf, length(w.w) AS L, 0 AS i,
                   [CAST(0 AS BIGINT)] AS scs, [CAST(0 AS BIGINT)] AS nps
            FROM w
            UNION ALL
            SELECT r.w, r.wf, r.L, r.i + 1,
                   list_append(r.scs,
                       list_reduce(
                           list_transform(e.el,
                               x -> {'s': r.scs[x.st] + x.sc,
                                     'n': r.nps[x.st] + 1}),
                           (a, c) -> CASE WHEN c.s > a.s
                                          OR (c.s = a.s AND c.n < a.n)
                                     THEN c ELSE a END).s),
                   list_append(r.nps,
                       list_reduce(
                           list_transform(e.el,
                               x -> {'s': r.scs[x.st] + x.sc,
                                     'n': r.nps[x.st] + 1}),
                           (a, c) -> CASE WHEN c.s > a.s
                                          OR (c.s = a.s AND c.n < a.n)
                                     THEN c ELSE a END).n)
            FROM rec r JOIN epos e ON e.w = r.w AND e.pos = r.i + 1
            WHERE r.i < r.L
        ), fin AS MATERIALIZED (
            SELECT w, wf, L, scs, nps FROM rec WHERE i = L
        ), bk AS MATERIALIZED (
            -- deterministic path choice: longest piece among edges
            -- achieving the optimal (score, n_pieces) at each position
            SELECT f.w, e.pos, MAX(e.k) AS bk
            FROM fin f JOIN ed e ON e.w = f.w
            WHERE f.scs[e.pos - e.k + 1] + e.sc = f.scs[e.pos + 1]
              AND f.nps[e.pos - e.k + 1] + 1 = f.nps[e.pos + 1]
            GROUP BY f.w, e.pos
        ), walk AS (
            SELECT f.w, f.wf, f.L AS pos, CAST('' AS VARCHAR) AS pcs
            FROM fin f
            UNION ALL
            SELECT wk.w, wk.wf, wk.pos - b.bk,
                   wk.pcs || ' ' || substr(wk.w, wk.pos - b.bk + 1, b.bk)
            FROM walk wk JOIN bk b ON b.w = wk.w AND b.pos = wk.pos
            WHERE wk.pos > 0
        ), px AS (
            SELECT w, wf, unnest(string_split(trim(pcs), ' ')) AS piece
            FROM walk WHERE pos = 0
        )
        SELECT piece,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
               CAST(SUM(wf) AS BIGINT) AS n_uses_weighted
        FROM px GROUP BY piece
        """,
        tags=("ext-text", "ext-tokenizer"),
    )
    def q_unigram_mstep_piece_counts(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Viterbi-EM M-step: reconstruct every word's max-likelihood
        segmentation (deterministic longest-piece tie-break) and count
        corpus-wide piece usage — the renormalization/pruning table of
        the next EM round. Oracle: the forward recursive DP plus a
        second recursive backtrack walking a precomputed best-k table
        (plain joins, no lambdas in the recursion)."""
        docs = T(spark, sf_dir, "documents").select("text")
        return text.unigram_viterbi_mstep_counts(docs)

    @register(
        "geo_density_clusters",
        sql=f"""
        WITH RECURSIVE pts AS MATERIALIZED (
            SELECT c_custkey AS pid,
                   {lat_sql} AS plat,
                   {lon_sql} AS plon
            FROM customer
        ), pr AS MATERIALIZED (
            SELECT a.pid AS a, b.pid AS b
            FROM pts a JOIN pts b ON a.pid < b.pid
            WHERE (a.plat - b.plat) * (a.plat - b.plat)
                  + (a.plon - b.plon) * (a.plon - b.plon) <= 6250000
        ), und AS MATERIALIZED (
            SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr
        ), core AS MATERIALIZED (
            SELECT a AS n FROM und GROUP BY a HAVING COUNT(*) >= 2
        ), ce2 AS MATERIALIZED (
            SELECT u.a, u.b FROM und u
            JOIN core ca ON u.a = ca.n JOIN core cb ON u.b = cb.n
        ), reach(node, label) AS (
            SELECT n, n FROM core
            UNION
            SELECT e.a, r.label FROM ce2 e JOIN reach r ON r.node = e.b
        ), comp AS MATERIALIZED (
            SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
        ), border AS (
            SELECT u.a AS pid, MIN(c.cluster_id) AS cluster_id
            FROM und u JOIN comp c ON c.node = u.b
            WHERE NOT EXISTS (SELECT 1 FROM core k WHERE k.n = u.a)
            GROUP BY u.a
        )
        SELECT CAST(node AS BIGINT) AS pid,
               CAST(cluster_id AS BIGINT) AS cluster_id,
               'core' AS role
        FROM comp
        UNION ALL
        SELECT CAST(pid AS BIGINT), CAST(cluster_id AS BIGINT), 'border'
        FROM border
        """,
        tags=("ext-geo", "ext-graph"),
    )
    def q_geo_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
        """DBSCAN-lite over customer points (radius 2500 milli-deg,
        core = >=2 neighbors): grid-blocked pair join -> degree gate ->
        log-round CC over core edges -> min-cluster border attach. The
        oracle again runs the independent brute-force pair algorithm
        plus a transitive-closure recursion."""
        cust = T(spark, sf_dir, "customer").select("c_custkey")
        lat, lon = geo.synth_coords(F.col("c_custkey"))
        pts = cust.select(
            "c_custkey", lat.alias("lat_milli"), lon.alias("lon_milli")
        )
        return geo.density_clusters(
            pts, "c_custkey", radius_milli=2500, min_neighbors=2
        )


_register_batch4()


def _register_batch5():
    from politicamente_etl_spark.operators import sampling, sim
    from politicamente_etl_spark.plans.catalog import T, register
    from pyspark.sql import functions as F

    _M = sim.jl_sign_matrix(16, 64)
    _M_SQL = sim.sql_matrix_literal(_M)
    _VM = (
        "list_transform({e},"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    _D2I = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " s -> (s[1] - s[2]) * (s[1] - s[2])), (x, y) -> x + y)"
    )

    @register(
        "jl_projection_distance_pairs",
        sql=f"""
        WITH s AS (
            SELECT vec_id, {_VM.format(e="embedding")} AS vm
            FROM embeddings
            WHERE {sampling.sql_hash_bucket("vec_id", "jl-v1")} < 500
        ), pm AS (
            SELECT vec_id, vm,
                   list_transform({_M_SQL}, row ->
                       list_reduce(list_transform(list_zip(row, vm),
                           s -> s[1] * s[2]), (x, y) -> x + y)) AS proj
            FROM s
        )
        SELECT a.vec_id AS a, b.vec_id AS b,
               CAST({_D2I.format(a="a.vm", b="b.vm")} AS BIGINT) AS d2_orig,
               CAST({_D2I.format(a="a.proj", b="b.proj")} AS BIGINT)
                   AS d2_proj
        FROM pm a JOIN pm b ON a.vec_id < b.vec_id
        """,
        tags=("ext-sim", "ext-embeddings", "ext-sampling"),
    )
    def q_jl_projection_distance_pairs(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Johnson-Lindenstrauss sign projection (64 -> 16 dims, shared
        deterministic ±1 matrix) with its distance-preservation audit:
        exact integer squared distances in original-milli and projected
        space for every pair of a bounded 5% hash sample — the
        distortion report that justifies running downstream ANN in the
        cheap space. Projection is one codegen'd fold per row; the
        audit join broadcasts the bounded sample."""
        emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        return sim.jl_distance_pairs(emb, sim.jl_sign_matrix(16, 64))

    @register(
        "item_item_cooccurrence_sim",
        sql="""
        WITH bi AS (
            SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
        ), co AS (
            SELECT a.it AS ia, b.it AS ib, CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM bi a JOIN bi b ON a.bk = b.bk AND a.it < b.it
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ), cnt AS (
            SELECT it, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY it
        )
        SELECT co.ia AS item_a, co.ib AS item_b, co.c_ab,
               ca.c AS c_a, cb.c AS c_b,
               CAST((co.c_ab * co.c_ab * 1000000) // (ca.c * cb.c)
                    AS BIGINT) AS sim_sq_ppm
        FROM co JOIN cnt ca ON co.ia = ca.it JOIN cnt cb ON co.ib = cb.it
        ORDER BY sim_sq_ppm DESC, item_a, item_b LIMIT 50
        """,
        tags=("ext-rel", "ext-sim", "ext-graph"),
    )
    def q_item_item_cooccurrence_sim(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Item-item collaborative filtering over order baskets: binary
        cosine c_ab/sqrt(c_a*c_b) as exact integers (sim_sq_ppm — no
        float sqrt anywhere), per-basket pair explode + broadcast item
        counts + TakeOrdered top-50."""
        li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        return sim.item_cooccurrence_similarity(
            li, "l_orderkey", "l_partkey"
        )


_register_batch5()


def _register_batch6():
    import os
    import tempfile

    from politicamente_etl_spark.plans.catalog import T, register
    from pyspark.sql import functions as F

    @register(
        "txlog_right_to_erasure",
        sql="""
        SELECT CAST(c_nationkey AS BIGINT) AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS acctbal_cents
        FROM customer WHERE c_custkey % 97 <> 0
        GROUP BY c_nationkey
        """,
        tags=("ext-sink", "ext-privacy"),
    )
    def q_txlog_right_to_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
        """GDPR right-to-erasure on the commit-log table: load customers
        as FOUR key-range-clustered files (disjoint zonemaps), delete
        the subject set (c_custkey % 97 == 0) via `delete_keys` — the
        file-pruned transactional DELETE — and read back the surviving
        table, aggregated per nation. The oracle derives the post-
        delete state independently from the source table, so the whole
        create→delete→scan path must round-trip exactly. File-prune
        accounting (rewritten vs preserved vs skipped-by-stats) is
        asserted in tests/test_txlog.py; erasure is logical-now,
        physical-on-vacuum (documented two-step)."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        c = T(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_gdpr_"), "t")
        qsize = 500
        t = TxLogTable.create(
            spark, path, c.filter(F.col("c_custkey") <= qsize)
        )
        lo = qsize
        while True:
            chunk = c.filter(
                (F.col("c_custkey") > lo) & (F.col("c_custkey") <= lo + qsize)
            )
            if chunk.limit(1).count() == 0:
                break
            t.append(chunk)
            lo += qsize
        subjects = c.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
        t.delete_keys(subjects, ["c_custkey"])
        return (
            t.snapshot()
            .groupBy(F.col("c_nationkey").cast("long").alias("nation"))
            .agg(
                F.count("*").cast("long").alias("n_customers"),
                F.sum(F.floor(F.col("c_acctbal") * 100).cast("long"))
                .cast("long")
                .alias("acctbal_cents"),
            )
        )


_register_batch6()


def _register_batch7():
    from politicamente_etl_spark.operators import temporal
    from politicamente_etl_spark.plans.catalog import load_events, register

    @register(
        "window_funnel_levels",
        sql="""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        s AS (SELECT user_id, epoch_us(ts) AS t FROM events
              WHERE event_type = 'signup'),
        c AS (SELECT user_id, epoch_us(ts) AS t FROM events
              WHERE event_type = 'click'),
        p AS (SELECT user_id, epoch_us(ts) AS t FROM events
              WHERE event_type = 'purchase'),
        lv AS (
            SELECT u.user_id,
                CASE WHEN EXISTS (SELECT 1 FROM s, c, p
                        WHERE s.user_id = u.user_id
                          AND c.user_id = u.user_id
                          AND p.user_id = u.user_id
                          AND s.t <= c.t AND c.t <= p.t
                          AND p.t - s.t <= 86400000000) THEN 3
                     WHEN EXISTS (SELECT 1 FROM s, c
                        WHERE s.user_id = u.user_id
                          AND c.user_id = u.user_id
                          AND s.t <= c.t
                          AND c.t - s.t <= 86400000000) THEN 2
                     WHEN EXISTS (SELECT 1 FROM s
                        WHERE s.user_id = u.user_id) THEN 1
                     ELSE 0 END AS level
            FROM u
        )
        SELECT CAST(level AS BIGINT) AS level,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM lv GROUP BY level
        """,
        tags=("ext-temporal", "ext-events"),
    )
    def q_window_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ClickHouse-style windowFunnel over signup→click→purchase with
        a 24 h chain deadline anchored at the first step: one ordered
        fold per user carrying the minimal first-step timestamp per
        level (the windowFunnel recurrence) — single user shuffle, no
        joins. The oracle takes the opposite route again: per-level
        EXISTS chains over inequality joins."""
        ev = load_events(spark, sf_dir)
        return temporal.window_funnel_levels(
            ev, ["signup", "click", "purchase"], window_us=86_400_000_000
        )


_register_batch7()
