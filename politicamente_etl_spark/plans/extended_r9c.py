"""Round-9 prep, third wave: Youden-J optimal threshold for the
classifier gate, and data-driven Shapley channel attribution over
pre-purchase exposure coalitions (Zhao et al. 2018) — exact factorial
weights over the bounded 2⁴ coalition table.

Engine-parity rules as extended_r9/r9b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register_wave6():
    from politicamente_etl_spark.operators import stats, text
    from politicamente_etl_spark.plans.catalog import (
        load_events,
        register,
        T,
    )
    from politicamente_etl_spark.plans.extended_r8 import (
        _classifier_scored_cte,
        _fd_sql,
    )

    @register(
        "youden_optimal_threshold",
        sql=_classifier_scored_cte()
        + f""", j AS (
            SELECT {_fd_sql('logits.logit', 1000)} AS s, truth.label
            FROM logits JOIN truth USING (doc_id)
        ), ps AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS n_tot,
                   CAST(SUM(label) AS BIGINT) AS n_pos
            FROM j GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(n_pos) AS BIGINT) AS p,
                   CAST(SUM(n_tot) - SUM(n_pos) AS BIGINT) AS neg
            FROM ps
        ), sweep AS (
            -- threshold t = "predict positive when s >= t": TP/FP are
            -- reverse-cumulative sums over the bounded score summary
            SELECT s AS thr,
                   CAST(SUM(n_pos) OVER (ORDER BY s
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS BIGINT) AS tp,
                   CAST(SUM(n_tot - n_pos) OVER (ORDER BY s
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS BIGINT) AS fp
            FROM ps
        ), scored AS (
            SELECT thr, tp, fp,
                   CAST(tp * 1000000 // tot.p AS BIGINT) AS tpr_ppm,
                   CAST(fp * 1000000 // tot.neg AS BIGINT) AS fpr_ppm,
                   CAST(tp * 1000000 // tot.p
                        - fp * 1000000 // tot.neg AS BIGINT) AS j_ppm
            FROM sweep, tot
        )
        SELECT thr, tp, fp, tpr_ppm, fpr_ppm, j_ppm
        FROM scored
        ORDER BY j_ppm DESC, thr
        LIMIT 1
        """,
        tags=("ext-stats", "ext-text", "ext-docs"),
    )
    def q_youden_optimal_threshold(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Youden-J optimal operating point for the hashed quality
        gate: the milli-nat-bucketed threshold maximizing TPR − FPR —
        picked by an exact integer sweep over the SAME bounded
        per-score summary the AUC rank walk uses (reverse-cumulative
        TP/FP windows), so choosing the production cutoff costs one
        grid pass, not a corpus rescan per candidate threshold."""
        from pyspark.sql import Window

        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        w = text.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
        logit = text.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        ).select("doc_id", "logit_micro")
        truth = docs.select(
            "doc_id",
            (
                F.expr(
                    "(size(array_distinct(split(text, ' '))) * 1000)"
                    " div size(split(text, ' '))"
                )
                >= 800
            )
            .cast("int")
            .alias("label"),
        )
        j = logit.join(truth, "doc_id").select(
            F.expr(
                "(logit_micro - pmod(logit_micro, 1000)) DIV 1000"
            ).alias("s"),
            "label",
        )
        ps = j.groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("n_tot"),
            F.sum("label").cast("long").alias("n_pos"),
        )
        tot = ps.agg(
            F.sum("n_pos").cast("long").alias("p"),
            (F.sum("n_tot") - F.sum("n_pos")).cast("long").alias("neg"),
        )
        w_ge = Window.orderBy("s").rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        sweep = ps.select(
            F.col("s").alias("thr"),
            F.sum("n_pos").over(w_ge).cast("long").alias("tp"),
            F.sum(F.col("n_tot") - F.col("n_pos"))
            .over(w_ge)
            .cast("long")
            .alias("fp"),
        )
        scored = sweep.join(F.broadcast(tot)).select(
            "thr",
            "tp",
            "fp",
            F.expr("tp * 1000000 DIV p").cast("long").alias("tpr_ppm"),
            F.expr("fp * 1000000 DIV neg").cast("long").alias("fpr_ppm"),
            F.expr("tp * 1000000 DIV p - fp * 1000000 DIV neg")
            .cast("long")
            .alias("j_ppm"),
        )
        return scored.orderBy(F.col("j_ppm").desc(), "thr").limit(1)

    # popcount as portable arithmetic (identical text both engines)
    _POP = (
        "(({m}) % 2 + (({m}) // 2) % 2 + (({m}) // 4) % 2"
        " + (({m}) // 8) % 2)"
    )

    @register(
        "shapley_channel_attribution",
        sql=f"""
        WITH fp AS (
            SELECT user_id, MIN(epoch_us(ts)) AS conv_t
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ), exp_ AS (
            SELECT e.user_id,
                   CAST(MAX(CASE WHEN e.event_type = 'view'
                            THEN 1 ELSE 0 END)
                        + 2 * MAX(CASE WHEN e.event_type = 'click'
                                  THEN 1 ELSE 0 END)
                        + 4 * MAX(CASE WHEN e.event_type = 'signup'
                                  THEN 1 ELSE 0 END)
                        + 8 * MAX(CASE WHEN e.event_type = 'error'
                                  THEN 1 ELSE 0 END) AS BIGINT) AS mask,
                   CAST(MAX(CASE WHEN fp.user_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS converted
            FROM events e
            LEFT JOIN fp ON e.user_id = fp.user_id
            WHERE e.event_type <> 'purchase'
              AND (fp.conv_t IS NULL OR epoch_us(e.ts) < fp.conv_t)
            GROUP BY e.user_id
        ), vq AS (
            SELECT g.m AS mask,
                   CAST(COALESCE(COUNT(exp_.user_id), 0) AS BIGINT)
                       AS n_users,
                   CAST(COALESCE(SUM(exp_.converted), 0) AS BIGINT)
                       AS n_conv,
                   CAST(CASE WHEN COUNT(exp_.user_id) = 0 THEN 0
                        ELSE SUM(exp_.converted) * 1000000
                             // COUNT(exp_.user_id) END AS BIGINT) AS v_ppm
            FROM UNNEST(generate_series(0, 15)) g(m)
            LEFT JOIN exp_ ON exp_.mask = g.m
            GROUP BY 1
        ), ch AS (
            SELECT * FROM (VALUES ('view', 1), ('click', 2),
                                  ('signup', 4), ('error', 8)) c(name, bit)
        ), terms AS (
            SELECT ch.name,
                   CAST(SUM(CASE {_POP.format(m='s.mask')}
                             WHEN 0 THEN 6 WHEN 1 THEN 2
                             WHEN 2 THEN 2 WHEN 3 THEN 6 END
                            * (w.v_ppm - s.v_ppm)) AS BIGINT) AS phi24_ppm
            FROM ch
            JOIN vq s ON (s.mask // ch.bit) % 2 = 0
            JOIN vq w ON w.mask = s.mask + ch.bit
            GROUP BY 1
        )
        SELECT name AS channel, phi24_ppm,
               CAST({_fd_sql('phi24_ppm', 24)} AS BIGINT) AS phi_ppm
        FROM terms
        """,
        tags=("ext-temporal", "ext-stats", "ext-events"),
    )
    def q_shapley_channel_attribution(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Data-driven Shapley attribution (Zhao et al. 2018) over the
        four pre-purchase exposure channels: coalition value v(S) =
        conversion rate of users whose exposure set is EXACTLY S
        (unobserved coalitions contribute 0, documented), Shapley
        φ_c = Σ_{S∌c} |S|!(3−|S|)!·(v(S∪c) − v(S)) / 4! with the
        factorial weights as exact integer literals (×24 carried, one
        sign-safe floor at the end). The corpus collapses to the
        16-row coalition table in one conditional aggregate; the
        coalition joins are grid-sized. The causal-flavored complement
        of u_shaped_attribution's positional rule."""
        ev = load_events(spark, sf_dir)
        fp = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.expr("MIN(unix_micros(ts))").alias("conv_t"))
        )
        exp_ = (
            ev.filter(F.col("event_type") != "purchase")
            .join(F.broadcast(fp), "user_id", "left")
            .filter(
                F.col("conv_t").isNull()
                | (F.expr("unix_micros(ts)") < F.col("conv_t"))
            )
            .groupBy("user_id")
            .agg(
                (
                    F.max(
                        (F.col("event_type") == "view").cast("long")
                    )
                    + 2
                    * F.max((F.col("event_type") == "click").cast("long"))
                    + 4
                    * F.max((F.col("event_type") == "signup").cast("long"))
                    + 8
                    * F.max((F.col("event_type") == "error").cast("long"))
                )
                .cast("long")
                .alias("mask"),
                F.max(F.col("conv_t").isNotNull().cast("long"))
                .cast("long")
                .alias("converted"),
            )
        )
        grid = spark.range(0, 16).select(F.col("id").cast("long").alias("mask"))
        vq = (
            grid.join(exp_, "mask", "left")
            .groupBy("mask")
            .agg(
                F.count("user_id").cast("long").alias("n_users"),
                F.coalesce(F.sum("converted"), F.lit(0))
                .cast("long")
                .alias("n_conv"),
            )
            .select(
                "mask",
                "n_users",
                "n_conv",
                F.expr(
                    "CAST(CASE WHEN n_users = 0 THEN 0"
                    " ELSE n_conv * 1000000 DIV n_users END AS BIGINT)"
                ).alias("v_ppm"),
            )
        )
        ch = spark.createDataFrame(
            [("view", 1), ("click", 2), ("signup", 4), ("error", 8)],
            "name string, bit long",
        )
        s = vq.select(
            F.col("mask").alias("s_mask"), F.col("v_ppm").alias("s_v")
        )
        wfull = vq.select(
            F.col("mask").alias("w_mask"), F.col("v_ppm").alias("w_v")
        )
        pop = _POP.format(m="s_mask").replace("//", "DIV")
        terms = (
            ch.join(
                F.broadcast(s), F.expr("(s_mask DIV bit) % 2 = 0")
            )
            .join(
                F.broadcast(wfull), F.expr("w_mask = s_mask + bit")
            )
            .groupBy(F.col("name").alias("channel"))
            .agg(
                F.sum(
                    F.expr(
                        f"CASE {pop} WHEN 0 THEN 6 WHEN 1 THEN 2"
                        " WHEN 2 THEN 2 WHEN 3 THEN 6 END"
                    )
                    * (F.col("w_v") - F.col("s_v"))
                )
                .cast("long")
                .alias("phi24_ppm")
            )
        )
        return terms.select(
            "channel",
            "phi24_ppm",
            F.expr(
                "CAST(((phi24_ppm) - pmod(phi24_ppm, 24)) DIV 24 AS BIGINT)"
            ).alias("phi_ppm"),
        )


_register_wave6()


def _register_wave7():
    """Wave 7: nonparametric time-series hypothesis tests — Mann-
    Kendall monotone trend and the Wald-Wolfowitz runs test — over the
    bounded daily-revenue calendar grid, plus a bipartiteness audit of
    the co-purchase graph via BFS parity."""
    from politicamente_etl_spark.plans.catalog import T, register

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
        "mann_kendall_trend",
        sql=f"""
        WITH o AS (
            SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS day,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), daily AS (
            SELECT day // 7 AS wk, CAST(SUM(cents) AS BIGINT) AS y
            FROM o GROUP BY 1
        ), pairs AS (
            SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                                 WHEN b.y < a.y THEN -1 ELSE 0 END)
                        AS BIGINT) AS s_stat
            FROM daily a JOIN daily b ON a.wk < b.wk
        ), ties AS (
            SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                        AS BIGINT) AS tie_term
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                  FROM daily GROUP BY y HAVING COUNT(*) > 1)
        ), nn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily
        ), var18 AS (
            SELECT CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT)
                       AS v18, n
            FROM nn, ties
        )
        SELECT pairs.s_stat, var18.n, var18.v18,
               CAST(CASE
                    WHEN pairs.s_stat > 0 THEN
                      (pairs.s_stat - 1) * 1000
                      // {_ISQ.format(x="var18.v18 * 1000000 // 18")}
                    WHEN pairs.s_stat < 0 THEN
                      -(((-pairs.s_stat) - 1) * 1000
                        // {_ISQ.format(x="var18.v18 * 1000000 // 18")})
                    ELSE 0 END * 1000 AS BIGINT) AS z_micro
        FROM pairs, var18
        """,
        tags=("ext-temporal", "ext-stats"),
    )
    def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Mann-Kendall monotone-trend test on weekly total revenue:
        S = Σ_{i<j} sign(y_j − y_i) with the tie-corrected variance
        Var·18 = n(n−1)(2n+5) − Σt(t−1)(2t+5), continuity-corrected
        z = (|S|−1)/√Var in signed micro — the distribution-free 'is
        revenue drifting?' answer (|z| ≳ 1.96e6 rejects no-trend). The
        pair sum runs on the WEEK grid (calendar-bounded — ~350 rows
        whatever the corpus), so the O(grid²) join is constant-cost;
        the corpus-sized work is one weekly rollup. √Var via the exact
        isqrt on a 10⁶-scaled radicand (milli-precision root)."""
        o = T(spark, sf_dir, "orders").select(
            F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        daily = o.groupBy(F.expr("day div 7").alias("wk")).agg(
            F.sum("cents").cast("long").alias("y")
        )
        a = daily.select(F.col("wk").alias("wa"), F.col("y").alias("ya"))
        b = daily.select(F.col("wk").alias("wb"), F.col("y").alias("yb"))
        pairs = (
            a.join(F.broadcast(b), F.col("wa") < F.col("wb"))
            .agg(
                F.sum(
                    F.when(F.col("yb") > F.col("ya"), 1)
                    .when(F.col("yb") < F.col("ya"), -1)
                    .otherwise(0)
                )
                .cast("long")
                .alias("s_stat")
            )
        )
        ties = (
            daily.groupBy("y")
            .agg(F.count(F.lit(1)).cast("long").alias("t"))
            .filter(F.col("t") > 1)
            .agg(
                F.coalesce(
                    F.sum(
                        F.col("t")
                        * (F.col("t") - 1)
                        * (2 * F.col("t") + 5)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("tie_term")
            )
        )
        nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
        var18 = nn.join(F.broadcast(ties)).select(
            "n",
            F.expr(
                "CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT)"
            ).alias("v18"),
        )
        isq = _ISQ.replace("//", "DIV")
        root = isq.format(x="v18 * 1000000 DIV 18")
        return pairs.join(F.broadcast(var18)).select(
            "s_stat",
            "n",
            "v18",
            F.expr(
                f"CAST(CASE WHEN s_stat > 0 THEN"
                f" (s_stat - 1) * 1000 DIV {root}"
                f" WHEN s_stat < 0 THEN"
                f" -(((-s_stat) - 1) * 1000 DIV {root})"
                f" ELSE 0 END * 1000 AS BIGINT)"
            ).alias("z_micro"),
        )


_register_wave7()


def _register_wave7b():
    """Wald-Wolfowitz runs test for randomness of the weekly revenue
    series around its median."""
    from politicamente_etl_spark.plans.catalog import T, register

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
        "revenue_runs_test",
        sql=f"""
        WITH o AS (
            SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) // 7 AS wk,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), weekly AS (
            SELECT wk, CAST(SUM(cents) AS BIGINT) AS y FROM o GROUP BY 1
        ), med AS (
            SELECT y AS m FROM (
                SELECT y, row_number() OVER (ORDER BY y) AS rn,
                       COUNT(*) OVER () AS n
                FROM weekly
            ) WHERE rn = (n + 1) // 2
        ), signs AS (
            SELECT wk, CASE WHEN y > m THEN 1 ELSE 0 END AS s
            FROM weekly, med WHERE y <> m
        ), runs AS (
            SELECT CAST(1 + SUM(CASE WHEN s <> prev_s THEN 1 ELSE 0 END)
                        AS BIGINT) AS r,
                   CAST(SUM(s) AS BIGINT) AS n1,
                   CAST(SUM(1 - s) AS BIGINT) AS n2
            FROM (SELECT s, lag(s) OVER (ORDER BY wk) AS prev_s FROM signs)
            WHERE prev_s IS NOT NULL OR TRUE
        ), stat AS (
            SELECT r, n1, n2, n1 + n2 AS n,
                   r * (n1 + n2) - (n1 + n2) - 2 * n1 * n2 AS a,
                   2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) AS b
            FROM runs
        )
        SELECT r AS n_runs, n1, n2,
               CAST(CASE WHEN b <= 0 THEN NULL
                    WHEN a >= 0 THEN
                      {_ISQ.format(x="a * a * (n - 1) * 1000000 // b")}
                    ELSE
                      -{_ISQ.format(x="a * a * (n - 1) * 1000000 // b")}
                    END AS BIGINT) AS z_milli
        FROM stat
        """,
        tags=("ext-temporal", "ext-stats"),
    )
    def q_revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Wald-Wolfowitz runs test: is the weekly revenue's
        above/below-median sequence random, or does it cluster
        (momentum) / alternate (mean-reversion)? Exact integers: run
        count by one lag over the week grid, z = (Rn−n−2n₁n₂)√(n−1) /
        √(2n₁n₂(2n₁n₂−n)) via the isqrt-of-scaled-square trick
        (negative z = fewer runs than chance = clustering). Median =
        exact lower order statistic on the bounded weekly summary;
        exact-median weeks drop by convention."""
        from pyspark.sql import Window

        o = T(spark, sf_dir, "orders").select(
            F.expr(
                "CAST(unix_date(to_date(o_orderdate)) AS BIGINT) div 7"
            ).alias("wk"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        weekly = o.groupBy("wk").agg(F.sum("cents").cast("long").alias("y"))
        wname = Window.orderBy("y")
        wall = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        med = (
            weekly.select(
                "y",
                F.row_number().over(wname).alias("rn"),
                F.count(F.lit(1)).over(wall).alias("n"),
            )
            .filter(F.expr("rn = (n + 1) DIV 2"))
            .select(F.col("y").alias("m"))
        )
        signs = (
            weekly.join(F.broadcast(med))
            .filter(F.col("y") != F.col("m"))
            .select("wk", (F.col("y") > F.col("m")).cast("int").alias("s"))
        )
        lagged = signs.select(
            "s", F.lag("s").over(Window.orderBy("wk")).alias("prev_s")
        )
        runs = lagged.agg(
            (
                1
                + F.sum(
                    F.when(
                        F.col("prev_s").isNotNull()
                        & (F.col("s") != F.col("prev_s")),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("r"),
            F.sum("s").cast("long").alias("n1"),
            F.sum(1 - F.col("s")).cast("long").alias("n2"),
        )
        stat = runs.select(
            "r",
            "n1",
            "n2",
            (F.col("n1") + F.col("n2")).alias("n"),
            F.expr("r * (n1 + n2) - (n1 + n2) - 2 * n1 * n2").alias("a"),
            F.expr("2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2))").alias("b"),
        )
        isq = _ISQ.replace("//", "DIV")
        z2 = "a * a * (n - 1) * 1000000 DIV b"
        return stat.select(
            F.col("r").alias("n_runs"),
            "n1",
            "n2",
            F.expr(
                f"CAST(CASE WHEN b <= 0 THEN NULL"
                f" WHEN a >= 0 THEN {isq.format(x=z2)}"
                f" ELSE -{isq.format(x=z2)} END AS BIGINT)"
            ).alias("z_milli"),
        )


_register_wave7b()


def _register_wave8():
    """Wave 8: expected calibration error of the RAW gate (next to the
    Brier decomposition of the calibrated one), CUPED variance-reduced
    A/B readout (the pre-period-covariate adjustment every
    experimentation platform runs), and rich-club coefficients over
    the co-purchase graph."""
    from politicamente_etl_spark.operators import text
    from politicamente_etl_spark.plans.catalog import (
        T,
        load_events,
        register,
    )
    from politicamente_etl_spark.plans.extended_r8 import (
        _classifier_scored_cte,
        _fd_sql,
    )

    @register(
        "ece_raw_gate",
        sql=_classifier_scored_cte()
        + """, j AS (
            SELECT logits.logit AS s, truth.label AS y
            FROM logits JOIN truth USING (doc_id)
        ), rng AS (
            SELECT MIN(s) AS smin, MAX(s) AS smax FROM j
        ), bins AS (
            SELECT CAST(((s - smin) * 10) // (smax - smin + 1) AS BIGINT)
                       AS bin,
                   CAST(COUNT(*) AS BIGINT) AS nk,
                   CAST(SUM(y) AS BIGINT) AS pk,
                   CAST(SUM(s) AS BIGINT) AS ssum,
                   MIN(smin) AS smin, MIN(smax) AS smax
            FROM j, rng GROUP BY 1
        ), scored AS (
            SELECT bin, nk, pk,
                   CAST(pk * 1000000 // nk AS BIGINT) AS y_ppm,
                   CAST((ssum - nk * smin) * 1000000
                        // (nk * (smax - smin)) AS BIGINT) AS p_ppm
            FROM bins
        )
        SELECT CAST(SUM(nk) AS BIGINT) AS n,
               CAST(SUM(nk * abs(p_ppm - y_ppm)) AS BIGINT) AS ece_num,
               CAST(SUM(nk * abs(p_ppm - y_ppm)) // SUM(nk) AS BIGINT)
                   AS ece_ppm
        FROM scored
        """,
        tags=("ext-stats", "ext-text", "ext-docs"),
    )
    def q_ece_raw_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Expected calibration error of the RAW gate score read as a
        probability (min-max normalized): ECE = Σ n_k·|p̂_k − ȳ_k| / n
        over the 10 reliability bins, floored ppm per term — the
        headline calibration number BEFORE isotonic correction, sitting
        next to brier_decomposition_gate's post-correction audit. Bin
        means stay exact: p̂ = (Σs − n·smin)·10⁶ / (n·(smax−smin))."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        w = text.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
        logit = text.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        ).select("doc_id", F.col("logit_micro").alias("s"))
        truth = docs.select(
            "doc_id",
            (
                F.expr(
                    "(size(array_distinct(split(text, ' '))) * 1000)"
                    " div size(split(text, ' '))"
                )
                >= 800
            )
            .cast("int")
            .alias("y"),
        )
        j = logit.join(truth, "doc_id")
        rng = j.agg(F.min("s").alias("smin"), F.max("s").alias("smax"))
        bins = (
            j.join(F.broadcast(rng))
            .groupBy(
                F.expr("((s - smin) * 10) DIV (smax - smin + 1)")
                .cast("long")
                .alias("bin")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("nk"),
                F.sum("y").cast("long").alias("pk"),
                F.sum("s").cast("long").alias("ssum"),
                F.min("smin").alias("smin"),
                F.min("smax").alias("smax"),
            )
        )
        scored = bins.select(
            "nk",
            F.expr("pk * 1000000 DIV nk").cast("long").alias("y_ppm"),
            F.expr(
                "(ssum - nk * smin) * 1000000 DIV (nk * (smax - smin))"
            )
            .cast("long")
            .alias("p_ppm"),
        )
        return scored.agg(
            F.sum("nk").cast("long").alias("n"),
            F.sum(F.col("nk") * F.abs(F.col("p_ppm") - F.col("y_ppm")))
            .cast("long")
            .alias("ece_num"),
            F.expr(
                "CAST(SUM(nk * abs(p_ppm - y_ppm)) DIV SUM(nk) AS BIGINT)"
            ).alias("ece_ppm"),
        )

    @register(
        "cuped_adjusted_ab",
        sql=f"""
        WITH mid AS (
            SELECT CAST(
                (CAST(MIN(epoch_us(ts)) AS HUGEINT)
                 + CAST(MAX(epoch_us(ts)) AS HUGEINT)) // 2 AS BIGINT)
                AS m
            FROM events
        ), per_user AS (
            SELECT user_id,
                   CAST((CAST(('0x' || substring(md5(concat_ws(':', 'ab-v1',
                        CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 2)
                        AS INT) AS arm,
                   CAST(SUM(CASE WHEN epoch_us(ts) < mid.m
                            THEN CAST(floor(value * 1000) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN epoch_us(ts) >= mid.m
                            THEN CAST(floor(value * 1000) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y
            FROM events, mid
            GROUP BY 1, mid.m
        ), pooled AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                   CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
            FROM per_user
        ), theta AS (
            SELECT n, sx, sy,
                   CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                       AS cov_num,
                   CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                       AS var_num
            FROM pooled
        ), arms AS (
            SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
                   CAST(SUM(x) AS BIGINT) AS sx_arm,
                   CAST(SUM(y) AS BIGINT) AS sy_arm
            FROM per_user GROUP BY 1
        ), wide AS (
            SELECT MAX(CASE WHEN arm = 0 THEN n_arm END) AS na,
                   MAX(CASE WHEN arm = 0 THEN sx_arm END) AS sxa,
                   MAX(CASE WHEN arm = 0 THEN sy_arm END) AS sya,
                   MAX(CASE WHEN arm = 1 THEN n_arm END) AS nb,
                   MAX(CASE WHEN arm = 1 THEN sx_arm END) AS sxb,
                   MAX(CASE WHEN arm = 1 THEN sy_arm END) AS syb
            FROM arms
        )
        SELECT wide.na, wide.nb,
               CAST(theta.cov_num AS BIGINT) AS cov_num,
               CAST(theta.var_num AS BIGINT) AS var_num,
               CAST((((theta.cov_num * 1000000) - (((theta.cov_num * 1000000) % (theta.var_num)) + (theta.var_num)) % (theta.var_num)) // (theta.var_num)) AS BIGINT) AS theta_ppm,
               CAST(((((CAST(wide.syb AS HUGEINT) * wide.na - CAST(wide.sya AS HUGEINT) * wide.nb) * 1000) - ((((CAST(wide.syb AS HUGEINT) * wide.na - CAST(wide.sya AS HUGEINT) * wide.nb) * 1000) % ((CAST(wide.na AS HUGEINT) * wide.nb))) + ((CAST(wide.na AS HUGEINT) * wide.nb))) % ((CAST(wide.na AS HUGEINT) * wide.nb))) // ((CAST(wide.na AS HUGEINT) * wide.nb))) AS BIGINT) AS delta_raw_milli,
               CAST(((((CAST(wide.syb AS HUGEINT) * wide.na - CAST(wide.sya AS HUGEINT) * wide.nb) * 1000 - (((((((theta.cov_num * 1000000) - (((theta.cov_num * 1000000) % (theta.var_num)) + (theta.var_num)) % (theta.var_num)) // (theta.var_num))) * (CAST(wide.sxb AS HUGEINT) * wide.na - CAST(wide.sxa AS HUGEINT) * wide.nb) * 1000) - (((((((theta.cov_num * 1000000) - (((theta.cov_num * 1000000) % (theta.var_num)) + (theta.var_num)) % (theta.var_num)) // (theta.var_num))) * (CAST(wide.sxb AS HUGEINT) * wide.na - CAST(wide.sxa AS HUGEINT) * wide.nb) * 1000) % (1000000)) + (1000000)) % (1000000)) // (1000000))) - ((((CAST(wide.syb AS HUGEINT) * wide.na - CAST(wide.sya AS HUGEINT) * wide.nb) * 1000 - (((((((theta.cov_num * 1000000) - (((theta.cov_num * 1000000) % (theta.var_num)) + (theta.var_num)) % (theta.var_num)) // (theta.var_num))) * (CAST(wide.sxb AS HUGEINT) * wide.na - CAST(wide.sxa AS HUGEINT) * wide.nb) * 1000) - (((((((theta.cov_num * 1000000) - (((theta.cov_num * 1000000) % (theta.var_num)) + (theta.var_num)) % (theta.var_num)) // (theta.var_num))) * (CAST(wide.sxb AS HUGEINT) * wide.na - CAST(wide.sxa AS HUGEINT) * wide.nb) * 1000) % (1000000)) + (1000000)) % (1000000)) // (1000000))) % ((CAST(wide.na AS HUGEINT) * wide.nb))) + ((CAST(wide.na AS HUGEINT) * wide.nb))) % ((CAST(wide.na AS HUGEINT) * wide.nb))) // ((CAST(wide.na AS HUGEINT) * wide.nb))) AS BIGINT) AS delta_adj_milli
        FROM theta, wide
        """,
        tags=("ext-stats", "ext-events", "ext-sampling"),
    )
    def q_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
        """CUPED variance-reduced A/B readout (Deng et al. 2013): users
        hash-split into two arms, Y = post-period value, covariate X =
        PRE-period value (split at the midpoint timestamp); θ =
        cov(X,Y)/var(X) pooled, adjusted effect = ΔY − θ·ΔX. All
        sufficient statistics exact integers (milli-values), θ floored
        to ppm before the adjustment (snap-at-birth), effects in milli
        via sign-safe floors — the estimator every experimentation
        platform runs to shrink CIs without touching the treatment.
        One per-user conditional aggregate; arm/θ arithmetic is
        grid-sized."""
        from politicamente_etl_spark.operators.sampling import hash_bucket

        ev = load_events(spark, sf_dir)
        mid = ev.agg(
            F.expr(
                "CAST((CAST(MIN(unix_micros(ts)) AS decimal(38,0))"
                " + MAX(unix_micros(ts))) DIV 2 AS BIGINT)"
            ).alias("m")
        )
        per_user = (
            ev.join(F.broadcast(mid))
            .groupBy("user_id")
            .agg(
                F.sum(
                    F.when(
                        F.expr("unix_micros(ts)") < F.col("m"),
                        F.floor(F.col("value") * 1000).cast("long"),
                    ).otherwise(0)
                )
                .cast("long")
                .alias("x"),
                F.sum(
                    F.when(
                        F.expr("unix_micros(ts)") >= F.col("m"),
                        F.floor(F.col("value") * 1000).cast("long"),
                    ).otherwise(0)
                )
                .cast("long")
                .alias("y"),
            )
            .withColumn(
                "arm",
                hash_bucket("user_id", seed="ab-v1", n_buckets=2).cast(
                    "int"
                ),
            )
        )
        pooled = per_user.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.expr("CAST(x AS decimal(38,0)) * x")).alias("sxx"),
            F.sum(F.expr("CAST(x AS decimal(38,0)) * y")).alias("sxy"),
        )
        theta = pooled.select(
            "n",
            F.expr(
                "CAST(n AS decimal(38,0)) * sxy"
                " - CAST(sx AS decimal(38,0)) * sy"
            ).alias("cov_num"),
            F.expr(
                "CAST(n AS decimal(38,0)) * sxx"
                " - CAST(sx AS decimal(38,0)) * sx"
            ).alias("var_num"),
        )
        arms = per_user.groupBy("arm").agg(
            F.count(F.lit(1)).cast("long").alias("n_arm"),
            F.sum("x").cast("long").alias("sx_arm"),
            F.sum("y").cast("long").alias("sy_arm"),
        )
        wide = arms.agg(
            F.max(F.when(F.col("arm") == 0, F.col("n_arm"))).alias("na"),
            F.max(F.when(F.col("arm") == 0, F.col("sx_arm"))).alias("sxa"),
            F.max(F.when(F.col("arm") == 0, F.col("sy_arm"))).alias("sya"),
            F.max(F.when(F.col("arm") == 1, F.col("n_arm"))).alias("nb"),
            F.max(F.when(F.col("arm") == 1, F.col("sx_arm"))).alias("sxb"),
            F.max(F.when(F.col("arm") == 1, F.col("sy_arm"))).alias("syb"),
        )
        fdc = "(({x}) - pmod({x}, {d})) DIV ({d})"
        theta_ppm = fdc.format(x="cov_num * 1000000", d="var_num")
        raw_num = (
            "(CAST(syb AS decimal(38,0)) * na"
            " - CAST(sya AS decimal(38,0)) * nb) * 1000"
        )
        dx_num = (
            "(CAST(sxb AS decimal(38,0)) * na"
            " - CAST(sxa AS decimal(38,0)) * nb)"
        )
        den = "(CAST(na AS decimal(38,0)) * nb)"
        adj_num = (
            f"{raw_num} - "
            + fdc.format(x=f"({theta_ppm}) * {dx_num} * 1000", d="1000000")
        )
        return theta.join(F.broadcast(wide)).select(
            "na",
            "nb",
            F.col("cov_num").cast("long").alias("cov_num"),
            F.col("var_num").cast("long").alias("var_num"),
            F.expr(f"CAST({theta_ppm} AS BIGINT)").alias("theta_ppm"),
            F.expr(
                f"CAST({fdc.format(x=raw_num, d=den)} AS BIGINT)"
            ).alias("delta_raw_milli"),
            F.expr(
                f"CAST({fdc.format(x=adj_num, d=den)} AS BIGINT)"
            ).alias("delta_adj_milli"),
        )


_register_wave8()


def _register_wave8b():
    """Rich-club coefficients over the co-purchase graph."""
    from politicamente_etl_spark.plans.catalog import T, register
    from politicamente_etl_spark.plans.extended_r8 import (
        _CO_EDGE_SQL,
        _co_edges,
    )

    @register(
        "rich_club_coefficients",
        sql=f"""
        WITH {_CO_EDGE_SQL}, und AS (
            SELECT pa AS s, pb AS d FROM e
            UNION ALL SELECT pb, pa FROM e
        ), deg AS (
            SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM und GROUP BY 1
        ), ks AS (
            SELECT CAST(k AS BIGINT) AS k
            FROM (VALUES (2), (4), (8), (16)) t(k)
        ), club AS (
            SELECT ks.k, deg.node
            FROM ks JOIN deg ON deg.degree > ks.k
        ), msize AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS m FROM club GROUP BY 1
        ), ek AS (
            SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e_k
            FROM ks
            JOIN e ON TRUE
            JOIN deg da ON da.node = e.pa AND da.degree > ks.k
            JOIN deg db ON db.node = e.pb AND db.degree > ks.k
            GROUP BY 1
        )
        SELECT msize.k, msize.m, COALESCE(ek.e_k, 0) AS e_k,
               CAST(CASE WHEN msize.m < 2 THEN 0
                    ELSE 2 * COALESCE(ek.e_k, 0) * 1000000
                         // (msize.m * (msize.m - 1)) END AS BIGINT)
                   AS phi_ppm
        FROM msize LEFT JOIN ek USING (k)
        """,
        tags=("ext-graph", "ext-rel"),
    )
    def q_rich_club_coefficients(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Rich-club coefficient φ(k) = 2·E_{>k} / (m(m−1)) for k ∈
        {2,4,8,16}: how densely the high-degree parts interconnect —
        rising φ(k) = a hub oligarchy, the structural fact behind hub
        caps and skew controls elsewhere in this repo. Degree table +
        two broadcast semi-filters of the edge list per k (4-row k
        grid); everything bounded by the edge count."""
        e = _co_edges(spark, sf_dir)
        und = e.select(F.col("pa").alias("s")).unionAll(
            e.select(F.col("pb").alias("s"))
        )
        deg = und.groupBy(F.col("s").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("degree")
        )
        ks = spark.createDataFrame([(2,), (4,), (8,), (16,)], "k long")
        club = ks.join(F.broadcast(deg), F.col("degree") > F.col("k"))
        msize = club.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("m"))
        da = deg.select(
            F.col("node").alias("pa"), F.col("degree").alias("dega")
        )
        db = deg.select(
            F.col("node").alias("pb"), F.col("degree").alias("degb")
        )
        ej = e.join(F.broadcast(da), "pa").join(F.broadcast(db), "pb")
        ek = (
            ks.join(
                F.broadcast(ej),
                (F.col("dega") > F.col("k")) & (F.col("degb") > F.col("k")),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
        )
        return (
            msize.join(ek, "k", "left")
            .select(
                "k",
                "m",
                F.coalesce(F.col("e_k"), F.lit(0)).cast("long").alias("e_k"),
                F.expr(
                    "CAST(CASE WHEN m < 2 THEN 0"
                    " ELSE 2 * COALESCE(e_k, 0) * 1000000"
                    " DIV (m * (m - 1)) END AS BIGINT)"
                ).alias("phi_ppm"),
            )
        )


_register_wave8b()


def _register_wave8c():
    """PR curve + average precision for the gate — the full
    threshold-sweep complement of the single-point Youden/PR reports,
    both exact over the bounded bucketed-score summary."""
    from politicamente_etl_spark.operators import text
    from politicamente_etl_spark.plans.catalog import T, register
    from politicamente_etl_spark.plans.extended_r8 import (
        _classifier_scored_cte,
        _fd_sql,
    )

    _SWEEP_CTE = (
        _classifier_scored_cte()
        + f""", j AS (
            SELECT {_fd_sql('logits.logit', 1000)} AS s, truth.label
            FROM logits JOIN truth USING (doc_id)
        ), ps AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS n_tot,
                   CAST(SUM(label) AS BIGINT) AS n_pos
            FROM j GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(n_pos) AS BIGINT) AS p FROM ps
        ), sweep AS (
            SELECT s AS thr,
                   CAST(SUM(n_pos) OVER (ORDER BY s
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS BIGINT) AS tp,
                   CAST(SUM(n_tot) OVER (ORDER BY s
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS BIGINT) AS n_pred
            FROM ps
        )"""
    )

    @register(
        "pr_curve_points",
        sql=_SWEEP_CTE
        + """
        SELECT thr, tp, n_pred,
               CAST(tp * 1000000 // n_pred AS BIGINT) AS precision_ppm,
               CAST(tp * 1000000 // tot.p AS BIGINT) AS recall_ppm
        FROM sweep, tot
        """,
        tags=("ext-stats", "ext-text", "ext-docs"),
    )
    def q_pr_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The gate's full precision-recall curve, one point per
        bucketed threshold ("positive when s ≥ thr") — exact integer
        reverse-cumulative TP / predicted-positive counts over the
        bounded score summary, so the whole curve costs one grid pass.
        Feeds dashboards and the AP integral next door."""
        from pyspark.sql import Window

        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        w = text.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
        logit = text.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        ).select("doc_id", "logit_micro")
        truth = docs.select(
            "doc_id",
            (
                F.expr(
                    "(size(array_distinct(split(text, ' '))) * 1000)"
                    " div size(split(text, ' '))"
                )
                >= 800
            )
            .cast("int")
            .alias("label"),
        )
        j = logit.join(truth, "doc_id").select(
            F.expr(
                "(logit_micro - pmod(logit_micro, 1000)) DIV 1000"
            ).alias("s"),
            "label",
        )
        ps = j.groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("n_tot"),
            F.sum("label").cast("long").alias("n_pos"),
        )
        tot = ps.agg(F.sum("n_pos").cast("long").alias("p"))
        w_ge = Window.orderBy("s").rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        sweep = ps.select(
            F.col("s").alias("thr"),
            F.sum("n_pos").over(w_ge).cast("long").alias("tp"),
            F.sum("n_tot").over(w_ge).cast("long").alias("n_pred"),
        )
        return sweep.join(F.broadcast(tot)).select(
            "thr",
            "tp",
            "n_pred",
            F.expr("tp * 1000000 DIV n_pred")
            .cast("long")
            .alias("precision_ppm"),
            F.expr("tp * 1000000 DIV p").cast("long").alias("recall_ppm"),
        )

    @register(
        "average_precision_gate",
        sql=_SWEEP_CTE
        + """, pts AS (
            SELECT thr, tp, n_pred,
                   tp - COALESCE(lead(tp) OVER (ORDER BY thr), 0) AS d_tp
            FROM sweep
        )
        SELECT CAST(tot.p AS BIGINT) AS n_pos,
               CAST(SUM(CAST(d_tp AS HUGEINT) * tp * 1000000
                        // n_pred) AS BIGINT) AS ap_num_ppm,
               CAST(SUM(CAST(d_tp AS HUGEINT) * tp * 1000000
                        // n_pred) // tot.p AS BIGINT) AS ap_ppm
        FROM pts, tot
        GROUP BY tot.p
        """,
        tags=("ext-stats", "ext-text", "ext-docs"),
    )
    def q_average_precision_gate(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Average precision (AP = Σ ΔR·P, the PR-curve integral and
        ranking-quality single number next to ROC-AUC — the better
        summary under class imbalance): threshold steps descend the
        bucketed sweep, ΔTP between consecutive thresholds weights each
        point's exact precision; everything integer on the bounded
        summary (per-step floor snap, then one division by n_pos)."""
        from pyspark.sql import Window

        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        w = text.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
        logit = text.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        ).select("doc_id", "logit_micro")
        truth = docs.select(
            "doc_id",
            (
                F.expr(
                    "(size(array_distinct(split(text, ' '))) * 1000)"
                    " div size(split(text, ' '))"
                )
                >= 800
            )
            .cast("int")
            .alias("label"),
        )
        j = logit.join(truth, "doc_id").select(
            F.expr(
                "(logit_micro - pmod(logit_micro, 1000)) DIV 1000"
            ).alias("s"),
            "label",
        )
        ps = j.groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("n_tot"),
            F.sum("label").cast("long").alias("n_pos"),
        )
        tot = ps.agg(F.sum("n_pos").cast("long").alias("p"))
        w_ge = Window.orderBy("s").rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        sweep = ps.select(
            F.col("s").alias("thr"),
            F.sum("n_pos").over(w_ge).cast("long").alias("tp"),
            F.sum("n_tot").over(w_ge).cast("long").alias("n_pred"),
        )
        pts = sweep.select(
            "thr",
            "tp",
            "n_pred",
            (
                F.col("tp")
                - F.coalesce(
                    F.lead("tp").over(Window.orderBy("thr")), F.lit(0)
                )
            ).alias("d_tp"),
        )
        return (
            pts.join(F.broadcast(tot))
            .groupBy("p")
            .agg(
                F.sum(
                    F.expr(
                        "CAST(d_tp AS decimal(38,0)) * tp * 1000000"
                        " DIV n_pred"
                    )
                ).alias("ap_num_d")
            )
            .select(
                F.col("p").alias("n_pos"),
                F.col("ap_num_d").cast("long").alias("ap_num_ppm"),
                F.expr("CAST(ap_num_d DIV p AS BIGINT)").alias("ap_ppm"),
            )
        )


_register_wave8c()


def _register_wave9():
    """Wave 9: rank-based and robust ANOVA (Kruskal-Wallis H with tie
    correction, Brown-Forsythe variance equality), and an EVT
    mean-excess profile of the revenue tail."""
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "kruskal_wallis_segments",
        sql="""
        WITH j AS (
            SELECT c_mktsegment AS g,
                   CAST(floor(o_totalprice * 100) AS BIGINT) // 1000000
                       AS v
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), pv AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS cn FROM j GROUP BY 1
        ), rk AS (
            SELECT v,
                   2 * COALESCE(SUM(cn) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) + cn + 1 AS r2
            FROM pv
        ), gs AS (
            SELECT j.g, CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(rk.r2) AS BIGINT) AS sr2
            FROM j JOIN rk ON j.v = rk.v GROUP BY 1
        ), nn AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n FROM gs
        ), hraw AS (
            -- H = 12/(N(N+1)) Σ R_g²/n_g − 3(N+1), with doubled ranks:
            -- Σ R_g²/n_g = Σ (sr2/2)²/n_g = Σ sr2²/(4 n_g)
            SELECT CAST(SUM(CAST(sr2 AS HUGEINT) * sr2 * 1000
                            // (4 * n_g)) AS HUGEINT) AS s_milli, nn.n
            FROM gs, nn GROUP BY nn.n
        ), ties AS (
            SELECT CAST(COALESCE(SUM(CAST(cn AS HUGEINT) * cn * cn - cn), 0)
                        AS HUGEINT) AS t3t
            FROM pv WHERE cn > 1
        )
        SELECT hraw.n,
               CAST((12 * hraw.s_milli // (CAST(hraw.n AS HUGEINT)
                     * (hraw.n + 1))) - 3000 * (hraw.n + 1) AS BIGINT)
                   AS h_milli,
               CAST(ties.t3t AS BIGINT) AS tie_t3t,
               CAST(((12 * hraw.s_milli // (CAST(hraw.n AS HUGEINT)
                      * (hraw.n + 1))) - 3000 * (hraw.n + 1)) * 1000000
                    // (1000000 - ties.t3t * 1000000
                        // (CAST(hraw.n AS HUGEINT) * hraw.n * hraw.n
                            - hraw.n)) AS BIGINT) AS h_corrected_milli
        FROM hraw, ties
        """,
        tags=("ext-stats", "ext-rel"),
    )
    def q_kruskal_wallis_segments(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Kruskal-Wallis rank ANOVA: do the five market segments draw
        order values from the same distribution? H over DOUBLED average
        ranks (the _rank2x integer trick — Σ R_g²/n_g = Σ sr2²/(4n_g)
        stays exact), tie-corrected by 1 − Σ(t³−t)/(N³−N) in ppm;
        values bucketed to $10k so the rank summary is bounded (rank
        tests over bucketed values are exactly the tie-corrected tests
        of the bucketed variable). H ≳ 9488 milli rejects at p < 0.05
        (χ²₄). One corpus rollup; windows on the value summary."""
        from pyspark.sql import Window

        j = (
            T(spark, sf_dir, "orders")
            .join(
                F.broadcast(
                    T(spark, sf_dir, "customer").select(
                        "c_custkey", "c_mktsegment"
                    )
                ),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select(
                F.col("c_mktsegment").alias("g"),
                F.expr(
                    "CAST(floor(o_totalprice * 100) AS BIGINT) DIV 1000000"
                ).alias("v"),
            )
        )
        pv = j.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cn"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        rk = pv.select(
            "v",
            (
                2 * F.coalesce(F.sum("cn").over(w), F.lit(0))
                + F.col("cn")
                + 1
            )
            .cast("long")
            .alias("r2"),
        )
        gs = (
            j.join(F.broadcast(rk), "v")
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_g"),
                F.sum("r2").cast("long").alias("sr2"),
            )
        )
        nn = gs.agg(F.sum("n_g").cast("long").alias("n"))
        # exact-multiple decimal floor: (x - pmod(x, d)) / d divides an
        # exact multiple, so the decimal quotient is integral and exact —
        # Spark's DIV returns LONG and the quotient here outgrows it
        # around N ~ 5e5 rows (found by the 4x scale probe, which
        # crashed with ARITHMETIC_OVERFLOW rather than wrapping)
        _t = "CAST(sr2 AS decimal(38,0)) * sr2 * 1000"
        hraw = gs.join(F.broadcast(nn)).agg(
            F.first("n").alias("n"),
            F.sum(
                F.expr(
                    f"(({_t}) - pmod({_t}, 4 * n_g)) / (4 * n_g)"
                )
            ).alias("s_milli"),
        )
        ties = pv.filter(F.col("cn") > 1).agg(
            F.coalesce(
                F.sum(
                    F.expr("CAST(cn AS decimal(38,0)) * cn * cn - cn")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("t3t")
        )
        def _fdiv(x, d):
            return f"((({x}) - pmod({x}, {d})) / ({d}))"

        h = (
            _fdiv("12 * s_milli", "CAST(n AS decimal(38,0)) * (n + 1)")
            + " - 3000 * (n + 1)"
        )
        corr = (
            "1000000 - "
            + _fdiv(
                "t3t * 1000000",
                "CAST(n AS decimal(38,0)) * n * n - n",
            )
        )
        return hraw.join(F.broadcast(ties)).select(
            "n",
            F.expr(f"CAST({h} AS BIGINT)").alias("h_milli"),
            F.col("t3t").cast("long").alias("tie_t3t"),
            F.expr(
                f"CAST({_fdiv(f'({h}) * 1000000', f'({corr})')} AS BIGINT)"
            ).alias("h_corrected_milli"),
        )


_register_wave9()


def _register_wave9b():
    """Brown-Forsythe variance-equality test and the EVT mean-excess
    profile."""
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "variance_equality_brownforsythe",
        sql="""
        WITH j AS (
            SELECT c_mktsegment AS g,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS y
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), med AS (
            SELECT g, y AS m FROM (
                SELECT g, y, row_number() OVER (PARTITION BY g ORDER BY y)
                           AS rn,
                       COUNT(*) OVER (PARTITION BY g) AS n_g
                FROM j
            ) WHERE rn = (n_g + 1) // 2
        ), z AS (
            SELECT j.g, abs(j.y - med.m) AS z
            FROM j JOIN med ON j.g = med.g
        ), gs AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(z) AS BIGINT) AS sz,
                   CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz
            FROM z GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(sz) AS BIGINT) AS sz_all
            FROM gs
        ), parts AS (
            -- between·n = Σ (n·sz_g − n_g·sz_all)² / (n_g·n)   (scaled)
            -- within    = Σ szz_g − sz_g²/n_g
            SELECT CAST(SUM((CAST(tot.n AS HUGEINT) * gs.sz
                             - CAST(gs.n_g AS HUGEINT) * tot.sz_all)
                            * (CAST(tot.n AS HUGEINT) * gs.sz
                               - CAST(gs.n_g AS HUGEINT) * tot.sz_all)
                            // (CAST(gs.n_g AS HUGEINT) * tot.n * tot.n))
                        AS HUGEINT) AS between_num,
                   CAST(SUM(gs.szz - CAST(gs.sz AS HUGEINT) * gs.sz
                            // gs.n_g) AS HUGEINT) AS within_num,
                   tot.n, tot.k
            FROM gs, tot GROUP BY tot.n, tot.k
        )
        SELECT n, k,
               CAST(between_num // n AS BIGINT) AS between_per_n,
               CAST(within_num // n AS BIGINT) AS within_per_n,
               CAST(between_num * (n - k) * 1000
                    // (within_num * (k - 1)) AS BIGINT) AS w_milli
        FROM parts
        """,
        tags=("ext-stats", "ext-rel"),
    )
    def q_variance_equality_brownforsythe(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Brown-Forsythe test (Levene with group MEDIANS — robust to
        heavy tails): do segments have equal order-value spread?
        z = |y − median_g| on exact lower medians, then the one-way
        ANOVA F on z from integer sufficient statistics:
        W = ((n−k)/(k−1)) · Σn_g(z̄_g−z̄)² / Σ(z−z̄_g)², assembled as
        one exact HUGEINT ratio (per-group floor snaps). W ≳ 2372
        milli rejects equal variances at p<0.05 (F₄,∞). Median via a
        per-group rank window; one stats pass after."""
        from pyspark.sql import Window

        j = (
            T(spark, sf_dir, "orders")
            .join(
                F.broadcast(
                    T(spark, sf_dir, "customer").select(
                        "c_custkey", "c_mktsegment"
                    )
                ),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select(
                F.col("c_mktsegment").alias("g"),
                F.floor(F.col("o_totalprice") * 100).cast("long").alias("y"),
            )
        )
        wg = Window.partitionBy("g").orderBy("y")
        wcnt = Window.partitionBy("g")
        med = (
            j.select(
                "g",
                "y",
                F.row_number().over(wg).alias("rn"),
                F.count(F.lit(1)).over(wcnt).alias("n_g"),
            )
            .filter(F.expr("rn = (n_g + 1) DIV 2"))
            .select("g", F.col("y").alias("m"))
        )
        z = j.join(F.broadcast(med), "g").select(
            "g", F.abs(F.col("y") - F.col("m")).alias("z")
        )
        gs = z.groupBy("g").agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("z").cast("long").alias("sz"),
            F.sum(F.expr("CAST(z AS decimal(38,0)) * z")).alias("szz"),
        )
        tot = gs.agg(
            F.sum("n_g").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("sz").cast("long").alias("sz_all"),
        )
        parts = gs.join(F.broadcast(tot)).agg(
            F.first("n").alias("n"),
            F.first("k").alias("k"),
            # exact-multiple decimal floors: DIV would return LONG and
            # both quotients outgrow it near N ~ 5e6 (same class as the
            # Kruskal-Wallis overflow the 4x probe caught)
            F.sum(
                F.expr(
                    "(((CAST(n AS decimal(38,0)) * sz"
                    "   - CAST(n_g AS decimal(38,0)) * sz_all)"
                    "  * (CAST(n AS decimal(38,0)) * sz"
                    "     - CAST(n_g AS decimal(38,0)) * sz_all))"
                    " - pmod((CAST(n AS decimal(38,0)) * sz"
                    "         - CAST(n_g AS decimal(38,0)) * sz_all)"
                    "        * (CAST(n AS decimal(38,0)) * sz"
                    "           - CAST(n_g AS decimal(38,0)) * sz_all),"
                    "        CAST(n_g AS decimal(38,0)) * n * n))"
                    " / (CAST(n_g AS decimal(38,0)) * n * n)"
                )
            ).alias("between_num"),
            F.sum(
                F.expr(
                    "szz - ((CAST(sz AS decimal(38,0)) * sz"
                    "        - pmod(CAST(sz AS decimal(38,0)) * sz, n_g))"
                    "       / n_g)"
                )
            ).alias("within_num"),
        )
        # raw sums outgrow BIGINT near N ~ 5e6 (CAST_OVERFLOW, found by
        # the 4x probe) — emit them per-n; the ratio statistic uses the
        # unscaled decimals
        return parts.select(
            "n",
            "k",
            F.expr(
                "CAST((between_num - pmod(between_num, n)) / n AS BIGINT)"
            ).alias("between_per_n"),
            F.expr(
                "CAST((within_num - pmod(within_num, n)) / n AS BIGINT)"
            ).alias("within_per_n"),
            F.expr(
                "CAST((CAST(between_num AS decimal(38,0)) * (n - k) * 1000"
                " - pmod(CAST(between_num AS decimal(38,0)) * (n - k)"
                "        * 1000,"
                "        CAST(within_num AS decimal(38,0)) * (k - 1)))"
                " / (CAST(within_num AS decimal(38,0)) * (k - 1))"
                " AS BIGINT)"
            ).alias("w_milli"),
        )

    @register(
        "mean_excess_profile",
        sql="""
        WITH y AS (
            SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), thr AS (
            SELECT CAST(u AS BIGINT) * 10000000 AS u
            FROM (VALUES (1), (2), (3), (4)) t(u)
        )
        SELECT thr.u AS threshold_cents,
               CAST(COUNT(CASE WHEN y.cents > thr.u THEN 1 END) AS BIGINT)
                   AS n_exceed,
               CAST(COALESCE(SUM(CASE WHEN y.cents > thr.u
                             THEN y.cents - thr.u END), 0) AS BIGINT)
                   AS excess_sum,
               CAST(CASE WHEN COUNT(CASE WHEN y.cents > thr.u THEN 1 END)
                         = 0 THEN NULL
                    ELSE COALESCE(SUM(CASE WHEN y.cents > thr.u
                                  THEN y.cents - thr.u END), 0)
                         // COUNT(CASE WHEN y.cents > thr.u THEN 1 END)
                    END AS BIGINT) AS mean_excess_cents
        FROM y CROSS JOIN thr
        GROUP BY 1
        """,
        tags=("ext-stats",),
    )
    def q_mean_excess_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """EVT mean-excess function e(u) = E[Y−u | Y>u] at a $100k-step
        threshold grid — the diagnostic whose slope identifies the tail
        family (linear-rising ⇒ Pareto/heavy, flat ⇒ exponential,
        falling ⇒ short tail) and the empirical anchor under the Hill
        estimator's k choice. One pass with a 4-row broadcast threshold
        grid; exact integer cents."""
        y = T(spark, sf_dir, "orders").select(
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
        )
        thr = spark.createDataFrame(
            [(10_000_000,), (20_000_000,), (30_000_000,), (40_000_000,)],
            "u long",
        )
        return (
            y.join(F.broadcast(thr))
            .groupBy(F.col("u").alias("threshold_cents"))
            .agg(
                F.count(F.when(F.col("cents") > F.col("u"), 1))
                .cast("long")
                .alias("n_exceed"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("cents") > F.col("u"),
                            F.col("cents") - F.col("u"),
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("excess_sum"),
            )
            .select(
                "threshold_cents",
                "n_exceed",
                "excess_sum",
                F.expr(
                    "CAST(CASE WHEN n_exceed = 0 THEN NULL"
                    " ELSE excess_sum DIV n_exceed END AS BIGINT)"
                ).alias("mean_excess_cents"),
            )
        )


_register_wave9b()


def _register_wave10():
    """Wave 10: informative-prior log-odds keywords (Monroe et al.
    2008 'Fightin' Words' — what vocabulary characterizes a source),
    half-life-decayed item popularity (integer power-of-two decay),
    and the Cochran-Armitage trend test for proportions over ordered
    groups."""
    from politicamente_etl_spark.plans.catalog import T, register

    _ISQ = (
        "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        " - CASE WHEN CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        "          > ({x}) THEN 1 ELSE 0 END"
        " + CASE WHEN (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
        "          <= ({x}) THEN 1 ELSE 0 END)"
    )
    _LN = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1e6) AS BIGINT)"

    @register(
        "source_logodds_keywords",
        sql=f"""
        WITH toks AS (
            SELECT source AS g, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), c AS (
            SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS cgw
            FROM toks GROUP BY 1, 2
        ), tw AS (
            SELECT tok, CAST(SUM(cgw) AS BIGINT) AS cw FROM c GROUP BY 1
        ), ng AS (
            SELECT g, CAST(SUM(cgw) AS BIGINT) AS n_g FROM c GROUP BY 1
        ), nn AS (
            SELECT CAST(SUM(cw) AS BIGINT) AS n FROM tw
        ), z AS (
            SELECT c.g, c.tok, c.cgw,
                   tw.cw - c.cgw AS crw,
                   ng.n_g, nn.n,
                   ({_LN.format(x="(c.cgw + 1)")}
                    - {_LN.format(x="(ng.n_g - c.cgw + 1)")}
                    - {_LN.format(x="(tw.cw - c.cgw + 1)")}
                    + {_LN.format(x="(nn.n - ng.n_g - tw.cw + c.cgw + 1)")})
                       AS delta_micro,
                   1000000 // (c.cgw + 1)
                   + 1000000 // (tw.cw - c.cgw + 1) AS var_micro
            FROM c JOIN tw USING (tok) JOIN ng USING (g) CROSS JOIN nn
        ), scored AS (
            SELECT g, tok, cgw, delta_micro,
                   CAST(CASE WHEN delta_micro >= 0 THEN
                        {_ISQ.format(
                            x="delta_micro * delta_micro * 1000000"
                              " // (var_micro * 1000000)")}
                        ELSE
                        -{_ISQ.format(
                            x="delta_micro * delta_micro * 1000000"
                              " // (var_micro * 1000000)")}
                        END AS BIGINT) AS z_milli
            FROM z
        )
        SELECT g AS source, tok, cgw, delta_micro, z_milli
        FROM (
            SELECT *, row_number() OVER (PARTITION BY g
                      ORDER BY z_milli DESC, tok) AS rn
            FROM scored
        ) WHERE rn <= 3
        """,
        tags=("ext-text", "ext-stats", "ext-docs"),
    )
    def q_source_logodds_keywords(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """'Fightin' Words' (Monroe et al. 2008): which tokens
        characterize each source vs the rest — smoothed log-odds-ratio
        δ = ln(odds_in) − ln(odds_rest) with add-1 informative prior,
        z-scored by its variance ≈ 1/(c+1) + 1/(c_rest+1); top-3 per
        source. Micro-nat lns of add-1 counts, exact isqrt for the z.
        The raw-frequency-independent keyword extractor next to the
        tf-idf top terms. One token aggregate; bounded vocab work."""
        from pyspark.sql import Window

        toks = T(spark, sf_dir, "documents").select(
            F.col("source").alias("g"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        c = toks.groupBy("g", "tok").agg(
            F.count(F.lit(1)).cast("long").alias("cgw")
        )
        tw = c.groupBy("tok").agg(F.sum("cgw").cast("long").alias("cw"))
        ng = c.groupBy("g").agg(F.sum("cgw").cast("long").alias("n_g"))
        nn = tw.agg(F.sum("cw").cast("long").alias("n"))
        ln = _LN.replace("//", "DIV")
        z = (
            c.join(F.broadcast(tw), "tok")
            .join(F.broadcast(ng), "g")
            .join(F.broadcast(nn))
            .select(
                "g",
                "tok",
                "cgw",
                (
                    F.expr(ln.format(x="(cgw + 1)"))
                    - F.expr(ln.format(x="(n_g - cgw + 1)"))
                    - F.expr(ln.format(x="(cw - cgw + 1)"))
                    + F.expr(ln.format(x="(n - n_g - cw + cgw + 1)"))
                )
                .cast("long")
                .alias("delta_micro"),
                F.expr(
                    "1000000 DIV (cgw + 1) + 1000000 DIV (cw - cgw + 1)"
                )
                .cast("long")
                .alias("var_micro"),
            )
        )
        isq = _ISQ.replace("//", "DIV")
        z2 = (
            "delta_micro * delta_micro * 1000000"
            " DIV (var_micro * 1000000)"
        )
        scored = z.select(
            "g",
            "tok",
            "cgw",
            "delta_micro",
            F.expr(
                f"CAST(CASE WHEN delta_micro >= 0 THEN {isq.format(x=z2)}"
                f" ELSE -{isq.format(x=z2)} END AS BIGINT)"
            ).alias("z_milli"),
        )
        w = Window.partitionBy("g").orderBy(
            F.col("z_milli").desc(), F.col("tok")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select(F.col("g").alias("source"), "tok", "cgw",
                    "delta_micro", "z_milli")
        )

    @register(
        "decayed_item_popularity",
        sql="""
        WITH mx AS (
            SELECT MAX(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                       AS BIGINT)) AS dmax
            FROM orders
        ), li AS (
            SELECT l_partkey,
                   (mx.dmax - CAST(CAST(o_orderdate AS DATE)
                        - DATE '1970-01-01' AS BIGINT)) // 180 AS half_lives
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            CROSS JOIN mx
        )
        SELECT l_partkey AS part,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN half_lives >= 20 THEN 0
                        ELSE 1048576 // CAST(power(2, half_lives) AS BIGINT)
                        END) AS BIGINT) AS decayed_micro20
        FROM li
        GROUP BY 1
        ORDER BY decayed_micro20 DESC, part
        LIMIT 25
        """,
        tags=("ext-rel", "ext-temporal"),
    )
    def q_decayed_item_popularity(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Half-life-decayed item popularity (half-life 180 days):
        weight = 2^20 >> ⌊age/h⌋ — EXACT integer power-of-two decay (no
        float exp), the recency-aware popularity every 'trending'
        ranker uses where raw counts would let stale hits squat. Top-25
        parts; one dim-broadcast join + one aggregate."""
        o = T(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day"),
        )
        mx = o.agg(F.max("day").alias("dmax"))
        li = (
            T(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .join(o, F.col("l_orderkey") == o.o_orderkey)
            .join(F.broadcast(mx))
            .select(
                "l_partkey",
                F.expr("(dmax - day) div 180").alias("half_lives"),
            )
        )
        return (
            li.groupBy(F.col("l_partkey").alias("part"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_purchases"),
                F.sum(
                    F.expr(
                        "CASE WHEN half_lives >= 20 THEN 0"
                        " ELSE shiftright(1048576, CAST(half_lives AS INT))"
                        " END"
                    )
                )
                .cast("long")
                .alias("decayed_micro20"),
            )
            .orderBy(F.col("decayed_micro20").desc(), "part")
            .limit(25)
        )

    @register(
        "cochran_armitage_trend",
        sql=f"""
        WITH d AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
                   CAST((len(list_distinct(string_split(text, ' '))) * 1000)
                        // len(string_split(text, ' ')) >= 800 AS INT)
                       AS y
            FROM documents
        ), b AS (
            SELECT CAST(CASE WHEN n_tok < 40 THEN 0
                        WHEN n_tok < 80 THEN 1
                        WHEN n_tok < 120 THEN 2
                        ELSE 3 END AS BIGINT) AS grp, y
            FROM d
        ), gs AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_i,
                   CAST(SUM(y) AS BIGINT) AS r_i
            FROM b GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                   CAST(SUM(r_i) AS BIGINT) AS r,
                   CAST(SUM(n_i * grp) AS BIGINT) AS snt,
                   CAST(SUM(n_i * grp * grp) AS BIGINT) AS snt2,
                   CAST(SUM(r_i * grp) AS BIGINT) AS srt
            FROM gs
        )
        SELECT n, r,
               CAST(n * srt - r * snt AS BIGINT) AS a_num,
               CAST(CASE WHEN r * (n - r) * (n * snt2 - snt * snt) = 0
                    THEN NULL
                    WHEN n * srt - r * snt >= 0 THEN
                    {_ISQ.format(
                        x="(n * srt - r * snt) * (n * srt - r * snt)"
                          " * n * 1000000"
                          " // (r * (n - r) * (n * snt2 - snt * snt))")}
                    ELSE
                    -{_ISQ.format(
                        x="(n * srt - r * snt) * (n * srt - r * snt)"
                          " * n * 1000000"
                          " // (r * (n - r) * (n * snt2 - snt * snt))")}
                    END AS BIGINT) AS z_milli
        FROM tot
        """,
        tags=("ext-stats", "ext-docs"),
    )
    def q_cochran_armitage_trend(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Cochran-Armitage trend test: does the gate's positive rate
        rise MONOTONICALLY with document-length band (scores 0..3)? The
        χ²-family test with the trend alternative — more powerful than
        the omnibus χ² when the direction is the hypothesis:
        z = (nΣr_i t_i − rΣn_i t_i)·√n / √(r(n−r)(nΣn_i t_i² − (Σn_i t_i)²)),
        every factor an exact integer, signed z in milli via exact
        isqrt. One conditional aggregate to the 4-band summary."""
        d = T(spark, sf_dir, "documents").select(
            F.expr("size(split(text, ' '))").alias("n_tok"),
            (
                F.expr(
                    "(size(array_distinct(split(text, ' '))) * 1000)"
                    " div size(split(text, ' '))"
                )
                >= 800
            )
            .cast("int")
            .alias("y"),
        )
        b = d.select(
            F.expr(
                "CAST(CASE WHEN n_tok < 40 THEN 0 WHEN n_tok < 80 THEN 1"
                " WHEN n_tok < 120 THEN 2 ELSE 3 END AS BIGINT)"
            ).alias("grp"),
            "y",
        )
        gs = b.groupBy("grp").agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum("y").cast("long").alias("r_i"),
        )
        tot = gs.agg(
            F.sum("n_i").cast("long").alias("n"),
            F.sum("r_i").cast("long").alias("r"),
            F.sum(F.col("n_i") * F.col("grp")).cast("long").alias("snt"),
            F.sum(F.col("n_i") * F.col("grp") * F.col("grp"))
            .cast("long")
            .alias("snt2"),
            F.sum(F.col("r_i") * F.col("grp")).cast("long").alias("srt"),
        )
        isq = _ISQ.replace("//", "DIV")
        z2 = (
            "CAST(n * srt - r * snt AS decimal(38,0))"
            " * (n * srt - r * snt) * n * 1000000"
            " DIV (CAST(r AS decimal(38,0)) * (n - r)"
            "      * (CAST(n AS decimal(38,0)) * snt2"
            "         - CAST(snt AS decimal(38,0)) * snt))"
        )
        return tot.select(
            "n",
            "r",
            F.expr("CAST(n * srt - r * snt AS BIGINT)").alias("a_num"),
            F.expr(
                f"CAST(CASE WHEN CAST(r AS decimal(38,0)) * (n - r)"
                f" * (CAST(n AS decimal(38,0)) * snt2"
                f"    - CAST(snt AS decimal(38,0)) * snt) = 0 THEN NULL"
                f" WHEN n * srt - r * snt >= 0 THEN {isq.format(x=z2)}"
                f" ELSE -{isq.format(x=z2)} END AS BIGINT)"
            ).alias("z_milli"),
        )


_register_wave10()


def _register_wave11():
    """Wave 11: Wald's SPRT sequential conversion monitor (the
    daily-decision boundary walk) and Kendall's tau-b association over
    the bounded joint-bucket grid."""
    from politicamente_etl_spark.plans.catalog import (
        T,
        load_events,
        register,
    )
    from politicamente_etl_spark.plans.extended_r8 import (
        _classifier_scored_cte,
        _fd_sql,
    )

    # SPRT log-likelihood increments, micro-nats, H0 p=0.2 vs H1 p=0.3:
    # conv: ln(0.3/0.2), non-conv: ln(0.7/0.8) — Python-precomputed
    # literals shared by both engines (snap-at-birth of the constants)
    import math as _math

    _LLR_C = round(_math.log(0.3 / 0.2) * 1e6)  # +405465
    _LLR_N = round(_math.log(0.7 / 0.8) * 1e6)  # -133531
    _A = round(_math.log(19) * 1e6)  # upper boundary (alpha=beta=0.05)

    @register(
        "sprt_signup_monitor",
        sql=f"""
        WITH d AS (
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   CAST(CASE WHEN event_type = 'signup'
                        THEN 1 ELSE 0 END AS BIGINT) AS conv
            FROM events WHERE event_type IN ('signup', 'view')
        ), daily AS (
            SELECT day, CAST(SUM(conv) AS BIGINT) AS n_conv,
                   CAST(COUNT(*) - SUM(conv) AS BIGINT) AS n_fail
            FROM d GROUP BY 1
        ), walk AS (
            SELECT day, n_conv, n_fail,
                   CAST(SUM(n_conv * {_LLR_C} + n_fail * {_LLR_N})
                        OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS llr_micro
            FROM daily
        )
        SELECT day, n_conv, n_fail, llr_micro,
               CAST(CASE WHEN llr_micro >= {_A} THEN 1
                    WHEN llr_micro <= -{_A} THEN -1
                    ELSE 0 END AS INT) AS decision
        FROM walk
        """,
        tags=("ext-stats", "ext-events", "ext-temporal"),
    )
    def q_sprt_signup_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Wald's SPRT run daily over the signup-vs-view stream: the
        cumulative log-likelihood ratio of H₁ (signup share 0.3)
        against H₀ (0.2), with ±ln 19 boundaries (α = β = 0.05) — the
        sequential test that lets a monitor STOP as soon as the
        evidence crosses a boundary instead of waiting for a fixed n.
        Increments are Python-precomputed micro-nat literals shared by
        both engines; the walk is a window over the bounded day grid;
        decision ∈ {{−1 accept H₀, 0 continue, +1 accept H₁}} per day."""
        from pyspark.sql import Window

        ev = load_events(spark, sf_dir)
        d = ev.filter(
            F.col("event_type").isin("signup", "view")
        ).select(
            F.expr("unix_micros(ts) div 86400000000")
            .cast("long")
            .alias("day"),
            (F.col("event_type") == "signup").cast("long").alias("conv"),
        )
        daily = d.groupBy("day").agg(
            F.sum("conv").cast("long").alias("n_conv"),
            (F.count(F.lit(1)) - F.sum("conv")).cast("long").alias("n_fail"),
        )
        w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        walk = daily.select(
            "day",
            "n_conv",
            "n_fail",
            F.sum(
                F.col("n_conv") * _LLR_C + F.col("n_fail") * _LLR_N
            )
            .over(w)
            .cast("long")
            .alias("llr_micro"),
        )
        return walk.select(
            "day",
            "n_conv",
            "n_fail",
            "llr_micro",
            F.expr(
                f"CAST(CASE WHEN llr_micro >= {_A} THEN 1"
                f" WHEN llr_micro <= -{_A} THEN -1 ELSE 0 END AS INT)"
            ).alias("decision"),
        )

    @register(
        "kendall_tau_quality_vs_logit",
        sql=_classifier_scored_cte()
        + f""", j AS (
            SELECT {_fd_sql('logits.logit', 10000)} AS x,
                   CAST((len(list_distinct(string_split(text, ' ')))
                         * 1000)
                        // len(string_split(text, ' ')) AS BIGINT) // 50
                       AS y
            FROM logits JOIN documents USING (doc_id)
        ), cells AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c
            FROM j GROUP BY 1, 2
        ), pairs AS (
            SELECT CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                                  OR (a.x > b.x AND a.y > b.y)
                             THEN CAST(a.c AS HUGEINT) * b.c
                             ELSE 0 END) AS HUGEINT) AS conc2,
                   CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                                  OR (a.x > b.x AND a.y < b.y)
                             THEN CAST(a.c AS HUGEINT) * b.c
                             ELSE 0 END) AS HUGEINT) AS disc2
            FROM cells a, cells b
        ), marg AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST((SELECT SUM(CAST(cx AS HUGEINT) * (cx - 1))
                         FROM (SELECT SUM(c) AS cx FROM cells GROUP BY x))
                        AS HUGEINT) AS tx2,
                   CAST((SELECT SUM(CAST(cy AS HUGEINT) * (cy - 1))
                         FROM (SELECT SUM(c) AS cy FROM cells GROUP BY y))
                        AS HUGEINT) AS ty2
            FROM cells
        )
        SELECT CAST(marg.n AS BIGINT) AS n,
               CAST(pairs.conc2 / 2 AS BIGINT) AS n_concordant,
               CAST(pairs.disc2 / 2 AS BIGINT) AS n_discordant,
               CAST(CASE WHEN (CAST(marg.n AS HUGEINT) * (marg.n - 1)
                               - marg.tx2)
                              * (CAST(marg.n AS HUGEINT) * (marg.n - 1)
                                 - marg.ty2) = 0 THEN NULL
                    WHEN pairs.conc2 >= pairs.disc2 THEN
                    (CAST(floor(sqrt(CAST(
                      (pairs.conc2 - pairs.disc2)
                      * (pairs.conc2 - pairs.disc2) * 1000000
                      // ((CAST(marg.n AS HUGEINT) * (marg.n - 1) - marg.tx2)
                         * (CAST(marg.n AS HUGEINT) * (marg.n - 1)
                            - marg.ty2))
                      AS DOUBLE))) AS BIGINT))
                    ELSE
                    -(CAST(floor(sqrt(CAST(
                      (pairs.disc2 - pairs.conc2)
                      * (pairs.disc2 - pairs.conc2) * 1000000
                      // ((CAST(marg.n AS HUGEINT) * (marg.n - 1) - marg.tx2)
                         * (CAST(marg.n AS HUGEINT) * (marg.n - 1)
                            - marg.ty2))
                      AS DOUBLE))) AS BIGINT))
                    END AS BIGINT) AS tau_b_milli_approx
        FROM pairs, marg
        """,
        tags=("ext-stats", "ext-text", "ext-docs"),
    )
    def q_kendall_tau_quality_vs_logit(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Kendall's τ-b between the gate logit (10-milli-nat buckets)
        and the lexical-diversity score (50-milli buckets): concordant
        − discordant over the BOUNDED joint-bucket grid (cell-pair
        products, O(grid²) constant cost — never row pairs), tie terms
        from the marginals, |τ| via the float-floor sqrt of the exact
        ratio (approx-root, documented: the num/den integers are the
        contract; parity holds because both engines floor the same
        double). The rank-correlation triplet is now complete:
        Spearman (ρ), Kendall (τ), AUC (c-statistic)."""
        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        from politicamente_etl_spark.operators import text as text_ops

        w = text_ops.fixture_hash_weights(
            spark, n_buckets=4096, seed="qc-w"
        )
        logit = text_ops.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        ).select("doc_id", "logit_micro")
        j = logit.join(docs, "doc_id").select(
            F.expr(
                "(logit_micro - pmod(logit_micro, 10000)) DIV 10000"
            ).alias("x"),
            F.expr(
                "CAST((size(array_distinct(split(text, ' '))) * 1000)"
                " div size(split(text, ' ')) AS BIGINT) DIV 50"
            ).alias("y"),
        )
        cells = j.groupBy("x", "y").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        a = cells.select(
            F.col("x").alias("ax"), F.col("y").alias("ay"),
            F.col("c").alias("ac"),
        )
        b = cells.select(
            F.col("x").alias("bx"), F.col("y").alias("by"),
            F.col("c").alias("bc"),
        )
        pairs = a.join(F.broadcast(b)).agg(
            F.sum(
                F.when(
                    ((F.col("ax") < F.col("bx")) & (F.col("ay") < F.col("by")))
                    | ((F.col("ax") > F.col("bx")) & (F.col("ay") > F.col("by"))),
                    F.expr("CAST(ac AS decimal(38,0)) * bc"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("conc2"),
            F.sum(
                F.when(
                    ((F.col("ax") < F.col("bx")) & (F.col("ay") > F.col("by")))
                    | ((F.col("ax") > F.col("bx")) & (F.col("ay") < F.col("by"))),
                    F.expr("CAST(ac AS decimal(38,0)) * bc"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("disc2"),
        )
        tx = (
            cells.groupBy("x")
            .agg(F.sum("c").alias("cx"))
            .agg(
                F.sum(F.expr("CAST(cx AS decimal(38,0)) * (cx - 1)")).alias(
                    "tx2"
                )
            )
        )
        ty = (
            cells.groupBy("y")
            .agg(F.sum("c").alias("cy"))
            .agg(
                F.sum(F.expr("CAST(cy AS decimal(38,0)) * (cy - 1)")).alias(
                    "ty2"
                )
            )
        )
        nn = cells.agg(F.sum("c").cast("long").alias("n"))
        den = (
            "(CAST(n AS decimal(38,0)) * (n - 1) - tx2)"
            " * (CAST(n AS decimal(38,0)) * (n - 1) - ty2)"
        )
        pos = (
            "CAST(floor(sqrt(CAST((conc2 - disc2) * (conc2 - disc2)"
            f" * 1000000 DIV ({den}) AS DOUBLE))) AS BIGINT)"
        )
        neg = (
            "CAST(floor(sqrt(CAST((disc2 - conc2) * (disc2 - conc2)"
            f" * 1000000 DIV ({den}) AS DOUBLE))) AS BIGINT)"
        )
        return (
            pairs.join(F.broadcast(tx))
            .join(F.broadcast(ty))
            .join(F.broadcast(nn))
            .select(
                "n",
                F.expr("CAST(conc2 / 2 AS BIGINT)").alias("n_concordant"),
                F.expr("CAST(disc2 / 2 AS BIGINT)").alias("n_discordant"),
                F.expr(
                    f"CAST(CASE WHEN {den} = 0 THEN NULL"
                    f" WHEN conc2 >= disc2 THEN {pos}"
                    f" ELSE -({neg}) END AS BIGINT)"
                ).alias("tau_b_milli_approx"),
            )
        )


_register_wave11()


def _register_wave11b():
    """Per-source PSI drift of the gate's logit distribution — the
    score-level monitoring sheet (a source whose SCORES drift needs a
    look even if its label mix hasn't moved)."""
    from politicamente_etl_spark.plans.catalog import T, register
    from politicamente_etl_spark.plans.extended_r8 import (
        _classifier_scored_cte,
        _fd_sql,
    )

    @register(
        "logit_psi_by_source",
        sql=_classifier_scored_cte()
        + f""", b AS (
            SELECT documents.source AS g,
                   {_fd_sql('logits.logit', 200000)} AS bin
            FROM logits JOIN documents USING (doc_id)
        ), grid AS (
            SELECT g.g, s.bin FROM (SELECT DISTINCT g FROM b) g
            CROSS JOIN (SELECT DISTINCT bin FROM b) s
        ), counts AS (
            SELECT grid.g, grid.bin,
                   CAST(COALESCE(COUNT(b.g), 0) + 1 AS BIGINT) AS cc
            FROM grid LEFT JOIN b ON b.g = grid.g AND b.bin = grid.bin
            GROUP BY 1, 2
        ), refc AS (
            SELECT bin, CAST(SUM(cc) AS BIGINT) AS cr FROM counts GROUP BY 1
        ), totals AS (
            SELECT g, CAST(SUM(cc) AS BIGINT) AS nc FROM counts GROUP BY 1
        ), reft AS (
            SELECT CAST(SUM(cr) AS BIGINT) AS nr FROM refc
        ), terms AS (
            SELECT c.g, c.bin,
                   CAST(c.cc * 1000000 // t.nc AS BIGINT) AS q_ppm,
                   CAST(r.cr * 1000000 // rt.nr AS BIGINT) AS p_ppm,
                   CAST(round(ln(CAST(r.cr AS DOUBLE)
                                 * CAST(t.nc AS DOUBLE)) * 1e6) AS BIGINT)
                   - CAST(round(ln(CAST(c.cc AS DOUBLE)
                                   * CAST(rt.nr AS DOUBLE)) * 1e6) AS BIGINT)
                       AS ln_diff_micro
            FROM counts c
            JOIN refc r USING (bin) JOIN totals t USING (g) CROSS JOIN reft rt
        )
        SELECT g AS source,
               CAST(SUM({_fd_sql(
                   "(p_ppm - q_ppm) * ln_diff_micro", 1_000_000)})
                    AS BIGINT) AS psi_micro
        FROM terms GROUP BY 1
        """,
        tags=("ext-stats", "ext-text", "ext-docs"),
    )
    def q_logit_psi_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
        """PSI of each source's gate-LOGIT distribution against the
        whole corpus (0.2-nat score bins, add-one smoothing on the
        zero-filled source×bin grid) — score-level drift monitoring:
        a source whose SCORE mass moves needs retraining attention even
        before its pass rate does. Same micro-nat ratio-log machinery
        as psi_report, grouped per source; one corpus scoring pass,
        grid-sized arithmetic after."""
        from politicamente_etl_spark.operators import text as text_ops

        docs = T(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        w = text_ops.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
        logit = text_ops.hashed_linear_score(
            docs.select("doc_id", "text"), w, n_buckets=4096, seed="qc-v1"
        ).select("doc_id", "logit_micro")
        b = logit.join(docs.select("doc_id", "source"), "doc_id").select(
            F.col("source").alias("g"),
            F.expr(
                "(logit_micro - pmod(logit_micro, 200000)) DIV 200000"
            ).alias("bin"),
        )
        grid = (
            b.select("g").distinct().join(F.broadcast(b.select("bin").distinct()))
        )
        counts = (
            grid.join(b.withColumn("one", F.lit(1)), ["g", "bin"], "left")
            .groupBy("g", "bin")
            .agg((F.count("one") + 1).cast("long").alias("cc"))
        )
        refc = counts.groupBy("bin").agg(
            F.sum("cc").cast("long").alias("cr")
        )
        totals = counts.groupBy("g").agg(
            F.sum("cc").cast("long").alias("nc")
        )
        reft = refc.agg(F.sum("cr").cast("long").alias("nr"))
        terms = (
            counts.join(F.broadcast(refc), "bin")
            .join(F.broadcast(totals), "g")
            .join(F.broadcast(reft))
            .select(
                "g",
                F.expr("cc * 1000000 DIV nc").cast("long").alias("q_ppm"),
                F.expr("cr * 1000000 DIV nr").cast("long").alias("p_ppm"),
                (
                    F.expr(
                        "CAST(round(ln(CAST(cr AS DOUBLE)"
                        " * CAST(nc AS DOUBLE)) * 1e6) AS BIGINT)"
                    )
                    - F.expr(
                        "CAST(round(ln(CAST(cc AS DOUBLE)"
                        " * CAST(nr AS DOUBLE)) * 1e6) AS BIGINT)"
                    )
                )
                .cast("long")
                .alias("ln_diff_micro"),
            )
        )
        fd = "(({x}) - pmod({x}, 1000000)) DIV 1000000"
        return terms.groupBy(F.col("g").alias("source")).agg(
            F.sum(
                F.expr(fd.format(x="(p_ppm - q_ppm) * ln_diff_micro"))
            )
            .cast("long")
            .alias("psi_micro")
        )


_register_wave11b()
