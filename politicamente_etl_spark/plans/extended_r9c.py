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
