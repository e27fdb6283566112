"""Round-7 batch I: Huber M-estimation (robust location) per group —
median/MAD initialization + one IRLS reweighting step, exact-integer
deterministic on both engines."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Huber tuning constant ×1000 (1.345 — the classic 95%-Gaussian-
# efficiency choice), kept integer so both engines compute k·MAD in
# exact cents·milli units.
_HUBER_K_MILLI = 1345


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "huber_mean_revenue_by_segment",
        sql=f"""
        WITH x AS (
            SELECT c_mktsegment AS seg,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), med AS (
            SELECT seg, cents AS m0
            FROM (
                SELECT seg, cents,
                       row_number() OVER (PARTITION BY seg
                           ORDER BY cents) AS rn,
                       COUNT(*) OVER (PARTITION BY seg) AS n
                FROM x
            ) WHERE rn = (n + 1) // 2
        ), dev AS (
            SELECT x.seg, x.cents, ABS(x.cents - med.m0) AS ad, med.m0
            FROM x JOIN med USING (seg)
        ), mad AS (
            SELECT seg, ad AS mad0
            FROM (
                SELECT seg, ad,
                       row_number() OVER (PARTITION BY seg
                           ORDER BY ad) AS rn,
                       COUNT(*) OVER (PARTITION BY seg) AS n
                FROM dev
            ) WHERE rn = (n + 1) // 2
        ), w AS (
            SELECT d.seg, d.cents, d.m0, m.mad0,
                   CASE WHEN ABS(d.cents - d.m0) * 1000
                             <= {_HUBER_K_MILLI} * m.mad0
                        THEN CAST(1000000 AS BIGINT)
                        ELSE CAST(round(1000000.0
                             * ({_HUBER_K_MILLI} * CAST(m.mad0 AS DOUBLE))
                             / (1000.0 * CAST(ABS(d.cents - d.m0) AS DOUBLE)))
                             AS BIGINT)
                   END AS w_micro
            FROM dev d JOIN mad m USING (seg)
        )
        SELECT seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(m0) AS BIGINT) AS median_cents,
               CAST(MAX(mad0) AS BIGINT) AS mad_cents,
               CAST(SUM(w_micro) AS BIGINT) AS sum_w_micro,
               -- explicit HUGEINT: per-row w_micro*cents ~1e13 overflows
               -- an int64 SUM near sf1 (~1.5M orders); DuckDB would
               -- promote silently, Spark would not — both now widen
               CAST(SUM(CAST(w_micro AS HUGEINT) * cents) AS DOUBLE)
                   / CAST(SUM(w_micro) AS DOUBLE) AS huber_mean_cents
        FROM w GROUP BY seg
        """,
        tags=("ext-stats",),
    )
    def q_huber_mean_revenue_by_segment(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Huber M-estimator of per-segment order value (robust
        location: outliers get down-weighted smoothly instead of the
        trimmed mean's hard cut): lower-median initialization, MAD
        scale, and ONE IRLS step with the classic k=1.345 tuning
        constant. Everything that must agree across engines is exact
        integer — cents, lower medians via deterministic rank (no
        even-count averaging), weights micro-snapped per row before the
        weighted sums — so the one double division at the end is the
        only float op. Iterating to convergence repeats the same
        one-aggregate step. The per-segment medians are rank windows
        (partitioned sorts, the scalable shape); the weight pass is one
        broadcast-sized join of the 5-row (m0, mad) table back onto the
        facts."""
        o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        x = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )

        def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
            # row_number ties on equal values are arbitrary, but rows
            # tied at the median rank share the VALUE — the selected
            # m0/mad0 is deterministic without any global tiebreak
            w = Window.partitionBy("seg").orderBy(col)
            return (
                df.withColumn("rn", F.row_number().over(w))
                .withColumn("n", F.count("*").over(Window.partitionBy("seg")))
                .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
                .select("seg", F.col(col).alias(out))
            )

        med = lower_median(x, "cents", "m0")
        dev = x.join(F.broadcast(med), "seg").withColumn(
            "ad", F.abs(F.col("cents") - F.col("m0"))
        )
        mad = lower_median(dev.select("seg", "ad"), "ad", "mad0")
        k = _HUBER_K_MILLI
        w_micro = F.when(
            F.abs(F.col("cents") - F.col("m0")) * 1000
            <= k * F.col("mad0"),
            F.lit(1000000).cast("long"),
        ).otherwise(
            F.round(
                1000000.0
                * (k * F.col("mad0").cast("double"))
                / (1000.0 * F.abs(F.col("cents") - F.col("m0")).cast("double")),
                0,
            ).cast("long")
        )
        w = dev.join(F.broadcast(mad), "seg").withColumn("w_micro", w_micro)
        return w.groupBy("seg").agg(
            F.count("*").cast("long").alias("n"),
            F.max("m0").cast("long").alias("median_cents"),
            F.max("mad0").cast("long").alias("mad_cents"),
            F.sum("w_micro").cast("long").alias("sum_w_micro"),
            # sum in decimal(38,0): per-row w_micro*cents is ~1.4e13, so a
            # LONG sum overflows near sf1 (~1.5M orders) — ANSI mode would
            # throw ARITHMETIC_OVERFLOW exactly at the scale this query
            # claims to serve (ADVICE r7); the oracle widens via HUGEINT
            (
                F.sum(
                    (F.col("w_micro") * F.col("cents")).cast("decimal(38,0)")
                ).cast("double")
                / F.sum("w_micro").cast("double")
            ).alias("huber_mean_cents"),
        )

    @register(
        "codec_roundtrip_matrix",
        sql="""
        SELECT codec,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents_sum
        FROM (
            SELECT 'snappy' AS codec, l_quantity, l_extendedprice
            FROM lineitem
            UNION ALL
            SELECT 'zstd', l_quantity, l_extendedprice FROM lineitem
            UNION ALL
            SELECT 'gzip', l_quantity, l_extendedprice FROM lineitem
        ) GROUP BY codec
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_codec_roundtrip_matrix(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Parquet compression-codec transparency: the same lineitem
        projection written under snappy (the scan-speed default), zstd
        (the 100 TB storage choice — typically ~30% smaller at similar
        scan cost), and gzip (legacy interchange), each read back and
        checksummed. All three rows must carry IDENTICAL aggregates —
        codec choice is a pure storage/scan-cost knob, never a
        semantics one (the regression gate for flipping
        spark.sql.parquet.compression.codec fleet-wide). The oracle
        reads the original parquet three times, so a codec-specific
        value corruption or row drop hash-fails."""
        import tempfile as _tf

        li = T(spark, sf_dir, "lineitem").select(
            "l_quantity", "l_extendedprice"
        )
        base = _tf.mkdtemp(prefix="codec_rt_")
        out = None
        for codec in ("snappy", "zstd", "gzip"):
            p = os.path.join(base, codec)
            li.write.option("compression", codec).parquet(p)
            row = (
                spark.read.parquet(p)
                .agg(
                    F.count("*").cast("long").alias("n_items"),
                    F.sum(F.col("l_quantity").cast("long"))
                    .cast("long")
                    .alias("sum_qty"),
                    F.sum(
                        F.floor(F.col("l_extendedprice") * 100).cast("long")
                    )
                    .cast("long")
                    .alias("price_cents_sum"),
                )
                .select(
                    F.lit(codec).alias("codec"),
                    "n_items",
                    "sum_qty",
                    "price_cents_sum",
                )
            )
            out = row if out is None else out.unionByName(row)
        return out

    @register(
        "collation_aware_dedup",
        sql="""
        WITH named AS (
            SELECT CASE WHEN c_custkey % 3 = 0
                        THEN upper('cust#' || CAST(c_custkey % 50 AS VARCHAR))
                        ELSE 'cust#' || CAST(c_custkey % 50 AS VARCHAR)
                   END AS name_v
            FROM customer
        )
        SELECT MIN(name_v) AS canonical,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT name_v) AS BIGINT) AS n_casings
        FROM named
        GROUP BY lower(name_v)
        """,
        tags=("ext-text", "ext-dedup"),
    )
    def q_collation_aware_dedup(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Spark 4's COLLATION engine (SPARK-46830) through a dedup
        lens: grouping under the UTF8_LCASE collation must equal
        grouping on lower() — entity keys that differ only by case
        (the classic dirty-CRM join killer) collapse WITHOUT rewriting
        every expression to lower(col), and the collation participates
        in hashing/shuffles natively. Names are synthesized with a
        deterministic case fault (every 3rd key uppercased) over a
        50-value domain so every group genuinely mixes casings; the
        group key itself is first-seen-nondeterministic under
        collation, so the output carries the BINARY MIN as the
        deterministic canonical plus the row/casing counts the dedup
        decision needs. The oracle is the lower() formulation — a
        semantic divergence between the collation engine and explicit
        folding hash-fails."""
        c = T(spark, sf_dir, "customer").select("c_custkey")
        base = F.concat(F.lit("cust#"), (F.col("c_custkey") % 50).cast("string"))
        named = c.select(
            F.when(F.col("c_custkey") % 3 == 0, F.upper(base))
            .otherwise(base)
            .alias("name_v")
        )
        return (
            named.groupBy(
                F.collate(F.col("name_v"), "UTF8_LCASE").alias("__g")
            )
            .agg(
                F.min(F.col("name_v").cast("string")).alias("canonical"),
                F.count("*").cast("long").alias("n_rows"),
                F.countDistinct(F.col("name_v").cast("string"))
                .cast("long")
                .alias("n_casings"),
            )
            .drop("__g")
        )


_register()
