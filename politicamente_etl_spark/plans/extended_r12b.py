"""Round-7 batch B: driver-visible certificates for the round's two
storage-layer correctness fixes — vacuum's tombstone/constraint
carriage across manifest expiry (ADVICE r6 high) with full sidecar
lifecycle (retain → materialize → reclaim), and NULL-key uniformity
across both tombstone storage forms (ADVICE r6 medium). Unit tests
prove these locally; these queries make the driver's oracle prove them
every round.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_vacuum_lifecycle_report",
        sql="""
        WITH base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(o_orderkey) AS BIGINT) AS s
            FROM orders WHERE o_orderkey % 13 != 5
        ), extra AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(o_orderkey + 30000000) AS BIGINT) AS s
            FROM orders WHERE o_orderkey % 13 = 1
        )
        SELECT 'after_vacuum' AS stage,
               base.n + extra.n AS n_rows,
               base.s + extra.s AS key_sum,
               1 AS n_sidecar_dirs
        FROM base, extra
        UNION ALL
        SELECT 'after_reclaim', base.n + extra.n, base.s + extra.s, 0
        FROM base, extra
        """,
        tags=("ext-sink",),
    )
    def q_txlog_vacuum_lifecycle_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The full merge-on-read delete lifecycle, certified through
        MANIFEST EXPIRY: create → sidecar tombstone (o_orderkey % 13
        == 5) → append a shifted batch → vacuum(retain=2), which
        REWRITES the oldest retained manifest as a self-contained
        checkpoint and deletes the create manifest. The r6-advised
        bug: that checkpoint omitted tombstones, so every logically
        deleted row resurrected — here the oracle pins the exact
        surviving row count and key checksum AFTER expiry, so any
        carriage loss (tombstones, add-version ordering, schema)
        hash-fails. Stage two materializes (optimize), checkpoints
        (which drops the now-dead tombstone), and vacuums again: the
        delete-file sidecar itself is physically reclaimed
        (n_sidecar_dirs 1 → 0) while the logical contents stay
        bit-identical — logical delete → scheduled materialize →
        physical reclaim, closed end-to-end.

        100 TB: retention-bounded tables run exactly this loop
        forever; the checkpoint fold is O(live files + live
        tombstones) metadata, never data."""
        from politicamente_etl_spark.sources.txlog import (
            _DELETES_DIR,
            TxLogTable,
        )

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_vl_"), "t")
        t = TxLogTable.create(spark, path, o.repartition(2))
        t.delete_where_logical(
            "o_orderkey",
            keys_df=o.filter(F.col("o_orderkey") % 13 == 5),
        )
        t.append(
            o.filter(F.col("o_orderkey") % 13 == 1).select(
                (F.col("o_orderkey") + 30000000).alias("o_orderkey"),
                "o_custkey",
            )
        )
        t.vacuum(retain_versions=2)  # expires the create manifest

        def sidecar_dirs() -> int:
            d = os.path.join(path, _DELETES_DIR)
            return len(os.listdir(d)) if os.path.isdir(d) else 0

        def stage(name: str, n_dirs: int) -> DataFrame:
            return TxLogTable(spark, path).snapshot().agg(
                F.lit(name).alias("stage"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
                F.lit(n_dirs).cast("int").alias("n_sidecar_dirs"),
            )
        part1 = stage("after_vacuum", sidecar_dirs())
        part1 = spark.createDataFrame(part1.collect(), part1.schema)
        t.optimize(target_file_bytes=1 << 30)  # materialize tombstones
        t.checkpoint()  # drops the dead tombstone from the fold
        # single-writer demo: no in-flight delete can be staging, so the
        # sidecar grace window (vacuum's in-flight-writer guard) is
        # safely zero — reclaims the sidecar immediately
        t.vacuum(retain_versions=1, sidecar_grace_sec=0.0)
        part2 = stage("after_reclaim", sidecar_dirs())
        return part1.unionByName(part2).select(
            "stage", "n_rows", "key_sum", "n_sidecar_dirs"
        )

    @register(
        "txlog_null_key_tombstone_proof",
        sql="""
        WITH t AS (
            SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_custkey END AS ck,
                   o_orderkey
            FROM orders
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM t
        WHERE ck IS NULL
           OR ((ck % 100 != 0 OR ck < 100 OR ck > 1500)
               AND (ck % 100 != 50 OR ck < 50 OR ck >= 3000000))
        """,
        tags=("ext-sink",),
    )
    def q_txlog_null_key_tombstone_proof(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """NULL keys survive tombstones UNIFORMLY (ADVICE r6 medium):
        the inline small-set branch used NOT-IN, whose tri-valued
        logic evaluates to NULL for NULL-keyed rows and silently
        deleted them, while the anti-join branch kept them — the same
        table could lose or keep rows depending on tombstone batch
        size. Here a nullable key column (o_custkey nulled where
        o_orderkey % 7 == 0) takes one INLINE tombstone (15 literal
        values — the NOT-IN branch) and one SIDECAR tombstone (a
        keys_df — the anti-join branch); the oracle counts NULL-keyed
        rows explicitly, so either branch dropping them hash-fails.
        Tombstoned values are generated ranges (multiples of 100 up to
        1500; 100k+50 below 3M), mirrored exactly in the oracle's
        bounds, so neither form collects anything from the data and
        the query stays SF-portable."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select(
            F.when(F.col("o_orderkey") % 7 == 0, None)
            .otherwise(F.col("o_custkey"))
            .alias("ck"),
            "o_orderkey",
        )
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_nk_"), "t")
        t = TxLogTable.create(spark, path, o)
        hi = 3_000_000  # covers the custkey domain at any tested SF
        t.delete_where_logical(
            "ck", list(range(100, 1501, 100))  # inline NOT-IN branch
        )
        t.delete_where_logical(
            "ck",
            keys_df=spark.range(50, hi, 100).select(
                F.col("id").alias("ck")
            ),
        )
        return t.snapshot().agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("ck").isNull().cast("long"))
            .cast("long")
            .alias("n_null_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )


_register()
