"""Round-6 batch E: file-level Bloom-filter point-lookup pruning on the
commit-log table — the equality complement to the zonemap queries. The
layout clusters orders by o_custkey buckets, so every file's
o_orderkey zonemap spans ~the whole key range and a point lookup keeps
ALL files; the per-file Bloom (built from exact md5-lane integer math)
keeps ~one. The oracle reproduces the bloom math predicate-level —
"file kept ⇔ some key in the file sets BOTH probe bit positions" —
with no storage, so a green row certifies the stored bloom words, the
driver-side probe, and the pruning logic agree bit-for-bit (false
positives included: they are deterministic under this construction).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.sources.txlog import sql_bloom_pos

_N_BITS = 2048
_KP1, _KP2 = sql_bloom_pos("o_orderkey", "o_orderkey", _N_BITS)
_PP1, _PP2 = sql_bloom_pos("o_orderkey", "k", _N_BITS)


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_bloom_point_scan",
        sql=f"""
        WITH probe AS (
            SELECT MIN(o_orderkey) AS k FROM orders WHERE o_orderkey % 7 = 3
        ), pp AS (
            SELECT k, {_PP1} AS p1, {_PP2} AS p2 FROM probe
        ), keys AS (
            SELECT o_custkey % 16 AS f, o_orderkey,
                   {_KP1} AS kp1, {_KP2} AS kp2
            FROM orders
        ), files AS (
            SELECT f, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
                   MAX(CASE WHEN kp1 = pp.p1 OR kp2 = pp.p1
                       THEN 1 ELSE 0 END) AS b1,
                   MAX(CASE WHEN kp1 = pp.p2 OR kp2 = pp.p2
                       THEN 1 ELSE 0 END) AS b2,
                   MIN(pp.k) AS k
            FROM keys, pp GROUP BY f
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN mn <= k AND mx >= k
                        THEN 1 ELSE 0 END) AS BIGINT) AS zonemap_kept,
               CAST(SUM(CASE WHEN mn <= k AND mx >= k
                             AND b1 = 1 AND b2 = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS bloom_kept,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM orders, probe WHERE o_orderkey = probe.k)
                   AS n_rows_match
        FROM files
        """,
        tags=("ext-sink", "ext-scan"),
    )
    def q_txlog_bloom_point_scan(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Point-lookup pruning through per-file Bloom filters: orders
        are written as a commit-log table clustered into 16 files by
        o_custkey bucket with a 2048-bit Bloom over o_orderkey per file
        (TxLogTable.create bloom_cols — ONE extra aggregation job).
        A point lookup on a deterministic key then runs twice through
        scan_files: zonemap-only (use_blooms=False — keeps ~ALL files,
        because orderkey is uncorrelated with the custkey layout and
        every file's min/max spans the range) and with blooms (keeps
        the one containing file plus deterministic false positives).
        The Spark side reports what STORAGE did; the oracle reproduces
        the bloom math at predicate level (bit p set ⇔ some key in the
        file hashes a lane to p). A hash divergence anywhere — build
        expressions, stored words, driver probe, pruning logic — fails
        the row.

        100 TB: zonemaps answer range scans on clustered columns;
        blooms answer needle-in-haystack id lookups on UNclustered
        columns (the 'find this document/user/order' op) without a
        secondary index — metadata-only, ~n_bits/8 bytes per file."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        k = (
            o.filter(F.col("o_orderkey") % 7 == 3)
            .agg(F.min("o_orderkey"))
            .first()[0]
        )
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_bloom_"), "t")
        t = TxLogTable.create(
            spark,
            path,
            o.withColumn("__f", F.col("o_custkey") % 16),
            cluster_file_col="__f",
            bloom_cols=("o_orderkey",),
            bloom_bits=_N_BITS,
        )
        preds = {"o_orderkey": (k, k)}
        zm_kept, total = t.scan_files(preds, use_blooms=False)
        bl_kept, _ = t.scan_files(preds)
        n_match = t.scan(preds).count()
        return spark.createDataFrame(
            [(total, len(zm_kept), len(bl_kept), n_match)],
            "n_files long, zonemap_kept long, bloom_kept long, "
            "n_rows_match long",
        )


_register()
