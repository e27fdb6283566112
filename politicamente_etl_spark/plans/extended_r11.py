"""Round-6 batch A: the Z-order WRITE PATH connected to the storage
layer (VERDICT r5 item 6). `zorder_skipping_model` (extended_r10h) is
the planner; this batch registers the query that actually WRITES a
Z-ordered commit-log table through sinks.write_zordered_txlog and
reads it back through TxLogTable.scan_files — the driver row certifies
that the modeled kept-file set equals the REAL skipped set, because
the Spark side emits the measured storage counts while the oracle
derives the same numbers from the explicit bucket math alone. A
storage/model divergence hash-mismatches the row.

Same engine-parity rules as the other extended batches: integer
outputs only, no floats, no DATE/TIMESTAMP columns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.plans.extended_r10h import _MORTON_SQL


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    _M = _MORTON_SQL.format(x="cx", y="cd")

    @register(
        "txlog_zorder_storage_report",
        sql=f"""
        WITH b AS (
            SELECT MIN(o_custkey) AS mnc, MAX(o_custkey) AS mxc,
                   MIN(date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE))) AS mnd,
                   MAX(date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE))) AS mxd
            FROM orders
        ), o AS (
            SELECT o_custkey,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS day,
                   (o_custkey - b.mnc) * 16 // (b.mxc - b.mnc + 1) AS cx,
                   (date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) - b.mnd) * 16
                       // (b.mxd - b.mnd + 1) AS cd,
                   b.mnc + (b.mxc - b.mnc + 1) * 8 // 16 AS lo_ck,
                   b.mnc + (b.mxc - b.mnc + 1) * 12 // 16 - 1 AS hi_ck,
                   b.mnd + (b.mxd - b.mnd + 1) * 8 // 16 AS lo_d,
                   b.mnd + (b.mxd - b.mnd + 1) * 12 // 16 - 1 AS hi_d
            FROM orders CROSS JOIN b
        ), files AS (
            SELECT {_M} // 16 AS zfile,
                   MIN(o_custkey) AS fmnc, MAX(o_custkey) AS fmxc,
                   MIN(day) AS fmnd, MAX(day) AS fmxd,
                   COUNT(*) AS n_rows,
                   MIN(lo_ck) AS lo_ck, MIN(hi_ck) AS hi_ck,
                   MIN(lo_d) AS lo_d, MIN(hi_d) AS hi_d,
                   SUM(CASE WHEN o_custkey BETWEEN lo_ck AND hi_ck
                            AND day BETWEEN lo_d AND hi_d
                       THEN 1 ELSE 0 END) AS n_match
            FROM o GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN fmxc >= lo_ck AND fmnc <= hi_ck
                             AND fmxd >= lo_d AND fmnd <= hi_d
                        THEN 1 ELSE 0 END) AS BIGINT) AS files_kept,
               CAST(SUM(CASE WHEN fmxc >= lo_ck AND fmnc <= hi_ck
                             AND fmxd >= lo_d AND fmnd <= hi_d
                        THEN n_rows ELSE 0 END) AS BIGINT)
                   AS rows_in_kept_files,
               CAST(SUM(n_match) AS BIGINT) AS n_rows_match
        FROM files
        """,
        tags=("ext-sink", "ext-scan", "ext-olap"),
    )
    def q_txlog_zorder_storage_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Model == storage, certified by the driver hash: orders are
        WRITTEN as a Z-order-clustered commit-log table (one file per
        Morton bucket of (o_custkey, day), 4 bits/dim, 16 files —
        sinks.write_zordered_txlog), then a 2-D box predicate (the
        middle quarter of BOTH dimensions) is pushed through
        TxLogTable.scan_files. The Spark side emits what the STORAGE
        actually did — live file count, files the zonemaps kept, rows
        inside kept files (read amplification), rows matching the
        residual predicate — while the oracle computes the same four
        numbers from the explicit bucket math with no storage at all.
        Any divergence between the physical layout/pruning and the
        planner's model fails the row.

        100 TB: this is the end-to-end OPTIMIZE ZORDER BY contract —
        write cost one clustering pass, read cost thereafter
        rows_in_kept_files instead of the table; the model query
        (`zorder_skipping_model`) prices the layout BEFORE paying for
        the rewrite, this one proves the paid-for layout delivers it."""
        from politicamente_etl_spark.sources.sinks import write_zordered_txlog

        o = T(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.unix_date(F.to_date("o_orderdate")).alias("day"),
        )
        b = o.agg(
            F.min("o_custkey").alias("mnc"),
            F.max("o_custkey").alias("mxc"),
            F.min("day").alias("mnd"),
            F.max("day").alias("mxd"),
        ).first()
        lo_ck = b.mnc + (b.mxc - b.mnc + 1) * 8 // 16
        hi_ck = b.mnc + (b.mxc - b.mnc + 1) * 12 // 16 - 1
        lo_d = b.mnd + (b.mxd - b.mnd + 1) * 8 // 16
        hi_d = b.mnd + (b.mxd - b.mnd + 1) * 12 // 16 - 1
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_zorder_"), "t")
        t = write_zordered_txlog(
            spark, path, o, ["o_custkey", "day"], bits=4, n_files=16
        )
        preds = {"o_custkey": (lo_ck, hi_ck), "day": (lo_d, hi_d)}
        kept, total = t.scan_files(preds)
        rows_kept = (
            spark.read.parquet(*[os.path.join(path, f) for f in kept]).count()
            if kept
            else 0
        )
        n_match = t.scan(preds).count()
        return spark.createDataFrame(
            [(total, len(kept), rows_kept, n_match)],
            "n_files long, files_kept long, rows_in_kept_files long, "
            "n_rows_match long",
        )


_register()
