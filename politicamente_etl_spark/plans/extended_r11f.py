"""Round-6 batch F: merge-on-read logical deletes (key tombstones — the
Delta deletion-vector / Iceberg delete-file analogue) on the commit-log
table, driver-certified: two tombstone commits rewrite ZERO files while
every subsequent snapshot (and time travel across them) reads exactly
the SQL-predicate-filtered relation — the storage's files_rewritten
counters ride the output row, so a rewrite sneaking in (or a tombstone
leaking across versions) hash-fails against the pure-SQL oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_deletion_vector_report",
        sql="""
        SELECT 1 AS version,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(0 AS BIGINT) AS files_rewritten
        FROM orders
        UNION ALL
        SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM orders WHERE o_orderkey % 13 != 5
        UNION ALL
        SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM orders WHERE o_orderkey % 13 != 5 AND o_orderkey % 13 != 7
        """,
        tags=("ext-sink",),
    )
    def q_txlog_deletion_vector_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Logical DELETE without touching a byte of data: orders become
        a commit-log table, then two `delete_where_logical` commits
        tombstone the keys with o_orderkey % 13 == 5 and == 7. The
        query fingerprints ALL THREE versions (row count + key
        checksum) and carries each commit's measured files_rewritten —
        pinned to 0 in the oracle, so any rewrite the logical path
        performs fails the row, as would a tombstone applied to the
        wrong version (time travel must see deleted rows again). The
        merge-on-read contract proven here: reads anti-filter
        tombstoned keys from files added BEFORE the tombstone;
        re-inserts/restores postdate it and pass (unit-tested);
        optimize materializes.

        100 TB: a compliance- or correction-delete on a petabyte table
        commits in O(1) — no candidate scan, no rewrite — and the
        physical reclaim rides the next scheduled OPTIMIZE. The
        copy-on-write twin (`txlog_right_to_erasure`) pays the rewrite
        immediately, which actual GDPR erasure requires; this path is
        for everything that doesn't."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_dv_"), "t")
        t = TxLogTable.create(spark, path, o)
        keys5 = [
            r[0]
            for r in o.filter(F.col("o_orderkey") % 13 == 5)
            .select("o_orderkey")
            .collect()
        ]
        keys7 = [
            r[0]
            for r in o.filter(F.col("o_orderkey") % 13 == 7)
            .select("o_orderkey")
            .collect()
        ]
        m2 = t.delete_where_logical("o_orderkey", keys5)
        m3 = t.delete_where_logical("o_orderkey", keys7)
        rewrites = {1: 0, 2: m2["delete_stats"]["files_rewritten"],
                    3: m3["delete_stats"]["files_rewritten"]}
        parts = [
            t.snapshot(version=v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
                F.lit(rewrites[v]).cast("long").alias("files_rewritten"),
            )
            for v in (1, 2, 3)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select("version", "n_rows", "key_sum", "files_rewritten")


_register()
