"""Round-6 batch I: the commit-log audit surface — DESCRIBE HISTORY as
a driver-checked query: a fixed operation sequence (create, append,
constraint, logical delete, merge) must write exactly the manifest
trail the oracle pins, file accounting included.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_history_report",
        sql="""
        SELECT 1 AS version, 'create' AS op, 0 AS n_removed,
               CAST(0 AS BIGINT) AS n_tombstoned_keys,
               0 AS n_constraints_set, CAST(NULL AS INT) AS files_rewritten
        UNION ALL
        SELECT 2, 'append', 0, CAST(0 AS BIGINT), 0, NULL
        UNION ALL
        SELECT 3, 'set_constraint', 0, CAST(0 AS BIGINT), 1, NULL
        UNION ALL
        SELECT 4, 'delete_logical', 0,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                 WHERE o_orderkey % 2 = 0 AND o_orderkey % 5 = 0),
               0, 0
        UNION ALL
        SELECT 5, 'merge', 2, CAST(0 AS BIGINT), 0, 2
        """,
        tags=("ext-sink", "ext-quality"),
    )
    def q_txlog_history_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """DESCRIBE HISTORY, certified: a fixed op sequence — create
        (even orderkeys, one file), append (odd, one file), CHECK
        constraint, logical delete of even keys divisible by 5 (the
        measured tombstoned-key count rides the row), and a MERGE whose
        batch straddles both files (both rewritten, one output file) —
        must leave exactly the manifest trail the oracle pins: op
        names, file REMOVE counts, tombstone sizes, constraint
        settings, files_rewritten. (Added-file counts are excluded:
        a merge's output file count tracks the rewrite's partitioning
        — session-dependent — while removals, rewrites, and tombstone
        sizes are semantic.) Any operation writing a different
        manifest shape (a delete that rewrites, a merge that loses a
        file, a constraint that doesn't commit) hash-fails.

        100 TB: the history is the compliance/audit artifact — pure
        manifest metadata, O(versions) driver work, no data I/O."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_hist_"), "t")
        t = TxLogTable.create(
            spark, path, o.filter(F.col("o_orderkey") % 2 == 0).coalesce(1)
        )
        t.append(o.filter(F.col("o_orderkey") % 2 == 1).coalesce(1))
        t.set_constraint("price_nonneg", "o_totalprice >= 0")
        evens_div5 = [
            r[0]
            for r in o.filter(
                (F.col("o_orderkey") % 2 == 0) & (F.col("o_orderkey") % 5 == 0)
            )
            .select("o_orderkey")
            .collect()
        ]
        t.delete_where_logical("o_orderkey", evens_div5)
        batch = o.filter(F.col("o_orderkey").isin(2, 3)).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
        )
        t.merge(batch, ["o_orderkey"])
        return t.describe_history().select(
            "version",
            "op",
            "n_removed",
            "n_tombstoned_keys",
            "n_constraints_set",
            "files_rewritten",
        )


_register()
