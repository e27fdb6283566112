"""Round-6 batch H: table CHECK constraints on the commit-log table —
write-time data contracts (Delta's ADD CONSTRAINT): a violating batch
is rejected whole, a clean one lands, and the gate itself is a
versioned commit. The oracle derives the accepted relation and the
violation counts from the same predicate in plain SQL, so a green row
certifies the enforcement boundary exactly.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_constraint_gate_report",
        sql="""
        WITH batch AS (
            SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders)
                       AS o_orderkey,
                   CASE WHEN o_orderkey % 17 = 3
                        THEN -o_totalprice ELSE o_totalprice
                   END AS o_totalprice
            FROM orders
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM batch
                 WHERE NOT (o_totalprice >= 0)) AS n_violations,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM batch) AS n_batch,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
                   + (SELECT CAST(COUNT(*) AS BIGINT) FROM batch
                       WHERE o_totalprice >= 0) AS n_final_rows,
               (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders)
                   + (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM batch
                       WHERE o_totalprice >= 0) AS key_sum
        """,
        tags=("ext-sink", "ext-quality"),
    )
    def q_txlog_constraint_gate_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Write-time data contract, end to end: orders become a
        commit-log table with CHECK `o_totalprice >= 0`; a batch with
        every 17th price negated is offered and REJECTED WHOLE (the
        measured per-constraint violation count rides the output), then
        the clean subset is offered and lands. The oracle computes the
        violation count, batch size, and the final table fingerprint
        from the same predicate in SQL — if enforcement let one bad row
        through, blocked a good one, or committed anything from the
        rejected batch, the fingerprint hash-fails.

        100 TB: enforcement is one aggregate over the BATCH (all
        constraints in a single pass), never a table scan — the
        contract costs O(batch) at the only place bad data can enter.
        The constraint is itself a versioned commit: it time-travels,
        survives checkpoints, and follows clones."""
        from politicamente_etl_spark.sources.txlog import (
            ConstraintViolation,
            TxLogTable,
        )

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_ck_"), "t")
        t = TxLogTable.create(spark, path, o)
        t.set_constraint("price_nonneg", "o_totalprice >= 0")
        max_ok = o.agg(F.max("o_orderkey")).first()[0]
        batch = o.select(
            (F.col("o_orderkey") + F.lit(max_ok)).alias("o_orderkey"),
            F.when(
                F.col("o_orderkey") % 17 == 3, -F.col("o_totalprice")
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        n_batch = batch.count()
        try:
            t.append(batch)
            n_violations = 0  # unreachable if the gate works
        except ConstraintViolation as exc:
            n_violations = exc.counts.get("price_nonneg", 0)
        t.append(batch.filter(F.col("o_totalprice") >= 0))
        final = t.snapshot().agg(
            F.count("*").cast("long").alias("n_final_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        ).first()
        return spark.createDataFrame(
            [(n_violations, n_batch, final.n_final_rows, final.key_sum)],
            "n_violations long, n_batch long, n_final_rows long, "
            "key_sum long",
        )


_register()
