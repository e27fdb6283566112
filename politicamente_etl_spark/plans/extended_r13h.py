"""Round-8 batch H: generated columns (GENERATED ALWAYS AS) and
rename-without-rewrite (column mapping) on the commit-log table."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_generated_column_proof",
        sql="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_sum,
               CAST(0 AS BIGINT) AS n_mismatch
        FROM orders
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_txlog_generated_column_proof(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """GENERATED COLUMNS (Delta's GENERATED ALWAYS AS): after
        `set_generated_column("cents", floor(price*100))`, an append
        that OMITS cents gets it computed inside the write path — the
        ingest job stops hand-maintaining the derived field and the
        derivation rule lives in the table, versioned and cloned with
        it. The proof: half the rows were written WITH the column
        (pre-declaration), half WITHOUT (computed); the full-table
        cents checksum must equal the SQL derivation over every row,
        and n_mismatch pins that no row's stored cents deviates from
        its generation expression. The companion enforcement (a batch
        SUPPLYING wrong values is rejected atomically on the staged
        files) is unit-tested — it cannot appear in a green result by
        construction."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        first = o.filter(F.col("o_orderkey") % 2 == 0).withColumn(
            "cents",
            F.floor(F.col("o_totalprice") * 100).cast("long"),
        )
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_gen_"), "t")
        t = TxLogTable.create(spark, path, first)
        t.set_generated_column(
            "cents", "CAST(floor(o_totalprice * 100) AS BIGINT)"
        )
        # second half arrives WITHOUT the derived column
        t.append(o.filter(F.col("o_orderkey") % 2 == 1))
        snap = t.snapshot()
        return snap.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.sum(
                (
                    ~F.col("cents").eqNullSafe(
                        F.floor(F.col("o_totalprice") * 100).cast("long")
                    )
                ).cast("long")
            )
            .cast("long")
            .alias("n_mismatch"),
        )

    @register(
        "txlog_column_rename_proof",
        sql="""
        SELECT 'all' AS label,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM orders
        UNION ALL
        SELECT 'scanned_high', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT)
        FROM orders WHERE o_totalprice >= 200000.0
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_txlog_column_rename_proof(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """RENAME WITHOUT REWRITE (Delta column mapping): half the table
        is written under the old name, the column is renamed in ONE
        metadata commit (zero files touched), the other half lands
        under the new name — and both vintages read back as one logical
        column (pre-rename files alias at read time, per add-version
        group). The 'scanned_high' row goes through `scan()` with a
        range predicate ON THE NEW NAME: its equality with the SQL
        relation proves the zonemap remap — stats recorded under the
        old physical name still prune and still return exact results
        for new-name predicates. At 100 TB a rename that rewrote data
        would be a multi-hour job; this is one JSON line."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_ren_"), "t")
        t = TxLogTable.create(
            spark,
            path,
            o.filter(F.col("o_orderkey") % 2 == 0).withColumnRenamed(
                "o_totalprice", "amount"
            ),
        )
        t.rename_column("amount", "price_usd")
        t.append(
            o.filter(F.col("o_orderkey") % 2 == 1).withColumnRenamed(
                "o_totalprice", "price_usd"
            )
        )
        snap = t.snapshot()
        all_rows = snap.agg(
            F.lit("all").alias("label"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.floor(F.col("price_usd") * 100).cast("long"))
            .cast("long")
            .alias("cents_sum"),
        )
        scanned = t.scan({"price_usd": (200000.0, None)}).agg(
            F.lit("scanned_high").alias("label"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.floor(F.col("price_usd") * 100).cast("long"))
            .cast("long")
            .alias("cents_sum"),
        )
        return all_rows.unionByName(scanned)


_register()
