"""Round-7 batch A: the auto-OPTIMIZE trigger policy for merge-on-read
tombstone debt (VERDICT r6 item 4) and the first REAL image-codec path
through the multimodal decode seam (VERDICT r6 item 7) — BMP bytes
built, shipped, and parsed entirely on the executors, certified against
closed-form pixel math in the oracle.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "txlog_auto_optimize_policy",
        sql="""
        WITH c AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o_orderkey % 13 = 5 THEN 1 ELSE 0
                            END) AS BIGINT) AS d
            FROM orders
        )
        SELECT 'before' AS stage, n AS live_rows, d AS tombstoned_keys,
               CAST(CASE WHEN d * 1.0 / n >= 0.05 THEN 1 ELSE 0 END
                    AS INT) AS fires_at_5pct,
               CAST(CASE WHEN d * 1.0 / n >= 0.10 THEN 1 ELSE 0 END
                    AS INT) AS fires_at_10pct
        FROM c
        UNION ALL
        SELECT 'after', n - d, CAST(0 AS BIGINT), 0, 0 FROM c
        """,
        tags=("ext-sink",),
    )
    def q_txlog_auto_optimize_policy(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The WHEN of merge-on-read maintenance: `delete_where_logical`
        commits in O(1) but leaves debt (every read pays the anti-join,
        deleted bytes still occupy scan I/O), and nothing decided when
        that debt gets materialized. `needs_optimize` fires when
        still-applicable tombstoned keys / physical live rows crosses a
        threshold — pure manifest + parquet-footer metadata, no data
        scan. Certified here end-to-end: orders become a 4-file txlog
        table, a sidecar tombstone kills the o_orderkey % 13 == 5 keys
        (≈7.7% of rows), and the oracle pins the exact trigger inputs
        AND decisions — fires at a 5% threshold, holds at 10%, and
        after optimize() materializes the debt the policy reads exactly
        zero (live rows drop to the surviving count, no rewrite loops).

        100 TB: this is the compaction scheduler's entire decision
        input, computed from manifests + footers in O(files) driver
        metadata work — the table itself is never touched until the
        policy says the one rewrite is worth it."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_opt_"), "t")
        t = TxLogTable.create(spark, path, o.repartition(4))
        t.delete_where_logical(
            "o_orderkey",
            keys_df=o.filter(F.col("o_orderkey") % 13 == 5),
        )
        before5 = t.needs_optimize(tombstone_ratio=0.05)
        before10 = t.needs_optimize(tombstone_ratio=0.10)
        t.optimize(target_file_bytes=1 << 30)
        after5 = t.needs_optimize(tombstone_ratio=0.05)
        after10 = t.needs_optimize(tombstone_ratio=0.10)
        rows = [
            (
                "before",
                before5["live_rows"],
                before5["tombstoned_keys"],
                int(before5["needs_optimize"]),
                int(before10["needs_optimize"]),
            ),
            (
                "after",
                after5["live_rows"],
                after5["tombstoned_keys"],
                int(after5["needs_optimize"]),
                int(after10["needs_optimize"]),
            ),
        ]
        return spark.createDataFrame(
            rows,
            "stage string, live_rows long, tombstoned_keys long, "
            "fires_at_5pct int, fires_at_10pct int",
        )

    @register(
        "bmp_decode_stats",
        sql="""
        SELECT CAST(1 + doc_id % 16 AS INT) AS width,
               CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(1 + doc_id % 8) AS BIGINT) AS height_sum,
               CAST(SUM((1 + doc_id % 16) * (1 + doc_id % 8) * 3
                        * (doc_id % 251)) AS BIGINT) AS pixel_sum_total
        FROM documents
        GROUP BY 1
        """,
        tags=("ext-multimodal",),
    )
    def q_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """A REAL codec through the multimodal decode seam: each
        document synthesizes a valid 24-bit BMP on the executors
        (width = 1 + doc_id % 16, height = 1 + doc_id % 8, every pixel
        byte = doc_id % 251 — `encode_bmp` emits genuine
        BITMAPINFOHEADER bytes with 4-byte row padding), the payloads
        ride a binary column through `decode_image_stats`' mapInPandas
        pass, and the pure-Python BMP parser recovers dimensions,
        channel count, and the pixel-byte sum from the RAW BYTES. The
        oracle pins the closed-form math (pixel_sum = w*h*3*fill, row
        padding excluded), so a header-offset bug, stride/padding slip,
        or channel miscount hash-fails. This replaces the repo's oldest
        documented NotImplementedError (decode seam) with an
        end-to-end byte path; PNG/JPEG still need an injected decoder.

        100 TB: media bytes are built AND parsed inside one Arrow batch
        per partition — the payload never crosses a shuffle, and the
        output carries 5 stat columns per image, not the image."""
        from politicamente_etl_spark.operators.multimodal import (
            decode_image_stats,
            encode_bmp,
        )

        docs = T(spark, sf_dir, "documents").select("doc_id")

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media": [
                            encode_bmp(
                                1 + int(d) % 16,
                                1 + int(d) % 8,
                                int(d) % 251,
                            )
                            for d in pdf["doc_id"]
                        ],
                    }
                )

        payloads = docs.mapInPandas(build, "doc_id long, media binary")
        return (
            decode_image_stats(payloads)
            .groupBy("width")
            .agg(
                F.count("*").cast("long").alias("n_images"),
                F.sum("height").cast("long").alias("height_sum"),
                F.sum("pixel_sum").cast("long").alias("pixel_sum_total"),
            )
            .select("width", "n_images", "height_sum", "pixel_sum_total")
        )


_register()
