"""Round-9 wave B: the JPEG capstone of the multimodal decode seam.

Reference parity note: the reference has no multimodal surface at all
(src/politicamente_etl/etl/load.py is pure tabular) — this is §2.10
LLM-data-pipeline scope, the last carried optional item from VERDICT
r7/r8 item 7: a REAL baseline JPEG codec behind the decode seam, so
every exercised format family (raw BMP/PPM, DEFLATE PNG, PCM WAV, and
now DCT+Huffman JPEG) decodes through genuine byte paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "jpeg_decode_stats",
        sql="""
        SELECT CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
                   AS n_channels,
               CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(1 + doc_id % 16) AS BIGINT) AS width_sum,
               CAST(SUM((1 + doc_id % 16) * (1 + doc_id % 8)
                        * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END)
                        * (doc_id % 251)) AS BIGINT) AS pixel_sum_total
        FROM documents
        GROUP BY 1
        """,
        tags=("ext-multimodal",),
    )
    def q_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The DCT-compressed twin of png_decode_stats: each doc
        synthesizes a spec-conformant baseline JFIF on the executors
        (grayscale/RGB-4:4:4 by doc parity, w=1+id%16, h=1+id%8,
        fill=id%251, quality cycling 85/90/100 and restart interval
        cycling 0-3 by doc id — so DRI/RSTn segmentation and every
        quality-scaled quant table are exercised in-query), and
        `parse_jpeg` decodes it from raw bytes: marker walk, canonical
        Huffman entropy decode with DC prediction and restart resets,
        dequantize, 8x8 IDCT, YCbCr->RGB. Flat payloads quantize to a
        DC-only spectrum whose reconstruction error is < 0.5 at
        quality>=77, so the closed-form oracle
        (pixel_sum = w*h*nch*fill) is EXACT — any Huffman, zigzag,
        dequant, IDCT, or color-convert slip hash-fails.

        100 TB: decode runs inside the Arrow batch on the executor —
        payload bytes never shuffle; output is 4 stat columns. The
        pure-Python bit loops are the per-byte cost slot a native codec
        (PIL/libjpeg via the decoder= seam) replaces wholesale; the
        plumbing (schema, batching, payload pruning) is identical
        either way, which is what this query pins."""
        from politicamente_etl_spark.operators.multimodal import (
            decode_image_stats,
            encode_jpeg,
        )

        # the per-doc codec work is the cost here, not the scan: a
        # small single-file documents.parquet would otherwise pin the
        # whole encode+decode loop to ONE task. Shuffling just the
        # 8-byte doc_id column (not payloads) buys full parallelism.
        docs = (
            T(spark, sf_dir, "documents")
            .select("doc_id")
            .repartition(spark.sparkContext.defaultParallelism)
        )

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media": [
                            encode_jpeg(
                                1 + int(d) % 16,
                                1 + int(d) % 8,
                                int(d) % 251,
                                n_channels=1 if int(d) % 2 == 0 else 3,
                                quality=(85, 90, 100)[int(d) % 3],
                                restart_interval=int(d) % 4,
                            )
                            for d in pdf["doc_id"]
                        ],
                    }
                )

        payloads = docs.mapInPandas(build, "doc_id long, media binary")
        return (
            decode_image_stats(payloads)
            .groupBy("n_channels")
            .agg(
                F.count("*").cast("long").alias("n_images"),
                F.sum("width").cast("long").alias("width_sum"),
                F.sum("pixel_sum").cast("long").alias("pixel_sum_total"),
            )
            .select("n_channels", "n_images", "width_sum", "pixel_sum_total")
        )


_register()
