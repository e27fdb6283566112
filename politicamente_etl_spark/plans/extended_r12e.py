"""Round-7 batch E: the PNG decode path — a genuinely COMPRESSED image
format through the multimodal seam (zlib inflate + scanline
unfiltering) — and incremental MinHash-LSH index maintenance off the
commit log's change feed (the dedup index you never rebuild)."""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.operators import dedup
from politicamente_etl_spark.operators.core import spread

# DuckDB twins of the minhash signature pipeline (mirrors the blocks in
# plans/extended.py for minhash_signatures — 3-gram token shingles,
# md5-keyed permutations).
_MH_SQL_SHINGLES = """
            SELECT doc_id, string_split(text, ' ') AS toks FROM fin
        ), sh AS (
            SELECT doc_id,
                   [concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                    for i in range(1, len(toks) - 1)] AS shingles
            FROM t
        )
"""
_MH_COLS = ",\n".join(
    "               list_min(list_transform(shingles,"
    f" x -> md5(concat_ws(':', '{i}', x)))) AS mh_{i}"
    for i in range(dedup.N_MINHASH)
)
_SIG_SUMS = ",\n".join(
    f"               SUM(CAST(('0x' || substring(mh_{i}, 1, 8)) AS BIGINT))"
    f" AS s_{i}"
    for i in range(dedup.N_MINHASH)
)
_PERM_ROWS = "\n            UNION ALL\n".join(
    f"            SELECT {i} AS perm, n AS n_docs, s_{i} AS sig_sum FROM s"
    for i in range(dedup.N_MINHASH)
)


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "png_decode_stats",
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
    def q_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """A COMPRESSED real codec through the decode seam: each doc
        synthesizes a spec-conformant PNG on the executors (8-bit,
        alternating grayscale/RGB by doc parity, w=1+id%16, h=1+id%8,
        fill=id%251 — CRC-correct chunks, zlib IDAT), and `parse_png`
        decodes it from raw bytes: chunk walk, CRC check, INFLATE, and
        scanline unfiltering — not header arithmetic like the BMP/PPM
        paths. The closed-form oracle (pixel_sum = w·h·nch·fill) makes
        any inflate slip, stride error, or channel-map bug hash-fail.
        Together with bmp/wav_decode_stats this retires the codec-seam
        stub for every format stdlib can express.

        100 TB: decode runs inside the Arrow batch on the executor —
        payload bytes never shuffle; output is 4 stat columns. The
        pure-Python unfilter loop is the per-byte cost slot a native
        codec (PIL/opencv via the decoder= seam) replaces wholesale;
        the plumbing (schema, batching, payload pruning) is identical
        either way, which is what this query pins."""
        from politicamente_etl_spark.operators.multimodal import (
            decode_image_stats,
            encode_png,
        )

        docs = T(spark, sf_dir, "documents").select("doc_id")

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media": [
                            encode_png(
                                1 + int(d) % 16,
                                1 + int(d) % 8,
                                int(d) % 251,
                                color_type=0 if int(d) % 2 == 0 else 2,
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

    @register(
        "lsh_index_cdf_maintenance",
        sql=f"""
        WITH fin AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 11 = 4 AND doc_id % 7 != 3
                        THEN text || ' zz' ELSE text END AS text
            FROM documents
        ), t AS (
{_MH_SQL_SHINGLES}
        , mh AS (
            SELECT doc_id,
{_MH_COLS}
            FROM sh
        ), s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
{_SIG_SUMS}
            FROM mh
        ), perms AS (
{_PERM_ROWS}
        )
        SELECT CAST(perm AS INT) AS perm,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(sig_sum AS BIGINT) AS sig_sum
        FROM perms
        """,
        bench=True,  # r8 headline: incremental LSH index maintenance
        # under CDF deletes (slot ceded by sum_status_by_key, saturated
        # at 0.41 s since r1 — VERDICT r7 item 6)
        tags=("ext-dedup", "ext-sink", "ext-stream"),
    )
    def q_lsh_index_cdf_maintenance(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Incremental maintenance of the MinHash-LSH dedup INDEX off
        the commit log's change feed: the signature index is built once
        from txlog version 1 (docs with doc_id%7==3 held out), then a
        merge commit lands inserts (the held-out docs) and updates
        (docs with doc_id%11==4 get ' zz' appended) — and the index is
        repaired from `table_changes(1,2)` alone: drop every changed
        key, re-sign ONLY the changed rows' new text, union back. Cost
        ∝ |changeset| shingled + |index| anti-joined — the corpus text
        is never re-read, which is the difference between re-shingling
        100 TB nightly and signing the day's arrivals. The oracle
        re-signs the FULL final corpus from scratch, and the compared
        rows are per-permutation 32-bit signature checksums over every
        doc — one stale signature, dropped update, or double-applied
        insert shifts a sum and hash-fails (maintenance == rebuild,
        proven not claimed). Same md5-keyed minhash as
        `minhash_signatures`; downstream banding/pair queries read the
        maintained index unchanged."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        docs = T(spark, sf_dir, "documents").select("doc_id", "text")
        base = docs.filter(F.col("doc_id") % 7 != 3)
        path = os.path.join(tempfile.mkdtemp(prefix="lsh_idx_"), "t")
        t = TxLogTable.create(spark, path, base)
        updates = docs.filter(
            (F.col("doc_id") % 11 == 4) & (F.col("doc_id") % 7 != 3)
        ).select("doc_id", F.concat("text", F.lit(" zz")).alias("text"))
        inserts = docs.filter(F.col("doc_id") % 7 == 3)
        t.merge(updates.unionByName(inserts), ["doc_id"])

        # spread() both signature inputs: the snapshot/changeset scans are
        # single-split at bench SF, which would run the 8-permutation md5
        # minhash on ONE core; at production scale the scans already carry
        # >= cores splits and spread is a no-op (guide §2: scale-adaptive
        # partitioning, the same fan-out _banded_signature applies)
        index0 = dedup.with_minhash_signature(
            spread(t.snapshot(version=1).select("doc_id", "text"), "doc_id")
        ).drop("text")
        # r9 opt (guide §8 proxy-table pattern): the change feed is a
        # multi-join relation (file-set diff + tombstone semi-joins) and
        # BOTH consumers below — the broadcast `changed` key set and the
        # re-sign input `fresh` — would re-derive it from scratch. Cut
        # lineage once: the materialized delta is changeset-sized
        # (∝ |merge batch|, never ∝ table), so the barrier costs one
        # small write and removes a full second CDF derivation.
        delta = t.table_changes(1, 2, ["doc_id"], ["text"]).localCheckpoint(
            eager=False
        )
        changed = delta.select("doc_id").distinct()
        fresh = dedup.with_minhash_signature(
            spread(
                delta.filter(
                    F.col("change_type").isin("insert", "update")
                ).select("doc_id", F.col("new_text").alias("text")),
                "doc_id",
            )
        ).drop("text")
        index2 = index0.join(
            F.broadcast(changed), "doc_id", "left_anti"
        ).unionByName(fresh)

        n = dedup.N_MINHASH
        vals = index2.select(
            *[
                F.conv(F.substring(F.col(f"mh_{i}"), 1, 8), 16, 10)
                .cast("long")
                .alias(f"v_{i}")
                for i in range(n)
            ]
        )
        agg = vals.agg(
            F.count("*").cast("long").alias("n_docs"),
            *[F.sum(f"v_{i}").cast("long").alias(f"s_{i}") for i in range(n)],
        )
        stack_args = ", ".join(f"{i}, s_{i}" for i in range(n))
        return agg.selectExpr(
            f"stack({n}, {stack_args}) AS (perm, sig_sum)", "n_docs"
        ).select(
            F.col("perm").cast("int").alias("perm"),
            "n_docs",
            F.col("sig_sum").cast("long").alias("sig_sum"),
        )


_register()
