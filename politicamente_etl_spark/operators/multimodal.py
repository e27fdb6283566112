"""Multimodal column plumbing (SURVEY.md §2.10 north star).

Images/audio/video ride through the engine as opaque `binary` columns with
typed metadata. Spark-side plumbing — schema, partition-friendly batch
shape, Arrow-batched `mapInPandas` signatures — is real and tested; the
actual codec calls are stubbed (`NotImplementedError`) because no
image/audio libraries exist in this environment. A production deployment
injects a decoder; everything around it is already distributed-correct.

Scale notes: media bytes dominate row size, so feature extraction uses
`mapInPandas` (per-partition Arrow batches — bytes cross the JVM↔Python
boundary once, never per-row) and outputs drop the payload column as early
as possible so downstream shuffles move only features.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, media_type string"
)
IMAGE_META_SCHEMA = "doc_id long, width int, height int, n_channels int"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media: the document text encoded as bytes, with a
    media_type tag. Stands in for real image/audio payload columns."""
    return df.withColumn("media", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def extract_media_features(df: DataFrame) -> DataFrame:
    """Codec-independent feature pass over binary payloads via mapInPandas:
    size + content digest + type. This is the real production shape — the
    pandas batch loop is where a decoder would run."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "content_md5": pdf["media"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "media_type": pdf["media_type"],
                }
            )

    return df.select("doc_id", "media", "media_type").mapInPandas(
        featurize, MEDIA_FEATURES_SCHEMA
    )


def decode_image_meta(
    df: DataFrame, decoder: Callable[[bytes], tuple[int, int, int]] | None = None
) -> DataFrame:
    """Image decode → (width, height, channels). `decoder` must be supplied
    (e.g. PIL-based) — this environment has no image codecs, so the default
    raises NotImplementedError *inside the executor batch*, proving the
    plumbing executes; tests inject a deterministic fake decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no image codec in this environment; inject decoder="
                )
            meta = [decoder(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_channels": [m[2] for m in meta],
                }
            )

    return df.select("doc_id", "media").mapInPandas(run, IMAGE_META_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize shape: binary payload in → resized binary payload out,
    plus the target dims as metadata. The codec slot (`resizer`) is stubbed
    like decode_image_meta — a PIL/opencv-backed callable in production,
    a deterministic fake in tests.

    Resize preserves row count (1:1), so it composes with feature
    extraction in the same mapInPandas pass in a real pipeline; kept
    separate here so each operator's batch contract is independently
    testable. Payload bytes stay inside the Arrow batch — one JVM↔Python
    crossing each way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "no image codec in this environment; inject resizer="
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [
                        resizer(bytes(b), width, height) for b in pdf["media"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "media").mapInPandas(
        run, "doc_id long, media binary, width int, height int"
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    frame_extractor: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame-sampling shape: one input row → N frame rows (binary).
    Extractor stubbed like decode_image_meta; the explode-after-extract
    pattern keeps the expensive decode single-pass per payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if frame_extractor is None:
                raise NotImplementedError(
                    "no video codec in this environment; inject frame_extractor="
                )
            rows: dict[str, list[Any]] = {"doc_id": [], "frame_no": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                for i, fr in enumerate(frame_extractor(bytes(payload), every_n)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame"].append(fr)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(
        run, "doc_id long, frame_no int, frame binary"
    )


def frame_sampling_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    duration_col: str = "duration_ms",
    every_ms: int = 40,
    max_frames: int = 16,
) -> DataFrame:
    """Deterministic frame-sampling PLAN for video payloads: one row per
    (media item, frame) with the millisecond timestamp to decode at —
    every `every_ms` from 0, capped at `max_frames` per item. The plan is
    pure metadata (no payload touched), so it computes as a narrow
    sequence-explode over the catalog scan and can be joined back to the
    binary column only inside the decode `mapInPandas` pass — at 100 TB
    the planner runs on the (tiny) metadata table while the byte-heavy
    decode stays embarrassingly parallel and reads each payload once.

    The row blow-up is bounded by max_frames, and the (id, frame_idx)
    grain is exactly what `extract_video_frames` emits — the plan is the
    declarative half of that stub's imperative loop."""
    n = F.least(
        F.lit(max_frames),
        (F.floor(F.col(duration_col) / F.lit(every_ms)) + F.lit(1)),
    ).cast("int")
    # Spark's sequence(0, n-1) auto-DESCENDS when n <= 0 (phantom frames
    # for corrupt negative durations); emit an empty array instead so a
    # bad item yields zero plan rows — matching generate_series semantics.
    seq = F.when(n >= 1, F.sequence(F.lit(0), n - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    return df.select(
        F.col(id_col),
        F.posexplode(seq).alias("frame_idx", "__v"),
    ).select(
        F.col(id_col),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx") * F.lit(every_ms)).cast("long").alias("ts_ms"),
    )


def extract_media_features_arrow(df: DataFrame) -> DataFrame:
    """The `mapInArrow` twin of `extract_media_features`: batches arrive
    as raw `pyarrow.RecordBatch` instead of pandas DataFrames, so the
    binary payload column is touched as Arrow buffers — no
    pandas-Series-of-Python-bytes materialization per row. For byte-heavy
    media columns this removes the dominant conversion cost of the pandas
    tier (pandas boxes every payload into a Python bytes object; Arrow
    keeps one contiguous buffer + offsets).

    Output is identical to the pandas path (tested row-for-row) — the two
    tiers are interchangeable, and the Arrow one is the default
    recommendation once per-item work is C-level (hashing, codecs)."""
    import hashlib

    import pyarrow as pa

    def featurize(batches):
        for batch in batches:
            media = batch.column(batch.schema.get_field_index("media"))
            # one buffer wrap per value, both stats derived from it
            bufs = [v.as_buffer() for v in media]
            digests = [hashlib.md5(b).hexdigest() for b in bufs]
            sizes = [len(b) for b in bufs]
            yield pa.record_batch(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pa.array(sizes, type=pa.int64()),
                    pa.array(digests, type=pa.string()),
                    batch.column(
                        batch.schema.get_field_index("media_type")
                    ),
                ],
                names=["doc_id", "n_bytes", "content_md5", "media_type"],
            )

    return df.select("doc_id", "media", "media_type").mapInArrow(
        featurize, MEDIA_FEATURES_SCHEMA
    )
