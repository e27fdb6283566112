"""Unit tests: multimodal binary plumbing (with injected fake codecs and
the stub path) and the as-of / range join operators on literal frames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.operators import multimodal as mm
from politicamente_etl_spark.operators.temporal import asof_join, range_join_bucketed


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], "doc_id long, text string"
    )
    return mm.with_binary_payload(df)


def test_media_features_roundtrip(spark, media):
    import hashlib

    rows = {r.doc_id: r for r in mm.extract_media_features(media).collect()}
    assert rows[1].n_bytes == len(b"hello world")
    assert rows[1].content_md5 == hashlib.md5(b"hello world").hexdigest()
    assert rows[1].media_type == "text/plain"


def test_decode_image_meta_stub_raises(spark, media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        mm.decode_image_meta(media).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_image_meta_injected(spark, media):
    def fake_decoder(b: bytes):
        return (len(b), len(b) * 2, 3)

    rows = {r.doc_id: r for r in mm.decode_image_meta(media, fake_decoder).collect()}
    assert rows[1].width == 11 and rows[1].height == 22 and rows[1].n_channels == 3


def test_sample_frames_injected(spark, media):
    def fake_frames(b: bytes, every_n: int):
        return [b[:4], b[4:8]]

    out = mm.sample_frames(media, frame_extractor=fake_frames).collect()
    assert len(out) == 4  # 2 docs × 2 frames
    assert {r.frame_no for r in out} == {0, 1}


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 4, "early"), (2, 50, "c")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 15, 200), (2, 60, 300)], "k long, rts long, payload long"
    )
    out = {
        r.name: r
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["payload"],
        ).collect()
    }
    assert out["a"].asof_ts == 5 and out["a"].asof_payload == 100
    assert out["b"].asof_ts == 15 and out["b"].asof_payload == 200
    assert out["early"].asof_ts is None  # nothing at-or-before ts=4
    assert out["c"].asof_ts is None  # right row at 60 > 50


def test_asof_join_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 10)], "k long, rts long")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", right_cols=[])
    assert out.collect()[0].asof_ts == 10  # <= bound is inclusive


def test_range_join_bucketed(spark):
    left = spark.createDataFrame(
        [(1, 5.0), (2, 149.9), (3, 150.0), (4, 250.0)], "id long, v double"
    )
    ranges = spark.createDataFrame(
        [(0, 0.0, 150.0), (1, 100.0, 250.0)], "band long, lo double, hi double"
    )
    got = sorted(
        (r.id, r.band)
        for r in range_join_bucketed(left, ranges, "v", "lo", "hi", 50.0).collect()
    )
    # 5.0→band0; 149.9→bands 0+1; 150.0→band1 only (hi-exclusive); 250.0→none
    assert got == [(1, 0), (2, 0), (2, 1), (3, 1)]


def test_resize_images_injected(spark, media):
    """resize_images: 1:1 rows, payload transformed by the injected codec,
    dims attached."""
    import politicamente_etl_spark.operators.multimodal as mm

    def fake_resizer(b: bytes, w: int, h: int) -> bytes:
        return b[: w % 7 + 1]  # deterministic, size-dependent

    out = {r.doc_id: r for r in mm.resize_images(media, 224, 224, fake_resizer).collect()}
    src = {r.doc_id: r for r in media.collect()}
    assert set(out) == set(src)
    for doc_id, r in out.items():
        assert bytes(r.media) == bytes(src[doc_id].media)[:1]
        assert (r.width, r.height) == (224, 224)


def test_resize_images_stub_raises(spark, media):
    import pytest

    import politicamente_etl_spark.operators.multimodal as mm

    with pytest.raises(Exception, match="NotImplementedError|no image codec"):
        mm.resize_images(media).collect()


def test_asof_join_forward_direction(spark):
    """forward: smallest right_ts >= left_ts; >= bound inclusive."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 16, "mid"), (2, 70, "late")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 15, 200), (1, 20, 300), (2, 60, 400)],
        "k long, rts long, payload long",
    )
    out = {
        r.name: r
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["payload"], direction="forward",
        ).collect()
    }
    assert out["a"].asof_ts == 15 and out["a"].asof_payload == 200
    assert out["b"].asof_ts == 20 and out["b"].asof_payload == 300  # >= inclusive
    assert out["mid"].asof_ts == 20 and out["mid"].asof_payload == 300
    assert out["late"].asof_ts is None  # nothing at-or-after 70


def test_asof_join_tolerance(spark):
    """tolerance nulls matches farther than the bound (pandas parity),
    in both directions."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 100, "near"), (1, 500, "far")], "k long, ts long, name string"
    )
    right = spark.createDataFrame([(1, 90, 7)], "k long, rts long, payload long")
    back = {
        r.name: r
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["payload"], tolerance=F.lit(50),
        ).collect()
    }
    assert back["near"].asof_ts == 90 and back["near"].asof_payload == 7
    assert back["far"].asof_ts is None and back["far"].asof_payload is None

    fwd_left = spark.createDataFrame(
        [(1, 80, "near"), (1, 10, "far")], "k long, ts long, name string"
    )
    fwd = {
        r.name: r
        for r in asof_join(
            fwd_left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["payload"], direction="forward", tolerance=F.lit(20),
        ).collect()
    }
    assert fwd["near"].asof_ts == 90
    assert fwd["far"].asof_ts is None  # 90 - 10 = 80 > 20


def test_asof_join_timestamp_interval_tolerance(spark, sf_dir):
    """Timestamp columns with an INTERVAL tolerance: same operator, the
    delta comparison runs in day-time-interval arithmetic."""
    from pyspark.sql import functions as F

    from politicamente_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir).limit(2000)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        right_cols=["c_id"],
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    rows = joined.collect()
    assert len(rows) == purchases.count()
    for r in rows:
        if r.asof_ts is not None:
            delta = (r.p_ts - r.asof_ts).total_seconds()
            assert 0 <= delta <= 1800


# --- built-in pure-Python image codec (round 7: the real byte path) ---


def test_encode_parse_bmp_roundtrip_with_padding():
    """width=3 forces a 9-byte pixel row padded to 12 — the parser must
    exclude the 3 padding bytes from pixel_sum."""
    data = mm.encode_bmp(3, 2, 7)
    assert data[:2] == b"BM"
    got = mm.parse_bmp(data)
    assert got == {
        "width": 3,
        "height": 2,
        "n_channels": 3,
        "pixel_sum": 3 * 2 * 3 * 7,
    }
    # stride math: file = 54-byte header + 2 rows of 12
    assert len(data) == 54 + 2 * 12


def test_parse_bmp_rejects_compressed_and_non_bmp():
    with pytest.raises(ValueError):
        mm.parse_bmp(b"PNG whatever")
    data = bytearray(mm.encode_bmp(2, 2, 1))
    data[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(NotImplementedError):
        mm.parse_bmp(bytes(data))


def test_parse_ppm_header_with_comment():
    raster = bytes(range(2 * 1 * 3))
    data = b"P6\n# a comment\n2 1\n255\n" + raster
    got = mm.parse_ppm(data)
    assert got == {
        "width": 2,
        "height": 1,
        "n_channels": 3,
        "pixel_sum": sum(raster),
    }


def test_decode_image_dispatch_and_unknown_format():
    assert mm.decode_image(mm.encode_bmp(1, 1, 9))["pixel_sum"] == 27
    assert mm.decode_image(b"P6\n1 1\n255\n\x01\x02\x03")["pixel_sum"] == 6
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n")


def test_decode_image_meta_default_uses_builtin_codec(spark):
    df = spark.createDataFrame(
        [(1, mm.encode_bmp(4, 3, 5)), (2, mm.encode_bmp(7, 2, 0))],
        "doc_id long, media binary",
    )
    rows = {r.doc_id: r for r in mm.decode_image_meta(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_channels) == (4, 3, 3)
    assert (rows[2].width, rows[2].height, rows[2].n_channels) == (7, 2, 3)


def test_decode_image_stats_executor_path(spark):
    df = spark.createDataFrame(
        [(1, mm.encode_bmp(4, 3, 5))], "doc_id long, media binary"
    )
    (row,) = mm.decode_image_stats(df).collect()
    assert row.pixel_sum == 4 * 3 * 3 * 5 and row.width == 4


def test_encode_parse_wav_roundtrip_mono_and_stereo():
    got = mm.parse_wav(mm.encode_wav(10, 16000, -7, n_channels=1))
    assert got == {
        "n_channels": 1,
        "sample_rate": 16000,
        "n_samples": 10,
        "sample_sum": -70,
    }
    got = mm.parse_wav(mm.encode_wav(5, 8000, 100, n_channels=2))
    assert got == {
        "n_channels": 2,
        "sample_rate": 8000,
        "n_samples": 5,
        "sample_sum": 5 * 2 * 100,
    }


def test_parse_wav_walks_extra_chunks_and_rejects_non_pcm():
    # a LIST chunk (odd-sized, forcing the word-alignment pad) before fmt
    base = mm.encode_wav(3, 8000, 4)
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    data = base[:12] + extra + base[12:]
    data = data[:4] + (len(data) - 8).to_bytes(4, "little") + data[8:]
    assert mm.parse_wav(data)["sample_sum"] == 12
    with pytest.raises(ValueError):
        mm.parse_wav(b"OggS junk")
    bad = bytearray(mm.encode_wav(2, 8000, 1))
    bad[20:22] = (3).to_bytes(2, "little")  # IEEE float format tag
    with pytest.raises(NotImplementedError):
        mm.parse_wav(bytes(bad))


def test_decode_audio_stats_executor_path(spark):
    df = spark.createDataFrame(
        [(1, mm.encode_wav(4, 8000, 9, n_channels=2))],
        "doc_id long, media binary",
    )
    (row,) = mm.decode_audio_stats(df).collect()
    assert (row.n_channels, row.sample_rate, row.n_samples, row.sample_sum) \
        == (2, 8000, 4, 72)
