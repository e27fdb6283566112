"""Baseline JPEG codec tests (operators/multimodal.py JPEG section).

The encoder/decoder pair is the compressed-format capstone of the
decode seam: real FDCT → quantize → Huffman bitstream on the way in,
real marker walk → entropy decode → dequant → IDCT on the way out.
Reference parity note: the reference pipeline has no multimodal surface
at all (its ETL is pure tabular — src/politicamente_etl/etl/load.py);
this battery exists for the §2.10 LLM-data-pipeline extension.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from politicamente_etl_spark.operators import multimodal as mm


# --- flat-fill closed-form exactness (what the driver oracle rests on) ---


@pytest.mark.parametrize(
    "w,h,fill", [(1, 1, 0), (3, 5, 250), (8, 8, 17), (13, 9, 128), (20, 11, 77)]
)
def test_flat_gray_roundtrip_exact(w, h, fill):
    got = mm.parse_jpeg(mm.encode_jpeg(w, h, fill))
    assert got == {
        "width": w,
        "height": h,
        "n_channels": 1,
        "pixel_sum": w * h * fill,
    }


@pytest.mark.parametrize("w,h,fill", [(5, 3, 10), (16, 8, 200), (9, 9, 128)])
def test_flat_rgb_roundtrip_exact(w, h, fill):
    got = mm.parse_jpeg(mm.encode_jpeg(w, h, fill, n_channels=3))
    assert got == {
        "width": w,
        "height": h,
        "n_channels": 3,
        "pixel_sum": w * h * 3 * fill,
    }


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    fill=st.integers(0, 255),
    quality=st.integers(77, 100),
)
def test_flat_gray_exact_property(w, h, fill, quality):
    """Flat blocks are DC-only; for quality>=77 the scaled Annex-K
    Q[0] stays < 8, so the DC reconstruction error is < 0.5 and the
    roundtrip is bit-exact for every (w, h, fill, quality)."""
    got = mm.parse_jpeg(mm.encode_jpeg(w, h, fill, quality=quality))
    assert got["pixel_sum"] == w * h * fill
    assert (got["width"], got["height"]) == (w, h)


# --- lossy-but-bounded reconstruction on arbitrary pixel content ---


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_noise_gray_q100_bounded_error(w, h, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    dec = mm._decode_jpeg_pixels(mm.encode_jpeg(w, h, pixels=px, quality=100))
    assert dec.shape == (h, w, 1)
    assert np.abs(dec[..., 0].astype(int) - px.astype(int)).max() <= 2


def test_noise_rgb_q100_bounded_error():
    px = np.random.default_rng(3).integers(0, 256, (10, 14, 3), dtype=np.uint8)
    dec = mm._decode_jpeg_pixels(mm.encode_jpeg(14, 10, pixels=px, quality=100))
    assert dec.shape == (10, 14, 3)
    # YCbCr forward+inverse adds one extra rounding on top of the DCT
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 4


def test_smooth_gradient_high_quality_exact():
    px = (np.add.outer(np.arange(24) * 3, np.arange(33) * 2) % 256).astype(
        np.uint8
    )
    dec = mm._decode_jpeg_pixels(mm.encode_jpeg(33, 24, pixels=px, quality=95))
    assert np.array_equal(dec[..., 0], px)


def test_lower_quality_compresses_harder():
    px = np.random.default_rng(11).integers(0, 256, (32, 32), dtype=np.uint8)
    hi = mm.encode_jpeg(32, 32, pixels=px, quality=95)
    lo = mm.encode_jpeg(32, 32, pixels=px, quality=10)
    assert len(lo) < len(hi)
    with pytest.raises(ValueError, match="quality"):
        mm.encode_jpeg(4, 4, 1, quality=0)


# --- restart markers + byte stuffing ---


def test_restart_interval_decodes_identically():
    px = np.random.default_rng(5).integers(0, 256, (24, 40), dtype=np.uint8)
    plain = mm.encode_jpeg(40, 24, pixels=px, quality=100)
    rst = mm.encode_jpeg(40, 24, pixels=px, quality=100, restart_interval=3)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst  # DRI + RST0 present
    assert b"\xff\xdd" not in plain
    assert np.array_equal(
        mm._decode_jpeg_pixels(plain), mm._decode_jpeg_pixels(rst)
    )


def test_entropy_byte_stuffing_roundtrips():
    """A payload whose entropy stream contains emitted 0xFF bytes must
    destuff correctly — search random seeds until one actually produces
    a stuffed 0xFF00 inside the scan, then roundtrip it."""
    for seed in range(200):
        px = np.random.default_rng(seed).integers(
            0, 256, (8, 8), dtype=np.uint8
        )
        data = mm.encode_jpeg(8, 8, pixels=px, quality=100)
        scan_at = data.find(b"\xff\xda")
        if b"\xff\x00" in data[scan_at:]:
            dec = mm._decode_jpeg_pixels(data)
            assert np.abs(dec[..., 0].astype(int) - px.astype(int)).max() <= 2
            return
    pytest.fail("no seed produced a stuffed 0xFF in the entropy stream")


# --- unsupported-variant fences (the injectable-decoder seam) ---


def _swap_marker(data: bytes, old: int, new: int) -> bytes:
    out = bytearray(data)
    idx = out.find(bytes([0xFF, old]))
    assert idx >= 0
    out[idx + 1] = new
    return bytes(out)


def test_progressive_sof_rejected():
    data = _swap_marker(mm.encode_jpeg(4, 4, 1), 0xC0, 0xC2)
    with pytest.raises(NotImplementedError, match="progressive"):
        mm.parse_jpeg(data)


def test_sixteen_bit_dqt_rejected():
    data = bytearray(mm.encode_jpeg(4, 4, 1))
    idx = data.find(b"\xff\xdb")
    data[idx + 4] |= 0x10  # Pq=1: 16-bit table precision
    with pytest.raises(NotImplementedError, match="16-bit"):
        mm.parse_jpeg(bytes(data))


def test_subsampled_sof_rejected():
    data = bytearray(mm.encode_jpeg(4, 4, 1, n_channels=3))
    idx = data.find(b"\xff\xc0")
    data[idx + 11] = 0x22  # first component sampling 2x2
    with pytest.raises(NotImplementedError, match="subsampled"):
        mm.parse_jpeg(bytes(data))


def test_truncated_and_non_jpeg_rejected():
    data = mm.encode_jpeg(16, 16, 1)
    with pytest.raises(ValueError):
        mm.parse_jpeg(data[: len(data) // 2])
    with pytest.raises(ValueError, match="not a JPEG"):
        mm.parse_jpeg(b"RIFF nope")


# --- seam integration ---


def test_decode_image_dispatches_jpeg():
    got = mm.decode_image(mm.encode_jpeg(4, 4, 9))
    assert got == {
        "width": 4,
        "height": 4,
        "n_channels": 1,
        "pixel_sum": 4 * 4 * 9,
    }


def test_decode_image_stats_executor_path_jpeg(spark):
    df = spark.createDataFrame(
        [
            (1, mm.encode_jpeg(6, 3, 5)),
            (2, mm.encode_jpeg(7, 2, 10, n_channels=3)),
        ],
        "doc_id long, media binary",
    )
    rows = {
        r["doc_id"]: r
        for r in mm.decode_image_stats(df).collect()
    }
    assert rows[1]["pixel_sum"] == 6 * 3 * 5
    assert rows[1]["n_channels"] == 1
    assert rows[2]["pixel_sum"] == 7 * 2 * 3 * 10
    assert rows[2]["n_channels"] == 3
