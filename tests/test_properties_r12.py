"""Round-7 batch D/E property tests: the PNG decoder against randomized
rasters/filters (pure-Python code path — no Spark needed), and the
Kalman scalar recursion's analytic invariants."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from politicamente_etl_spark.operators.multimodal import (
    _PNG_CHANNELS,
    _png_chunk,
    parse_png,
)
from tests.test_round12_ops import _png_forward_filter, _scalar_kalman


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    color_type=st.sampled_from([0, 2, 6]),
    data=st.data(),
)
def test_png_decoder_reconstructs_any_raster(w, h, color_type, data):
    """For ANY 8-bit raster and ANY per-scanline filter choice, the
    decoder must recover the exact pixel bytes (observed through the
    pixel sum and dimensions) — this drives all five unfilter branches
    with adversarial pixel patterns, not just flat fills."""
    nch = _PNG_CHANNELS[color_type]
    rows = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * nch,
                    max_size=w * nch,
                )
            )
        )
        for _ in range(h)
    ]
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    raw = bytearray()
    prev = bytes(w * nch)
    for line, ft in zip(rows, filters):
        raw += bytes([ft]) + _png_forward_filter(ft, line, prev, nch)
        prev = line
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    got = parse_png(png)
    assert got == {
        "width": w,
        "height": h,
        "n_channels": nch,
        "pixel_sum": sum(sum(r) for r in rows),
    }


@settings(max_examples=40, deadline=None)
@given(
    xs=st.lists(
        st.floats(
            min_value=0.0, max_value=1e4, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=200,
    )
)
def test_kalman_level_stays_in_observation_hull(xs):
    """The local-level filter is a convex combination of observations:
    the level can never leave [min(xs), max(xs)], the gain stays in
    [0, 1), and the covariance stays positive and bounded by p0+Q."""
    level, p, k = _scalar_kalman(xs)
    assert min(xs) - 1e-9 <= level <= max(xs) + 1e-9
    assert 0.0 <= k < 1.0
    assert 0.0 < p <= 1.0 + 0.1 + 1e-9


@settings(max_examples=40, deadline=None)
@given(
    xs=st.lists(
        st.floats(min_value=0.1, max_value=100.0, allow_nan=False),
        min_size=2,
        max_size=50,
    )
)
def test_kalman_gain_sequence_is_data_independent(xs):
    """The Riccati recursion (p, k) never reads the data — the gain
    after n steps over ANY series equals the gain over a constant
    series of the same length. (This is what makes the filter's cost
    O(1) state per key at any scale.)"""
    _, p_a, k_a = _scalar_kalman(xs)
    _, p_b, k_b = _scalar_kalman([7.0] * len(xs))
    assert p_a == p_b and k_a == k_b
