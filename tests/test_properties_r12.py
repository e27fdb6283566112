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


# -- table_changes vs the naive full-snapshot diff --------------------------------


import pytest


@pytest.mark.slow
@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_table_changes_equals_full_snapshot_diff(spark, tmp_path_factory, data):
    """The changed-files-only CDF must be EXTENSIONALLY equal to
    cdc.snapshot_diff over full snapshots for any interleaving of
    appends, merges, logical deletes, and restores — the strongest
    statement of this round's table_changes rewrite (coalescing,
    NULL-key handling, re-add flips are all consequences of this
    equality)."""
    from politicamente_etl_spark.operators import cdc
    from politicamente_etl_spark.sources.txlog import TxLogTable

    tmp = tmp_path_factory.mktemp("cdfprop")
    base = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 13)], "k long, v long"
    )
    t = TxLogTable.create(spark, str(tmp / "t"), base.repartition(3))
    n_ops = data.draw(st.integers(2, 4))
    next_key = 100
    for _ in range(n_ops):
        op = data.draw(st.sampled_from(["append", "merge", "delete", "restore"]))
        if op == "append":
            t.append(
                spark.createDataFrame(
                    [(next_key, next_key)], "k long, v long"
                )
            )
            next_key += 1
        elif op == "merge":
            ks = data.draw(
                st.lists(st.integers(1, 12), min_size=1, max_size=3, unique=True)
            )
            t.merge(
                spark.createDataFrame(
                    [(k, k * 1000 + t.latest_version()) for k in ks],
                    "k long, v long",
                ),
                ["k"],
            )
        elif op == "delete":
            ks = data.draw(
                st.lists(st.integers(1, 12), min_size=1, max_size=3, unique=True)
            )
            live = {r.k for r in t.snapshot().select("k").collect()}
            ks = [k for k in ks if k in live]
            if not ks:
                continue
            t.delete_where_logical(
                "k", keys_df=spark.createDataFrame([(k,) for k in ks], "k long")
            )
        else:
            v = data.draw(st.integers(1, t.latest_version()))
            t.restore(v)
    hi = t.latest_version()
    lo = data.draw(st.integers(1, hi))
    if lo == hi:
        return
    got = {
        tuple(r)
        for r in t.table_changes(lo, hi, ["k"], ["v"])
        .select("k", "change_type", "old_v", "new_v")
        .collect()
    }
    want = {
        tuple(r)
        for r in cdc.snapshot_diff(
            t.snapshot(version=lo), t.snapshot(version=hi), ["k"], ["v"]
        )
        .select("k", "change_type", "old_v", "new_v")
        .collect()
    }
    assert got == want


@pytest.mark.slow
@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_sync_from_table_equals_source(spark, tmp_path_factory, data):
    """For ANY source key set (subset updates, fresh inserts, arbitrary
    vanishes), after sync_from the table content EQUALS the source —
    the defining property of three-clause MERGE."""
    from politicamente_etl_spark.sources.txlog import TxLogTable

    tmp = tmp_path_factory.mktemp("syncprop")
    base = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 16)], "k long, v long"
    )
    t = TxLogTable.create(spark, str(tmp / "t"), base.repartition(3))
    keep = data.draw(
        st.lists(st.integers(1, 15), min_size=0, max_size=15, unique=True)
    )
    fresh = data.draw(
        st.lists(st.integers(100, 110), min_size=0, max_size=4, unique=True)
    )
    rows = [(k, k * 1000) for k in keep] + [(k, k) for k in fresh]
    if not rows:
        return  # sync to empty is rejected by design (use overwrite)
    src = spark.createDataFrame(rows, "k long, v long")
    m = t.sync_from(src, ["k"])
    assert m["sync_stats"]["deleted_keys"] == 15 - len(keep)
    got = {(r.k, r.v) for r in t.snapshot().collect()}
    assert got == set(rows)


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(
    ids=st.lists(
        st.integers(0, 1_000_000), min_size=1, max_size=40, unique=True
    )
)
def test_contiguous_ids_dense_for_any_id_distribution(spark, tmp_path_factory, ids):
    """The two-pass numbering must produce exactly 1..N in id order for
    ANY id distribution — clustered, sparse, singleton, adversarial."""
    import os

    from politicamente_etl_spark.plans.catalog import CATALOG

    d = str(tmp_path_factory.mktemp("cid"))
    spark.createDataFrame([(i,) for i in ids], "doc_id long").write.parquet(
        os.path.join(d, "documents.parquet")
    )
    rows = sorted(
        CATALOG["contiguous_id_assignment"].fn(spark, d).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["doc_id"] for r in rows] == sorted(ids)
    assert [r["global_id"] for r in rows] == list(range(1, len(ids) + 1))
