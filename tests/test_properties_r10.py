"""Property tests for the round-5 batches: market-basket counts vs a
brute-force model, Page-Hinkley exact-recurrence equality on random
series, Markov stationary mass conservation, Kaplan-Meier at-risk
bookkeeping, PPS certainty-row inclusion, and Spearman rank stats vs a
python model. Each generates a tiny parquet mini-warehouse per example
(the catalog queries read (spark, sf_dir)), so examples stay small."""

from __future__ import annotations

import math
import os
import shutil
import tempfile
from collections import Counter
from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from politicamente_etl_spark.plans.catalog import CATALOG

MICRO = 1_000_000


def _warehouse(spark, **tables) -> str:
    d = tempfile.mkdtemp(prefix="prop10_")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")
    return d


_ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate string, o_orderpriority string"
)


def _half_away(v: float) -> int:
    """Spark/DuckDB round() on doubles: half away from zero."""
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 5)),
        min_size=1,
        max_size=30,
    )
)
def test_basket_lift_matches_bruteforce(spark, rows):
    from politicamente_etl_spark.plans.extended_r5 import _basket_lift

    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).distinct()
    got = {
        (r.part_a, r.part_b): (r.n_both, r.conf_ppm, r.lift_ppm)
        for r in _basket_lift(li, min_both=1).collect()
    }
    baskets: dict[int, set] = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    item = Counter(p for parts in baskets.values() for p in parts)
    n_orders = len(baskets)
    pair: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair[(ps[i], ps[j])] += 1
    want = {
        (a, b): (
            c,
            c * MICRO // item[a],
            c * n_orders * MICRO // (item[a] * item[b]),
        )
        for (a, b), c in pair.items()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 10**8), min_size=1, max_size=20)
)
def test_page_hinkley_matches_recurrence(spark, series):
    rows = [
        (
            i,
            1,
            "O",
            series[i] / 100.0,
            (datetime(1995, 1, 1) + timedelta(days=i)).strftime("%Y-%m-%d"),
            "1-URGENT",
        )
        for i in range(len(series))
    ]
    d = _warehouse(spark, orders=(rows, _ORDER_SCHEMA))
    try:
        out = sorted(
            CATALOG["page_hinkley_daily"].fn(spark, d).collect(),
            key=lambda r: r.day,
        )
        prefix, m, mmin, want = 0, 0, None, []
        for t, x in enumerate(series, start=1):
            prefix += x
            dev = _half_away((float(x) - float(prefix) / t) * 100)
            m += dev
            mmin = m if mmin is None else min(mmin, m)
            want.append((x, m, m - mmin))
        assert [(r.cents, r.m_c100, r.ph_c100) for r in out] == want
        assert all(r.ph_c100 >= 0 for r in out)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.sampled_from("abc")),
        min_size=2,
        max_size=30,
    )
)
def test_markov_stationary_mass_bounded(spark, events):
    rows = [
        (i, datetime(1995, 1, 1) + timedelta(minutes=i), u, t, 1.0, "{}")
        for i, (u, t) in enumerate(events)
    ]
    d = _warehouse(
        spark,
        events=(
            rows,
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double, props string",
        ),
    )
    try:
        out = {
            r.state: r.pi_ppm
            for r in CATALOG["markov_stationary_ppm"].fn(spark, d).collect()
        }
        if not out:  # no user has two events -> no chain
            return
        total = sum(out.values())
        k = len(out)
        # each floor step leaks < k ppm; 4 floors (init + 3 iters) with
        # states dropping mass only to other TRACKED states or floors
        assert total <= MICRO
        assert total >= MICRO - 4 * (k + 1) * (k + 1)
        assert all(v >= 0 for v in out.values())
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.integers(1, 4),
        st.lists(st.integers(0, 60), min_size=1, max_size=6, unique=True),
        min_size=1,
        max_size=4,
    )
)
def test_km_at_risk_bookkeeping(spark, cust_days):
    rows = []
    ok = 0
    for ck, days in cust_days.items():
        for day in days:
            rows.append(
                (
                    ok,
                    ck,
                    "O",
                    1.0,
                    (datetime(1970, 1, 1) + timedelta(days=day)).strftime(
                        "%Y-%m-%d"
                    ),
                    "1-URGENT",
                )
            )
            ok += 1
    d = _warehouse(spark, orders=(rows, _ORDER_SCHEMA))
    try:
        out = sorted(
            CATALOG["km_survival_order_gaps"].fn(spark, d).collect(),
            key=lambda r: r.duration_days,
        )
        horizon = max(max(days) for days in cust_days.values())
        obs = []  # (duration, censored)
        for days in cust_days.values():
            ds = sorted(days)
            obs += [(b - a, 0) for a, b in zip(ds, ds[1:])]
            obs.append((horizon - ds[-1], 1))
        by_dur: dict[int, list[int]] = {}
        for dur, c in obs:
            by_dur.setdefault(dur, [0, 0])[c] += 1
        assert [r.duration_days for r in out] == sorted(by_dur)
        total = len(obs)
        consumed = 0
        cum = 0
        for r in out:
            dct = by_dur[r.duration_days]
            assert (r.n_events, r.n_censored) == (dct[0], dct[1])
            assert r.n_risk == total - consumed  # reverse-cumulative
            if 0 < dct[0] < r.n_risk:
                cum += round(
                    math.log((r.n_risk - dct[0]) / r.n_risk) * MICRO
                )
            consumed += dct[0] + dct[1]
        # spot the last row's cumulative (rounding mode: values are never
        # exact halves of 1e-6 for these small ratios)
        assert out[-1].cum_ln_surv_micro == cum
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.integers(1, 30),
    st.integers(1, 10**6),
)
def test_pps_equal_prices_sample_everything(spark, n, cents):
    # equal-priced orders: inclusion threshold T*cents/total = T/n >= 1
    # whenever n <= 1000, so ALL rows are certainty rows
    rows = [
        (k, 1, "O", cents / 100.0, "1995-01-01", "1-URGENT")
        for k in range(1, n + 1)
    ]
    d = _warehouse(spark, orders=(rows, _ORDER_SCHEMA))
    try:
        out = CATALOG["pps_systematic_sample"].fn(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_sampled == n
        assert r.key_checksum == n * (n + 1) // 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.integers(1, 8),
        st.tuples(st.integers(1, 4), st.integers(1, 500)),
        min_size=2,
        max_size=8,
    )
)
def test_spearman_matches_rank_model(spark, cust):
    # cust: custkey -> (n_orders, price_cents each)
    rows = []
    ok = 0
    for ck, (n_orders, price) in cust.items():
        for _ in range(n_orders):
            rows.append((ok, ck, "O", price / 1.0, "1995-01-01", "1-URGENT"))
            ok += 1
    d = _warehouse(spark, orders=(rows, _ORDER_SCHEMA))
    try:
        r = CATALOG["spearman_orders_spend"].fn(spark, d).collect()[0]
        xs = {ck: v[0] for ck, v in cust.items()}
        ys = {ck: v[0] * v[1] * 100 for ck, v in cust.items()}

        def r2(vals: dict):
            # doubled average rank: 2*below + t + 1
            out = {}
            for k, v in vals.items():
                below = sum(1 for w in vals.values() if w < v)
                t = sum(1 for w in vals.values() if w == v)
                out[k] = 2 * below + t + 1
            return out

        r2x, r2y = r2(xs), r2(ys)
        want_d2 = sum((r2x[k] - r2y[k]) ** 2 for k in cust)

        def ties(vals: dict):
            c = Counter(vals.values())
            return sum(t**3 - t for t in c.values())

        assert r.n == len(cust)
        assert r.sum_d2_x4 == want_d2
        assert r.tie_x == ties(xs)
        assert r.tie_y == ties(ys)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 10**6),  # cents
            st.integers(0, 11),     # order month offset
            st.integers(0, 14),     # ship month offset (may precede!)
        ),
        min_size=1,
        max_size=12,
    )
)
def test_revenue_recognition_conserves_every_order(spark, orders):
    rows, li = [], []
    for i, (cents, om, sm) in enumerate(orders):
        rows.append(
            (
                i,
                1,
                "O",
                cents / 100.0,
                f"1995-{om + 1:02d}-15",
                "1-URGENT",
            )
        )
        li.append(
            (
                i,
                1,
                1,
                1,
                1.0,
                1.0,
                0.0,
                0.0,
                "N",
                "O",
                f"{1995 + sm // 12}-{sm % 12 + 1:02d}-10",
            )
        )
    d = _warehouse(
        spark,
        orders=(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string,"
            " o_orderpriority string",
        ),
        lineitem=(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate string",
        ),
    )
    try:
        out = CATALOG["revenue_recognition_schedule"].fn(spark, d).collect()
        # cents never appear or vanish: the schedule sums to the exact
        # total across all months, whatever the interval shapes
        assert sum(r.recognized_cents for r in out) == sum(
            c for c, _, _ in orders
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 12)),  # (start, len)
        min_size=1,
        max_size=15,
    )
)
def test_open_orders_depth_returns_to_zero(spark, ivs):
    rows, li = [], []
    for i, (s, length) in enumerate(ivs):
        rows.append(
            (
                i,
                1,
                "O",
                1.0,
                (datetime(1970, 1, 1) + timedelta(days=s)).strftime(
                    "%Y-%m-%d"
                ),
                "1-URGENT",
            )
        )
        li.append(
            (
                i,
                1,
                1,
                1,
                1.0,
                1.0,
                0.0,
                0.0,
                "N",
                "O",
                (
                    datetime(1970, 1, 1) + timedelta(days=s + length)
                ).strftime("%Y-%m-%d"),
            )
        )
    d = _warehouse(
        spark,
        orders=(rows, _ORDER_SCHEMA),
        lineitem=(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate string",
        ),
    )
    try:
        out = sorted(
            CATALOG["open_orders_depth_profile"].fn(spark, d).collect(),
            key=lambda r: r.day,
        )
        # sweep-line bookkeeping: depth never negative, every interval
        # both opens and closes, final depth is exactly zero
        assert all(r.depth >= 0 for r in out)
        assert out[-1].depth == 0
        assert sum(r.n_starts for r in out) == len(ivs)
        assert sum(r.n_ends for r in out) == len(ivs)
    finally:
        shutil.rmtree(d, ignore_errors=True)
