"""Property-based tests for the round-6-prep operator families whose
semantics have sharp edges: survival-curve monotonicity under censoring,
RBO bounds and rank monotonicity, HLL merge associativity over arbitrary
splits, CUSUM's zero-sum invariant, and budget selection's hard cap.

Same contract as tests/test_properties.py: small generated frames vs an
independent Python model, adversarial shapes (empty groups, ties, gaps)
rather than the fixed testdata distribution.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


steps = st.lists(
    st.tuples(
        st.integers(0, 12),  # t — collisions merged below
        st.integers(0, 5),  # d
        st.integers(0, 5),  # c
    ),
    min_size=1,
    max_size=10,
)


@given(data=steps)
@settings(**SETTINGS)
def test_kaplan_meier_properties(spark, data):
    """n_risk telescopes exactly; surv_lp_micro is non-increasing; the
    log survival equals the Python product-limit model within rounding."""
    from politicamente_etl_spark.operators.temporal import kaplan_meier_terms

    merged: dict[int, tuple[int, int]] = {}
    for t, d, c in data:
        pd_, pc = merged.get(t, (0, 0))
        merged[t] = (pd_ + d, pc + c)
    rows = [(t, d, c) for t, (d, c) in sorted(merged.items()) if d + c > 0]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["t", "d", "c"])
    out = sorted(kaplan_meier_terms(df).collect(), key=lambda r: r["t"])
    total = sum(d + c for _, d, c in rows)
    # telescoping at-risk counts
    acc = total
    lp_model = 0
    prev_lp = None
    for r, (t, d, c) in zip(out, rows):
        assert r["n_risk"] == acc
        acc -= d + c
        if d < r["n_risk"]:
            lp_model += round(math.log((r["n_risk"] - d) / r["n_risk"]) * 1e6)
            assert r["surv_lp_micro"] == lp_model
        if prev_lp is not None and r["surv_lp_micro"] is not None:
            assert r["surv_lp_micro"] <= prev_lp
        prev_lp = r["surv_lp_micro"]


ranks = st.permutations(list(range(1, 9)))


@given(pe=ranks, pa=ranks, k_common=st.integers(0, 8))
@settings(**SETTINGS)
def test_rbo_bounds_and_identity(spark, pe, pa, k_common):
    """0 <= rbo <= full mass; rbo(x, x) == full mass; dropping common
    docs never increases the score."""
    from politicamente_etl_spark.operators.sim import (
        rbo_compare,
        rbo_suffix_weights,
    )

    k = 8
    w = rbo_suffix_weights(k, 0.9)
    e = spark.createDataFrame(
        [(0, i, r) for i, r in enumerate(pe, 1)], ["query_id", "vec_id", "rank"]
    )
    # approx shares only the first k_common doc ids (renumber the rest)
    a_rows = [
        (0, i if i <= k_common else 100 + i, r)
        for i, r in enumerate(pa, 1)
    ]
    a = spark.createDataFrame(a_rows, ["query_id", "vec_id", "rank"])
    r = rbo_compare(e, a, k=k, p=0.9).collect()[0]
    assert 0 <= r["rbo_micro"] <= sum(w)
    assert r["n_overlap"] == k_common
    ident = rbo_compare(e, e, k=k, p=0.9).collect()[0]
    assert ident["rbo_micro"] == sum(w)


values = st.lists(st.integers(0, 10_000), min_size=2, max_size=40)
cut = st.integers(1, 5)


@given(vals=values, nparts=cut)
@settings(**SETTINGS)
def test_hll_merge_associative_arbitrary_splits(spark, vals, nparts):
    """Registers of any partition-union == registers of the whole — for
    arbitrary (including empty and skewed) splits."""
    from politicamente_etl_spark.operators.agg import hll_registers

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "v"])
    whole = {
        (r["bucket"], r["max_rho"]) for r in hll_registers(df, "v").collect()
    }
    merged: dict[int, int] = {}
    for p in range(nparts):
        part = hll_registers(df.filter(F.col("i") % nparts == p), "v")
        for r in part.collect():
            merged[r["bucket"]] = max(
                merged.get(r["bucket"], 0), r["max_rho"]
            )
    assert set(merged.items()) == whole


series = st.lists(st.integers(0, 1000), min_size=2, max_size=30)


@given(xs=series)
@settings(**SETTINGS)
def test_cusum_invariants(spark, xs):
    """The full-series CUSUM telescopes to zero (sum of n-scaled devs);
    the reported peak is the true argmax |prefix sum| with earliest-t
    ties; before/after sums partition the total."""
    from politicamente_etl_spark.operators.stats import cusum_changepoint

    df = spark.createDataFrame(list(enumerate(xs)), ["t", "x"])
    r = cusum_changepoint(df, "t", "x").collect()[0]
    n, s = len(xs), sum(xs)
    devs = [n * x - s for x in xs]
    assert sum(devs) == 0
    prefix, best_t, best_v = 0, None, -1
    for t, d in enumerate(devs):
        prefix += d
        if abs(prefix) > best_v:
            best_v, best_t = abs(prefix), t
    assert r["change_t"] == best_t
    assert abs(r["cusum"]) == best_v
    assert r["sum_before"] + r["sum_after"] == s
    assert r["n_before"] + r["n_after"] == n


docs = st.lists(
    st.tuples(
        st.integers(0, 1),  # source
        st.integers(1, 30),  # n_tokens
        st.integers(0, 1000),  # quality
    ),
    min_size=0,
    max_size=25,
)


@given(data=docs, budget=st.integers(0, 120))
@settings(**SETTINGS)
def test_token_budget_never_exceeded_and_greedy(spark, data, budget):
    """cum_tokens <= budget always; the kept set equals the Python greedy
    model walking (quality desc, id) and skipping docs that overflow
    NOTHING — the running total includes skipped docs by contract."""
    from politicamente_etl_spark.operators.sampling import (
        select_by_token_budget,
    )

    rows = [
        (str(s), i, q, nt) for i, (s, nt, q) in enumerate(data)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, ["source", "doc_id", "q_milli", "n_tokens"]
    )
    got = {
        (r["source"], r["doc_id"])
        for r in select_by_token_budget(df, budget_tokens=budget).collect()
    }
    model = set()
    for src in {r[0] for r in rows}:
        cum = 0
        for s_, i, q, nt in sorted(
            (r for r in rows if r[0] == src), key=lambda r: (-r[2], r[1])
        ):
            cum += nt
            if cum <= budget:
                model.add((src, i))
    assert got == model
