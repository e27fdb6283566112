"""Second property batch for the round-8 families: the closed-form
max-min isotonic fit must equal classic stack PAV on arbitrary bins,
BFS hop distances must match a Python BFS on random graphs, and the
mutual-kNN filter must be invariant to candidate-pair orientation."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


bins_strategy = st.lists(
    st.tuples(st.integers(1, 30), st.integers(0, 30)).map(
        lambda t: (t[0], min(t[0], t[1]))  # n_pos <= n
    ),
    min_size=1,
    max_size=8,
)


def _stack_pav(vals):
    """Classic pool-adjacent-violators with exact Fraction means;
    returns the fitted fraction per original bin."""
    stack: list = []  # (pos, n, width_in_bins)
    for p, q in vals:
        stack.append((p, q, 1))
        while len(stack) > 1 and Fraction(stack[-2][0], stack[-2][1]) > (
            Fraction(stack[-1][0], stack[-1][1])
        ):
            p2, q2, w2 = stack.pop()
            p1, q1, w1 = stack.pop()
            stack.append((p1 + p2, q1 + q2, w1 + w2))
    fit = []
    for p, q, w in stack:
        fit.extend([Fraction(p, q)] * w)
    return fit


@given(bins=bins_strategy)
@settings(**SETTINGS)
def test_isotonic_max_min_equals_stack_pav(spark, bins):
    from politicamente_etl_spark.operators.stats import isotonic_calibration

    df = spark.createDataFrame(
        [(i, n, p) for i, (n, p) in enumerate(bins)],
        "bin long, n long, n_pos long",
    )
    got = {
        r.bin: r.iso_rate_ppm for r in isotonic_calibration(df).collect()
    }
    want = _stack_pav([(p, n) for n, p in bins])
    for i, f in enumerate(want):
        assert got[i] == (f.numerator * 1_000_000) // f.denominator
    iso = [got[i] for i in range(len(bins))]
    assert iso == sorted(iso)  # monotone non-decreasing, always


graphs = st.lists(
    st.tuples(st.integers(1, 10), st.integers(1, 10)),
    min_size=1,
    max_size=20,
).map(lambda es: [(a, b) for a, b in es if a != b])


@given(edges=graphs, n_hops=st.integers(1, 4))
@settings(**SETTINGS)
def test_bfs_matches_python_on_random_graphs(spark, edges, n_hops):
    from collections import deque

    from politicamente_etl_spark.operators.graph import bfs_hop_distances

    if not edges:
        return
    seeds = [min(min(e) for e in edges)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {
        r.node: r.dist
        for r in bfs_hop_distances(e, s, max_hops=n_hops).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want, dq = {seeds[0]: 0}, deque(seeds)
    while dq:
        u = dq.popleft()
        if want[u] >= n_hops:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    assert got == want


dots_strategy = st.lists(
    st.tuples(
        st.integers(1, 8), st.integers(1, 8), st.integers(1, 1000)
    ),
    min_size=1,
    max_size=16,
).map(
    lambda ds: list(
        {
            (min(a, b), max(a, b)): d
            for a, b, d in ds
            if a != b
        }.items()
    )
)


@given(dots=dots_strategy, k=st.integers(1, 4))
@settings(**SETTINGS)
def test_mutual_knn_orientation_invariance_and_symmetry(spark, dots, k):
    from politicamente_etl_spark.operators.sim import mutual_knn_pairs

    if not dots:
        return
    rows = [(a, b, d) for (a, b), d in dots]
    d1 = spark.createDataFrame(rows, "va long, vb long, dot long")
    d2 = spark.createDataFrame(
        [(b, a, d) for a, b, d in rows], "va long, vb long, dot long"
    )
    # the operator symmetrizes internally, so feeding swapped canonical
    # columns must give the identical pair set (ranks included)
    r1 = {
        (r.node_a, r.node_b): (r.dot, r.rank_ab, r.rank_ba)
        for r in mutual_knn_pairs(d1, k=k).collect()
    }
    r2 = {
        (r.node_a, r.node_b): (r.dot, r.rank_ab, r.rank_ba)
        for r in mutual_knn_pairs(d2, k=k).collect()
    }
    # the symmetrize step erases input orientation entirely: identical
    # pair set, dots, AND ranks
    assert r1 == r2
