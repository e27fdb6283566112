"""Property-based tests for the round-8-prep operator families: rank
statistics must be invariant under strictly monotone score transforms
(AUC, Spearman), the Holt fold must fix constant series exactly and
match a Python model on arbitrary ones, LOO encoding must satisfy its
per-category sum identity, t-closeness must be zero when a class
mirrors the global distribution, and Adamic-Adar must be symmetric in
its edge orientation.

Same contract as tests/test_properties*.py: small generated frames vs
an independent Python model, adversarial shapes (ties, negatives,
singletons) rather than the fixed testdata distribution.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


scored = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 1)),
    min_size=4,
    max_size=24,
).filter(
    lambda xs: any(y == 1 for _, y in xs) and any(y == 0 for _, y in xs)
)


@given(pairs=scored)
@settings(**SETTINGS)
def test_auc_invariant_under_monotone_transform(spark, pairs):
    """AUC is a rank statistic: applying a strictly increasing transform
    to every score (here s -> 7s³ + 3s, strictly monotone over ints)
    must not move auc_num/auc_den at all; reversing the scores must
    complement it (AUC -> 1 - AUC, i.e. num -> den - num)."""
    from politicamente_etl_spark.operators.stats import auc_exact_report

    df = spark.createDataFrame(pairs, "score long, label int")
    base = auc_exact_report(df).collect()[0]
    warped = spark.createDataFrame(
        [(7 * s**3 + 3 * s, y) for s, y in pairs], "score long, label int"
    )
    w = auc_exact_report(warped).collect()[0]
    assert (w.auc_num, w.auc_den) == (base.auc_num, base.auc_den)
    flipped = spark.createDataFrame(
        [(-s, y) for s, y in pairs], "score long, label int"
    )
    f = auc_exact_report(flipped).collect()[0]
    assert f.auc_den == base.auc_den
    assert f.auc_num == base.auc_den - base.auc_num


pairs_xy = st.lists(
    st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
    min_size=3,
    max_size=20,
).filter(
    lambda xs: len({x for x, _ in xs}) > 1 and len({y for _, y in xs}) > 1
)


@given(pts=pairs_xy)
@settings(**SETTINGS)
def test_spearman_monotone_invariance_and_symmetry(spark, pts):
    """Spearman is a rank statistic: warping x by a strictly increasing
    map leaves every sufficient statistic unchanged; swapping the roles
    of x and y swaps (sx,sxx)<->(sy,syy) and fixes sxy and the signed
    rho² ppm."""
    from politicamente_etl_spark.operators.stats import spearman_report

    df = spark.createDataFrame(pts, "x long, y long")
    base = spearman_report(df, "x", "y").collect()[0]
    warped = spark.createDataFrame(
        [(5 * x**3 + x, y) for x, y in pts], "x long, y long"
    )
    w = spearman_report(warped, "x", "y").collect()[0]
    assert (w.sx, w.sxx, w.sxy, w.rho_sq_signed_ppm) == (
        base.sx,
        base.sxx,
        base.sxy,
        base.rho_sq_signed_ppm,
    )
    swapped = spearman_report(df, "y", "x").collect()[0]
    assert (swapped.sx, swapped.sxx) == (base.sy, base.syy)
    assert swapped.sxy == base.sxy
    assert swapped.rho_sq_signed_ppm == base.rho_sq_signed_ppm


series = st.lists(st.integers(0, 10_000), min_size=1, max_size=30)


@given(xs=series)
@settings(**SETTINGS)
def test_holt_fold_fixes_constants_and_matches_model(spark, xs):
    """A constant series is a fixed point (level == the constant,
    trend == 0) because the integer recurrence is exact; arbitrary
    series match the Python floor-division model step for step."""
    import datetime as dt

    from politicamente_etl_spark.operators.stats import (
        holt_winters_level_trend,
    )

    rows = [
        ("g", dt.date(2024, 1, 1) + dt.timedelta(days=i), v)
        for i, v in enumerate(xs)
    ] + [
        ("const", dt.date(2024, 1, 1) + dt.timedelta(days=i), 777)
        for i in range(len(xs))
    ]
    df = spark.createDataFrame(rows, "g string, day date, v long")
    got = {
        r.g: (r.level, r.trend)
        for r in holt_winters_level_trend(df, "g").collect()
    }
    assert got["const"] == (777, 0)
    l = b = 0
    for i, v in enumerate(xs):
        if i == 0:
            l, b = v, 0
        else:
            lnew = (2 * v + 8 * (l + b)) // 10
            b = ((lnew - l) + 9 * b) // 10
            l = lnew
    assert got["g"] == (l, b)


cats = st.lists(
    st.tuples(st.sampled_from("abc"), st.integers(0, 1000)),
    min_size=1,
    max_size=20,
)


@given(rows=cats)
@settings(**SETTINGS)
def test_loo_encoding_sum_identity(spark, rows):
    """Per category: Σ_i loo_num_i = (n-1)·Σ_i x_i (each row's numerator
    omits exactly its own value), and every loo_den equals n-1; singleton
    categories yield NULLs."""
    from collections import defaultdict

    from politicamente_etl_spark.operators.stats import loo_target_encoding

    df = spark.createDataFrame(
        [(i, c, v) for i, (c, v) in enumerate(rows)],
        "id long, cat string, v long",
    )
    out = loo_target_encoding(df, "cat", "v", keep_cols=("id",)).collect()
    per = defaultdict(list)
    for i, (c, v) in enumerate(rows):
        per[c].append(v)
    got = defaultdict(list)
    for r in out:
        got[r.cat].append(r)
    for c, vals in per.items():
        n, s = len(vals), sum(vals)
        rs = got[c]
        if n == 1:
            assert rs[0].loo_num is None and rs[0].loo_den is None
            continue
        assert all(r.loo_den == n - 1 for r in rs)
        assert sum(r.loo_num for r in rs) == (n - 1) * s


@given(
    base=st.lists(st.integers(0, 3), min_size=2, max_size=12),
    reps=st.integers(1, 3),
)
@settings(**SETTINGS)
def test_t_closeness_zero_for_mirror_classes(spark, base, reps):
    """A class whose sensitive distribution is an exact copy of every
    other class's (so each equals the global) must score TVD = 0; and
    tvd_ppm is always within [0, 1e6]."""
    from politicamente_etl_spark.operators.quality import t_closeness_classes

    rows = [
        (f"c{k}", v) for k in range(reps + 1) for v in base
    ]
    df = spark.createDataFrame(rows, "q string, s int")
    out = t_closeness_classes(df, ["q"], "s").collect()
    assert all(r.tvd_ppm == 0 for r in out)
    # perturbed: move one class's rows to a fresh sensitive value
    rows2 = rows + [("odd", max(base) + 1)] * len(base)
    out2 = t_closeness_classes(
        spark.createDataFrame(rows2, "q string, s int"), ["q"], "s"
    ).collect()
    assert all(0 <= r.tvd_ppm <= 1_000_000 for r in out2)
    assert any(r.q == "odd" and r.tvd_ppm > 0 for r in out2)


edge_sets = st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 8)),
    min_size=1,
    max_size=16,
).map(lambda es: [(a, b) for a, b in es if a != b])


@given(edges=edge_sets)
@settings(**SETTINGS)
def test_adamic_adar_orientation_invariance(spark, edges):
    """Scores depend on the undirected graph only: flipping every edge's
    (src, dst) orientation must produce the identical score table."""
    from politicamente_etl_spark.operators.graph import adamic_adar

    if not edges:
        return
    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = spark.createDataFrame(
        [(b, a) for a, b in edges], "src long, dst long"
    )
    s1 = {
        (r.node_a, r.node_b): (r.n_common, r.aa_micro)
        for r in adamic_adar(e1, top_k=1000).collect()
    }
    s2 = {
        (r.node_a, r.node_b): (r.n_common, r.aa_micro)
        for r in adamic_adar(e2, top_k=1000).collect()
    }
    assert s1 == s2
