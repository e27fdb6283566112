"""Property tests for the round-9 statistics: Cohen's κ extremes and
model equality on random contingency draws, Cramér's V permutation
invariance, KS symmetry/positivity against a brute-force model, and
PSI's ref/cur swap symmetry."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_pairs = st.lists(
    st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
    min_size=2,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(_pairs)
def test_kappa_matches_model_on_random_draws(spark, pairs):
    from politicamente_etl_spark.operators.stats import cohens_kappa

    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra: dict = {}
    cb: dict = {}
    for a, b in pairs:
        ra[a] = ra.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    pe = sum(r * cb.get(k, 0) for k, r in ra.items())
    df = spark.createDataFrame(pairs, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row.kappa_num == n * agree - pe
    assert row.kappa_den == n * n - pe
    if n * n == pe:  # both raters constant on one label: κ undefined → 0
        assert row.kappa_ppm == 0
        return
    assert row.kappa_ppm == (n * agree - pe) * 1_000_000 // (n * n - pe)
    if agree == n:
        assert row.kappa_ppm == 1_000_000  # perfect agreement


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3)),
        min_size=4,
        max_size=40,
    )
)
def test_cramers_v_label_permutation_invariant(spark, rows):
    """Relabeling categories (a bijection) cannot change χ² or V."""
    from politicamente_etl_spark.operators.stats import cramers_v

    df1 = spark.createDataFrame(rows, "a long, b long")
    relabeled = [(5 - a, 7 - b) for a, b in rows]
    df2 = spark.createDataFrame(relabeled, "a long, b long")
    r1 = cramers_v(df1, "a", "b").collect()[0]
    r2 = cramers_v(df2, "a", "b").collect()[0]
    assert (r1.chi2_micro, r1.v2_ppm, r1.n, r1.n_rows, r1.n_cols) == (
        r2.chi2_micro,
        r2.v2_ppm,
        r2.n,
        r2.n_rows,
        r2.n_cols,
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 6), min_size=2, max_size=25),
    st.lists(st.integers(0, 6), min_size=2, max_size=25),
)
def test_ks_two_group_symmetry(spark, xs, ys):
    """With exactly two groups, D(a vs rest) == D(b vs rest): both
    measure the same ECDF gap, and d_num is symmetric in (n1, n2)."""
    from politicamente_etl_spark.operators.stats import ks_one_vs_rest

    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in ks_one_vs_rest(df, "g", "v").collect()}
    assert out["a"].d_num == out["b"].d_num
    assert out["a"].d_ppm == out["b"].d_ppm
    assert out["a"].reject_05 == out["b"].reject_05
    assert out["a"].d_num >= 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 500)),
        min_size=2,
        max_size=12,
    )
)
def test_psi_swap_symmetry(spark, counts):
    """PSI(ref, cur) == PSI(cur, ref): each bin's (p−q)·ln(p/m... q)
    term flips both signs, so the product — and the micro-floored
    contribution up to the snap — is swap-symmetric; totals agree
    within one micro per bin."""
    from politicamente_etl_spark.operators.stats import psi_report

    rows = [(i, a, b) for i, (a, b) in enumerate(counts)]
    fwd = psi_report(
        spark.createDataFrame(rows, "bin long, c_ref long, c_cur long")
    ).collect()
    rev = psi_report(
        spark.createDataFrame(
            [(i, b, a) for i, a, b in rows],
            "bin long, c_ref long, c_cur long",
        )
    ).collect()
    t_fwd = sum(r.contrib_micro for r in fwd)
    t_rev = sum(r.contrib_micro for r in rev)
    assert abs(t_fwd - t_rev) <= len(rows)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 5), min_size=2, max_size=20),
    st.lists(st.integers(0, 5), min_size=2, max_size=20),
)
def test_wasserstein_swap_symmetric_and_zero_on_equal(spark, xs, ys):
    """W1 is symmetric in the two groups and exactly 0 when the two
    distributions coincide."""
    from politicamente_etl_spark.plans.catalog import CATALOG  # noqa: F401
    from pyspark.sql import functions as F  # noqa: F401

    # drive the same grid arithmetic through the Python model the
    # oracle encodes: |c1*n2 - c2*n1| * dv summed over the merged grid
    def w1_num(a, b):
        vals = sorted(set(a) | set(b))
        n1, n2 = len(a), len(b)
        c1 = c2 = 0
        total = 0
        for i, v in enumerate(vals[:-1]):
            c1 += sum(1 for x in a if x == v)
            c2 += sum(1 for x in b if x == v)
            total += abs(c1 * n2 - c2 * n1) * (vals[i + 1] - v)
        return total

    assert w1_num(xs, ys) == w1_num(ys, xs)
    assert w1_num(xs, xs) == 0


@settings(max_examples=6, deadline=None)
@given(st.integers(1, 60))
def test_fourth_root_identity(spark, c):
    """⌊√⌊√c³⌋⌋ == ⌊c^0.75⌋ for every count — the identity
    negative_sampling_weights rests on."""
    import math

    assert math.isqrt(math.isqrt(c**3)) == int(c**0.75 + 1e-9) or (
        math.isqrt(math.isqrt(c**3)) == math.floor(c**0.75)
    )
