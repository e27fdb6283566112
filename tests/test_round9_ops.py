"""Round-9 batch 1 tests: Cohen's κ vs a textbook Python model
(including a worse-than-chance negative-κ case exercising the
sign-safe floor), Cramér's V on a perfectly-dependent and an
independent grid, the HHI monopoly/even bounds, PSI zero-drift
identity and positivity, and McNemar's discordant-count accounting."""

from __future__ import annotations

import math


def _kappa_model(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra: dict = {}
    cb: dict = {}
    for a, b in pairs:
        ra[a] = ra.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    pe_x_n = sum(r * cb.get(k, 0) for k, r in ra.items())
    num = n * agree - pe_x_n
    den = n * n - pe_x_n
    return num, den, (num * 1_000_000) // den


def test_cohens_kappa_matches_model_and_signs(spark):
    from politicamente_etl_spark.operators.stats import cohens_kappa

    # moderate agreement
    pairs = [("x", "x")] * 40 + [("x", "y")] * 10 + [("y", "y")] * 30 + [
        ("y", "x")
    ] * 20
    df = spark.createDataFrame(pairs, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    num, den, ppm = _kappa_model(pairs)
    assert (row.kappa_num, row.kappa_den, row.kappa_ppm) == (num, den, ppm)
    assert row.n == 100 and row.n_agree == 70

    # systematic disagreement → κ < 0; Python // floors negatives the
    # same way the pmod trick does, so the model stays the oracle
    anti = [("x", "y")] * 50 + [("y", "x")] * 50 + [("x", "x")] * 2
    df2 = spark.createDataFrame(anti, "a string, b string")
    row2 = cohens_kappa(df2, "a", "b").collect()[0]
    num2, den2, ppm2 = _kappa_model(anti)
    assert row2.kappa_ppm == ppm2 < 0


def test_cramers_v_dependence_bounds(spark):
    from politicamente_etl_spark.operators.stats import cramers_v

    # perfect dependence: b = f(a) → V² = 1 (up to the per-cell micro
    # floor, ≤ n_cells micro low)
    dep = [(a, a * 10) for a in (1, 2, 3) for _ in range(7)]
    row = cramers_v(
        spark.createDataFrame(dep, "a long, b long"), "a", "b"
    ).collect()[0]
    assert row.n == 21 and row.n_rows == 3 and row.n_cols == 3
    assert 999_990 <= row.v2_ppm <= 1_000_000

    # independence: every (a, b) cell has identical count → χ² = 0
    ind = [(a, b) for a in (1, 2) for b in (1, 2, 3) for _ in range(5)]
    row2 = cramers_v(
        spark.createDataFrame(ind, "a long, b long"), "a", "b"
    ).collect()[0]
    # each micro-snapped term floors exactly (counts divide evenly)
    assert row2.chi2_micro == 0 and row2.v2_ppm == 0


def test_concentration_report_bounds(spark):
    from politicamente_etl_spark.operators.stats import concentration_report

    rows = (
        # group "mono": one entity owns everything → HHI = 1e6
        [("mono", 1, 500), ("mono", 1, 500)]
        # group "even4": four equal entities → HHI = 250000, top 250000
        + [("even4", e, 250) for e in (1, 2, 3, 4)]
        # group "skew": 90/10
        + [("skew", 1, 900), ("skew", 2, 100)]
    )
    df = spark.createDataFrame(rows, "g string, e long, v long")
    got = {
        r.g: (r.n_entities, r.total, r.hhi_ppm, r.top_share_ppm)
        for r in concentration_report(df, "g", "e", "v").collect()
    }
    assert got["mono"] == (1, 1000, 1_000_000, 1_000_000)
    assert got["even4"] == (4, 1000, 250_000, 250_000)
    assert got["skew"] == (2, 1000, 810_000 + 10_000, 900_000)


def test_psi_zero_drift_and_positivity(spark):
    from politicamente_etl_spark.operators.stats import psi_report

    # identical distributions → every contribution exactly 0
    same = [(b, 10 * b + 5, 10 * b + 5) for b in range(5)]
    out = psi_report(
        spark.createDataFrame(same, "bin long, c_ref long, c_cur long")
    ).collect()
    assert all(r.contrib_micro == 0 and r.p_ppm == r.q_ppm for r in out)

    # a genuinely shifted pair of bins → positive total, and each
    # contribution ≥ -1 micro (exact math ≥ 0; snapping can graze -1)
    drift = [(0, 900, 100), (1, 100, 900)]
    out2 = psi_report(
        spark.createDataFrame(drift, "bin long, c_ref long, c_cur long")
    ).collect()
    total = sum(r.contrib_micro for r in out2)
    # textbook PSI for (0.9, 0.1) vs (0.1, 0.9) ≈ 2 · 0.8 · ln 9 ≈ 3.515
    approx = 2 * 0.8 * math.log((901) / (101))
    assert all(r.contrib_micro >= -1 for r in out2)
    assert abs(total / 1e6 - approx) < 0.01


def test_mcnemar_query_counts(spark):
    """Discordant accounting on the real frame: b + c + n_both +
    n_neither = n, and the statistic matches the closed form."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    row = CATALOG["gate_vs_length_mcnemar"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert 0 <= row.n_both <= row.n
    assert row.b + row.c <= row.n
    expect = (
        0
        if row.b + row.c == 0
        else (row.b - row.c) ** 2 * 1000 // (row.b + row.c)
    )
    assert row.mcnemar_milli == expect


def _ks_model(rows):
    """Brute-force one-vs-rest KS over (group, value) rows."""
    from collections import Counter

    groups = sorted({g for g, _ in rows})
    vals = sorted({v for _, v in rows})
    n = len(rows)
    out = {}
    for g in groups:
        mine = Counter(v for gg, v in rows if gg == g)
        rest = Counter(v for gg, v in rows if gg != g)
        n1 = sum(mine.values())
        n2 = n - n1
        c1 = c2 = 0
        d_num = 0
        for v in vals:
            c1 += mine.get(v, 0)
            c2 += rest.get(v, 0)
            d_num = max(d_num, abs(c1 * n2 - c2 * n1))
        reject = int(d_num * d_num * 1_000_000 > 1_844_440 * (n1 + n2) * n1 * n2)
        out[g] = (n1, n2, d_num, d_num * 1_000_000 // (n1 * n2), reject)
    return out


def test_ks_one_vs_rest_matches_model(spark):
    from politicamente_etl_spark.operators.stats import ks_one_vs_rest

    # "lo" clusters low, "hi" clusters high (clear drift), "mid" mixes
    rows = (
        [("lo", v) for v in (1, 1, 2, 2, 3, 3, 4)]
        + [("hi", v) for v in (7, 8, 8, 9, 9, 10, 10)]
        + [("mid", v) for v in (1, 3, 5, 5, 7, 9, 10)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.n1, r.n2, r.d_num, r.d_ppm, r.reject_05)
        for r in ks_one_vs_rest(df, "g", "v").collect()
    }
    assert got == _ks_model(rows)
    # identical-to-rest sanity: two copies of one distribution
    same = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    out = {
        r.g: r.d_num
        for r in ks_one_vs_rest(
            spark.createDataFrame(same, "g string, v long"), "g", "v"
        ).collect()
    }
    assert out == {"a": 0, "b": 0}


def _logrank_model(steps):
    """Textbook log-rank fold over (t, d1, c1, d2, c2) steps with the
    same micro floor snaps as the operator."""
    steps = sorted(steps)
    n1 = sum(d1 + c1 for _, d1, c1, _, _ in steps)
    n2 = sum(d2 + c2 for _, _, _, d2, c2 in steps)
    o1 = e1 = v = 0
    for _, d1, c1, d2, c2 in steps:
        d, n = d1 + d2, n1 + n2
        o1 += d1
        e1 += d * n1 * 1_000_000 // n
        if n > 1:
            v += d * n1 * (n - n1) * (n - d) * 1_000_000 // (n * n * (n - 1))
        n1 -= d1 + c1
        n2 -= d2 + c2
    z = o1 * 1_000_000 - e1
    chi2 = 0 if v == 0 else z * z * 1000 // (v * 1_000_000)
    return o1, e1, v, chi2


def test_logrank_matches_model_and_null(spark):
    from politicamente_etl_spark.operators.temporal import logrank_test

    # group 1 churns early, group 2 late → large statistic
    steps = [
        (1, 5, 1, 0, 0),
        (2, 4, 0, 1, 1),
        (3, 1, 0, 3, 0),
        (4, 0, 1, 4, 2),
    ]
    df = spark.createDataFrame(steps, "t long, d1 long, c1 long, d2 long, c2 long")
    r = logrank_test(df).collect()[0]
    assert (r.o1, r.e1_micro, r.v_micro, r.chi2_milli) == _logrank_model(steps)

    # perfectly proportional groups → O1 ≈ E1, statistic ~ 0
    null_steps = [(t, 2, 1, 4, 2) for t in range(1, 6)]
    df2 = spark.createDataFrame(
        null_steps, "t long, d1 long, c1 long, d2 long, c2 long"
    )
    r2 = logrank_test(df2).collect()[0]
    assert (r2.o1, r2.e1_micro, r2.v_micro, r2.chi2_milli) == _logrank_model(
        null_steps
    )
    assert r2.chi2_milli < 100  # ≈ 0 up to snapping


def test_kmv_set_ops_exhaustive_and_model(spark):
    """With fewer than k distinct values the sketches are exhaustive:
    est_union and est_inter are EXACT. Also replay the md5 rank model
    in Python for a non-trivial overlap."""
    import hashlib

    from politicamente_etl_spark.operators.agg import kmv_set_ops

    rows = [("a", v) for v in range(30)] + [("b", v) for v in range(20, 50)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_set_ops(df, "g", "v", k=64).collect()[0]
    assert (r.g_a, r.g_b) == ("a", "b")
    # |A ∪ B| = 50, |A ∩ B| = 10, sketch exhaustive at k=64
    assert r.n_kept == 50 and r.k_inter == 10
    assert r.est_union == 50.0 and r.est_inter == 10.0

    # non-exhaustive: k=8 → replay the KMV estimator in Python
    def h(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)

    sa = sorted(h(v) for v in range(30))[:8]
    sb = sorted(h(v) for v in range(20, 50))[:8]
    merged = sorted(set(sa) | set(sb))[:8]
    kth = merged[-1]
    k_inter = sum(1 for x in merged if x in set(sa) and x in set(sb))
    est_union = 7.0 * float(1 << 48) / kth
    r2 = kmv_set_ops(df, "g", "v", k=8).collect()[0]
    assert r2.n_kept == 8 and r2.kth_hash == kth and r2.k_inter == k_inter
    assert abs(r2.est_union - est_union) < 1e-9
    assert abs(r2.est_inter - k_inter * est_union / 8) < 1e-9


def test_retrieval_mrr_invariants(spark):
    """Binary-relevance identities: every query retrieves itself at
    exact rank 1 and the self vector is always in its own relevant set,
    so first_rank = 1 and rr = 1000; hit counts bound by both k's."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["retrieval_mrr_report"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.p_at_k_milli == r.n_hits * 1000 // 10
        assert r.r_at_k_milli == r.n_hits * 1000 // 5
        if r.first_rank:
            assert r.rr_milli == 1000 // r.first_rank
        # the query vector hashes to its own bucket and cos(self)=1:
        # rank 1 is the query itself, which is also relevant
        assert r.first_rank == 1 and r.rr_milli == 1000


def test_streaming_cusum_crosses_batch_boundary_and_matches_fold(spark):
    from collections import defaultdict

    from politicamente_etl_spark.streaming import windows as W

    sf = "/root/testdata/sf0.001"
    out = W.run_stream_to_table(
        W.stateful_cusum_user_value(W.stream_events_time_halves(spark, sf)),
        mode="update",
    ).collect()
    per_user = defaultdict(list)
    for r in out:
        per_user[r.user_id].append(
            (r.n_obs, r.base, r.s_hi, r.s_lo, r.n_alarms)
        )
    # users active in both halves emit twice with growing n_obs — the
    # state crossed the micro-batch boundary
    assert any(len(v) == 2 for v in per_user.values())
    rows = sorted(
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "user_id",
            "unix_micros(cast(ts as timestamp)) AS t",
            "event_id",
            "cast(floor(value * 1000) as long) AS vm",
        )
        .collect(),
        key=lambda r: (r.t, r.event_id),
    )
    want: dict = {}
    for r in rows:
        n, base, s_hi, s_lo, alarms = want.get(r.user_id, (0, 0, 0, 0, 0))
        if n == 0:
            base = r.vm
        else:
            nh = max(0, s_hi + r.vm - base - 50_000)
            nl = max(0, s_lo + base - 50_000 - r.vm)
            alarms += (1 if nh > 400_000 else 0) + (1 if nl > 400_000 else 0)
            s_hi = 0 if nh > 400_000 else nh
            s_lo = 0 if nl > 400_000 else nl
        want[r.user_id] = (n + 1, base, s_hi, s_lo, alarms)
    got = {u: max(v) for u, v in per_user.items()}
    assert got == want


def test_txlog_merge_read_version_conflict(spark, tmp_path):
    """A merge pinned to a stale read version must raise CommitConflict
    (lost-update guard), while a rebased retry lands and preserves the
    interleaved commit's effect."""
    import pytest

    from politicamente_etl_spark.sources.txlog import (
        CommitConflict,
        TxLogTable,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, "orig", 10) for i in range(1, 7)], "k long, s string, v long"
    )
    t_a = TxLogTable.create(spark, path, base)
    t_b = TxLogTable(spark, path)
    t_a.merge(
        spark.createDataFrame([(2, "a", 10), (4, "a", 10)], "k long, s string, v long"),
        ["k"],
    )
    with pytest.raises(CommitConflict):
        t_b.merge(
            spark.createDataFrame([(3, "b", 99)], "k long, s string, v long"),
            ["k"],
            read_version=1,
        )
    t_b.merge(
        spark.createDataFrame([(3, "b", 99)], "k long, s string, v long"),
        ["k"],
    )
    got = {
        (r.k, r.s, r.v) for r in TxLogTable(spark, path).snapshot().collect()
    }
    assert got == {
        (1, "orig", 10),
        (2, "a", 10),
        (3, "b", 99),
        (4, "a", 10),
        (5, "orig", 10),
        (6, "orig", 10),
    }
    assert TxLogTable(spark, path).latest_version() == 3


def test_brier_decomposition_matches_fraction_model(spark):
    """REL/RES/UNC/direct against an exact-Fraction Python model with
    the same floor snaps, and the rational identity REL − RES + UNC =
    direct (gap only from snapping, bounded by a few pp2)."""
    from politicamente_etl_spark.operators.stats import brier_decomposition

    bins = [(0, 40, 4, 100_000), (1, 30, 15, 500_000), (2, 30, 27, 900_000)]
    df = spark.createDataFrame(bins, "bin long, n long, n_pos long, iso_rate_ppm long")
    r = brier_decomposition(df).collect()[0]
    n = sum(b[1] for b in bins)
    p = sum(b[2] for b in bins)
    rel_sum = sum((fp * nk - 10**6 * pk) ** 2 // nk for _, nk, pk, fp in bins)
    res_sum = sum(
        (pk * n - p * nk) ** 2 * 10**12 // (nk * n * n)
        for _, nk, pk, fp in bins
    )
    direct_sum = sum(
        nk * fp * fp - 2 * 10**6 * fp * pk + 10**12 * pk
        for _, nk, pk, fp in bins
    )
    unc = p * (n - p) * 10**12 // (n * n)
    assert (r.n, r.n_pos) == (n, p)
    assert r.rel_pp2 == rel_sum // n
    assert r.res_pp2 == res_sum // n
    assert r.unc_pp2 == unc
    assert r.brier_pp2 == direct_sum // n
    assert r.identity_gap_pp2 == direct_sum // n - (
        rel_sum // n - res_sum // n + unc
    )
    # exact rational identity → the snapped gap stays within a few pp2
    assert abs(r.identity_gap_pp2) <= 5


def test_bellman_ford_matches_python_on_random_graph(spark):
    """Exact equality with a Python Bellman-Ford limited to the same
    sweep count, on a seeded random weighted graph."""
    import random

    from politicamente_etl_spark.operators.graph import bellman_ford_distances

    rnd = random.Random(7)
    nodes = list(range(12))
    edges = []
    seen = set()
    while len(edges) < 20:
        a, b = rnd.sample(nodes, 2)
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        edges.append((key[0], key[1], rnd.randint(1, 9)))
    seeds = [0, 7]

    def model(sweeps):
        adj = {}
        for a, b, w in edges:
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
        dist = {s: 0 for s in seeds}
        for _ in range(sweeps):
            nxt = dict(dist)
            for u, du in dist.items():
                for v, w in adj.get(u, []):
                    if du + w < nxt.get(v, float("inf")):
                        nxt[v] = du + w
            dist = nxt
        return dist

    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    for sweeps in (1, 2, 4):
        got = {
            r.node: r.dist
            for r in bellman_ford_distances(e, s, max_sweeps=sweeps).collect()
        }
        assert got == model(sweeps), f"sweeps={sweeps}"


def test_js_divergence_bounds_and_diversity(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["lang_char_js_divergence"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        # JS ∈ [0, ln 2]; snapping can graze a hair below zero
        assert -5 <= r.js_micro <= 693_148 + 5

    div = {
        r.source: (r.n_langs, r.simpson_ppm, r.eff_langs_milli)
        for r in CATALOG["source_lang_diversity"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    for n_langs, simpson_ppm, eff in div.values():
        # λ ∈ [1/n_langs, 1]; effective languages ∈ [1, n_langs]
        assert 1_000_000 // n_langs - n_langs <= simpson_ppm <= 1_000_000
        assert 1_000 - 5 <= eff <= n_langs * 1000 + 5


def test_hits_matches_python_model(spark):
    """HITS on a hand-built bipartite graph vs an exact Python replay
    of the integer max-normalized iteration."""
    from politicamente_etl_spark.operators.graph import hits_scores

    edges = [
        (1, 10), (1, 11), (1, 12),  # order 1: broad basket
        (2, 10), (2, 11),
        (3, 10),
        (4, 13),  # isolated pair
    ]

    def model(iters=2, scale=1000):
        us = sorted({u for u, _ in edges})
        h = {u: scale for u in us}
        a = {}
        for _ in range(iters):
            a = {}
            for u, p in edges:
                a[p] = a.get(p, 0) + h[u]
            mx = max(a.values())
            a = {p: v * scale // mx for p, v in a.items()}
            h = {}
            for u, p in edges:
                h[u] = h.get(u, 0) + a[p]
            mx = max(h.values())
            h = {u: v * scale // mx for u, v in h.items()}
        return h, a

    df = spark.createDataFrame(edges, "src long, dst long")
    got_h, got_a = {}, {}
    for r in hits_scores(df, iters=2).collect():
        (got_h if r.side == "hub" else got_a)[r.node] = r.score
    want_h, want_a = model()
    assert got_h == want_h and got_a == want_a
    # order 1 holds the most authoritative basket; part 10 is the most
    # authoritative part
    assert got_h[1] == 1000 and got_a[10] == 1000


def test_shallow_clone_zero_copy_and_isolation(spark, tmp_path):
    """Clone references source files (no copy); COW merge into the
    clone leaves the source untouched; clone vacuum never deletes
    source files; source merge after cloning doesn't leak into the
    clone (snapshot pinned at clone time)."""
    import glob
    import os

    from politicamente_etl_spark.sources.txlog import TxLogTable

    src_path, clone_path = str(tmp_path / "src"), str(tmp_path / "clone")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "k long, v long"
    )
    src = TxLogTable.create(spark, src_path, base)
    clone = src.clone_shallow(clone_path)
    assert glob.glob(
        os.path.join(clone_path, "data", "**", "*.parquet"), recursive=True
    ) == []
    assert {(r.k, r.v) for r in clone.snapshot().collect()} == {
        (i, i * 10) for i in range(1, 9)
    }
    # COW divergence both directions
    clone.merge(spark.createDataFrame([(2, 999)], "k long, v long"), ["k"])
    src.merge(spark.createDataFrame([(3, 777)], "k long, v long"), ["k"])
    got_src = {(r.k, r.v) for r in src.snapshot().collect()}
    got_clone = {(r.k, r.v) for r in clone.snapshot().collect()}
    assert (2, 999) in got_clone and (2, 20) in got_src
    assert (3, 777) in got_src and (3, 30) in got_clone
    # clone vacuum must not touch source data
    n_src_files = len(
        glob.glob(os.path.join(src_path, "data", "**", "*.parquet"),
                  recursive=True)
    )
    clone.vacuum()
    assert len(
        glob.glob(os.path.join(src_path, "data", "**", "*.parquet"),
                  recursive=True)
    ) == n_src_files
    # second clone onto an existing table refuses
    import pytest

    with pytest.raises(FileExistsError):
        src.clone_shallow(clone_path)


def test_interval_union_matches_python_sweep(spark):
    """Overlapping, nested, touching and disjoint intervals vs a
    Python union model (half-open semantics)."""
    from politicamente_etl_spark.operators.temporal import (
        interval_union_length,
    )

    cases = {
        "a": [(0, 10), (5, 15), (20, 30)],  # overlap + gap → 25, 2 islands
        "b": [(0, 100), (10, 20), (30, 40)],  # nested → 100, 1 island
        "c": [(0, 10), (10, 20)],  # touching → contiguous: 20, 1 island
        "d": [(7, 7)],  # empty interval → 0 covered, 1 island
    }
    rows = [(g, s, e) for g, ivs in cases.items() for s, e in ivs]
    df = spark.createDataFrame(rows, "user_id string, s long, e long")
    got = {
        r.user_id: (r.covered, r.n_islands)
        for r in interval_union_length(df, "user_id", "s", "e").collect()
    }

    def union_len(ivs):
        ivs = sorted(ivs)
        total = 0
        run = None
        islands = 0
        for s, e in ivs:
            if run is None or s > run:
                islands += 1
            add = max(0, e - max(s, run if run is not None else s))
            total += add
            run = e if run is None else max(run, e)
        return total, islands

    assert got == {g: union_len(ivs) for g, ivs in cases.items()}
    assert got["a"] == (25, 2)
    assert got["c"] == (20, 1)  # [0,10) ∪ [10,20) covers [0,20) contiguously
