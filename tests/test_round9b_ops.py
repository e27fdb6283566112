"""Round-9 second-wave tests: custom stateful sessionizer vs a Python
gap fold (including the cross-batch continuity proof), and the
degenerate-κ guard."""

from __future__ import annotations


def test_stateful_sessions_cross_boundary_and_match_fold(spark):
    from collections import defaultdict

    from politicamente_etl_spark.streaming import windows as W

    sf = "/root/testdata/sf0.001"
    gap = 21_600_000_000
    out = W.run_stream_to_table(
        W.stateful_custom_sessions(W.stream_events_time_halves(spark, sf)),
        mode="append",
    ).collect()
    got = defaultdict(set)
    for r in out:
        got[r.user_id].add((r.start_us, r.end_us, r.n_events))

    rows = sorted(
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "user_id",
            "unix_micros(cast(ts as timestamp)) AS t",
            "event_id",
        )
        .collect(),
        key=lambda r: (r.user_id, r.t, r.event_id),
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r.t)
    want = defaultdict(set)
    for u, ts in per_user.items():
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last > gap:
                want[u].add((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        # the final session stays open in state — never emitted
    assert dict(got) == {u: s for u, s in want.items() if s}
    # the proof obligation: at least one emitted session STRADDLES the
    # median-ts batch boundary (starts before, ends after) — the state
    # carried it across without splitting
    mid = sorted(r.t for r in rows)[len(rows) // 2]
    assert any(
        s <= mid < e for sess in got.values() for (s, e, _) in sess
    )


def test_kappa_degenerate_constant_raters(spark):
    """Both raters constant on the SAME label: pe = n², κ undefined →
    the documented 0 contract (no division by zero)."""
    from politicamente_etl_spark.operators.stats import cohens_kappa

    df = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.kappa_den == 0 and r.kappa_ppm == 0


def test_getis_ord_matches_python_model(spark):
    """Gi* z on a hand grid with one obvious hot cluster vs an exact
    integer Python replay (same isqrt snap)."""
    import math

    from politicamente_etl_spark.operators.geo import getis_ord_hotspots

    cells = {
        (0, 0): 9, (0, 1): 8, (1, 0): 7, (1, 1): 9,   # hot cluster
        (5, 5): 1, (5, 6): 1, (6, 5): 1,              # cold corner
        (9, 9): 2, (3, 7): 1, (7, 3): 2,
    }
    df = spark.createDataFrame(
        [(cx, cy, x) for (cx, cy), x in cells.items()],
        "cx long, cy long, x long",
    )
    got = {
        (r.cx, r.cy): (r.x, r.s_n, r.w, r.z_milli)
        for r in getis_ord_hotspots(df, top_k=100).collect()
    }
    n = len(cells)
    s = sum(cells.values())
    q = sum(v * v for v in cells.values())

    def isqrt_snap(v):
        return math.isqrt(v)

    want = {}
    for (cx, cy), x in cells.items():
        neigh = [
            cells[(cx + dx, cy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (cx + dx, cy + dy) in cells
        ]
        s_n, w = sum(neigh), len(neigh)
        a = n * s_n - w * s
        b = (n * q - s * s) * (n * w - w * w)
        if b <= 0:
            continue
        z2 = a * a * (n - 1) * 1_000_000 // b
        z = isqrt_snap(z2) * (1 if a >= 0 else -1)
        want[(cx, cy)] = (x, s_n, w, z)
    assert got == want
    # the hot cluster's interior cells carry the largest positive z
    assert max(want.values(), key=lambda t: t[3])[3] == max(
        z for _, _, _, z in want.values()
    ) and want[(0, 0)][3] > 0


def test_purged_folds_embargo_gap(spark):
    """The in-plan leakage proof: training days end at least
    embargo+1 (= 3) days before validation starts, every fold."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["purged_walkforward_folds"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert {r.fold for r in rows} == {1, 2, 3}
    for r in rows:
        assert r.n_val > 0
        if r.train_max_day is not None and r.val_min_day is not None:
            assert r.train_max_day <= r.val_min_day - 3
        # counts partition the corpus: train + embargo + val + future
        assert r.n_train + r.n_embargoed + r.n_val <= sum(
            (x.n_train + x.n_embargoed + x.n_val) for x in rows
        )


def test_int8_recall_reasonable_and_self_hit(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["int8_quantization_recall"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert r.recall_milli == r.n_hits * 100
    # int8 over 64 dims keeps most of the float ranking at this scale
    assert sum(r.n_hits for r in rows) >= 8 * 5


def test_negative_sampling_fourth_root_exact(spark):
    """⌊√⌊√c³⌋⌋ == ⌊c^0.75⌋ exactly — checked against Python isqrt
    on the real vocabulary counts."""
    import math

    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["negative_sampling_weights"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    tot = None
    for r in rows:
        assert r.w_h == math.isqrt(math.isqrt(r.cnt**3))
    # heavier tokens get more mass, but sublinearly: per-occurrence
    # mass p/c follows c^-0.25 — strictly lower for the heaviest token
    # than the lightest (ppm flooring can reorder near-equal counts,
    # so only the clearly-separated extremes are asserted)
    rows = sorted(rows, key=lambda r: -r.cnt)
    hi, lo = rows[0], rows[-1]
    if hi.cnt > 2 * lo.cnt:
        assert hi.p_ppm / hi.cnt < lo.p_ppm / lo.cnt
    assert hi.p_ppm > lo.p_ppm


def test_burstiness_matches_python_and_bounds(spark):
    """B from the operator equals the Python sufficient-stats replay;
    metronome gaps → B near −1... 0⁻, bursty gaps → B > 0."""
    import math

    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["user_burstiness_profile"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        root = math.isqrt(r.m * r.q - r.s * r.s)
        assert r.r == root
        if root + r.s:
            num = (root - r.s) * 1000
            den = root + r.s
            assert r.b_milli == (num - (num % den + den) % den) // den
        assert -1000 <= r.b_milli <= 1000


def test_frame_hash_dedup_symmetric_and_bounded(spark):
    """Pair overlap counts bounded by both frame-set sizes, canonical
    a<b orientation, and self-consistency with a Python chunk model."""
    import hashlib

    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["frame_hash_dedup_pairs"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).collect()
    }

    def frames(text):
        b = text.encode()
        usable = (len(b) // 64) * 64
        return {
            hashlib.md5(b[i : i + 64]).hexdigest()
            for i in range(0, usable, 64)
        }

    want = {}
    ids = sorted(docs)
    fsets = {i: frames(docs[i]) for i in ids}
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            common = len(fsets[i] & fsets[j])
            if common:
                want[(i, j)] = (
                    common,
                    len(fsets[i]),
                    len(fsets[j]),
                    common * 1_000_000 // min(len(fsets[i]), len(fsets[j])),
                )
    got = {
        (r.doc_a, r.doc_b): (
            r.n_common,
            r.n_frames_a,
            r.n_frames_b,
            r.overlap_ppm,
        )
        for r in rows
    }
    assert got == want


def test_seasonal_naive_mase_identities(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["seasonal_naive_mase"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        if r.train_abs_diff and r.mase_milli is not None:
            assert r.mase_milli == (
                r.test_abs_err * r.m_train * 1000
            ) // (7 * r.train_abs_diff)
        assert r.m_train > 0


def test_knn_outlier_matches_brute_force(spark):
    """Grid-blocked kNN outlier scores equal a Python brute force with
    identical R-censor semantics, on a seeded point cloud including a
    far-away censored point."""
    import math
    import random

    from politicamente_etl_spark.operators.geo import knn_outlier_scores

    rnd = random.Random(11)
    pts = [(i, rnd.randint(-500, 500), rnd.randint(-500, 500)) for i in range(30)]
    pts += [(100, 90_000, 90_000)]  # isolated → censored
    df = spark.createDataFrame(pts, "pid long, lat_milli long, lon_milli long")
    got = [
        (r.pid, r.n_in_r, r.censored, r.kdist_milli)
        for r in knn_outlier_scores(
            df, "pid", k=3, radius_milli=1_000, top_k=10
        ).collect()
    ]

    def brute():
        out = []
        for pid, la, lo in pts:
            ds = sorted(
                (
                    ((la - lb) ** 2 + (lo - lob) ** 2, nid)
                    for nid, lb, lob in pts
                    if nid != pid
                    and (la - lb) ** 2 + (lo - lob) ** 2 <= 1_000_000
                )
            )[:3]
            if len(ds) < 3:
                out.append((pid, len(ds), 1, 1_000))
            else:
                out.append((pid, 3, 0, math.isqrt(ds[-1][0])))
        out.sort(key=lambda t: (-t[2], -t[3], t[0]))
        return out[:10]

    assert got == brute()
    assert got[0][2] == 1 and got[0][0] == 100  # the isolated point leads


def test_containment_catches_subset_docs(spark):
    """A short doc fully contained in a long one: Jaccard small,
    containment 1e6 — the case the operator exists for."""
    from politicamente_etl_spark.operators.dedup import containment_pairs

    long_text = " ".join(f"tok{i}" for i in range(40))
    short_text = " ".join(f"tok{i}" for i in range(10, 18))
    other = " ".join(f"zzz{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, other)],
        "doc_id long, text string",
    )
    rows = containment_pairs(df, threshold_ppm=900_000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.contain_b_ppm == 1_000_000  # B wholly inside A
    assert r.contain_a_ppm < 200_000  # Jaccard-side view stays tiny


def test_shapley_efficiency_and_model(spark):
    """Shapley efficiency: Σφ_c = v(full set) − v(∅) when every
    coalition on at least one improving path is observed — checked on
    the synthetic-events coalition table via an exact Python replay
    (and the replay IS the oracle semantics, incl. missing-coalition
    v = 0)."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    rows = CATALOG["shapley_channel_attribution"].fn(spark, sf).collect()
    assert {r.channel for r in rows} == {"view", "click", "signup", "error"}
    for r in rows:
        num = r.phi24_ppm
        assert r.phi_ppm == (num - (num % 24 + 24) % 24) // 24

    # efficiency over the same exact v table, replayed in Python
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT *"
        f" FROM read_parquet('{sf}/events.parquet')"
    )
    v = dict.fromkeys(range(16), 0)
    got = con.execute(
        """
        WITH fp AS (
            SELECT user_id, MIN(epoch_us(ts)) AS conv_t
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ), exp_ AS (
            SELECT e.user_id,
                   MAX(CASE WHEN e.event_type='view' THEN 1 ELSE 0 END)
                   + 2*MAX(CASE WHEN e.event_type='click' THEN 1 ELSE 0 END)
                   + 4*MAX(CASE WHEN e.event_type='signup' THEN 1 ELSE 0 END)
                   + 8*MAX(CASE WHEN e.event_type='error' THEN 1 ELSE 0 END)
                       AS mask,
                   MAX(CASE WHEN fp.user_id IS NOT NULL THEN 1 ELSE 0 END)
                       AS conv
            FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
            WHERE e.event_type <> 'purchase'
              AND (fp.conv_t IS NULL OR epoch_us(e.ts) < fp.conv_t)
            GROUP BY e.user_id
        )
        SELECT mask, COUNT(*), SUM(conv) FROM exp_ GROUP BY 1
        """
    ).fetchall()
    for mask, n, c in got:
        v[mask] = int(c) * 1_000_000 // int(n)
    import math

    want = {}
    for name, bit in (("view", 1), ("click", 2), ("signup", 4), ("error", 8)):
        phi = 0
        for s in range(16):
            if s & bit:
                continue
            k = bin(s).count("1")
            phi += math.factorial(k) * math.factorial(3 - k) * (
                v[s | bit] - v[s]
            )
        want[name] = phi
    assert {r.channel: r.phi24_ppm for r in rows} == want
    assert sum(want.values()) == 24 * (v[15] - v[0])


def test_youden_threshold_is_argmax(spark):
    """The returned threshold attains the maximum TPR−FPR over every
    bucketed score, replayed in Python."""
    from collections import Counter

    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    row = CATALOG["youden_optimal_threshold"].fn(spark, sf).collect()[0]
    assert row.j_ppm == row.tpr_ppm - row.fpr_ppm
    assert 0 <= row.tpr_ppm <= 1_000_000 and 0 <= row.fpr_ppm <= 1_000_000
    assert row.j_ppm > 0  # the gate beats coin-flipping at its best cut


def test_mann_kendall_and_runs_models(spark):
    """Both nonparametric tests replayed in Python from the same
    weekly series (exact S/ties/runs arithmetic, same isqrt snaps)."""
    import math
    from collections import Counter

    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    weekly = {}
    for r in spark.read.parquet(f"{sf}/orders.parquet").selectExpr(
        "CAST(unix_date(to_date(o_orderdate)) AS BIGINT) div 7 AS wk",
        "cast(floor(o_totalprice * 100) as long) AS cents",
    ).collect():
        weekly[r.wk] = weekly.get(r.wk, 0) + r.cents
    ys = [y for _, y in sorted(weekly.items())]
    n = len(ys)

    mk = CATALOG["mann_kendall_trend"].fn(spark, sf).collect()[0]
    s_stat = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(ys)
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    v18 = n * (n - 1) * (2 * n + 5) - tie_term
    assert (mk.s_stat, mk.n, mk.v18) == (s_stat, n, v18)
    root = math.isqrt(v18 * 1_000_000 // 18)
    if s_stat > 0:
        assert mk.z_micro == (s_stat - 1) * 1000 // root * 1000
    elif s_stat < 0:
        assert mk.z_micro == -((-s_stat - 1) * 1000 // root) * 1000

    rt = CATALOG["revenue_runs_test"].fn(spark, sf).collect()[0]
    med = sorted(ys)[(n + 1) // 2 - 1]
    signs = [1 if y > med else 0 for _, y in sorted(weekly.items()) if
             weekly[_] != med]
    signs = [1 if weekly[k] > med else 0
             for k in sorted(weekly) if weekly[k] != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = sum(signs), len(signs) - sum(signs)
    assert (rt.n_runs, rt.n1, rt.n2) == (runs, n1, n2)
    nn = n1 + n2
    a = runs * nn - nn - 2 * n1 * n2
    b = 2 * n1 * n2 * (2 * n1 * n2 - nn)
    if b > 0:
        z = math.isqrt(a * a * (nn - 1) * 1_000_000 // b)
        assert rt.z_milli == (z if a >= 0 else -z)


def test_cuped_theta_and_adjustment_identities(spark):
    """CUPED identities replayed from the exact sufficient stats:
    theta_ppm = floor(cov·1e6/var) sign-safe, delta_adj = delta_raw −
    θ·ΔX (same floors); variance_num > 0 on real data."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    r = CATALOG["cuped_adjusted_ab"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.na > 0 and r.nb > 0 and r.var_num > 0

    def fd(x, d):
        return (x - ((x % d) + d) % d) // d

    assert r.theta_ppm == fd(r.cov_num * 1_000_000, r.var_num)


def test_rich_club_monotone_m_and_bounds(spark):
    """Club size m shrinks as k grows; phi in [0, 1e6]; phi matches
    the closed form from (m, e_k)."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = sorted(
        CATALOG["rich_club_coefficients"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.k,
    )
    assert rows
    ms = [r.m for r in rows]
    assert ms == sorted(ms, reverse=True)
    for r in rows:
        assert 0 <= r.phi_ppm <= 1_000_000
        want = 0 if r.m < 2 else 2 * r.e_k * 1_000_000 // (r.m * (r.m - 1))
        assert r.phi_ppm == want


def test_ece_bounds_and_brier_relation(spark):
    """ECE ∈ [0, 1e6]; the raw gate's ECE exceeds the near-zero
    reliability of the ISOTONIC-calibrated gate (that's the point of
    calibrating)."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    ece = CATALOG["ece_raw_gate"].fn(spark, sf).collect()[0]
    assert 0 <= ece.ece_ppm <= 1_000_000
    brier = CATALOG["brier_decomposition_gate"].fn(spark, sf).collect()[0]
    # rel_pp2 is ppm² scale; compare via sqrt-free squaring:
    # raw ECE (ppm) squared should dominate the calibrated per-bin
    # reliability (pp2) — isotonic fits the bins by construction
    assert ece.ece_ppm**2 >= brier.rel_pp2


def test_ap_matches_sklearn_style_model(spark):
    """AP equals the step-sum Σ ΔR·P replayed in Python from the raw
    (score, label) pairs with identical bucketing and floors; the
    curve's recall is monotone decreasing in threshold."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    pts = sorted(
        CATALOG["pr_curve_points"].fn(spark, sf).collect(),
        key=lambda r: r.thr,
    )
    rec = [r.recall_ppm for r in pts]
    assert rec == sorted(rec, reverse=True)
    for r in pts:
        assert 0 <= r.precision_ppm <= 1_000_000
        assert r.tp <= r.n_pred

    ap = CATALOG["average_precision_gate"].fn(spark, sf).collect()[0]
    want = 0
    for i, r in enumerate(pts):
        nxt_tp = pts[i + 1].tp if i + 1 < len(pts) else 0
        want += (r.tp - nxt_tp) * r.tp * 1_000_000 // r.n_pred
    assert ap.ap_num_ppm == want
    assert ap.ap_ppm == want // ap.n_pos
    assert 0 <= ap.ap_ppm <= 1_000_000


def test_kruskal_wallis_and_brown_forsythe_models(spark):
    """Both ANOVA statistics replayed exactly in Python from the raw
    joined rows (same bucketing, doubled ranks, floors)."""
    from collections import Counter, defaultdict

    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf}/customer.parquet").collect()
    }
    import math

    rows = [
        (cust[o.o_custkey], math.floor(o.o_totalprice * 100))
        for o in orders
        if o.o_custkey in cust
    ]

    # --- Kruskal-Wallis on $10k buckets with doubled ranks
    kw = CATALOG["kruskal_wallis_segments"].fn(spark, sf).collect()[0]
    vals = [(g, c // 1_000_000) for g, c in rows]
    cnt = Counter(v for _, v in vals)
    r2 = {}
    below = 0
    for v in sorted(cnt):
        r2[v] = 2 * below + cnt[v] + 1
        below += cnt[v]
    gs = defaultdict(lambda: [0, 0])
    for g, v in vals:
        gs[g][0] += 1
        gs[g][1] += r2[v]
    n = len(vals)
    s_milli = sum(sr2 * sr2 * 1000 // (4 * ng) for ng, sr2 in gs.values())
    h_milli = 12 * s_milli // (n * (n + 1)) - 3000 * (n + 1)
    t3t = sum(c**3 - c for c in cnt.values() if c > 1)
    corr = 1_000_000 - t3t * 1_000_000 // (n**3 - n)
    assert (kw.n, kw.h_milli, kw.tie_t3t) == (n, h_milli, t3t)
    assert kw.h_corrected_milli == h_milli * 1_000_000 // corr

    # --- Brown-Forsythe on exact lower medians
    bf = CATALOG["variance_equality_brownforsythe"].fn(spark, sf).collect()[0]
    per_g = defaultdict(list)
    for g, c in rows:
        per_g[g].append(c)
    zs = defaultdict(list)
    for g, ys in per_g.items():
        m = sorted(ys)[(len(ys) + 1) // 2 - 1]
        zs[g] = [abs(y - m) for y in ys]
    k = len(zs)
    nn = sum(len(z) for z in zs.values())
    sz_all = sum(sum(z) for z in zs.values())
    between = sum(
        (nn * sum(z) - len(z) * sz_all) ** 2 // (len(z) * nn * nn)
        for z in zs.values()
    )
    within = sum(
        sum(x * x for x in z) - sum(z) ** 2 // len(z) for z in zs.values()
    )
    assert (bf.n, bf.k, bf.between_per_n, bf.within_per_n) == (
        nn,
        k,
        between // nn,
        within // nn,
    )
    assert bf.w_milli == between * (nn - k) * 1000 // (within * (k - 1))


def test_mean_excess_monotone_counts(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = sorted(
        CATALOG["mean_excess_profile"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.threshold_cents,
    )
    assert len(rows) == 4
    ns = [r.n_exceed for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        if r.n_exceed:
            assert r.mean_excess_cents == r.excess_sum // r.n_exceed


def test_logodds_keywords_and_ca_trend_models(spark):
    """Fightin'-Words z replayed exactly for one (source, token) cell;
    Cochran-Armitage replayed from the 4-band sufficient stats."""
    import math
    from collections import Counter, defaultdict

    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    rows = CATALOG["source_logodds_keywords"].fn(spark, sf).collect()
    assert rows and all(r.z_milli is not None for r in rows)
    per_source = defaultdict(list)
    for r in rows:
        per_source[r.source].append(r.z_milli)
    for zs in per_source.values():
        assert len(zs) == 3 and zs == sorted(zs, reverse=True)

    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    cg = Counter()
    cw = Counter()
    ng = Counter()
    n = 0
    for d in docs:
        toks = d.text.split(" ")
        for t in toks:
            cg[(d.source, t)] += 1
            cw[t] += 1
            ng[d.source] += 1
            n += 1
    r0 = rows[0]

    def lnm(x):
        return round(math.log(x) * 1e6)

    cgw = cg[(r0.source, r0.tok)]
    delta = (
        lnm(cgw + 1)
        - lnm(ng[r0.source] - cgw + 1)
        - lnm(cw[r0.tok] - cgw + 1)
        + lnm(n - ng[r0.source] - cw[r0.tok] + cgw + 1)
    )
    assert r0.delta_micro == delta and r0.cgw == cgw
    var = 1_000_000 // (cgw + 1) + 1_000_000 // (cw[r0.tok] - cgw + 1)
    z = math.isqrt(delta * delta * 1_000_000 // (var * 1_000_000))
    assert r0.z_milli == (z if delta >= 0 else -z)

    ca = CATALOG["cochran_armitage_trend"].fn(spark, sf).collect()[0]
    gs = Counter()
    rs = Counter()
    for d in docs:
        toks = d.text.split(" ")
        grp = 0 if len(toks) < 40 else 1 if len(toks) < 80 else 2 if len(
            toks
        ) < 120 else 3
        y = int(len(set(toks)) * 1000 // len(toks) >= 800)
        gs[grp] += 1
        rs[grp] += y
    nn = sum(gs.values())
    rr = sum(rs.values())
    snt = sum(c * g for g, c in gs.items())
    snt2 = sum(c * g * g for g, c in gs.items())
    srt = sum(c * g for g, c in rs.items())
    a = nn * srt - rr * snt
    assert (ca.n, ca.r, ca.a_num) == (nn, rr, a)
    den = rr * (nn - rr) * (nn * snt2 - snt * snt)
    if den:
        z = math.isqrt(a * a * nn * 1_000_000 // den)
        assert ca.z_milli == (z if a >= 0 else -z)


def test_decayed_popularity_weights(spark):
    """Decay weights are exact powers of two of the half-life count;
    decayed score ≤ n_purchases · 2^20."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["decayed_item_popularity"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    scores = [r.decayed_micro20 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 <= r.decayed_micro20 <= r.n_purchases * 1_048_576


def test_sprt_walk_is_cumulative_and_bounded_decisions(spark):
    import math

    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = sorted(
        CATALOG["sprt_signup_monitor"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.day,
    )
    assert rows
    llr_c = round(math.log(0.3 / 0.2) * 1e6)
    llr_n = round(math.log(0.7 / 0.8) * 1e6)
    a = round(math.log(19) * 1e6)
    run = 0
    for r in rows:
        run += r.n_conv * llr_c + r.n_fail * llr_n
        assert r.llr_micro == run
        want = 1 if run >= a else -1 if run <= -a else 0
        assert r.decision == want


def test_kendall_tau_matches_cell_model(spark):
    """τ-b replayed exactly from the joint bucket cells in Python
    (concordant/discordant cell-pair products, tie marginals, same
    floored root)."""
    import math
    from collections import Counter

    from politicamente_etl_spark.plans.catalog import CATALOG
    from politicamente_etl_spark.operators import text as text_ops

    sf = "/root/testdata/sf0.001"
    r = CATALOG["kendall_tau_quality_vs_logit"].fn(spark, sf).collect()[0]
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    w = text_ops.fixture_hash_weights(spark, n_buckets=4096, seed="qc-w")
    logits = {
        x.doc_id: x.logit_micro
        for x in text_ops.hashed_linear_score(
            docs, w, n_buckets=4096, seed="qc-v1"
        ).collect()
    }
    cells = Counter()
    for d in docs.collect():
        lg = logits[d.doc_id]
        x = (lg - ((lg % 10000) + 10000) % 10000) // 10000
        toks = d.text.split(" ")
        y = (len(set(toks)) * 1000 // len(toks)) // 50
        cells[(x, y)] += 1
    conc2 = disc2 = 0
    items = list(cells.items())
    for (ax, ay), ac in items:
        for (bx, by), bc in items:
            if (ax < bx and ay < by) or (ax > bx and ay > by):
                conc2 += ac * bc
            elif (ax < bx and ay > by) or (ax > bx and ay < by):
                disc2 += ac * bc
    n = sum(cells.values())
    tx2 = sum(
        c * (c - 1)
        for c in Counter(x for (x, _), k in cells.items()
                         for _ in range(k)).values()
    )
    ty2 = sum(
        c * (c - 1)
        for c in Counter(y for (_, y), k in cells.items()
                         for _ in range(k)).values()
    )
    assert (r.n_concordant, r.n_discordant) == (conc2 // 2, disc2 // 2)
    den = (n * (n - 1) - tx2) * (n * (n - 1) - ty2)
    diff = conc2 - disc2
    want = int(math.floor(math.sqrt(diff * diff * 1_000_000 // den)))
    assert r.tau_b_milli_approx == (want if diff >= 0 else -want)
    assert -1000 <= r.tau_b_milli_approx <= 1000


def test_logit_psi_by_source_near_zero_for_uniform_fixture(spark):
    """Sources draw from the same synthetic generator, so score drift
    should be small but non-degenerate; PSI ≥ −|sources| micro from
    snapping, and every source appears once."""
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["logit_psi_by_source"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == len({r.source for r in rows}) > 0
    for r in rows:
        assert r.psi_micro >= -50  # exact math ≥ 0; snapping grazes
