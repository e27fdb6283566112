"""Round-8 batch 1 tests: Adamic-Adar vs a Python model, mutual-kNN
reciprocity, LOO target-encoding exactness (incl. the singleton NULL
contract), Holt level/trend vs a Python fold (negative-trend floor
division), HBOS bin arithmetic + score model, and the exact AUC
identity against the brute-force pairwise U statistic."""

from __future__ import annotations

import datetime as dt
import math


def _aa_model(edges, max_degree=256):
    """Pure-Python Adamic-Adar over an undirected edge list."""
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    known = {tuple(sorted(e)) for e in edges}
    scores: dict = {}
    for w, ns in adj.items():
        deg = len(ns)
        if deg < 2 or deg > max_degree:
            continue
        wm = round(1e6 / math.log(deg))
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                cnt, s = scores.get((u, v), (0, 0))
                scores[(u, v)] = (cnt + 1, s + wm)
    return {
        p: v for p, v in scores.items() if p not in known
    }


def test_adamic_adar_matches_python_model(spark):
    from politicamente_etl_spark.operators.graph import adamic_adar

    # 1-2-3 path + star center 9 touching 1,2,3,4 + isolated edge 7-8
    edges = [(1, 2), (2, 3), (9, 1), (9, 2), (9, 3), (9, 4), (7, 8)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.node_a, r.node_b): (r.n_common, r.aa_micro)
        for r in adamic_adar(e, top_k=100).collect()
    }
    assert got == _aa_model(edges)
    # hub cap: with max_degree=3 the degree-4 center 9 contributes no
    # wedges, so only node 2 (deg 3: 1,3,9) predicts links
    capped = {
        (r.node_a, r.node_b): (r.n_common, r.aa_micro)
        for r in adamic_adar(e, max_degree=3, top_k=100).collect()
    }
    assert capped == _aa_model(edges, max_degree=3)
    assert (1, 3) in capped  # wedge through center 2 survives the cap


def test_mutual_knn_keeps_only_reciprocal_pairs(spark):
    from politicamente_etl_spark.operators.sim import mutual_knn_pairs

    # canonical candidate pairs (a < b): 1's best is 2 and 2's best is 1
    # (mutual at k=1); 3's best is 1 but 1 ranks 3 second -> dropped at
    # k=1, kept at k=2.
    dots = spark.createDataFrame(
        [(1, 2, 900), (1, 3, 800), (2, 3, 100)],
        "va long, vb long, dot long",
    )
    k1 = mutual_knn_pairs(dots, k=1).collect()
    assert [(r.node_a, r.node_b, r.dot) for r in k1] == [(1, 2, 900)]
    k2 = {
        (r.node_a, r.node_b): (r.rank_ab, r.rank_ba)
        for r in mutual_knn_pairs(dots, k=2).collect()
    }
    assert k2 == {(1, 2): (1, 1), (1, 3): (2, 1), (2, 3): (2, 2)}


def test_loo_target_encoding_exactness_and_singleton_null(spark):
    from politicamente_etl_spark.operators.stats import loo_target_encoding

    rows = [
        (1, "a", 10),
        (2, "a", 20),
        (3, "a", 33),
        (4, "b", 7),  # singleton category -> NULL encoding
    ]
    df = spark.createDataFrame(rows, "id long, cat string, cents long")
    out = {
        r.id: (r.loo_num, r.loo_den, r.loo_mean)
        for r in loo_target_encoding(
            df, "cat", "cents", keep_cols=("id",)
        ).collect()
    }
    assert out[1] == (53, 2, 26)  # (20+33)/2 floored
    assert out[2] == (43, 2, 21)
    assert out[3] == (30, 2, 15)
    assert out[4] == (None, None, None)


def _holt_model(series, a=2, c=1):
    l = b = 0
    for i, v in enumerate(series):
        if i == 0:
            l, b = v, 0
        else:
            lnew = (a * v + (10 - a) * (l + b)) // 10  # python // == floor
            b = (c * (lnew - l) + (10 - c) * b) // 10
            l = lnew
    return l, b


def test_holt_winters_matches_python_fold_with_negative_trend(spark):
    from politicamente_etl_spark.operators.stats import (
        holt_winters_level_trend,
    )

    up = [100, 120, 140, 160, 200]
    down = [500, 400, 290, 150, 40]  # decreasing -> negative trend
    rows = [
        ("up", dt.date(2024, 1, 1) + dt.timedelta(days=i), v)
        for i, v in enumerate(up)
    ] + [
        ("down", dt.date(2024, 1, 1) + dt.timedelta(days=i), v)
        for i, v in enumerate(down)
    ]
    df = spark.createDataFrame(rows, "g string, day date, v long")
    got = {
        r.g: (r.n_days, r.level, r.trend, r.forecast)
        for r in holt_winters_level_trend(df, "g").collect()
    }
    for name, series in (("up", up), ("down", down)):
        l, b = _holt_model(series)
        assert got[name] == (len(series), l, b, l + 7 * b)
    assert got["down"][2] < 0  # the sign-safe floor division is exercised


def test_hbos_bins_cover_range_and_scores_match_model(spark):
    from politicamente_etl_spark.operators.stats import hbos_scores

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(hours=i % 5), "t" + str(i % 2), float(i))
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = hbos_scores(ev, top_k=40).collect()
    assert len(out) == 40
    assert all(0 <= r.vbin <= 15 for r in out)
    # model: vm = i*1000, vmin=0, vmax=39000 -> vbin = i*16000 // 39001
    lnm = lambda n: round(math.log(n) * 1e6)  # noqa: E731
    vb = {i: (i * 1000 * 16) // 39001 for i in range(40)}
    from collections import Counter

    nv = Counter(vb.values())
    nh = Counter(i % 5 for i in range(40))  # hod = hours since midnight %24
    nt = Counter(i % 2 for i in range(40))
    for r in out:
        i = r.event_id
        want = (
            3 * lnm(40) - lnm(nv[vb[i]]) - lnm(nh[i % 5]) - lnm(nt[i % 2])
        )
        assert r.hbos_micro == want
    # extremes of the value histogram are rarer bins -> higher scores
    # than the modal bins (sanity on ordering)
    assert out[0].hbos_micro == max(r.hbos_micro for r in out)


def _auc_pairwise(pairs):
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    return num, 2 * len(pos) * len(neg)


def test_auc_exact_matches_pairwise_u_statistic(spark):
    from politicamente_etl_spark.operators.stats import auc_exact_report

    pairs = [
        (10, 1),
        (10, 0),  # tie across classes
        (8, 1),
        (7, 0),
        (7, 1),
        (5, 0),
        (5, 0),
        (3, 1),
        (1, 0),
    ]
    df = spark.createDataFrame(pairs, "score long, label int")
    r = auc_exact_report(df).collect()[0]
    num, den = _auc_pairwise(pairs)
    assert (r.auc_num, r.auc_den) == (num, den)
    assert r.n_pos == 4 and r.n_neg == 5
    assert r.auc_ppm == num * 1_000_000 // den
    # perfect separation -> exactly 1.0
    perfect = spark.createDataFrame(
        [(9, 1), (8, 1), (2, 0), (1, 0)], "score long, label int"
    )
    assert auc_exact_report(perfect).collect()[0].auc_ppm == 1_000_000


def test_calibration_bins_partition_all_rows(spark):
    from politicamente_etl_spark.operators.stats import calibration_bins

    rows = [(s, 1 if s > 50 else 0) for s in range(0, 100, 3)]
    df = spark.createDataFrame(rows, "score long, label int")
    out = calibration_bins(df, score_col="score", label_col="label").collect()
    assert sum(r.n for r in out) == len(rows)
    assert all(0 <= r.bin <= 9 for r in out)
    for r in out:
        assert r.pos_rate_ppm == r.n_pos * 1_000_000 // r.n
        # bins over an increasing 0/1 boundary are monotone here
    by_bin = sorted(out, key=lambda r: r.bin)
    rates = [r.pos_rate_ppm for r in by_bin]
    assert rates[0] == 0 and rates[-1] == 1_000_000


def test_wordpiece_greedy_vs_viterbi_and_python_model(spark):
    from politicamente_etl_spark.operators.text import (
        unigram_viterbi_segmentation,
        wordpiece_greedy_segmentation,
    )

    rows = [
        (1, "abab abab abab cd"),
        (2, "abab ababx q cd cd"),
        (3, "zzzz abab cd q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # python replica: same vocab as the viterbi model in
    # tests/test_round7_ops.py, greedy longest-match walk
    from collections import Counter

    wf = Counter(w for _, t in rows for w in t.split(" "))
    pc: Counter = Counter()
    for w, f in wf.items():
        for k in range(1, min(4, len(w)) + 1):
            for i in range(len(w) - k + 1):
                pc[w[i : i + k]] += f
    top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    vocab = dict(top)
    for p, c in pc.items():
        if len(p) == 1:
            vocab[p] = c
    tot = sum(vocab.values())
    sc = {p: round(math.log(c / tot) * 1e6) for p, c in vocab.items()}

    def greedy(w):
        cur, np_, cost = 0, 0, 0
        while cur < len(w):
            k = max(
                k
                for k in range(1, min(4, len(w) - cur) + 1)
                if w[cur : cur + k] in sc
            )
            cost -= sc[w[cur : cur + k]]
            cur += k
            np_ += 1
        return np_, cost

    got = {
        r.w: (r.n_pieces, r.total_cost_micro)
        for r in wordpiece_greedy_segmentation(df).collect()
    }
    assert got == {w: greedy(w) for w in wf}
    # greedy can never beat the Viterbi optimum (same pieces, same costs)
    opt = {
        r.w: r.total_cost_micro
        for r in unigram_viterbi_segmentation(df).collect()
    }
    assert all(got[w][1] >= opt[w] for w in got)
    assert any(got[w][1] > opt[w] for w in got)  # 'ababx' is strictly worse


def test_label_propagation_rounds_and_tiebreak(spark):
    from politicamente_etl_spark.operators.graph import label_propagation

    # seeds: 1=x, 2=y. node 3 touches both (tie -> min label 'x');
    # node 4 touches only 3 (reached in round 2); 5 isolated.
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1, "x"), (2, "y")], "node long, label string")
    got = {
        r.node: (r.label, r.rnd)
        for r in label_propagation(edges, seeds, rounds=2).collect()
    }
    assert got == {
        1: ("x", 0),
        2: ("y", 0),
        3: ("x", 1),  # tie broken to the lexicographically smaller label
        4: ("x", 2),  # second round reaches it through 3
    }
    # majority beats tie-break: give 3 a second 'y' voter
    edges2 = spark.createDataFrame(
        [(1, 3), (2, 3), (6, 3)], "src long, dst long"
    )
    seeds2 = spark.createDataFrame(
        [(1, "x"), (2, "y"), (6, "y")], "node long, label string"
    )
    got2 = {
        r.node: r.label
        for r in label_propagation(edges2, seeds2, rounds=1).collect()
    }
    assert got2[3] == "y"


def test_domain_mw_weights_ordering_and_normalization(spark):
    from politicamente_etl_spark.operators.sampling import domain_mw_weights

    losses = spark.createDataFrame(
        [("a", 1_000_000), ("b", 1_500_000), ("c", 1_000_000)],
        "source string, loss_micro long",
    )
    out = {r.source: r for r in domain_mw_weights(losses).collect()}
    assert out["a"].excess_micro == 0 and out["a"].raw_micro == 1_000_000
    assert out["b"].excess_micro == 500_000
    assert out["b"].raw_micro == round(math.exp(0.5) * 1e6)
    # worst domain gets the most weight; equal losses get equal weight
    assert out["b"].weight_ppm > out["a"].weight_ppm == out["c"].weight_ppm
    total = sum(r.weight_ppm for r in out.values())
    assert 999_997 <= total <= 1_000_000  # floored ppm shares
    # the 12-nat clamp keeps raw_micro (and its ppm product) bounded
    extreme = spark.createDataFrame(
        [("a", 0), ("b", 10**9)], "source string, loss_micro long"
    )
    eo = {r.source: r for r in domain_mw_weights(extreme).collect()}
    assert eo["b"].raw_micro == round(math.exp(12.0) * 1e6)


def test_consistent_sample_k_grouped_stability_and_exact_k(spark):
    from politicamente_etl_spark.operators.sampling import (
        consistent_sample_k_grouped,
    )

    rows = [(i, "g" + str(i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = consistent_sample_k_grouped(df, k=4, group_col="g").collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r.g, set()).add(r.doc_id)
    assert all(len(v) == 4 for v in by_g.values()) and len(by_g) == 3
    # append-stability: adding rows to OTHER groups never changes a
    # group's sample; adding to the same group only displaces by rank
    df2 = spark.createDataFrame(
        rows + [(100 + i, "g9") for i in range(10)], "doc_id long, g string"
    )
    out2 = consistent_sample_k_grouped(df2, k=4, group_col="g").collect()
    by_g2: dict = {}
    for r in out2:
        by_g2.setdefault(r.g, set()).add(r.doc_id)
    for g in by_g:
        assert by_g2[g] == by_g[g]


def test_bfs_hop_distances_match_python_bfs(spark):
    from collections import deque

    from politicamente_etl_spark.operators.graph import bfs_hop_distances

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (7, 8), (2, 9)]
    seeds = [1, 7]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want, dq = {x: 0 for x in seeds}, deque(seeds)
    while dq:
        u = dq.popleft()
        if want[u] >= 3:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    got = {
        r.node: r.dist for r in bfs_hop_distances(e, s, max_hops=3).collect()
    }
    assert got == want
    assert got[4] == 3 and got[9] == 2 and got[8] == 1  # spot checks
    assert 5 not in got and 6 not in got  # beyond the 3-hop horizon


def test_t_closeness_tvd_matches_hand_distribution(spark):
    from politicamente_etl_spark.operators.quality import t_closeness_classes

    # global sensitive dist: bucket1 2/6, bucket2 4/6
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 2), ("b", 2)]
    df = spark.createDataFrame(rows, "q string, s int")
    out = {
        r.q: (r.n_rows, r.tvd_ppm)
        for r in t_closeness_classes(df, ["q"], "s").collect()
    }
    # class a = (2/3, 1/3) vs (1/3, 2/3): TVD = 1/3; class b = (0, 1): 1/3
    assert out == {"a": (3, 333333), "b": (3, 333333)}
    # a class that mirrors the global distribution has TVD 0
    rows2 = rows + [("c", 1), ("c", 2), ("c", 2)]
    # new global: b1 3/9, b2 6/9 -> class c (1/3, 2/3) == global
    out2 = {
        r.q: r.tvd_ppm
        for r in t_closeness_classes(
            spark.createDataFrame(rows2, "q string, s int"), ["q"], "s"
        ).collect()
    }
    assert out2["c"] == 0


def test_dim_covariance_matches_numpy(spark):
    import numpy as np

    from politicamente_etl_spark.plans.catalog import CATALOG

    df = CATALOG["embedding_dim_covariance_top"].fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = df.collect()
    assert len(rows) == 20
    emb = np.array(
        [
            r.embedding
            for r in spark.read.parquet(
                "/root/testdata/sf0.001/embeddings.parquet"
            ).collect()
        ],
        dtype=np.float64,
    )
    m = np.floor(emb * 1000).astype(np.int64)
    n = m.shape[0]
    for r in rows[:5]:
        i, j = int(r.dim_i) - 1, int(r.dim_j) - 1
        want = n * int(np.dot(m[:, i], m[:, j])) - int(m[:, i].sum()) * int(
            m[:, j].sum()
        )
        assert r.cov_num == want


def test_streaming_holt_crosses_batch_boundary_and_matches_fold(spark):
    from politicamente_etl_spark.streaming import windows as W

    sf = "/root/testdata/sf0.001"
    out = W.run_stream_to_table(
        W.stateful_holt_user_value(W.stream_events_time_halves(spark, sf)),
        mode="update",
    ).collect()
    # update mode emits once per (user, micro-batch): users active in
    # both halves must appear twice with strictly growing n_obs — the
    # proof the state actually crossed a batch boundary
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in out:
        per_user[r.user_id].append((r.n_obs, r.level, r.trend))
    assert any(len(v) == 2 for v in per_user.values())
    # final state equals the batch fold over the ordered series
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
        n, l, b = want.get(r.user_id, (0, 0, 0))
        if n == 0:
            l, b = r.vm, 0
        else:
            lnew = (2 * r.vm + 8 * (l + b)) // 10
            b = ((lnew - l) + 9 * b) // 10
            l = lnew
        want[r.user_id] = (n + 1, l, b)
    got = {u: max(v) for u, v in per_user.items()}
    assert got == want


def test_spearman_matches_fraction_model(spark):
    from fractions import Fraction

    from politicamente_etl_spark.operators.stats import spearman_report

    rows = [(1, 10), (2, 20), (2, 15), (4, 40), (5, 30), (6, 60), (6, 60)]
    df = spark.createDataFrame(rows, "x long, y long")

    def avg_ranks(vals):
        out = []
        for v in vals:
            below = sum(1 for w in vals if w < v)
            eq = sum(1 for w in vals if w == v)
            out.append(Fraction(2 * below + eq + 1, 2))
        return out

    xs, ys = [r[0] for r in rows], [r[1] for r in rows]
    ra, rb = avg_ranks(xs), avg_ranks(ys)
    n = len(rows)
    num = n * sum(a * b for a, b in zip(ra, rb)) - sum(ra) * sum(rb)
    dxx = n * sum(a * a for a in ra) - sum(ra) ** 2
    dyy = n * sum(b * b for b in rb) - sum(rb) ** 2
    want_ppm = int(
        (1 if num >= 0 else -1) * (num * num * 1_000_000) / (dxx * dyy)
    )
    r = spearman_report(df, "x", "y").collect()[0]
    assert r.n == n
    # doubled ranks: engine stats are 2x the fraction ranks
    assert r.sx == sum(2 * a for a in ra) and r.sy == sum(2 * b for b in rb)
    # the 2x scaling cancels in the ratio
    assert abs(r.rho_sq_signed_ppm - want_ppm) <= 1  # floor vs trunc at sign
    # perfectly monotone -> +1.0
    mono = spark.createDataFrame(
        [(1, 5), (2, 8), (3, 9)], "x long, y long"
    )
    assert (
        spearman_report(mono, "x", "y").collect()[0].rho_sq_signed_ppm
        == 1_000_000
    )


def test_clustering_coefficients_match_python_model(spark):
    from itertools import combinations

    from politicamente_etl_spark.operators.graph import clustering_coefficients

    # K4 on {1,2,3,4} (all cc=1) + pendant 5-1 + path 6-7-8 (cc(7)=0)
    edges = list(combinations([1, 2, 3, 4], 2)) + [(5, 1), (6, 7), (7, 8)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.degree, r.n_triangles, r.cc_ppm)
        for r in clustering_coefficients(e, top_k=100).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, ns in adj.items():
        d = len(ns)
        if d < 2:
            continue
        t = sum(
            1 for a, b in combinations(sorted(ns), 2) if b in adj[a]
        )
        want[v] = (d, t, 2 * t * 1_000_000 // (d * (d - 1)))
    assert got == want
    assert got[2] == (3, 3, 1_000_000)  # K4 interior stays fully clustered
    assert got[7][2] == 0  # path center has an open neighborhood


def test_histogram_quantile_proof_invariants(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    r = CATALOG["histogram_quantile_merge_proof"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_mismatched_bins == 0  # shard hists merge exactly
    assert r.within_bin == 1  # exact order statistic inside the est bin
    assert r.est_lo_cents <= r.exact_median_cents <= r.est_hi_cents


def test_degree_assortativity_signs(spark):
    from itertools import combinations

    from politicamente_etl_spark.operators.graph import degree_assortativity

    # star: hub degree n-1 pairs with leaves degree 1 -> negative
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r.assortativity_sq_signed_ppm < 0
    # two disjoint cliques of different sizes: within each edge both
    # endpoints share a degree -> perfectly assortative (+1)
    k3 = list(combinations([1, 2, 3], 2))
    k4 = list(combinations([11, 12, 13, 14], 2))
    cliq = spark.createDataFrame(k3 + k4, "src long, dst long")
    r2 = degree_assortativity(cliq).collect()[0]
    assert r2.assortativity_sq_signed_ppm == 1_000_000
    # symmetrization: sx == sy, sxx == syy always
    assert r.sx == r.sy and r.sxx == r.syy


def test_collision_profile_accounts_for_every_bucket(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["hash_bucket_collision_profile"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    # the load histogram plus the empty row partitions all 4096 buckets
    assert sum(r.n_buckets for r in rows) == 4096
    assert all(r.load >= 0 for r in rows)
    # and Σ load·n_buckets = number of distinct features
    n_feats = sum(r.load * r.n_buckets for r in rows)
    assert n_feats > 0


def test_isotonic_calibration_matches_sklearn_free_pav(spark):
    from fractions import Fraction

    from politicamente_etl_spark.operators.stats import isotonic_calibration

    # raw rates: 0.5, 0.2, 0.8, 0.6, 1.0 -> PAV pools (0.5,0.2) and (0.8,0.6)
    bins = [(0, 10, 5), (1, 10, 2), (2, 10, 8), (3, 10, 6), (4, 10, 10)]
    df = spark.createDataFrame(bins, "bin long, n long, n_pos long")
    got = {
        r.bin: (r.raw_rate_ppm, r.iso_rate_ppm)
        for r in isotonic_calibration(df).collect()
    }

    def pav(vals):  # classic stack PAV over (pos, n) with Fraction means
        stack: list = []
        for p, q in vals:
            stack.append((p, q))
            while len(stack) > 1 and Fraction(
                stack[-2][0], stack[-2][1]
            ) > Fraction(stack[-1][0], stack[-1][1]):
                p2, q2 = stack.pop()
                p1, q1 = stack.pop()
                stack.append((p1 + p2, q1 + q2))
        fit = []
        for p, q in stack:
            # each pooled block covers q/10 original bins here (n=10 each)
            fit.extend([Fraction(p, q)] * (q // 10))
        return fit

    want = pav([(p, n) for _, n, p in bins])
    for i, f in enumerate(want):
        assert got[i][1] == (f.numerator * 1_000_000) // f.denominator
    # monotone non-decreasing
    iso = [got[i][1] for i in range(5)]
    assert iso == sorted(iso)


def test_ivm_delta_rule_zero_mismatch(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["ivm_join_delta_proof"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(r.n_mismatched_groups == 0 for r in rows)
    assert sum(r.n_orders for r in rows) == spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).count()


def test_conformal_coverage_near_target(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    r = CATALOG["conformal_coverage_report"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert r.n_calib > 0 and r.n_test > 0
    assert r.r_target == (9 * (r.n_calib + 1) + 9) // 10
    # exchangeable splits: realized coverage within a loose CLT band of
    # the 90% target (binomial sd ~ sqrt(.09/n))
    assert 800_000 <= r.coverage_ppm <= 1_000_000
    assert r.n_covered * 1_000_000 // r.n_test == r.coverage_ppm


def test_hill_estimator_exact_on_known_tail(spark):
    import math

    from politicamente_etl_spark.operators import text  # noqa: F401
    from politicamente_etl_spark.plans.catalog import CATALOG

    r = CATALOG["hill_tail_index"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert r.k_used == 19 and r.x_min > 0
    assert r.hill_inv_alpha_micro == r.sum_log_micro // 19
    if r.sum_log_micro > 0:
        assert r.alpha_micro == 19 * 10**12 // r.sum_log_micro


def test_markov_heldout_accuracy_bounds_and_baseline(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    rows = CATALOG["markov_heldout_accuracy"].fn(spark, sf).collect()
    assert rows and all(0 <= r.acc_ppm <= 1_000_000 for r in rows)
    assert all(r.n_correct <= r.n_pairs for r in rows)
    # exact replica: rebuild train argmax + test scoring in Python
    from collections import Counter, defaultdict

    ev = sorted(
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "user_id",
            "event_type",
            "unix_micros(cast(ts as timestamp)) AS t",
            "event_id",
        )
        .collect(),
        key=lambda r: (r.user_id, r.t, r.event_id),
    )
    pairs = []
    for i in range(len(ev) - 1):
        if ev[i].user_id == ev[i + 1].user_id:
            pairs.append(
                (ev[i].user_id % 2, ev[i].event_type, ev[i + 1].event_type)
            )
    train: dict = defaultdict(Counter)
    for g, p, nx in pairs:
        if g == 0:
            train[p][nx] += 1
    pred = {
        p: min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for p, c in train.items()
    }
    want: dict = defaultdict(lambda: [0, 0])
    for g, p, nx in pairs:
        if g == 1 and p in pred:
            want[p][0] += 1
            want[p][1] += int(nx == pred[p])
    got = {r.prev: (r.n_pairs, r.n_correct) for r in rows}
    assert got == {p: (n, c) for p, (n, c) in want.items()}


def test_holt_backtest_consistency(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["holt_backtest_report"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.abs_err_cents == abs(r.actual_cents - r.forecast_cents)
        assert r.n_train_days >= 1


def test_quantile_normalization_is_a_distribution_bijection(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    rows = CATALOG["quantile_normalization_scores"].fn(spark, sf).collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(rows) == n_docs
    # mapped values carry the target distribution EXACTLY (multiset equal)
    from collections import Counter

    target = Counter(
        r.q
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .selectExpr(
            "CAST((size(array_distinct(split(text, ' '))) * 1000)"
            " div size(split(text, ' ')) AS LONG) AS q"
        )
        .collect()
    )
    assert Counter(r.mapped_q_milli for r in rows) == target
    # and the map is monotone: higher logit rank -> >= mapped value
    by_rank = sorted(rows, key=lambda r: r.src_rank)
    mapped = [r.mapped_q_milli for r in by_rank]
    assert mapped == sorted(mapped)


def test_lsh_recall_report_invariants(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    r = CATALOG["lsh_near_dup_recall_report"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert r.n_lsh_only == 0  # bucketing only restricts candidates
    assert 0 < r.n_lsh <= r.n_exact
    assert r.recall_ppm == r.n_lsh * 1_000_000 // r.n_exact
    assert r.recall_ppm <= 1_000_000


def test_bootstrap_auc_replicates_spread_around_point_estimate(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.01"
    reps = CATALOG["bootstrap_auc_replicates"].fn(spark, sf).collect()
    assert len(reps) == 16
    point = CATALOG["classifier_auc_report"].fn(spark, sf).collect()[0]
    aucs = [r.auc_ppm for r in reps if r.auc_ppm is not None]
    assert aucs and min(aucs) <= point.auc_ppm <= max(aucs)
    # resampled totals hover around the true class counts
    assert all(
        0 < r.n_pos < 5 * point.n_pos and 0 < r.n_neg < 5 * point.n_neg
        for r in reps
    )


def test_hub_removal_fragments_the_giant_component(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = {
        r.scenario: r
        for r in CATALOG["hub_removal_robustness"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    full, res = rows["full"], rows["hubs_removed"]
    assert res.n_nodes < full.n_nodes  # hubs (and isolated leaves) leave
    assert res.largest_component <= full.largest_component
    assert full.largest_component <= full.n_nodes
    # a scale-free-ish co-purchase graph loses coverage under attack:
    # the surviving giant is a strictly smaller FRACTION of its graph
    assert (
        res.largest_component * full.n_nodes
        <= full.largest_component * res.n_nodes
    )


def test_chi2_uniformity_matches_textbook_statistic(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    rows = CATALOG["events_hourly_uniformity_chi2"].fn(spark, sf).collect()
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "event_type",
            "pmod(unix_micros(cast(ts as timestamp)) div 3600000000, 24)"
            " AS hod",
        )
        .collect()
    )
    from collections import Counter, defaultdict

    per: dict = defaultdict(Counter)
    for r in ev:
        per[r.event_type][r.hod] += 1
    for r in rows:
        c = per[r.event_type]
        n = sum(c.values())
        # textbook chi2 vs uniform over 24 cells, as an exact fraction
        num = sum((24 * c.get(h, 0) - n) ** 2 for h in range(24))
        assert (r.chi2_num, r.chi2_den) == (num, 24 * n)
        assert r.chi2_milli == num * 1000 // (24 * n)


def test_t_closeness_null_buckets_and_null_qi_survive(spark):
    from politicamente_etl_spark.operators.quality import t_closeness_classes

    rows = [
        ("a", 1),
        ("a", None),  # NULL sensitive value is a legitimate bucket
        ("b", 1),
        ("b", None),
        (None, 1),  # NULL QI component is a legitimate class
        (None, None),
    ]
    df = spark.createDataFrame(rows, "q string, s int")
    out = {r.q: r for r in t_closeness_classes(df, ["q"], "s").collect()}
    # all three classes present, including the NULL-keyed one
    assert set(out) == {"a", "b", None}
    assert all(r.n_rows == 2 for r in out.values())
    # every class mirrors the global (1/2, 1/2) distribution -> TVD 0,
    # which only holds if NULL buckets joined null-safely
    assert all(r.tvd_ppm == 0 for r in out.values())


def test_business_day_closed_form_matches_python_calendar(spark):
    import datetime as dt

    from politicamente_etl_spark.plans.catalog import CATALOG

    # python model over the actual sf0.001 join, weekday() < 5
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").selectExpr(
        "l_orderkey", "cast(l_shipdate as date) AS ship"
    )
    o = spark.read.parquet(f"{sf}/orders.parquet").selectExpr(
        "o_orderkey", "o_orderpriority", "cast(o_orderdate as date) AS odate"
    )
    rows = li.join(o, li.l_orderkey == o.o_orderkey).collect()

    def bdays(a: dt.date, b: dt.date) -> int:
        sign = 1
        if b < a:
            a, b, sign = b, a, -1
        n, d = 0, a
        while d < b:
            d += dt.timedelta(days=1)
            if d.weekday() < 5:
                n += 1
        return sign * n

    from collections import Counter

    want = Counter(
        (r.o_orderpriority, bdays(r.odate, r.ship)) for r in rows
    )
    got = Counter()
    for r in CATALOG["business_day_latency_profile"].fn(spark, sf).collect():
        got[(r.o_orderpriority, r.bdays)] = r.n_items
    assert got == want


def test_intersect_all_multiplicities(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG
    from collections import Counter

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").selectExpr(
        "cast(l_quantity as long) AS qty", "l_returnflag"
    ).collect()
    ret = Counter(r.qty for r in li if r.l_returnflag == "R")
    kept = Counter(r.qty for r in li if r.l_returnflag != "R")
    want = {q: min(ret[q], kept[q]) for q in ret if q in kept}
    got = {
        r.qty: r.n
        for r in CATALOG["intersect_all_quantities"].fn(spark, sf).collect()
    }
    assert got == want  # multiset semantics: min of the two multiplicities
