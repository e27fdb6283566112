"""Round-7 batch 1 tests: unigram-LM Viterbi segmentation vs a Python
DP model, U-shaped attribution credit schedules, and the seasonal
decomposition identities."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def _viterbi_model(corpus_words, max_len=4, vocab_top=200):
    """Pure-Python replica of unigram_viterbi_segmentation's contract."""
    from collections import Counter

    wf = Counter(corpus_words)
    pc: Counter = Counter()
    for w, f in wf.items():
        for k in range(1, min(max_len, len(w)) + 1):
            for i in range(len(w) - k + 1):
                pc[w[i : i + k]] += f
    top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_top]
    vocab = dict(top)
    for p, c in pc.items():
        if len(p) == 1:
            vocab[p] = c
    tot = sum(vocab.values())
    sc = {p: round(math.log(c / tot) * 1e6) for p, c in vocab.items()}
    out = {}
    for w, f in wf.items():
        L = len(w)
        dp = [(0, 0)] + [None] * L  # (score, n_pieces), maximize score then min pieces
        for i in range(1, L + 1):
            best = None
            for k in range(1, min(max_len, i) + 1):
                p = w[i - k : i]
                if p not in sc:
                    continue
                cand = (dp[i - k][0] + sc[p], dp[i - k][1] + 1)
                if best is None or cand[0] > best[0] or (
                    cand[0] == best[0] and cand[1] < best[1]
                ):
                    best = cand
            dp[i] = best
        out[w] = (f, L, dp[L][1], -dp[L][0])
    return out


def test_unigram_viterbi_matches_python_dp(spark):
    from politicamente_etl_spark.operators.text import (
        unigram_viterbi_segmentation,
    )

    # 'abab' repeats a lot -> 'ab' (and 'abab') become high-probability
    # pieces; rare words must fall back to single chars.
    rows = [
        (1, "abab abab abab cd"),
        (2, "abab ababx q cd cd"),
        (3, "zzzz abab cd q"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["w"]: (r["wf"], r["n_chars"], r["n_pieces"], r["total_cost_micro"])
        for r in unigram_viterbi_segmentation(docs.select("text")).collect()
    }
    corpus = " ".join(t for _, t in rows).split(" ")
    want = _viterbi_model(corpus)
    assert got == want
    # sanity on the model itself: 'abab' segments into fewer pieces than
    # characters (multi-char pieces won) and cost decreases vs all-chars.
    assert want["abab"][2] < 4


def test_u_shaped_attribution_credit_schedules(spark):
    from politicamente_etl_spark.operators.temporal import (
        u_shaped_attribution,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, typ, minutes, value=10.0):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, value, "{}")

    rows = [
        # user 1: four clicks then purchase -> 400k/100k/100k/400k
        ev(1, 1, "click", 0),
        ev(2, 1, "click", 10),
        ev(3, 1, "click", 20),
        ev(4, 1, "click", 30),
        ev(5, 1, "purchase", 40, 2.5),
        # user 2: single click -> 1_000_000
        ev(6, 2, "click", 0),
        ev(7, 2, "purchase", 30, 1.0),
        # user 3: two clicks -> 500k each; plus one click OUTSIDE the
        # 2h lookback that must earn nothing
        ev(8, 3, "click", -150),
        ev(9, 3, "click", 5),
        ev(10, 3, "click", 25),
        ev(11, 3, "purchase", 60, 4.0),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = u_shaped_attribution(events, lookback_us=7_200_000_000)
    got = {
        (r["conv_id"], r["touch_id"]): (
            r["pos"],
            r["n_touches"],
            r["credit_ppm"],
            r["credited_value_milli_ppm"],
        )
        for r in out.collect()
    }
    assert got[(5, 1)] == (1, 4, 400_000, 400_000 * 2500)
    assert got[(5, 2)] == (2, 4, 100_000, 100_000 * 2500)
    assert got[(5, 3)] == (3, 4, 100_000, 100_000 * 2500)
    assert got[(5, 4)] == (4, 4, 400_000, 400_000 * 2500)
    assert got[(7, 6)] == (1, 1, 1_000_000, 1_000_000 * 1000)
    assert (11, 8) not in got  # outside lookback
    assert got[(11, 9)] == (1, 2, 500_000, 500_000 * 4000)
    assert got[(11, 10)] == (2, 2, 500_000, 500_000 * 4000)
    # every conversion's ppm budget is fully assigned for n <= 2 and
    # exactly 1e6 for the 4-touch path (200k middle pool splits evenly)
    assert sum(v[2] for k, v in got.items() if k[0] == 5) == 1_000_000


def test_seasonal_decomposition_identities(spark):
    from politicamente_etl_spark.operators.stats import (
        seasonal_decomposition_hourly,
    )

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    # 72 hourly events with a daily sine-ish pattern + linear trend
    rows = []
    for h in range(72):
        v = 100 + h + 50 * ((h % 24) >= 12)
        rows.append((h, t0 + dt.timedelta(hours=h), 1, "click", float(v), "{}"))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = seasonal_decomposition_hourly(events).collect()
    by_h = {r["h"]: r for r in out}
    hs = sorted(by_h)
    assert len(hs) == 72
    vm = {h: by_h[h]["v_milli"] for h in hs}
    # edges: first/last 12 rows have NULL trend; interior trend is the
    # exact 25-hour sum
    for idx, h in enumerate(hs):
        r = by_h[h]
        if 12 <= idx < 60:
            assert r["trend_sum"] == sum(vm[hs[j]] for j in range(idx - 12, idx + 13))
        else:
            assert r["trend_sum"] is None
    # seasonal identity per hour-of-day over complete rows
    import collections

    num = collections.Counter()
    den = collections.Counter()
    for idx, h in enumerate(hs):
        if 12 <= idx < 60:
            num[h % 24] += 25 * vm[h] - by_h[h]["trend_sum"]
            den[h % 24] += 1
    for h in hs:
        r = by_h[h]
        assert r["seas_num"] == num[r["hod"]]
        assert r["seas_den"] == den[r["hod"]]


def test_ipw_unsampled_strata_are_exact_and_membership_is_stable(spark):
    from politicamente_etl_spark.operators.sampling import (
        ipw_telemetry_estimates,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), i % 7, "click" if i % 2 else "view",
         float(i), "{}")
        for i in range(200)
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out1 = {
        r["event_type"]: r
        for r in ipw_telemetry_estimates(
            events, {"click": 2000}
        ).collect()
    }
    # view: unsampled stratum (rate = N_BUCKETS) -> estimate IS the truth
    assert out1["view"]["est_sum_milli"] == out1["view"]["true_sum_milli"]
    assert out1["view"]["n_sampled"] == out1["view"]["n_true"]
    # click: sampled at 20%; estimator identity holds exactly
    c = out1["click"]
    assert c["n_sampled"] < c["n_true"]
    # determinism: same frame, same answer
    out2 = {
        r["event_type"]: r
        for r in ipw_telemetry_estimates(events, {"click": 2000}).collect()
    }
    assert out1 == out2


def _ring_model(n_shards, keys, vnodes=16, seed="ring-v1"):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pts = sorted(
        (h60(f"{seed}:{s}:{v}"), s)
        for s in range(n_shards)
        for v in range(vnodes)
    )
    out = {}
    for k in keys:
        kpt = h60(f"{seed}:key:{k}")
        nxt = [p for p in pts if p[0] >= kpt]
        out[k] = (nxt[0] if nxt else pts[0])[1]
    return out


def test_consistent_hash_rebalance_matches_model_and_only_steals(spark):
    from politicamente_etl_spark.operators.sampling import (
        consistent_hash_rebalance,
    )

    keys = list(range(1, 301))
    df = spark.createDataFrame([(k,) for k in keys], ["doc_id"])
    got = {
        r["shard_before"]: (r["n_keys"], r["n_moved"])
        for r in consistent_hash_rebalance(df, "doc_id", 5, 6).collect()
    }
    before = _ring_model(5, keys)
    after = _ring_model(6, keys)
    # growth only STEALS: every moved key lands on the new shard
    for k in keys:
        if before[k] != after[k]:
            assert after[k] == 5  # the added shard id
    import collections

    want_keys = collections.Counter(before.values())
    want_moved = collections.Counter(
        before[k] for k in keys if before[k] != after[k]
    )
    want = {s: (want_keys[s], want_moved.get(s, 0)) for s in want_keys}
    assert got == want


def test_corpus_datasheet_counts_and_mode(spark):
    from politicamente_etl_spark.plans.catalog import CATALOG

    rows = [
        (1, "dup dup dup", "en", "a", 11),
        (2, "dup dup dup", "en", "a", 11),
        (3, "unique text here", "pt", "a", 16),
        (4, "other words", "pt", "b", 11),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["source"]: r
            for r in CATALOG["corpus_datasheet"].fn(spark, d).collect()
        }
    a = out["a"]
    assert (a["n_docs"], a["n_unique"], a["dup_ppm"]) == (3, 2, 333333)
    assert a["tokens_total"] == 9 and a["n_langs"] == 2
    # tie 2-vs-1 broken by count; 'en' is modal in a
    assert a["top_lang"] == "en"
    b = out["b"]
    assert (b["n_docs"], b["dup_ppm"], b["top_lang"]) == (1, 0, "pt")


def test_geo_neighbor_pairs_match_bruteforce(spark):
    from politicamente_etl_spark.operators.geo import (
        neighbor_pairs_within,
        synth_coords,
    )

    df = spark.createDataFrame([(k,) for k in range(1, 401)], ["id"])
    lat, lon = synth_coords(F.col("id"))
    pts = df.select("id", lat.alias("lat_milli"), lon.alias("lon_milli"))
    r = 5000
    got = {
        (x["a"], x["b"]): x["dist_sq_milli"]
        for x in neighbor_pairs_within(
            pts, "id", radius_milli=r
        ).collect()
    }
    # brute force over the same deterministic coords
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    coords = {
        k: (h60(f"geo-v1:lat:{k}") % 180_000 - 90_000,
            h60(f"geo-v1:lon:{k}") % 360_000 - 180_000)
        for k in range(1, 401)
    }
    want = {}
    ks = sorted(coords)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            d2 = (coords[a][0] - coords[b][0]) ** 2 + (
                coords[a][1] - coords[b][1]
            ) ** 2
            if d2 <= r * r:
                want[(a, b)] = d2
    assert want, "radius too small for the fixture"
    assert got == want


def test_seq_pattern_greedy_fold_is_subsequence_containment(spark):
    from politicamente_etl_spark.operators.stats import seq_pattern_support

    t0 = dt.datetime(2024, 5, 1)
    # one user, one day, sequence: a b a c  (types named with full words)
    seq = ["click", "view", "click", "purchase"]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, et, 1.0, "{}")
        for i, et in enumerate(seq)
    ]
    # second user-day: purchase only
    rows.append((99, t0 + dt.timedelta(days=1), 1, "purchase", 1.0, "{}"))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {
        r["pattern"]: (r["n_support"], r["n_sequences_total"])
        for r in seq_pattern_support(events).collect()
    }

    def is_subseq(pat, s):
        it = iter(s)
        return all(tok in it for tok in pat)

    seqs = [seq, ["purchase"]]
    types = sorted(set(seq))
    import itertools

    pats = [
        list(p)
        for L in (1, 2, 3)
        for p in itertools.product(types, repeat=L)
    ]
    for p in pats:
        key = " ".join(p)
        want = sum(1 for s in seqs if is_subseq(p, s))
        assert out[key] == (want, 2), key
    # spot checks: order matters, duplicates consume
    assert out["view click purchase"] == (1, 2)
    assert out["purchase click"] == (0, 2)
    assert out["click click purchase"] == (1, 2)
    assert out["click click click"] == (0, 2)


def test_seq_pattern_max_types_caps_grid_not_sequences(spark):
    """VERDICT r5 item 2: the candidate grid is built from the top-K
    most frequent types only (K+K^2+K^3 rows, flat in the taxonomy
    size), while rare types still participate in the SEQUENCES being
    scored — they just don't mint patterns."""
    from politicamente_etl_spark.operators.stats import seq_pattern_support

    t0 = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    # user 1, one day: click rare1 purchase click rare2 purchase
    for et in ["click", "rare1", "purchase", "click", "rare2", "purchase"]:
        rows.append((eid, t0 + dt.timedelta(minutes=eid), 1, et, 1.0, "{}"))
        eid += 1
    # user 2, one day: click purchase (frequent types only)
    for et in ["click", "purchase"]:
        rows.append((eid, t0 + dt.timedelta(minutes=eid), 2, et, 1.0, "{}"))
        eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {
        r["pattern"]: r["n_support"]
        for r in seq_pattern_support(events, max_types=2).collect()
    }
    # grid is exactly K + K^2 + K^3 for K=2 (click/purchase are the top-2
    # by frequency; rare1/rare2 are singletons and out-ranked)
    assert len(out) == 2 + 4 + 8
    assert all(
        set(p.split(" ")) <= {"click", "purchase"} for p in out
    ), sorted(out)
    # rare types still live inside user 1's sequence: the subsequence
    # 'click purchase click purchase' only exists because matching runs
    # over the FULL sequence, rare events included
    assert out["click purchase click"] == 1
    assert out["click purchase"] == 2
    # tie-break determinism: widen K past the taxonomy — grid covers all
    # 4 types and equals T + T^2 + T^3
    full = seq_pattern_support(events, max_types=64)
    assert full.count() == 4 + 16 + 64


def test_mstep_counts_cover_every_char_and_match_model(spark):
    from politicamente_etl_spark.operators.text import (
        unigram_viterbi_mstep_counts,
    )

    rows = [
        (1, "abab abab abab cd"),
        (2, "abab ababx q cd cd"),
        (3, "zzzz abab cd q"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["piece"]: (r["n_words"], r["n_uses_weighted"])
        for r in unigram_viterbi_mstep_counts(docs.select("text")).collect()
    }
    corpus = " ".join(t for _, t in rows).split(" ")
    # chars-covered invariant: every word's characters are covered exactly
    # once across its pieces, so weighted piece-length mass == weighted
    # word-length mass
    from collections import Counter

    wf = Counter(corpus)
    want_mass = sum(f * len(w) for w, f in wf.items())
    got_mass = sum(len(p) * uses for p, (_, uses) in out.items())
    assert got_mass == want_mass
    # the dominant piece of this corpus must be in use
    assert "abab" in out or "ab" in out


def test_density_clusters_hand_built_topology(spark):
    from politicamente_etl_spark.operators.geo import density_clusters

    # cluster A: 1,2,3 mutually within r (triangle) -> all core
    # bridge/border: 4 near 3 only (degree 1) -> border into A's cluster
    # pair: 5,6 within r of each other only (degree 1 each) -> noise-ish:
    #   neither is core (needs >= 2 neighbors) -> not emitted
    # isolated: 7 far away -> not emitted
    pts = [
        (1, 0, 0),
        (2, 0, 80),
        (3, 60, 40),       # within 100 of both 1 and 2
        (4, 150, 40),      # within 100 of 3 only
        (5, 5000, 5000),
        (6, 5000, 5080),
        (7, 20000, 20000),
    ]
    df = spark.createDataFrame(pts, ["pid", "lat_milli", "lon_milli"])
    out = {
        r["pid"]: (r["cluster_id"], r["role"])
        for r in density_clusters(
            df, "pid", radius_milli=100, min_neighbors=2
        ).collect()
    }
    assert out[1] == (1, "core")
    assert out[2] == (1, "core")
    assert out[3] == (1, "core")
    assert out[4] == (1, "border")
    assert 5 not in out and 6 not in out and 7 not in out


def test_jl_projection_exact_and_distance_ratio_concentrates(spark):
    from politicamente_etl_spark.operators.sim import (
        jl_distance_pairs,
        jl_sign_matrix,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(1, 120)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    M = jl_sign_matrix(16, 64)
    out = jl_distance_pairs(df, M, sample_buckets=10_000).collect()
    assert len(out) == 119 * 118 // 2
    # exactness vs a Python model on a few pairs
    vm = {i: [int(__import__("math").floor(x * 1000)) for x in v] for i, v in rows}

    def proj(v):
        return [sum(s * x for s, x in zip(row, v)) for row in M]

    for r in out[:5]:
        a, b = r["a"], r["b"]
        want_orig = sum((p - q) ** 2 for p, q in zip(vm[a], vm[b]))
        want_proj = sum((p - q) ** 2 for p, q in zip(proj(vm[a]), proj(vm[b])))
        assert (r["d2_orig"], r["d2_proj"]) == (want_orig, want_proj)
    # JL: E[d2_proj] = m * d2_orig; the mean ratio concentrates near 16
    ratios = [r["d2_proj"] / r["d2_orig"] for r in out if r["d2_orig"] > 0]
    mean = sum(ratios) / len(ratios)
    assert 13.0 < mean < 19.0


def test_item_cooccurrence_sim_hand_values(spark):
    from politicamente_etl_spark.operators.sim import (
        item_cooccurrence_similarity,
    )

    baskets = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"),
        (4, "z"), (4, "x"),
        (5, "q"),
    ]
    df = spark.createDataFrame(baskets, ["bk", "it"])
    out = {
        (r["item_a"], r["item_b"]): (
            r["c_ab"], r["c_a"], r["c_b"], r["sim_sq_ppm"]
        )
        for r in item_cooccurrence_similarity(
            df, "bk", "it", min_co=2, top_k=10
        ).collect()
    }
    # x,y co-occur 3x; c_x = 4, c_y = 3 -> sim² = 9/12 = 750000 ppm
    assert out[("x", "y")] == (3, 4, 3, 750_000)
    # x,z co-occur 2x; c_z = 2 -> sim² = 4/8 = 500000 ppm
    assert out[("x", "z")] == (2, 4, 2, 500_000)
    assert ("y", "z") not in out  # co-occurs once < min_co


def test_window_funnel_uses_latest_feasible_first_step(spark):
    from politicamente_etl_spark.operators.temporal import (
        window_funnel_levels,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, typ, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    rows = [
        # user 1: the FIRST signup is too old for the click, but a later
        # signup opens a full chain — a min-carry fold (the bug this test
        # pins) would stop at level 1; correct windowFunnel reaches 3.
        ev(1, 1, "signup", 0),
        ev(2, 1, "signup", 40),
        ev(3, 1, "click", 50),
        ev(4, 1, "purchase", 60),
        # user 2: signup then click inside the window, purchase outside
        # the 30-min deadline anchored at the signup -> level 2
        ev(5, 2, "signup", 0),
        ev(6, 2, "click", 10),
        ev(7, 2, "purchase", 45),
        # user 3: signup only -> level 1
        ev(8, 3, "signup", 0),
        # user 4: no signup at all -> level 0 (clicks don't start a chain)
        ev(9, 4, "click", 0),
        ev(10, 4, "purchase", 5),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {
        r["level"]: r["n_users"]
        for r in window_funnel_levels(
            events,
            ["signup", "click", "purchase"],
            window_us=30 * 60 * 1_000_000,
        ).collect()
    }
    assert out == {3: 1, 2: 1, 1: 1, 0: 1}
