"""Semantics tests for the round-3 additions: SCD2 merge, SemDeDup,
robust stats (MAD / equi-depth / RFM), event transitions, vocabulary
growth, boilerplate scoring, forward-asof attribution, and the
merge_upsert sink. Oracle parity is covered by the catalog SQL twins
(tests/test_oracle_parity.py + driver_sim); these pin the operator
CONTRACTS on hand-built frames where the expected answer is computable
by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from politicamente_etl_spark.operators import joins, sim, stats, text
from politicamente_etl_spark.plans.catalog import CATALOG


# ---------------------------------------------------------------------------
# scd2_merge
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [
            Row(k=1, name="a", bal=10.0, version=0, is_current=True),
            Row(k=2, name="b", bal=20.0, version=0, is_current=True),
            Row(k=3, name="c", bal=30.0, version=0, is_current=True),
            # closed historical row — must pass through untouched
            Row(k=1, name="a", bal=5.0, version=-1, is_current=False),
        ]
    )


def test_scd2_changed_key_closes_and_opens(spark, dim):
    upd = spark.createDataFrame([Row(k=1, bal=11.0)])
    out = joins.scd2_merge(
        dim, upd, keys=["k"], tracked=["bal"], batch_id=7,
        version_col="version", current_col="is_current",
    ).collect()
    k1 = sorted(
        [r for r in out if r.k == 1], key=lambda r: (r.version, r.bal)
    )
    # history row untouched, old open row closed, new version opened
    assert [(r.bal, r.version, r.is_current) for r in k1] == [
        (5.0, -1, False),
        (10.0, 0, False),
        (11.0, 7, True),
    ]


def test_scd2_noop_update_causes_no_churn(spark, dim):
    upd = spark.createDataFrame([Row(k=2, bal=20.0)])  # identical value
    out = joins.scd2_merge(dim, upd, ["k"], ["bal"], batch_id=7)
    k2 = [r for r in out.collect() if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].version == 0


def test_scd2_new_key_inserts_open(spark, dim):
    upd = spark.createDataFrame([Row(k=9, bal=90.0)])
    out = joins.scd2_merge(dim, upd, ["k"], ["bal"], batch_id=7)
    k9 = [r for r in out.collect() if r.k == 9]
    assert len(k9) == 1
    assert k9[0].is_current and k9[0].version == 7 and k9[0].name is None


def test_scd2_untouched_keys_pass_through(spark, dim):
    upd = spark.createDataFrame([Row(k=1, bal=11.0)])
    out = joins.scd2_merge(dim, upd, ["k"], ["bal"], batch_id=7)
    k3 = [r for r in out.collect() if r.k == 3]
    assert [(k3[0].bal, k3[0].version, k3[0].is_current)] == [(30.0, 0, True)]


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------


def test_semdedup_keeps_min_id_per_duplicate_group(spark):
    # two clusters around orthogonal axes; 0/1/2 near-identical, 3 alone
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.99, 0.01]),
            Row(vec_id=2, embedding=[0.98, 0.02]),
            Row(vec_id=3, embedding=[0.0, 1.0]),
        ]
    )
    cent = spark.createDataFrame(
        [Row(cell=0, centroid=[1.0, 0.0]), Row(cell=1, centroid=[0.0, 1.0])]
    )
    out = {r.vec_id: r for r in sim.semdedup(emb, cent, threshold=0.9).collect()}
    assert out[0].is_kept and out[0].dup_of is None
    assert not out[1].is_kept and out[1].dup_of == 0
    assert not out[2].is_kept and out[2].dup_of == 0
    assert out[3].is_kept and out[3].cell == 1


def test_semdedup_cross_cell_pairs_never_compared(spark):
    # identical vectors forced into different cells stay both kept:
    # the candidate join is cell-local by construction
    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 1.0]), Row(vec_id=1, embedding=[1.0, 1.0])]
    )
    cent = spark.createDataFrame(
        [Row(cell=0, centroid=[1.0, 1.0]), Row(cell=1, centroid=[1.0, 1.0])]
    )
    # both assign to cell 0 (tie broken by cell id) → duplicate detected
    out = {r.vec_id: r for r in sim.semdedup(emb, cent, threshold=0.9).collect()}
    assert out[0].is_kept and not out[1].is_kept


# ---------------------------------------------------------------------------
# stats
# ---------------------------------------------------------------------------


def test_mad_outliers_robust_to_injected_extremes(spark):
    # 99 values at 10±1 plus one at 1000: the extreme is flagged and the
    # fence (median) ignores it — mean/stddev would not
    rows = [Row(g="a", v=10.0 + (i % 3 - 1) * 1.0) for i in range(99)]
    rows.append(Row(g="a", v=1000.0))
    df = spark.createDataFrame(rows)
    out = stats.mad_outliers(df, "g", "v", n_mads=3.0).collect()
    assert len(out) == 1 and out[0].v == 1000.0
    assert out[0].med == 10.0 and out[0].mad == 1.0


def test_equi_depth_histogram_buckets_are_equal_depth(spark):
    df = spark.createDataFrame([Row(x=float(i)) for i in range(1000)])
    out = {r.bucket: r for r in stats.equi_depth_histogram(df, "x", 10).collect()}
    assert len(out) == 10
    counts = [out[b].n_rows for b in sorted(out)]
    assert max(counts) - min(counts) <= 1  # equal depth up to interpolation
    assert out[0].min_v == 0.0 and out[9].max_v == 999.0


def test_rfm_scores_bounds_and_cell(spark):
    import datetime

    rows = [
        Row(
            o_custkey=i % 50,
            o_orderdate=datetime.datetime(2024, 1, 1 + (i % 28)),
            o_totalprice=100.0 + i,
        )
        for i in range(500)
    ]
    out = stats.rfm_scores(spark.createDataFrame(rows), n_tiles=5).collect()
    assert len(out) == 50
    for r in out:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.rfm_cell == f"{r.r_score}{r.f_score}{r.m_score}"
        assert r.recency_days >= 0


def test_event_transitions_probabilities_normalize(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(user_id=u, ts=t0 + datetime.timedelta(minutes=i), event_id=u * 100 + i,
            event_type=seq[i])
        for u, seq in enumerate([["a", "b", "a", "c"], ["a", "a", "b"]])
        for i in range(len(seq))
    ]
    out = stats.event_transitions(spark.createDataFrame(rows)).collect()
    by_cur: dict[str, float] = {}
    for r in out:
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p_hop
        assert r.n_from >= r.n_hops
    for total in by_cur.values():
        assert abs(total - 1.0) < 1e-12
    hops = {(r.cur, r.nxt): r.n_hops for r in out}
    assert hops[("a", "b")] == 2 and hops[("a", "a")] == 1


# ---------------------------------------------------------------------------
# text: vocabulary growth + boilerplate
# ---------------------------------------------------------------------------


def test_vocab_growth_counts_new_types_once(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b"),
            Row(doc_id=1, text="a c"),   # c is new, a is not
            Row(doc_id=10, text="a d"),  # second bucket: only d is new
        ]
    )
    out = {r.bucket: r for r in text.vocab_growth_curve(docs, bucket_docs=10).collect()}
    assert out[0].new_types == 3 and out[0].cum_types == 3
    assert out[1].new_types == 1 and out[1].cum_types == 4


def test_boilerplate_score_flags_shared_shingles(spark):
    shared = "x y z w v"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=shared + " unique0 only0 here0 now0 one0"),
            Row(doc_id=1, text=shared + " unique1 only1 here1 now1 one1"),
            Row(doc_id=2, text="all fresh tokens no overlap at all ok yes"),
        ]
    )
    out = {
        r.doc_id: r
        for r in text.boilerplate_shingle_scores(docs, n=5, hot_doc_count=1).collect()
    }
    # docs 0/1 share exactly the 'x y z w v' shingle; doc 2 shares none
    assert out[0].n_boiler == 1 and out[1].n_boiler == 1
    assert out[2].n_boiler == 0 and out[2].boiler_ratio == 0.0
    assert 0.0 < out[0].boiler_ratio < 1.0


# ---------------------------------------------------------------------------
# forward-asof attribution (catalog-level semantics)
# ---------------------------------------------------------------------------


def test_click_attribution_window_semantics(spark, sf_dir):
    out = CATALOG["click_conversion_attribution"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    attributed = [r for r in out if r.conv_ts_us is not None]
    assert attributed, "tolerance window should capture some conversions"
    for r in attributed:
        delta_us = r.conv_ts_us - r.ts_us
        assert 0 <= delta_us <= 7_200_000_000  # forward-only, within 2h


# ---------------------------------------------------------------------------
# merge_upsert sink (parquet backend; delta arm import-gated)
# ---------------------------------------------------------------------------


def test_merge_upsert_parquet_backend(spark, tmp_path):
    from politicamente_etl_spark.sources.sinks import merge_upsert

    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [Row(k=1, v="old"), Row(k=2, v="keep")]
    ).write.parquet(path)
    new = spark.createDataFrame([Row(k=1, v="new"), Row(k=3, v="ins")])
    merge_upsert(spark, path, new, keys=["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_merge_upsert_delta_backend_requires_package(spark, tmp_path):
    from politicamente_etl_spark.sources.sinks import merge_upsert

    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; forced-backend error not applicable")
    except ImportError:
        pass
    path = str(tmp_path / "dim")
    spark.createDataFrame([Row(k=1, v="x")]).write.parquet(path)
    with pytest.raises(RuntimeError, match="delta-spark"):
        merge_upsert(
            spark, path, spark.createDataFrame([Row(k=1, v="y")]),
            keys=["k"], backend="delta",
        )


# ---------------------------------------------------------------------------
# batch 3: epoch mix, funnel ordering, k-means step, audits
# ---------------------------------------------------------------------------


def test_realize_epoch_mix_deterministic_and_bounded(spark):
    from politicamente_etl_spark.operators import sampling

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % 3}") for i in range(300)]
    )
    w = sampling.temperature_mix_weights(docs, strata_col="source")
    out1 = sampling.realize_epoch_mix(docs, w, epoch_frac=0.5, seed="e1")
    out2 = sampling.realize_epoch_mix(docs, w, epoch_frac=0.5, seed="e1")
    ids1 = {r.doc_id for r in out1.collect()}
    ids2 = {r.doc_id for r in out2.collect()}
    assert ids1 == ids2  # same seed → identical membership
    rates = {r.accept_rate for r in out1.select("accept_rate").distinct().collect()}
    assert all(0.0 < r <= 1.0 for r in rates)
    # epoch_frac=0.5 over balanced sources → roughly half kept
    assert 0.3 * 300 < len(ids1) < 0.7 * 300
    other = {r.doc_id for r in
             sampling.realize_epoch_mix(docs, w, epoch_frac=0.5, seed="e2").collect()}
    assert other != ids1  # a new epoch seed redraws membership


def test_funnel_three_step_enforces_order(spark, tmp_path, monkeypatch):
    # click BEFORE signup must NOT advance the funnel
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ev(uid, typ, minutes, eid):
        return Row(event_id=eid, user_id=uid, event_type=typ,
                   ts=t0 + datetime.timedelta(minutes=minutes), value=1.0,
                   props="{}")

    rows = [
        # user 1: signup → click → purchase (full funnel)
        ev(1, "signup", 0, 1), ev(1, "click", 5, 2), ev(1, "purchase", 10, 3),
        # user 2: click BEFORE signup, purchase after — click must not count
        ev(2, "click", 0, 4), ev(2, "signup", 5, 5), ev(2, "purchase", 10, 6),
        # user 3: signup only
        ev(3, "signup", 0, 7),
    ]
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)

    from politicamente_etl_spark.plans.catalog import CATALOG as CAT

    out = CAT["funnel_three_step_ordered"].fn(spark, str(tmp_path)).collect()[0]
    assert out.n_signup_users == 3
    assert out.n_clicked_after == 1  # only user 1
    assert out.n_converted == 1


def test_kmeans_step_moves_centroid_to_cell_mean(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[0.0, 0.0]),
            Row(vec_id=1, embedding=[2.0, 0.0]),
            Row(vec_id=2, embedding=[10.0, 10.0]),
        ]
    )
    cent = spark.createDataFrame(
        [Row(cell=0, centroid=[1.0, 0.0]), Row(cell=1, centroid=[9.0, 9.0])]
    )
    assigned = sim.assign_cells(emb, cent)
    out = {
        (r.cell, r.pos): r.centroid_val
        for r in sim.group_centroids(assigned, group_col="cell").collect()
    }
    assert out[(0, 0)] == 1.0 and out[(0, 1)] == 0.0  # mean of {0,2}, {0,0}
    assert out[(1, 0)] == 10.0 and out[(1, 1)] == 10.0


def test_cross_source_matrix_normalizes_pair_order(spark, sf_dir):
    out = CATALOG["cross_source_dup_matrix"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.source_a <= r.source_b
        assert r.n_pairs >= 1
        assert 0.0 <= r.avg_est_jaccard <= 1.0


def test_langid_confusion_shares_normalize(spark, sf_dir):
    out = CATALOG["langid_confusion_matrix"].fn(spark, sf_dir).collect()
    by_lang: dict[str, float] = {}
    for r in out:
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.share
    for total in by_lang.values():
        assert abs(total - 1.0) < 1e-12


def test_ltv_curve_cumulative_monotone(spark, sf_dir):
    rows = CATALOG["customer_ltv_curve"].fn(spark, sf_dir).collect()
    seen: dict[int, list] = {}
    for r in rows:
        seen.setdefault(r.cohort_ym, []).append((r.month_idx, r.cum_revenue))
    for cohort, pts in seen.items():
        pts.sort()
        assert pts[0][0] == 0  # every cohort starts at its own first month
        cums = [c for _, c in pts]
        assert all(b >= a for a, b in zip(cums, cums[1:]))


# ---------------------------------------------------------------------------
# batch 4: incremental aggregate maintenance
# ---------------------------------------------------------------------------


def test_merge_aggregates_equals_full_recompute(spark):
    from politicamente_etl_spark.operators.agg import merge_aggregates

    rows = [Row(k=i % 5, amt=round(0.01 * i, 2), n=1) for i in range(200)]
    df = spark.createDataFrame(rows)

    def agg(d):
        return d.groupBy("k").agg(
            F.sum(F.col("amt").cast("decimal(27,4)")).cast("double").alias("amt"),
            F.count("*").alias("n"),
            F.max("amt").alias("hi"),
        )

    full = {r.k: (r.amt, r.n, r.hi) for r in agg(df).collect()}
    merged = merge_aggregates(
        agg(df.filter("k IN (0, 1) OR amt < 0.5")),
        agg(df.filter("NOT (k IN (0, 1) OR amt < 0.5)")),
        keys=["k"],
        sum_cols=["amt"],
        count_cols=["n"],
        max_cols=["hi"],
    )
    got = {r.k: (r.amt, r.n, r.hi) for r in merged.collect()}
    assert got == full


def test_merge_aggregates_key_only_in_one_side(spark):
    from politicamente_etl_spark.operators.agg import merge_aggregates

    state = spark.createDataFrame([Row(k=1, total=10.0, n=2)])
    delta = spark.createDataFrame([Row(k=2, total=5.0, n=1)])
    got = {
        r.k: (r.total, r.n)
        for r in merge_aggregates(
            state, delta, ["k"], sum_cols=["total"], count_cols=["n"]
        ).collect()
    }
    assert got == {1: (10.0, 2), 2: (5.0, 1)}


# ---------------------------------------------------------------------------
# semi-structured / VARIANT
# ---------------------------------------------------------------------------


def test_variant_parse_extract_and_malformed_tolerance(spark):
    from politicamente_etl_spark.operators import semistruct

    df = spark.createDataFrame(
        [
            Row(id=1, props='{"k": 5, "tags": ["a", "b"]}'),
            Row(id=2, props='{"k": "not_an_int"}'),
            Row(id=3, props="{broken json"),
        ]
    )
    v = semistruct.with_variant(df, "props")
    out = {
        r.id: r
        for r in semistruct.variant_fields(
            v, "v", {"k": ("$.k", "int"), "t0": ("$.tags[0]", "string")}
        ).collect()
    }
    assert out[1].k == 5 and out[1].t0 == "a"
    assert out[2].k is None          # uncastable → NULL, not an error
    assert out[3].k is None          # malformed JSON → NULL variant


def test_variant_schema_profile_detects_drift(spark):
    from politicamente_etl_spark.operators import semistruct

    rows = [Row(props='{"k": %d}' % i) for i in range(5)]
    rows += [Row(props='{"k": 1, "new_field": "x"}')]  # drifted shape
    v = semistruct.with_variant(spark.createDataFrame(rows), "props")
    prof = semistruct.variant_schema_profile(v, "v").collect()
    assert prof[0].n_rows == 5  # dominant shape first
    assert len(prof) == 2
    assert "new_field" in prof[1].variant_schema


# ---------------------------------------------------------------------------
# z-ordered layout
# ---------------------------------------------------------------------------


def test_zorder_layout_gives_multi_column_file_locality(spark, tmp_path):
    """A selective filter on EITHER clustered column must touch a small
    fraction of the files — the data-skipping property the Morton curve
    buys. Compared against a hash-scattered layout where every file
    contains every value range."""
    from politicamente_etl_spark.sources.sinks import write_zordered

    n, files = 10_000, 16
    df = spark.range(n).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "scattered")
    write_zordered(df, zpath, cols=["x", "y"], n_files=files)
    df.repartition(files).write.parquet(spath)

    def files_touched(path, cond):
        return (
            spark.read.parquet(path)
            .filter(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    for cond in ["x < 10", "y < 10"]:
        z = files_touched(zpath, cond)
        s = files_touched(spath, cond)
        assert s >= files * 0.9          # scattered: value range in ~every file
        assert z <= files * 0.5          # clustered: a curve segment subset
    # row fidelity: nothing lost or duplicated
    assert spark.read.parquet(zpath).count() == n


# ---------------------------------------------------------------------------
# hot-bucket skew guard
# ---------------------------------------------------------------------------


def test_minhash_hot_bucket_cap_bounds_degenerate_corpora(spark):
    """1000 near-identical docs put ~n²/2 pairs through the band join;
    with the cap, the viral bucket is excluded entirely (those docs are
    exact-dedup's job) while distinct near-dup pairs elsewhere survive."""
    from politicamente_etl_spark.operators.dedup import minhash_near_dup_pairs

    viral = "the same viral boilerplate string repeated all over the corpus"
    rows = [Row(doc_id=i, text=viral) for i in range(300)]
    # one genuine small near-dup pair, disjoint vocabulary
    rows += [
        Row(doc_id=9001, text="alpha beta gamma delta epsilon zeta eta theta"),
        Row(doc_id=9002, text="alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(rows)

    uncapped = minhash_near_dup_pairs(df)
    assert uncapped.count() >= 300 * 299 // 2  # quadratic blowup is real

    capped = minhash_near_dup_pairs(df, hot_bucket_cap=50)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (9001, 9002) in got                 # real pair survives
    assert all(a >= 9000 for a, _ in got)      # viral bucket fully excluded


def test_zorder_quantile_bucketing_survives_skew(spark, tmp_path):
    """Under a heavy-tailed column, linear bucketing collapses most rows
    into one code (the outlier owns the range); quantile bucketing keeps
    locality on BOTH columns. Verified by the files-touched metric on the
    skewed layout."""
    from politicamente_etl_spark.sources.sinks import write_zordered

    n, files = 10_000, 16
    df = spark.range(n).select(
        # heavy tail: 99.99% of x in [0,100), one row at 10^9
        F.when(F.col("id") == 0, F.lit(1_000_000_000))
        .otherwise(F.col("id") % 100)
        .alias("x"),
        (F.col("id") / 100).cast("int").alias("y"),
    )
    qpath = str(tmp_path / "zq")
    write_zordered(df, qpath, cols=["x", "y"], n_files=files, bucketize="quantile")

    def files_touched(path, cond):
        return (
            spark.read.parquet(path)
            .filter(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    # selective filters on either column still prune most files
    assert files_touched(qpath, "x >= 10 AND x < 20") <= files * 0.5
    assert files_touched(qpath, "y < 10") <= files * 0.5
    assert spark.read.parquet(qpath).count() == n


def test_stats_approx_mode_matches_exact_on_small_data(spark):
    """On data far below the sketch's accuracy budget the approx modes
    agree with the exact ones — proving the swap is a drop-in."""
    rows = [Row(g="a", v=float(i)) for i in range(101)]
    rows.append(Row(g="a", v=1000.0))
    df = spark.createDataFrame(rows)
    exact = stats.mad_outliers(df, "g", "v", 3.0, approx=False).collect()
    apx = stats.mad_outliers(df, "g", "v", 3.0, approx=True).collect()
    assert {r.v for r in exact} == {r.v for r in apx} == {1000.0}

    h_exact = {r.bucket: r.n_rows for r in stats.equi_depth_histogram(
        spark.createDataFrame([Row(x=float(i)) for i in range(1000)]), "x", 10
    ).collect()}
    h_apx = {r.bucket: r.n_rows for r in stats.equi_depth_histogram(
        spark.createDataFrame([Row(x=float(i)) for i in range(1000)]), "x", 10,
        approx=True,
    ).collect()}
    assert sum(h_apx.values()) == 1000
    assert all(abs(h_apx[b] - h_exact[b]) <= 20 for b in h_exact)
