"""Property-based tests (hypothesis) for the operators whose semantics have
sharp edges: keep-first dedup determinism, as-of join bounds, sink algebra
set semantics, and salted-join equivalence.

Each property drives the Spark operator with small generated frames and
checks it against an independent Python-computed model — the same
role the DuckDB oracle plays for the catalog queries, but over adversarial
inputs (duplicate keys, equal timestamps, empty sides) rather than the
fixed testdata distribution.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(0, 4),  # key — few values → collisions guaranteed
        st.integers(-100, 100),  # tiebreak / value
        st.integers(0, 50),  # payload
    ),
    min_size=0,
    max_size=25,
)


@given(data=rows)
@settings(**SETTINGS)
def test_dedup_keep_first_matches_model(spark, data):
    """dedup_keep_first == take the row with the smallest (order, payload)
    per key — deterministic regardless of input order or partitioning."""
    from politicamente_etl_spark.operators.core import dedup_keep_first

    df = spark.createDataFrame(data or [(0, 0, 0)], ["k", "ord", "v"])
    if not data:
        df = df.limit(0)
    got = {
        (r.k, r.ord, r.v)
        for r in dedup_keep_first(df, ["k"], [F.col("ord"), F.col("v")]).collect()
    }
    model = {}
    for k, o, v in sorted(data, key=lambda t: (t[1], t[2])):
        model.setdefault(k, (k, o, v))
    assert got == set(model.values())


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 9)),
        min_size=0,
        max_size=15,
    ),
)
@settings(**SETTINGS)
def test_asof_join_matches_model(spark, left, right):
    """asof_join attaches max(right_ts) with right_ts <= left_ts per key —
    including the equal-timestamp boundary and missing-key None."""
    from politicamente_etl_spark.operators.temporal import asof_join

    # de-dup right on (key, ts): keep max payload, so the model is unique
    rmap = {}
    for k, ts, p in right:
        rmap[(k, ts)] = max(rmap.get((k, ts), -1), p)
    right_rows = [(k, ts, p) for (k, ts), p in rmap.items()]

    ldf = spark.createDataFrame(left, ["k", "lts"])
    rdf = spark.createDataFrame(right_rows or [(0, 0, 0)], ["k", "rts", "p"])
    if not right_rows:
        rdf = rdf.limit(0)
    out = asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts")
    got = sorted((r.k, r.lts, r.asof_ts, r.asof_p) for r in out.collect())

    model = []
    for k, lts in left:
        cands = [(ts, p) for (kk, ts), p in rmap.items() if kk == k and ts <= lts]
        ts, p = max(cands) if cands else (None, None)
        model.append((k, lts, ts, p))
    assert got == sorted(model)


@given(
    existing=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), max_size=12),
    new=st.lists(st.tuples(st.integers(0, 5), st.integers(10, 19)), max_size=12),
)
@settings(**SETTINGS)
def test_sink_algebra_set_semantics(spark, existing, new):
    """upsert: new wins per key, others survive. insert_if_absent: existing
    wins, only genuinely new keys append (deterministically deduped)."""
    from politicamente_etl_spark.sources.sinks import insert_if_absent, upsert

    e = spark.createDataFrame(existing or [(0, 0)], ["k", "v"])
    n = spark.createDataFrame(new or [(0, 0)], ["k", "v"])
    if not existing:
        e = e.limit(0)
    if not new:
        n = n.limit(0)

    up = {(r.k, r.v) for r in upsert(e, n, ["k"]).collect()}
    new_keys = {k for k, _ in new}
    model_up = {(k, v) for k, v in existing if k not in new_keys} | set(new)
    assert up == model_up

    ins = [(r.k, r.v) for r in insert_if_absent(e, n, ["k"]).collect()]
    ex_keys = {k for k, _ in existing}
    fresh = {}
    for k, v in sorted(new, key=lambda t: (t[0], t[1])):
        if k not in ex_keys:
            fresh.setdefault(k, (k, v))
    # existing rows pass through with multiplicity; fresh keys append once
    assert sorted(ins) == sorted(existing + list(fresh.values()))


def test_salted_join_equals_plain_join(spark):
    """salted_join must return exactly the plain join's rows, with the hot
    key spread across salts."""
    from politicamente_etl_spark.operators.joins import salted_join

    # one hot key (0) with 500 rows, plus a uniform tail
    facts = spark.range(600).select(
        F.when(F.col("id") < 500, 0).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(7)], ["k", "name"])
    plain = {(r.k, r.payload, r.name) for r in facts.join(dim, "k").collect()}
    salted = {
        (r.k, r.payload, r.name)
        for r in salted_join(facts, dim, ["k"], n_salts=4).collect()
    }
    assert salted == plain


def test_quality_score_udf_equals_expression(spark, sf_dir):
    """§2.8: the Arrow pandas_udf twin must agree with the JVM expression
    path bit-for-bit on real documents."""
    from politicamente_etl_spark.operators.text import (
        quality_score,
        quality_score_pandas_udf,
    )
    from politicamente_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expr_rows = {
        r.doc_id: r.quality_score
        for r in docs.select("doc_id", quality_score("text")).collect()
    }
    udf = quality_score_pandas_udf()
    udf_rows = {
        r.doc_id: r.q
        for r in docs.select("doc_id", udf("text").alias("q")).collect()
    }
    assert expr_rows == udf_rows


edge_lists = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=0,
    max_size=20,
)


@given(edges=edge_lists)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_near_dup_clusters_matches_union_find(spark, edges):
    """near_dup_clusters == union-find connected components: cluster_id is
    the min node of the component, one canonical row per cluster —
    regardless of edge order, duplicate edges, or self-loops."""
    from politicamente_etl_spark.operators.dedup import near_dup_clusters

    nodes = list(range(15))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in nodes}

    docs = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
    # operator contract: pairs have doc_a < doc_b; drop self-loops like a
    # threshold filter would
    pairs_data = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    pairs = (
        spark.createDataFrame(pairs_data, "doc_a long, doc_b long")
        if pairs_data
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(docs, pairs).collect()
    }
    assert got == expect


# word pool small enough to force shared shingles and hot tokens
_words = st.sampled_from(["a", "b", "c", "d", "e"])
_docs = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join),
    min_size=0,
    max_size=10,
)


@given(texts=_docs)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_filter_is_lossless(spark, texts):
    """jaccard_pairs_prefix_filter must emit EXACTLY the pairs the plain
    inverted-index join emits — prefix pruning is a candidate superset,
    never a filter on true pairs. Adversarial inputs: tiny vocab (every
    token is hot), duplicate docs, empty docs, sets of size 1 (prefix
    length boundary: p = n - ceil(t*n) + 1 with n*t at exact multiples)."""
    from politicamente_etl_spark.operators import dedup

    df = spark.createDataFrame(
        list(enumerate(texts)) or [(0, "")], ["doc_id", "text"]
    )
    if not texts:
        df = df.limit(0)
    brute = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.4).collect()
    }
    pruned = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in dedup.jaccard_pairs_prefix_filter(df, t_num=2, t_den=5).collect()
    }
    assert pruned == brute


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 9)),
        min_size=0,
        max_size=15,
    ),
    tol=st.one_of(st.none(), st.integers(0, 12)),
)
@settings(**SETTINGS)
def test_asof_join_forward_tolerance_matches_model(spark, left, right, tol):
    """Forward direction: min(right_ts) with right_ts >= left_ts per key;
    tolerance nulls matches farther than the bound — checked against a
    brute-force model including the equal-ts boundary."""
    from politicamente_etl_spark.operators.temporal import asof_join

    rmap = {}
    for k, ts, p in right:
        rmap[(k, ts)] = max(rmap.get((k, ts), -1), p)
    right_rows = [(k, ts, p) for (k, ts), p in rmap.items()]

    ldf = spark.createDataFrame(left, ["k", "lts"])
    rdf = spark.createDataFrame(right_rows or [(0, 0, 0)], ["k", "rts", "p"])
    if not right_rows:
        rdf = rdf.limit(0)
    out = asof_join(
        ldf,
        rdf,
        on="k",
        left_ts="lts",
        right_ts="rts",
        direction="forward",
        tolerance=None if tol is None else F.lit(tol),
    )
    got = sorted((r.k, r.lts, r.asof_ts, r.asof_p) for r in out.collect())

    model = []
    for k, lts in left:
        cands = [(ts, p) for (kk, ts), p in rmap.items() if kk == k and ts >= lts]
        ts, p = min(cands) if cands else (None, None)
        if tol is not None and ts is not None and ts - lts > tol:
            ts, p = None, None
        model.append((k, lts, ts, p))
    assert got == sorted(model)


@given(
    dim=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-50, 50)),
        min_size=0, max_size=12, unique_by=lambda t: t[0],
    ),
    upd=st.lists(
        st.tuples(st.integers(0, 8), st.integers(-50, 50)),
        min_size=0, max_size=8, unique_by=lambda t: t[0],
    ),
)
@settings(**SETTINGS)
def test_scd2_merge_matches_model_and_is_idempotent(spark, dim, upd):
    """scd2_merge == the per-key model (close-and-open on change, no-op on
    equal, insert on new), AND re-applying the same batch to the merged
    result changes nothing (idempotence — the property a retried MERGE
    job needs)."""
    from politicamente_etl_spark.operators.joins import scd2_merge

    cur = spark.createDataFrame(
        [(k, float(v), 0, True) for k, v in dim] or [(0, 0.0, 0, True)],
        ["k", "bal", "version", "is_current"],
    )
    if not dim:
        cur = cur.limit(0)
    updates = spark.createDataFrame(
        [(k, float(v)) for k, v in upd] or [(0, 0.0)], ["k", "bal"]
    )
    if not upd:
        updates = updates.limit(0)

    merged = scd2_merge(cur, updates, ["k"], ["bal"], batch_id=1)
    got = {(r.k, r.bal, r.version, r.is_current) for r in merged.collect()}

    model = set()
    upd_map = dict(upd)
    dim_keys = {k for k, _ in dim}
    for k, v in dim:
        v = float(v)
        u = upd_map.get(k)
        if u is not None and float(u) != v:
            model.add((k, v, 0, False))
            model.add((k, float(u), 1, True))
        else:
            model.add((k, v, 0, True))
    for k, u in upd:
        if k not in dim_keys:
            model.add((k, float(u), 1, True))
    assert got == model

    again = scd2_merge(merged, updates, ["k"], ["bal"], batch_id=2)
    got2 = {(r.k, r.bal, r.version, r.is_current) for r in again.collect()}
    assert got2 == got  # same batch re-applied → no new versions


@given(
    vals=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    n_buckets=st.integers(2, 6),
)
@settings(**SETTINGS)
def test_equi_depth_histogram_partitions_all_rows(spark, vals, n_buckets):
    """Bucket counts always sum to the row count (no row dropped or
    double-counted), and bucket value ranges never overlap."""
    from politicamente_etl_spark.operators.stats import equi_depth_histogram

    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    out = sorted(
        equi_depth_histogram(df, "x", n_buckets).collect(),
        key=lambda r: r.bucket,
    )
    assert sum(r.n_rows for r in out) == len(vals)
    for a, b in zip(out, out[1:]):
        assert a.max_v <= b.min_v


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),      # user
            st.integers(0, 100),    # minutes offset (ties allowed)
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=0, max_size=30,
    )
)
@settings(**SETTINGS)
def test_event_transitions_conserve_hops(spark, events):
    """Total hops == sum over users of (len(stream) - 1); per-source rows
    normalize to 1."""
    import datetime

    from politicamente_etl_spark.operators.stats import event_transitions

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (u, t0 + datetime.timedelta(minutes=m), i, typ)
        for i, (u, m, typ) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows or [(0, t0, 0, "a")], ["user_id", "ts", "event_id", "event_type"]
    )
    if not rows:
        df = df.limit(0)
    out = event_transitions(df).collect()
    from collections import Counter

    per_user = Counter(u for u, _, _ in events)
    expect_hops = sum(n - 1 for n in per_user.values() if n > 0)
    assert sum(r.n_hops for r in out) == expect_hops
    by_cur: dict[str, float] = {}
    for r in out:
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p_hop
    for total in by_cur.values():
        assert abs(total - 1.0) < 1e-9
