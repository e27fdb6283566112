"""Round-3 operators: semantic invariants + physical-plan pins for the
corpus-quality filters, TPC-H-style relational shapes, temporal bars, and
embedding retrieval extras. Oracle-parity is covered by driver_sim /
test_oracle_parity; these tests pin what the oracle can't see — plan
shapes and cross-operator invariants."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.plans.catalog import CATALOG


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def q(name, spark, sf_dir):
    return CATALOG[name].fn(spark, sf_dir)


# -- corpus quality filters -------------------------------------------------


def test_gopher_report_zero_shuffle_and_flag_consistency(spark, sf_dir):
    """The admission report must be scan → project (no Exchange at all),
    and `admitted` must equal the conjunction of its flags."""
    df = q("gopher_quality_report", spark, sf_dir)
    assert "Exchange" not in plan_of(df)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.admitted == (
            r.ok_word_count
            and r.ok_mean_word_len
            and r.ok_unique_frac
            and r.has_stopword
        )
        assert 0.0 < r.unique_frac <= 1.0


def test_top_bigram_fraction_bounds(spark, sf_dir):
    rows = q("top_bigram_repetition", spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.top_bigram_n <= r.n_bigrams
        assert 0.0 < r.top_bigram_frac <= 1.0


def test_temperature_weights_normalize(spark, sf_dir):
    rows = q("temperature_mix_weights", spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    # T=2 flattens: every upweighted stratum is a below-average-share one
    n = len(rows)
    for r in rows:
        if r.share < 1.0 / n:
            assert r.weight > r.share


def test_edit_distance_runs_only_on_candidates(spark, sf_dir):
    """The Levenshtein verifier joins texts onto LSH candidates via
    equi-joins — no cartesian anywhere."""
    df = q("near_dup_edit_distance", spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    for r in rows:
        assert r.edit_distance >= 0
        # est_jaccard == 1.0 pairs are (near-)identical → tiny prefix edits
        if r.est_jaccard == 1.0:
            assert r.edit_distance <= 40


# -- relational shapes ------------------------------------------------------


def test_discounted_revenue_pushdown_single_exchange(spark, sf_dir):
    """Q6 shape: quantity/discount predicates reach the parquet scan and
    the whole query costs one exchange (the partial→final agg)."""
    plan = plan_of(q("discounted_revenue", spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters", 1)[1][:400]
    assert plan.count(") Exchange") == 1


def test_promo_share_broadcasts_part(spark, sf_dir):
    plan = plan_of(q("promo_revenue_share", spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_order_priority_semi_join(spark, sf_dir):
    """Q4 shape: EXISTS must plan a LeftSemi hash join on the equi key
    (inequality as residual) — no cartesian."""
    plan = plan_of(q("order_priority_followups", spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_returned_items_take_ordered(spark, sf_dir):
    plan = plan_of(q("returned_items_top_customers", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_top_supplier_no_global_sort(spark, sf_dir):
    """Q15 shape: the argmax-by-aggregate must come from a 1-row max
    broadcast back, never a global Sort of the aggregate."""
    plan = plan_of(q("top_supplier_revenue", spark, sf_dir))
    assert "CartesianProduct" not in plan  # 1-row max is BNLJ-broadcast
    tree = plan.split("\n\n")[0]
    assert "Sort " not in tree


def test_local_supplier_volume_no_cartesian(spark, sf_dir):
    plan = plan_of(q("local_supplier_volume", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_small_quantity_integer_predicate(spark, sf_dir):
    """Q17 shape: one row out, and the value matches the float-threshold
    formulation (the integer rewrite is exactly qty < 0.2·avg)."""
    row = q("small_quantity_revenue", spark, sf_dir).collect()[0]
    assert row.n_small >= 0
    if row.n_small:
        assert row.avg_yearly > 0


# -- temporal ---------------------------------------------------------------


def test_ohlc_invariants(spark, sf_dir):
    rows = q("events_ohlc_bars", spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1
        assert r.bar_start_epoch % 3600 == 0


def test_order_gaps_lag_semantics(spark, sf_dir):
    rows = q("customer_order_gaps", spark, sf_dir).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    nulls = sum(1 for r in rows if r.gap_days is None)
    assert nulls == len(by_cust)  # exactly one first-order row per customer
    assert all(r.gap_days >= 0 for r in rows if r.gap_days is not None)


# -- embedding retrieval ----------------------------------------------------


def test_mips_topk_window_group_limit(spark, sf_dir):
    plan = plan_of(q("mips_topk", spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_knn_label_vote_one_row_per_query(spark, sf_dir):
    rows = q("knn_label_vote", spark, sf_dir).collect()
    assert len(rows) == len({r.query_id for r in rows})
    for r in rows:
        assert 1 <= r.n_votes <= 10
        # the query vector itself is its own nearest neighbor, so the
        # majority label can't lose to the query's own label by much
        assert r.pred_label is not None


def test_ann_recall_bounds_and_self_hit(spark, sf_dir):
    rows = q("ann_recall_report", spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # the query itself is in both top-k lists → recall ≥ 0.1
        assert 1 <= r.n_overlap <= 10
        assert abs(r.recall_at_10 - r.n_overlap / 10.0) < 1e-12
