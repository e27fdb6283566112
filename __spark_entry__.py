"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``politicamente_etl_spark``; this module only
adapts the query catalog (plans/catalog.py + plans/extended.py) to the
driver's three-function surface.

Driver-window rotation (VERDICT r1/r2): the driver emits correctness rows
for exactly the first 50 dict entries. ``queries()`` therefore orders by
verification priority: (a) everything without a green driver row from any
prior round, plus (b) verified queries whose OPERATOR CODE was refactored
this round (a regression there must surface as a driver row, not only in
local parity tests), then (c) the parked verified-and-untouched queries —
still covered by tests/driver_sim.py + tests/test_oracle_parity.py every
round. Goal: every catalog entry keeps ≥1 driver row across rounds and no
refactor ships unwatched.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from politicamente_etl_spark.plans.catalog import CATALOG

# Names with a green driver CORRECTNESS row: CORRECTNESS_r01.json (46
# hash-match + by-design rows-only ml_minhash_lsh_pairs) ∪
# CORRECTNESS_r02.json (48 hash-match + by-design rows-only approx_aggs).
# json_props_map_explode is deliberately absent: its r2 row was red
# (DuckDB HUGEINT dtype artifact — oracle SQL fixed this round) and it
# must re-enter the window.
VERIFIED: frozenset[str] = frozenset(
    {
        # --- round 1 ---
        "flagship_revenue_rollup",
        "project_cast",
        "distinct_projection",
        "dedup_keep_first",
        "union_all_scan",
        "join_dim_single_key",
        "join_composite_key_missdrop",
        "join_derived_key_elections",
        "anti_join_absent",
        "sum_status_by_key",
        "join_update_acctbal",
        "update_match_accounting",
        "election_date_derive",
        "key_synthesis_concat",
        "upsert_merge",
        "insert_if_absent",
        "text_stats",
        "token_count_regex",
        "lang_id_heuristic",
        "doc_fingerprint",
        "winnowing_fingerprints",
        "winnowing_overlap_pairs",
        "top_terms",
        "repetition_ratio",
        "tfidf_top_terms",
        "exact_dedup_docs",
        "minhash_signatures",
        "minhash_near_dup_pairs",
        "ngram_jaccard_pairs",
        "jaccard_pairs_prefix_filter",
        "near_dup_clusters",
        "dedup_cluster_report",
        "train_test_contamination",
        "chunk_documents",
        "redact_pii_docs",
        "pack_sequences",
        "dataset_hash_split",
        "stratified_sample_docs",
        "simhash_signatures",
        "simhash_near_dup_pairs",
        "ml_minhash_lsh_pairs",
        "rollup_orders",
        "cube_customer_segments",
        "profile_orders",
        "multimodal_features",
        "cosine_topk",
        "embedding_group_centroids",
        # --- round 2 ---
        "asof_join_purchases",
        "range_join_value_bands",
        "pivot_event_counts",
        "cosine_topk_lsh",
        "cosine_topk_ivf",
        "embedding_cosine_near_dup",
        "embedding_cosine_near_dup_lsh",
        "retention_cohorts",
        "json_props_extract",
        "events_tumbling_window",
        "events_sessionization",
        "window_running_totals",
        "customer_value_deciles",
        "intersect_active_rich_customers",
        "except_rich_inactive_customers",
        "date_math_orders",
        "funnel_signup_purchase",
        "window_topk_orders",
        "streaming_tumbling_window",
        "streaming_sliding_window",
        "streaming_session_window",
        "streaming_dedup_count",
        "quality_score_docs",
        "streaming_enrich_join",
        "streaming_stateful_counts",
        "semi_join_fulfilled_orders",
        "full_outer_nation_reconcile",
        "salted_join_segment_counts",
        "grouping_sets_orders",
        "exact_percentiles_quantity",
        "text_normalize",
        "small_quantity_orders",
        "large_order_customers",
        "pricing_summary",
        "shipping_priority_top10",
        "approx_aggs",
        "grouped_moments",
        "argmax_order_per_customer",
        "doc_length_histogram",
        "bigram_top_terms",
        "zscore_outlier_events",
        "inverted_index_postings",
        "rolling_7day_order_totals",
        "unpivot_lineitem_metrics",
        "incremental_dedup_new_docs",
        "corpus_admission_report",
        "streaming_interval_join",
        "unigram_logprob_quality",
        "minhash_incremental_pairs",
    }
)

# Verified queries whose operator implementation changed THIS round —
# parked status is 'verified AND untouched since'; these stay in the front
# window one more round so a refactor regression gets a driver row
# (ADVICE.md r2, last item). The window holds exactly 50; registering the
# four late-r3 queries (bigram LM ×2, VARIANT ×2 — never driver-checked,
# so they take priority) forced four of the seven refactored entries back
# to the parked group. The four parked ones are the lowest-risk refactors
# with an independent driver-side signal: flagship_revenue_rollup is also
# the entry() smoke check AND a bench headliner; events_tumbling_window's
# UTC pin is probed by tests/driver_sim.py under a hostile TZ;
# cosine_topk_ivf's change was a pure helper extraction; and
# minhash_near_dup_pairs' new hot_bucket_cap branch is opt-in (default
# path byte-identical, covered by test_plan_quality).
REFACTORED_THIS_ROUND: frozenset[str] = frozenset(
    {
        "minhash_incremental_pairs",  # dedup.minhash_cross_pairs: narrow band exchange + signature re-join
        "unigram_logprob_quality",  # text.unigram_logprob_scores: un-forced vocab join + scale-bucket mode
        "embedding_cosine_near_dup",  # sim.cosine_near_dup_pairs: short-circuit limit() guard
    }
)


def _ordered_names() -> list[str]:
    """Never-verified + refactored-this-round first (catalog order
    preserved within each group), then the parked verified queries."""
    front = [
        n
        for n in CATALOG
        if n not in VERIFIED or n in REFACTORED_THIS_ROUND
    ]
    back = [
        n for n in CATALOG if n in VERIFIED and n not in REFACTORED_THIS_ROUND
    ]
    return front + back


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1) on /root/testdata/sf0.001."""
    return CATALOG["flagship_revenue_rollup"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    return {name: CATALOG[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; entries with no SQL (approximate /
    streaming-stateful ops) are omitted → driver runs rows-only checks."""
    return {
        name: CATALOG[name].sql
        for name in _ordered_names()
        if CATALOG[name].sql is not None
    }
