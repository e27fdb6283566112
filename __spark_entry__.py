"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``politicamente_etl_spark``; this module only
adapts the query catalog (plans/catalog.py + plans/extended.py) to the
driver's three-function surface.

Round-1 observation (VERDICT.md): the driver emitted correctness rows for
exactly the first 50 dict entries, leaving 45 registered queries with no
driver signal. ``queries()`` therefore orders entries by verification
priority: everything WITHOUT a green round-1 row first (45 untested +
3 events-loader errors), then the round-1-green queries (still covered by
tests/driver_sim.py + tests/test_oracle_parity.py every round), most
important first. The goal is that across rounds every catalog entry gets
at least one driver correctness row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from politicamente_etl_spark.plans.catalog import CATALOG

# Names with a green CORRECTNESS_r01.json row (46 hash-match passes + the
# by-design rows-only ml_minhash_lsh_pairs). Everything else sorts first.
R1_VERIFIED: frozenset[str] = frozenset(
    {
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
    }
)


def _ordered_names() -> list[str]:
    """Unverified queries first (catalog order preserved within each
    group), then the round-1-green ones."""
    front = [n for n in CATALOG if n not in R1_VERIFIED]
    back = [n for n in CATALOG if n in R1_VERIFIED]
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
