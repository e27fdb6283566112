"""Semantic unit tests for text operators on tiny literal data."""

from __future__ import annotations

from politicamente_etl_spark.operators import text


def test_winnowing_overlap_detects_copied_passage(spark):
    passage = "the quick brown fox jumps over the lazy dog near the river bank"
    df = spark.createDataFrame(
        [
            (1, "intro words here. " + passage + " and then some more A"),
            (2, "totally different opening! " + passage + " closing remarks B"),
            (3, "unrelated content about spark shuffles and parquet row groups"),
        ],
        "doc_id int, text string",
    )
    pairs = text.winnowing_overlap_pairs(df, k=8, w=4, min_common=5).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    r = pairs[0]
    assert r.n_common >= 5
    assert 0.0 < r.overlap <= 1.0


def test_dedup_cluster_report_accounting(spark):
    from pyspark.sql import functions as F

    from politicamente_etl_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaaa"), (3, "bb"), (4, "cccc"), (5, "cc")],
        "doc_id int, text string",
    )
    # cluster {1,2} keeps 1; cluster {4,5} keeps 4; 3 is a singleton
    clusters = spark.createDataFrame(
        [(1, 1, 1), (2, 1, 0), (3, 3, 1), (4, 4, 1), (5, 4, 0)],
        "doc_id int, cluster_id int, is_canonical int",
    )
    rep = {
        r.cluster_id: r
        for r in dedup.dedup_cluster_report(docs, clusters).collect()
    }
    assert set(rep) == {1, 4}  # singletons excluded
    assert (rep[1].n_docs, rep[1].chars_total, rep[1].chars_kept) == (2, 10, 4)
    assert rep[1].chars_dropped == 6
    assert (rep[4].n_docs, rep[4].chars_kept, rep[4].chars_dropped) == (2, 4, 2)


def test_cross_split_contamination_counts(spark):
    from politicamente_etl_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "train", "a b c d e"),
            (2, "test", "a b c x y z"),  # shares shingle "a b c" with train
            (3, "test", "p q r s"),  # clean
        ],
        "doc_id int, split string, text string",
    )
    rows = {r.doc_id: r for r in dedup.cross_split_contamination(docs).collect()}
    assert set(rows) == {2, 3}
    assert (rows[2].n_grams, rows[2].n_contaminated) == (4, 1)
    assert rows[2].contamination == 0.25
    assert (rows[3].n_grams, rows[3].n_contaminated) == (2, 0)
    assert rows[3].contamination == 0.0


def test_winnowing_overlap_short_docs_empty(spark):
    # shorter than one k-gram window -> empty fingerprint set, no pairs
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id int, text string"
    )
    assert text.winnowing_overlap_pairs(df, k=8, w=4, min_common=1).count() == 0
