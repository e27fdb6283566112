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


def test_winnowing_overlap_short_docs_empty(spark):
    # shorter than one k-gram window -> empty fingerprint set, no pairs
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id int, text string"
    )
    assert text.winnowing_overlap_pairs(df, k=8, w=4, min_common=1).count() == 0
