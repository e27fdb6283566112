"""Round-6 batch 7 operator tests: BPE merge application. Oracle parity
via driver_sim / parity_check; these pin the leftmost-greedy fold
semantics on constructed vocabularies."""

from __future__ import annotations

from politicamente_etl_spark.operators.text import apply_bpe_merge_and_recount


def _counts(spark, texts, a, b):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return {
        r["pair"]: (r["n_occurrences"], r["n_vocab_positions"])
        for r in apply_bpe_merge_and_recount(df, a, b, top_k=50).collect()
    }


def test_bpe_merge_applied_then_recounted(spark):
    # 'herd' -> h, er, d after merging (e, r): pairs h+er and er+d.
    out = _counts(spark, ["herd herd", "herd x"], "e", "r")
    assert out["h+er"] == (3, 1)
    assert out["er+d"] == (3, 1)
    assert "e+r" not in out  # consumed by the merge


def test_bpe_merge_leftmost_greedy_on_runs(spark):
    # 'aaa' under (a, a): leftmost-greedy gives [aa, a] -> one aa+a pair,
    # never a+aa (the right-associative parse).
    out = _counts(spark, ["aaa"], "a", "a")
    assert out == {"aa+a": (1, 1)}
    # 'aaaa' -> [aa, aa]
    out4 = _counts(spark, ["aaaa"], "a", "a")
    assert out4 == {"aa+aa": (1, 1)}


def test_bpe_merge_fully_merged_words_drop_out(spark):
    # 'er' becomes a single symbol -> contributes no pair rows at all.
    out = _counts(spark, ["er er er ab"], "e", "r")
    assert out == {"a+b": (1, 1)}


def test_bpe_merge_untouched_words_count_plain_pairs(spark):
    out = _counts(spark, ["dog dog"], "e", "r")
    assert out["d+o"] == (2, 1) and out["o+g"] == (2, 1)
