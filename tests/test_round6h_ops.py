"""Round-6 batch 9 tests: JSONL round-trip fidelity on hostile text and
the LOO-perplexity count identity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_jsonl_roundtrip_hostile_text(spark, tmp_path):
    rows = [
        (1, 'he said "hi"\tthen left', "a"),
        (2, "backslash \\ and slash /", "a"),
        (3, "unicode: café 中文", "b"),
        (4, "", "b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    path = str(tmp_path / "jl")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema("doc_id long, text string, source string").json(
        path
    )
    got = {(r["doc_id"], r["text"], r["source"]) for r in back.collect()}
    assert got == set(rows)


def test_loo_identity_matches_explicit_exclusion(spark):
    # LOO counts derived via (corpus - own) must equal retraining on the
    # complement explicitly.
    rows = [("a", "x x y"), ("b", "x z"), ("c", "y z z")]
    docs = spark.createDataFrame(rows, ["source", "text"])
    toks = docs.select(
        F.col("source").alias("g"), F.explode(F.split("text", " ")).alias("t")
    )
    pdf = toks.groupBy("g", "t").count().collect()
    from collections import defaultdict

    c_gw = {(r["g"], r["t"]): r["count"] for r in pdf}
    c_w = defaultdict(int)
    n_g = defaultdict(int)
    for (g, t), c in c_gw.items():
        c_w[t] += c
        n_g[g] += c
    n_tot = sum(c_w.values())
    for (g, t), c in c_gw.items():
        held_out_count = sum(
            cc for (gg, tt), cc in c_gw.items() if tt == t and gg != g
        )
        held_out_total = sum(cc for (gg, _), cc in c_gw.items() if gg != g)
        assert c_w[t] - c == held_out_count
        assert n_tot - n_g[g] == held_out_total


def test_dup_span_merges_overlapping_grams(spark):
    from politicamente_etl_spark.operators.dedup import duplicated_span_report

    # two docs share a 7-token run -> duplicated 5-gram starts at p, p+1,
    # p+2 in each; the three overlapping grams must merge to ONE span of
    # exactly 7 tokens, not 15.
    shared = "q w e r t y u"
    rows = [
        (1, f"a b {shared} c d"),
        (2, f"x {shared} z z2 z3"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in duplicated_span_report(df).collect()}
    assert out[1]["n_spans"] == 1 and out[1]["dup_tokens"] == 7
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 7
    assert out[1]["n_tokens"] == 11


def test_dup_span_distant_repeats_two_spans(spark):
    from politicamente_etl_spark.operators.dedup import duplicated_span_report

    run = "a b c d e"
    filler = " ".join(f"f{i}" for i in range(8))
    rows = [(1, f"{run} {filler} {run}"), (2, run)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in duplicated_span_report(df).collect()}
    # doc 1 carries the run twice, separated by unique filler -> 2 spans
    assert out[1]["n_spans"] == 2 and out[1]["dup_tokens"] == 10
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 5


def test_remove_spans_guarantees_no_repeated_gram(spark):
    from politicamente_etl_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    shared = "q w e r t y u"
    rows = [
        (1, f"a b {shared} c d"),
        (2, f"x {shared} z z2 z3"),
        (3, "totally unique words only here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df).collect()}
    assert out[1]["kept_tokens"] == 4  # a b c d survive
    assert out[2]["kept_tokens"] == 4  # x z z2 z3 survive
    assert out[3]["kept_tokens"] == 5  # untouched
    # untouched doc keeps its original fingerprint
    import hashlib

    assert out[3]["clean_digest"] == hashlib.md5(
        b"totally unique words only here"
    ).hexdigest()
    assert out[1]["clean_digest"] == hashlib.md5(b"a b c d").hexdigest()
