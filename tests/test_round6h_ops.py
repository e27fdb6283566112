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
