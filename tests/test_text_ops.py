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


def test_chunk_documents_windows_and_overlap(spark):
    toks = [f"t{i}" for i in range(1, 301)]  # 300 tokens
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id int, text string")
    chunks = sorted(
        text.chunk_documents(df, window=128, stride=96).collect(),
        key=lambda r: r.chunk_idx,
    )
    # 1 + ceil((300-128)/96) = 3 chunks, starts 1/97/193
    assert [r.chunk_idx for r in chunks] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in chunks] == [128, 128, 108]
    assert chunks[0].chunk_text.split(" ")[0] == "t1"
    assert chunks[1].chunk_text.split(" ")[0] == "t97"
    assert chunks[2].chunk_text.split(" ")[-1] == "t300"
    # consecutive chunks share window-stride = 32 tokens
    a = chunks[0].chunk_text.split(" ")
    b = chunks[1].chunk_text.split(" ")
    assert a[-32:] == b[:32]


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(7, "only four tokens here")], "doc_id int, text string")
    rows = text.chunk_documents(df, window=128, stride=96).collect()
    assert len(rows) == 1
    assert rows[0].chunk_idx == 0
    assert rows[0].n_chunk_tokens == 4
    assert rows[0].chunk_text == "only four tokens here"


def test_pack_sequences_cuts_at_budget(spark):
    from politicamente_etl_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, 60) for i in range(1, 11)], "doc_id int, n_tokens long"
    )
    packed = sampling.pack_sequences(df, budget=100, n_buckets=1).collect()
    by_order = sorted(packed, key=lambda r: (r.pack_order, r.doc_id))
    # single bucket: running sum 60,120,...,600 -> pack flips every other doc
    assert [r.cum_tokens for r in by_order] == [60 * i for i in range(1, 11)]
    assert [r.pack_id % (1 << 32) for r in by_order] == [
        (60 * i - 1) // 100 for i in range(1, 11)
    ]
    # every pack holds <= ceil(budget/doc_len) docs and ids are unique
    assert len({r.doc_id for r in packed}) == 10


def test_pack_sequences_greedy_caps_every_pack(spark):
    """mode='greedy': no pack exceeds the budget (the closed-form mode's
    2·budget-2 overflow is exactly what this mode removes); the walk is
    deterministic and single-doc-oversize still lands alone."""
    from collections import defaultdict

    from politicamente_etl_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, [60, 90, 30, 250][i % 4]) for i in range(1, 41)],
        "doc_id int, n_tokens long",
    )
    packed = sampling.pack_sequences(
        df, budget=200, n_buckets=4, mode="greedy"
    ).collect()
    assert len({r.doc_id for r in packed}) == 40
    totals = defaultdict(int)
    for r in packed:
        totals[r.pack_id] += r.n_tokens
    # 250-token docs exceed the budget alone; every other pack is capped
    assert all(t <= 200 or t == 250 for t in totals.values())
    # cum_tokens restarts inside each pack and ends at the pack total
    by_pack = defaultdict(list)
    for r in packed:
        by_pack[r.pack_id].append(r)
    for rows in by_pack.values():
        rows.sort(key=lambda r: (r.pack_order, r.doc_id))
        run = 0
        for r in rows:
            run += r.n_tokens
            assert r.cum_tokens == run
    # determinism across runs
    again = sampling.pack_sequences(
        df, budget=200, n_buckets=4, mode="greedy"
    ).collect()
    assert sorted((r.doc_id, r.pack_id) for r in again) == sorted(
        (r.doc_id, r.pack_id) for r in packed
    )


def test_redact_pii_literal(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org or see https://ex.org/a?b=1 now"),
            (2, "no pii here at all"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in text.redact_pii(df).collect()}
    assert rows[1].n_emails == 1 and rows[1].n_urls == 1
    assert rows[1].clean_text == "mail me at <EMAIL> or see <URL> now"
    assert rows[2].n_emails == 0 and rows[2].n_urls == 0
    assert rows[2].clean_text == "no pii here at all"


def test_unigram_logprob_scores_semantics(spark, sf_dir):
    """Bucket 1 = head (highest mean logprob); micro-nat sums are integral
    and every doc is scored exactly once."""
    from politicamente_etl_spark.operators.text import unigram_logprob_scores
    from politicamente_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = unigram_logprob_scores(docs).collect()
    assert len(out) == docs.count()
    assert {r.doc_id for r in out} == {r.doc_id for r in docs.select("doc_id").collect()}
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.quality_bucket, []).append(r.mean_logprob)
        # logprobs are negative; micro-nat sums must be too
        assert r.sum_lp_micro < 0 and r.mean_logprob < 0
    assert min(by_bucket[1]) >= max(by_bucket[max(by_bucket)])


def test_bigram_logprob_scores_hand_model(spark):
    """Two docs over a 3-doc corpus: the doc made of the corpus's dominant
    transitions outscores the doc using rare ones; values match the
    hand-computed MLE conditionals."""
    import math

    from pyspark.sql import Row
    from politicamente_etl_spark.operators.text import bigram_logprob_scores

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b a b a b"),   # transitions: ab,ba,ab,ba,ab
            Row(doc_id=1, text="a b a c"),        # ab, ba, ac
            Row(doc_id=2, text="c d"),            # cd
        ]
    )
    out = {r.doc_id: r for r in bigram_logprob_scores(docs).collect()}
    # corpus bigram counts: ab=4, ba=3, ac=1, cd=1 ; left counts: a=5 (4+1... )
    # left-context occurrences: 'a b'x4,'a c'x1 → a=5; 'b a'x3 → b=3; 'c d' → c=1
    lp = lambda c, l: round(math.log(c / l) * 1e6)
    d0 = 3 * lp(4, 5) + 2 * lp(3, 3)
    d1 = lp(4, 5) + lp(3, 3) + lp(1, 5)
    assert out[0].sum_lp_micro == d0 and out[0].n_bigrams == 5
    assert out[1].sum_lp_micro == d1 and out[1].n_bigrams == 3
    assert out[0].mean_logprob > out[1].mean_logprob
    assert out[2].sum_lp_micro == 0  # cd is c's only transition: ln(1)=0


def test_bigram_beats_unigram_on_word_salad(spark):
    """A shuffled doc with the SAME unigram profile as a structured one
    must score lower under the bigram LM — the signal unigrams miss."""
    from pyspark.sql import Row
    from politicamente_etl_spark.operators.text import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    phrase = "the quick brown fox jumps over the lazy dog"
    salad = "fox the over quick lazy jumps dog brown the"  # same multiset
    corpus = [Row(doc_id=i, text=phrase) for i in range(9)]
    corpus.append(Row(doc_id=99, text=salad))
    docs = spark.createDataFrame(corpus)

    uni = {r.doc_id: r.mean_logprob for r in unigram_logprob_scores(docs).collect()}
    assert abs(uni[0] - uni[99]) < 1e-9  # unigram LM can't tell them apart
    big = {r.doc_id: r.mean_logprob for r in bigram_logprob_scores(docs).collect()}
    assert big[0] > big[99]  # bigram LM can


def test_score_external_batch_with_backoff(spark):
    """External scoring: in-domain transitions use the bigram table,
    unseen transitions back off to unigram+penalty, fully-novel tokens
    bottom out — and n_backoff counts the model's blind spots."""
    import math

    from pyspark.sql import Row
    from politicamente_etl_spark.operators.text import (
        OOV_BACKOFF_PENALTY_MICRO,
        bigram_lm_tables,
        score_with_bigram_lm,
    )

    corpus = spark.createDataFrame(
        [Row(doc_id=i, text="a b a b a b") for i in range(3)]
    )
    bg_lp, uni_lp = bigram_lm_tables(corpus)

    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text="a b a b"),  # fully in-domain
            Row(doc_id=101, text="b b"),      # unseen transition, known token
            Row(doc_id=102, text="a zzz"),    # novel token
        ]
    )
    out = {r.doc_id: r for r in score_with_bigram_lm(batch, bg_lp, uni_lp).collect()}
    lp = lambda c, l: round(math.log(c / l) * 1e6)
    # corpus: bigrams ab x9 (a=9 lefts), ba x6 (b=6 lefts); unigrams a=9/18, b=9/18
    assert out[100].sum_lp_micro == 2 * lp(9, 9) + lp(6, 6) == 0
    assert out[100].n_backoff == 0
    assert out[101].sum_lp_micro == lp(9, 18) + OOV_BACKOFF_PENALTY_MICRO
    assert out[101].n_backoff == 1
    assert out[102].sum_lp_micro == 2 * OOV_BACKOFF_PENALTY_MICRO
    assert out[102].n_backoff == 1
    assert out[100].mean_logprob > out[101].mean_logprob > out[102].mean_logprob
