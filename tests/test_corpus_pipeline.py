"""End-to-end test of the stateful corpus-ingest pipeline
(politicamente_etl_spark/corpus.py): init from a seed corpus, ingest a
crafted batch, check every verdict class, confirm the state tables grow
by exactly the admitted set, and prove idempotence (re-ingesting the same
batch admits nothing)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from politicamente_etl_spark import corpus
from politicamente_etl_spark.sources.readers import load_table


def _long_text(seed: str, n: int = 40) -> str:
    toks = [f"{seed}{i % 7}tok{i}" for i in range(n)]
    return " ".join(toks)


@pytest.fixture(scope="module")
def root(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus_root"))
    seed = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .filter("doc_id < 40")
    )
    corpus.init_corpus(spark, path, seed)
    return path


def test_ingest_batch_verdict_classes(spark, sf_dir, root):
    seed_rows = {
        r.doc_id: r
        for r in spark.read.parquet(f"{root}/docs").collect()
    }
    exact_dup_text = seed_rows[3].text
    # near-dup: corpus doc with its last token altered → most shingles
    # (and thus minhash bands) survive, digest does not
    toks = seed_rows[5].text.split(" ")
    toks[-1] = "zzznovel"
    near_dup_text = " ".join(toks)

    batch = spark.createDataFrame(
        [
            Row(doc_id=1001, text=exact_dup_text, source="batch"),
            Row(doc_id=1002, text=near_dup_text, source="batch"),
            Row(doc_id=1003, text="way too short", source="batch"),
            Row(doc_id=1004, text=" ".join(["loop the same phrase"] * 20), source="batch"),
            Row(doc_id=1005, text=_long_text("freshA"), source="batch"),
            Row(doc_id=1006, text=_long_text("freshB"), source="batch"),
            # same fresh content twice in one batch → keep-first
            Row(doc_id=1007, text=_long_text("freshC"), source="batch"),
            Row(doc_id=1008, text=_long_text("freshC"), source="batch"),
        ]
    )
    n_docs_before = spark.read.parquet(f"{root}/docs").count()
    report = {r.doc_id: r.verdict for r in corpus.ingest_batch(spark, root, batch).collect()}

    assert report[1001] == "duplicate"
    assert report[1002] == "near_duplicate"
    assert report[1003] == "too_short"
    assert report[1004] == "repetitive"
    assert report[1005] == "admitted"
    assert report[1006] == "admitted"
    assert report[1007] == "admitted"       # first of the within-batch pair
    assert report[1008] == "duplicate_batch"

    docs_after = spark.read.parquet(f"{root}/docs")
    assert docs_after.count() == n_docs_before + 3
    # signature table stays in lockstep with the docs table
    assert spark.read.parquet(f"{root}/signatures").count() == docs_after.count()


def test_reingest_is_idempotent(spark, root):
    """The same batch re-submitted admits nothing: everything previously
    admitted is now an exact corpus duplicate."""
    batch = spark.createDataFrame(
        [
            Row(doc_id=2005, text=_long_text("freshA"), source="batch"),
            Row(doc_id=2006, text=_long_text("freshB"), source="batch"),
        ]
    )
    n_before = spark.read.parquet(f"{root}/docs").count()
    report = {r.doc_id: r.verdict for r in corpus.ingest_batch(spark, root, batch).collect()}
    assert report == {2005: "duplicate", 2006: "duplicate"}
    assert spark.read.parquet(f"{root}/docs").count() == n_before


def test_dry_run_leaves_state_untouched(spark, root):
    batch = spark.createDataFrame(
        [Row(doc_id=3001, text=_long_text("freshD"), source="batch")]
    )
    n_before = spark.read.parquet(f"{root}/docs").count()
    report = {
        r.doc_id: r.verdict
        for r in corpus.ingest_batch(spark, root, batch, commit=False).collect()
    }
    assert report == {3001: "admitted"}
    assert spark.read.parquet(f"{root}/docs").count() == n_before


def test_within_batch_near_dups_keep_first(spark, tmp_path):
    """Two NEAR-identical (not byte-identical) docs in one batch: only the
    smaller id commits; the other is rejected as near_duplicate_batch —
    the round-4 fix for the batch-vs-corpus-only near check."""
    root = str(tmp_path / "root")
    seed = spark.createDataFrame(
        [Row(doc_id=i, text=_long_text(f"seed{i}"), source="seed") for i in range(5)]
    )
    corpus.init_corpus(spark, root, seed)

    base = _long_text("pairX")
    toks = base.split(" ")
    toks[-1] = "zzzaltered"
    batch = spark.createDataFrame(
        [
            Row(doc_id=6001, text=base, source="batch"),
            Row(doc_id=6002, text=" ".join(toks), source="batch"),
        ]
    )
    report = {
        r.doc_id: r.verdict
        for r in corpus.ingest_batch(spark, root, batch).collect()
    }
    assert report == {6001: "admitted", 6002: "near_duplicate_batch"}
    docs = spark.read.parquet(f"{root}/docs")
    assert docs.filter("doc_id = 6001").count() == 1
    assert docs.filter("doc_id = 6002").count() == 0


def test_interrupted_commit_heals_on_retry(spark, tmp_path):
    """Crash simulation: state (signatures) append landed, docs append did
    not. The retry classifies the doc as `healed` and repairs the docs
    table; a further retry is a plain duplicate. State is written first
    precisely so this is the ONLY possible divergence shape."""
    import os as _os

    root = str(tmp_path / "root")
    seed = spark.createDataFrame(
        [Row(doc_id=i, text=_long_text(f"seed{i}"), source="seed") for i in range(5)]
    )
    corpus.init_corpus(spark, root, seed)

    batch = spark.createDataFrame(
        [Row(doc_id=6101, text=_long_text("crashy"), source="batch")]
    )
    # simulate the crash window: run the real commit, then roll back ONLY
    # the docs append (keep state) by restoring the docs dir content.
    docs_dir = _os.path.join(root, "docs")
    before = set(_os.listdir(docs_dir))
    corpus.ingest_batch(spark, root, batch)
    for name in set(_os.listdir(docs_dir)) - before:
        _os.remove(_os.path.join(docs_dir, name))

    n_state = spark.read.parquet(f"{root}/signatures").count()
    assert spark.read.parquet(docs_dir).filter("doc_id = 6101").count() == 0

    report = {
        r.doc_id: r.verdict
        for r in corpus.ingest_batch(spark, root, batch).collect()
    }
    assert report == {6101: "healed"}
    assert spark.read.parquet(docs_dir).filter("doc_id = 6101").count() == 1
    # healing repairs docs only — no second state row
    assert spark.read.parquet(f"{root}/signatures").count() == n_state

    report = {
        r.doc_id: r.verdict
        for r in corpus.ingest_batch(spark, root, batch).collect()
    }
    assert report == {6101: "duplicate"}
    assert spark.read.parquet(docs_dir).filter("doc_id = 6101").count() == 1


def test_no_full_docs_rehash_per_batch(spark, tmp_path):
    """The duplicate gate reads stored state digests, never re-hashing the
    docs table: the ingest plan must not contain an md5 over the corpus
    docs scan. Probed by dropping the text column from the persisted docs
    (state carries everything the gate needs); only the optional LM gate
    and heal-read touch docs at all."""
    root = str(tmp_path / "root")
    seed = spark.createDataFrame(
        [Row(doc_id=i, text=_long_text(f"seed{i}"), source="seed") for i in range(5)]
    )
    corpus.init_corpus(spark, root, seed)
    # corrupt docs' TEXT (keep digest): if ingest re-hashed docs text the
    # duplicate verdict would break; reading only the stored digest keeps it
    docs = spark.read.parquet(f"{root}/docs").withColumn(
        "text", F.lit("SCRAMBLED")
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "docs2"))
    spark.read.parquet(str(tmp_path / "docs2")).write.mode("overwrite").parquet(
        f"{root}/docs"
    )

    dup = spark.createDataFrame(
        [Row(doc_id=6201, text=_long_text("seed2"), source="batch")]
    )
    report = {
        r.doc_id: r.verdict
        for r in corpus.ingest_batch(spark, root, dup).collect()
    }
    assert report == {6201: "duplicate"}


def test_stream_ingest_drains_and_audits(spark, sf_dir, tmp_path):
    """The streaming twin: files landing in the watch directory flow
    through ingest_batch per micro-batch; admitted docs commit, verdicts
    land in the reports audit table, and a second run with no new files
    re-admits nothing."""
    root = str(tmp_path / "root")
    inbox = str(tmp_path / "inbox")
    seed = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .filter("doc_id < 20")
    )
    corpus.init_corpus(spark, root, seed)

    batch = spark.createDataFrame(
        [
            Row(doc_id=5001, text=_long_text("streamA"), source="stream"),
            Row(doc_id=5002, text="tiny", source="stream"),
        ]
    )
    batch.coalesce(1).write.mode("append").parquet(inbox)
    corpus.stream_ingest(spark, root, inbox)

    reports = spark.read.parquet(f"{root}/reports")
    got = {r.doc_id: r.verdict for r in reports.collect()}
    assert got == {5001: "admitted", 5002: "too_short"}
    assert spark.read.parquet(f"{root}/docs").filter("doc_id = 5001").count() == 1

    # drain again with nothing new: checkpoint skips the processed file
    corpus.stream_ingest(spark, root, inbox)
    assert spark.read.parquet(f"{root}/reports").count() == 2

    # a second file lands; only it is processed
    spark.createDataFrame(
        [Row(doc_id=5003, text=_long_text("streamA"), source="stream")]
    ).coalesce(1).write.mode("append").parquet(inbox)
    corpus.stream_ingest(spark, root, inbox)
    got = {
        r.doc_id: r.verdict for r in spark.read.parquet(f"{root}/reports").collect()
    }
    # 5003 duplicates the already-admitted 5001 content → exact dup
    assert got[5003] == "duplicate"


def test_corpus_cli_init_ingest(spark, sf_dir, tmp_path, capsys):
    """The CLI wraps init + ingest and prints the verdict histogram as one
    JSON line (the scheduler-facing signal)."""
    import json

    from politicamente_etl_spark import corpus_cli

    root = str(tmp_path / "root")
    seed_path = str(tmp_path / "seed")
    batch_path = str(tmp_path / "batch")
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).filter("doc_id < 10").write.parquet(seed_path)
    spark.createDataFrame(
        [
            Row(doc_id=9001, text=_long_text("cliA"), source="cli"),
            Row(doc_id=9002, text="nope", source="cli"),
        ]
    ).write.parquet(batch_path)

    assert corpus_cli.main(
        ["init", "--root", root, "--seed", seed_path], spark=spark
    ) == 0
    assert corpus_cli.main(
        ["ingest", "--root", root, "--batch", batch_path], spark=spark
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["verdicts"] == {"admitted": 1, "too_short": 1}
    assert spark.read.parquet(f"{root}/docs").count() == 11


def test_lm_gate_rejects_word_salad(spark, tmp_path):
    """With lm_gate set, a batch doc whose token TRANSITIONS are alien to
    the corpus (same vocabulary, shuffled order) is rejected as
    low_quality_lm while the in-domain doc passes — the statistical gate
    the length/repetition rules cannot express."""
    root = str(tmp_path / "root")
    phrase = (
        "the quick brown fox jumps over the lazy dog while a calm cat naps "
        "under an old tree near a blue river and the cold wind blows softly "
        "through green leaves as birds sing their evening songs"
    )
    seed = spark.createDataFrame(
        [Row(doc_id=i, text=phrase, source="seed") for i in range(20)]
    )
    corpus.init_corpus(spark, root, seed)

    in_domain = phrase.replace("evening songs", "morning songs")
    words = phrase.split(" ")
    salad = " ".join(words[1::2] + words[0::2])  # same multiset, alien order
    batch = spark.createDataFrame(
        [
            Row(doc_id=7001, text=in_domain, source="batch"),
            Row(doc_id=7002, text=salad, source="batch"),
        ]
    )
    # near-dup gate disabled (threshold above 1.0) for both runs: the
    # in-domain doc legitimately shares most shingles with the seed, and
    # this test isolates the LM gate as the only discriminator
    dry = {
        r.doc_id: r.verdict
        for r in corpus.ingest_batch(
            spark, root, batch, near_threshold=1.01, commit=False
        ).collect()
    }
    assert dry == {7001: "admitted", 7002: "admitted"}
    # gated: only the in-domain doc survives
    report = {
        r.doc_id: r.verdict
        for r in corpus.ingest_batch(
            spark, root, batch, near_threshold=1.01, lm_gate=-2.0, commit=False
        ).collect()
    }
    assert report[7001] == "admitted"
    assert report[7002] == "low_quality_lm"
