"""Round-6 batch A tests: the Z-order write path (sinks.write_zordered_txlog)
and its driver query txlog_zorder_storage_report."""

import os

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.plans.catalog import CATALOG

pytestmark = pytest.mark.usefixtures("spark")


def test_write_zordered_txlog_layout_and_pruning(spark, tmp_path):
    """The sink writes one data file per non-empty Morton bucket, the
    zonemaps prune a 2-D box in BOTH dimensions, and pruning is
    invisible to semantics (scan == full filter)."""
    from politicamente_etl_spark.sources.sinks import write_zordered_txlog

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 37) % 64).alias("y"),
    )
    t = write_zordered_txlog(
        spark, str(tmp_path / "zt"), df, ["x", "y"], bits=4, n_files=16
    )
    live, total = t.scan_files()
    assert total == 16  # 64 values/dim -> every Z-bucket non-empty
    assert len(live) == 16
    # box = middle quarter of both dims: [32, 47] x [32, 47]
    preds = {"x": (32, 47), "y": (32, 47)}
    kept, _ = t.scan_files(preds)
    # Z-order: both dimensions prune -> strictly fewer files than the
    # 1-D layout would keep (a linear-x layout keeps bucket files whose
    # x-range hits [32,47] but every file spans all y)
    assert 0 < len(kept) < 16
    got = sorted(r.k for r in t.scan(preds).collect())
    want = sorted(
        r.k
        for r in df.filter(
            F.col("x").between(32, 47) & F.col("y").between(32, 47)
        ).collect()
    )
    assert got == want


def test_write_zordered_txlog_rejects_nondivisible_n_files(spark, tmp_path):
    from politicamente_etl_spark.sources.sinks import write_zordered_txlog

    df = spark.range(16).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    with pytest.raises(ValueError, match="must divide"):
        write_zordered_txlog(
            spark, str(tmp_path / "zt"), df, ["x", "y"], bits=4, n_files=7
        )


def test_zorder_storage_report_matches_model_query(spark, sf_dir):
    """The new write-path query's four storage-measured numbers equal
    the planner model's zorder row — same bucket math, real files."""
    storage = CATALOG["txlog_zorder_storage_report"].fn(spark, sf_dir).first()
    model = {
        r.layout: r
        for r in CATALOG["zorder_skipping_model"].fn(spark, sf_dir).collect()
    }["zorder"]
    assert storage.n_files == model.n_files
    assert storage.files_kept == model.files_kept
    assert storage.rows_in_kept_files == model.rows_in_kept_files
    assert storage.n_rows_match == model.n_rows_match


# ---------------------------------------------------------------------------
# batch B (plans/extended_r11b.py)
# ---------------------------------------------------------------------------


def test_partition_pruning_reaches_the_scan(spark, tmp_path):
    """The range filter on the partition column must surface as a
    PartitionFilters entry on the parquet scan — out-of-range day
    directories are never listed, the O(partitions)-metadata contract
    the driver query's measured numbers rely on."""
    import contextlib
    import io

    df = spark.range(300).select(
        F.col("id").alias("event_id"), (F.col("id") % 10).alias("pday")
    )
    path = str(tmp_path / "pp")
    df.repartition("pday").write.partitionBy("pday").parquet(path)
    rdf = spark.read.parquet(path).filter(F.col("pday").between(3, 5))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rdf.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "pday" in pf
    # layout invariant the driver query counts on: one file per day dir
    got = {r[0] for r in rdf.select(F.input_file_name()).distinct().collect()}
    assert len(got) == 3


def test_linkage_fs_weights_expected_rates(spark, sf_dir):
    """m/u come out at the rates the deterministic dirtying implies:
    name m = P(custkey%5!=0) exactly, name u = 0 (names unique),
    segment u is LARGE (5-value field)."""
    rows = {r.field: r for r in CATALOG["linkage_fs_weights"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"name_exact", "name_suffix3", "segment"}
    nm = rows["name_exact"]
    # every block pair is counted once; matches = one per customer
    assert nm.n_match > 0 and nm.n_unmatch > nm.n_match
    # m_name = 1 - |%5==0| / n exactly, in ppm (floor)
    n = nm.n_match
    n_perturbed = sum(1 for k in range(1, n + 1) if k % 5 == 0)
    assert nm.m_ppm == (n - n_perturbed) * 1_000_000 // n
    assert nm.u_ppm == 0  # exact full names never collide across keys
    sfx = rows["name_suffix3"]
    assert sfx.u_ppm > 0  # 3-char suffix collides across keys...
    assert sfx.u_ppm < 50_000  # ...but rarely (fuzzy key, small u)
    seg = rows["segment"]
    assert seg.u_ppm > 100_000  # low-cardinality field: huge u
    assert seg.m_ppm < nm.m_ppm  # %3 wipe beats %5 truncation


def test_orc_roundtrip_preserves_schema_and_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "k long, s string, v double"
    )
    path = str(tmp_path / "orc")
    df.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())


# ---------------------------------------------------------------------------
# batch C (plans/extended_r11c.py): benchmark decontamination
# ---------------------------------------------------------------------------


def test_eval_ngram_contamination_flags_exact_overlap(spark):
    from politicamente_etl_spark.operators.dedup import (
        eval_ngram_contamination,
    )

    rows = [
        # doc 97 is EVAL (97 % 97 == 0)
        (97, "bench", "alpha beta gamma delta epsilon zeta"),
        # doc 1 shares the 4-gram 'beta gamma delta epsilon' -> flagged
        (1, "web", "xx beta gamma delta epsilon yy zz"),
        # doc 2 shares nothing -> absent
        (2, "web", "one two three four five six seven"),
        # doc 3 too short for any 4-gram -> absent
        (3, "web", "just three tokens"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in eval_ngram_contamination(docs, n=4).collect()}
    assert set(out) == {1}
    r = out[1]
    # doc 1 has 4 distinct 4-grams; exactly 1 hits the eval set
    assert (r.n_grams, r.n_hit) == (4, 1)
    assert r.contamination_ppm == 1_000_000 // 4
    # eval docs are never scored, even self-contaminated ones
    assert 97 not in out


# ---------------------------------------------------------------------------
# batch D (plans/extended_r11d.py): keep-best canonical selection
# ---------------------------------------------------------------------------


def test_keep_best_picks_longest_and_flags_policy_delta(spark, sf_dir):
    out = {
        r.cluster_id: r
        for r in CATALOG["canonical_keep_best_report"].fn(spark, sf_dir).collect()
    }
    assert out, "fixture corpus must contain multi-doc clusters"
    docs = {
        r.doc_id: len(r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    clusters = {
        r.doc_id: r.cluster_id
        for r in CATALOG["near_dup_clusters"].fn(spark, sf_dir).collect()
    }
    for cid, r in out.items():
        members = [d for d, c in clusters.items() if c == cid]
        assert r.n_docs == len(members) >= 2
        best = sorted(members, key=lambda d: (-docs[d], d))[0]
        assert r.canonical_doc_id == best
        assert r.canonical_chars == docs[best]
        assert r.chars_dropped == sum(docs[d] for d in members if d != best)
        assert r.differs_from_keep_first == (1 if best != cid else 0)
    # the policy delta must be non-degenerate on the fixture corpus:
    # keep-first (min id) and keep-best disagree somewhere
    assert any(r.differs_from_keep_first for r in out.values())


# ---------------------------------------------------------------------------
# batch E (plans/extended_r11e.py): file-level Bloom point-lookup pruning
# ---------------------------------------------------------------------------


def test_bloom_pruning_semantics_and_subsets(spark, tmp_path):
    """Bloom pruning never loses rows (scan == plain filter), only ever
    SHRINKS the zonemap-kept set, and the containing file survives for
    every present key."""
    from politicamente_etl_spark.sources.txlog import TxLogTable

    n = 2000
    df = spark.range(1, n + 1).select(
        F.col("id").alias("k"), (F.col("id") % 8).alias("__f")
    )
    t = TxLogTable.create(
        spark,
        str(tmp_path / "bt"),
        df,
        cluster_file_col="__f",
        bloom_cols=("k",),
        bloom_bits=4096,
    )
    for key in (1, 777, n):  # spread across files
        preds = {"k": (key, key)}
        zm, total = t.scan_files(preds, use_blooms=False)
        bl, _ = t.scan_files(preds)
        assert total == 8
        assert set(bl) <= set(zm)
        got = [r.k for r in t.scan(preds).collect()]
        assert got == [key]
    # absent key: zero rows regardless of false-positive files kept
    absent = n + 12345
    assert t.scan({"k": (absent, absent)}).count() == 0
    # range predicates ignore blooms (lo != hi) — zonemap path unchanged
    zm_range, _ = t.scan_files({"k": (10, 20)}, use_blooms=False)
    bl_range, _ = t.scan_files({"k": (10, 20)})
    assert zm_range == bl_range


def test_bloom_probe_matches_spark_build_math(spark):
    """The driver-side probe positions equal the Spark build
    expressions for the same (column, value) — the cross-engine
    contract the oracle also relies on."""
    from politicamente_etl_spark.sources.txlog import (
        _bloom_pos_cols,
        _bloom_positions_py,
    )

    vals = [1, 42, 999999999, -7]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    p1c, p2c = _bloom_pos_cols("k", 2048)
    got = {
        r.k: (r.p1, r.p2)
        for r in df.select("k", p1c.alias("p1"), p2c.alias("p2")).collect()
    }
    for v in vals:
        assert got[v] == _bloom_positions_py("k", v, 2048)


def test_zordered_writer_composes_with_blooms(spark, tmp_path):
    """One create gives both metadata layers: Z zonemaps prune the 2-D
    box on the clustered columns, blooms prune a point lookup on an
    UNclustered column."""
    from politicamente_etl_spark.sources.sinks import write_zordered_txlog

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 37) % 64).alias("y"),
    )
    t = write_zordered_txlog(
        spark,
        str(tmp_path / "zb"),
        df,
        ["x", "y"],
        bits=4,
        n_files=16,
        bloom_cols=("k",),
        bloom_bits=8192,
    )
    box_kept, total = t.scan_files({"x": (32, 47), "y": (32, 47)})
    assert 0 < len(box_kept) < total == 16
    # k is uncorrelated with the (x, y) Morton layout: the zonemap keeps
    # ~every file, the bloom keeps few
    key = 1234
    zm, _ = t.scan_files({"k": (key, key)}, use_blooms=False)
    bl, _ = t.scan_files({"k": (key, key)})
    assert len(bl) < len(zm)
    assert [r.k for r in t.scan({"k": (key, key)}).collect()] == [key]
