"""Round-7 batch D unit tests: bucketed co-located join, Kneser-Ney
smoothing invariants, per-language CCNet buckets, GMM EM step, and the
per-nation Kalman filter (cross-checked against a hand-rolled scalar
reference)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.plans.catalog import CATALOG
from politicamente_etl_spark.plans.extended_r12d import _bucketed_tables
from tests.test_plan_quality import plan_of


def q(name, spark, sf_dir):
    return CATALOG[name].fn(spark, sf_dir)


# -- bucketed co-located join ------------------------------------------------


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """The whole point of bucketBy: with broadcast disabled, the
    orders⋈customer equi-join on the bucket key must run with ZERO
    shuffle exchange — the write-time hash layout satisfies the join's
    distribution requirement on both sides."""
    bo, bc = _bucketed_tables(spark, sf_dir)
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    """Bucketed write+read is lossless: the segment rollup equals the
    same aggregate over the raw parquet."""
    got = {
        r["c_mktsegment"]: (r["n_orders"], r["revenue"])
        for r in q("bucketed_colocated_join", spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = {
        r["c_mktsegment"]: (r["n"], r["rev"])
        for r in (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(27,4)"))
                .cast("double")
                .alias("rev"),
            )
            .collect()
        )
    }
    assert got == want


# -- Kneser-Ney ---------------------------------------------------------------


def test_kneser_ney_distribution_sums_to_one(spark):
    """The KN invariant: for any context w1, Σ_w2 P_kn(w2|w1) = 1 over
    the observed-bigram support plus the backoff mass it leaves — here
    checked on a closed vocabulary where every bigram type is observed,
    so the observed-support sum alone must hit 1 exactly."""
    corpus = ["a b a c a b", "b a c a b a", "c a b a c a"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    from politicamente_etl_spark.operators.text import shingles_regex

    pairs = docs.select(F.explode(shingles_regex("text", 2)).alias("bg")).select(
        F.split("bg", " ")[0].alias("w1"), F.split("bg", " ")[1].alias("w2")
    )
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("n12").alias("c1n"), F.count("*").alias("nf")
    )
    cb = c12.groupBy("w2").agg(F.count("*").alias("nb"))
    ntb = c12.count()
    rows = (
        c12.join(c1, "w1").join(cb, "w2").collect()
    )
    # group by w1 in python and sum the closed-form p_kn
    from collections import defaultdict

    sums = defaultdict(float)
    # continuation distribution must itself sum to 1 over the vocab
    cont = {r["w2"]: r["nb"] / ntb for r in cb.collect()}
    assert abs(sum(cont.values()) - 1.0) < 1e-12
    for r in rows:
        p = max(r["n12"] - 0.75, 0.0) / r["c1n"] + 0.75 * r["nf"] / r[
            "c1n"
        ] * (r["nb"] / ntb)
        sums[r["w1"]] += p
    # every vocab word follows every context here EXCEPT pairs never
    # seen; add the unseen-backoff mass explicitly
    seen = {(r["w1"], r["w2"]) for r in rows}
    by_w1 = {r["w1"]: r for r in c1.collect()}
    for w1, tot in list(sums.items()):
        unseen = [w2 for w2 in cont if (w1, w2) not in seen]
        backoff = 0.75 * by_w1[w1]["nf"] / by_w1[w1]["c1n"]
        tot += sum(backoff * cont[w2] for w2 in unseen)
        assert abs(tot - 1.0) < 1e-9, (w1, tot)


def test_kneser_ney_query_rows(spark, sf_dir):
    out = q("kneser_ney_bigram_scores", spark, sf_dir).collect()
    assert len(out) == 20
    assert all(0 < r["p_kn_micro"] <= 1_000_000 for r in out)
    assert [r["rnk"] for r in sorted(out, key=lambda r: r["rnk"])] == list(
        range(1, 21)
    )


# -- CCNet per-language buckets ----------------------------------------------


def test_ccnet_lang_buckets_balanced(spark, sf_dir):
    """ntile(3) per language: the three buckets' doc counts differ by
    at most 1 within each language, and every language contributes all
    three buckets (sf0.01 has hundreds of docs per lang)."""
    rows = q("ccnet_lang_buckets_report", spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r["n_docs"]
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        counts = sorted(buckets.values())
        assert counts[-1] - counts[0] <= 1, (lang, buckets)


# -- GMM EM step ---------------------------------------------------------------


def test_gmm_em_step_invariants(spark, sf_dir):
    rows = {r["component"]: r for r in q("gmm_em_one_step", spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    n = rows[1]["n"]
    # responsibilities partition each row: Σr1 + Σr2 == n (in micro units)
    total_micro = rows[1]["sum_r_micro"] + rows[2]["sum_r_micro"]
    assert abs(total_micro - n * 1_000_000) <= n  # ≤1 micro per row of snap
    # component order is preserved by the init means
    assert rows[1]["mu_new"] < rows[2]["mu_new"]
    assert rows[1]["sigma_new"] > 0 and rows[2]["sigma_new"] > 0


# -- Kalman local-level filter --------------------------------------------------


def _scalar_kalman(xs, q_noise=0.1, r_noise=1.0):
    level, p, k = xs[0], 1.0, 0.0
    for x in xs[1:]:
        pe = p + q_noise
        k = pe / (pe + r_noise)
        level = level + k * (x - level)
        p = (1.0 - k) * pe
    return level, p, k


def test_kalman_matches_scalar_reference(spark, sf_dir):
    """The distributed filter must equal the sequential scalar filter
    run on the same per-nation series — same trajectory, not just the
    same summary statistic."""
    out = {
        r["nation"]: r for r in q("kalman_local_level_daily", spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_orderdate")
        .agg(F.sum("cents").alias("cents"))
        .orderBy("nation", "o_orderdate")
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["nation"], []).append(float(r["cents"]) / 1e7)
    assert set(series) == set(out)
    for nation, xs in series.items():
        level, p, k = _scalar_kalman(xs)
        row = out[nation]
        assert row["n_obs"] == len(xs)
        assert row["level_micro"] == int(math.floor(level * 1e6 + 0.5))
        assert row["p_micro"] == int(math.floor(p * 1e6 + 0.5))
        assert row["gain_micro"] == int(math.floor(k * 1e6 + 0.5))


# -- entity resolution + replica divergence ---------------------------------------


def test_entity_resolution_accounting(spark, sf_dir):
    """Every record (2 per customer: one per file) lands in exactly one
    entity; singleton entities are trivially pure; every true pair that
    the match rule links lands in one entity (the rule always links a
    record to its own twin when neither field was dirtied away)."""
    rows = q("linkage_entity_resolution", spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    total_records = sum(r["entity_size"] * r["n_entities"] for r in rows)
    assert total_records == 2 * n_cust
    for r in rows:
        assert 0 <= r["n_pure"] <= r["n_entities"]
        if r["entity_size"] == 1:
            assert r["n_pure"] == r["n_entities"]


def test_replica_divergence_localizes_all_faults(spark, sf_dir):
    """Completeness: every bucket holding an injected fault (dropped
    %1009 key or repriced %997 key) is reported, and no clean bucket
    is. Derived from the same fault rule, independently."""
    from pyspark.sql import functions as SF

    got = {r["bucket"] for r in q("replica_divergence_buckets", spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    faulty = o.filter(
        (SF.col("o_orderkey") % 1009 == 0) | (SF.col("o_orderkey") % 997 == 0)
    )
    bucket = (
        SF.conv(
            SF.substring(
                SF.md5(
                    SF.concat_ws(
                        ":", SF.lit("v1"), SF.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 64
    )
    want = {r["b"] for r in faulty.select(bucket.alias("b")).distinct().collect()}
    assert got == want and got  # non-empty at sf0.01


# -- contiguous global IDs -------------------------------------------------------


def test_contiguous_ids_are_dense_and_ordered(spark, sf_dir):
    rows = q("contiguous_id_assignment", spark, sf_dir).collect()
    rows.sort(key=lambda r: r["doc_id"])
    assert [r["global_id"] for r in rows] == list(range(1, len(rows) + 1))


def test_contiguous_ids_with_sparse_ranges(spark):
    """ID distributions that leave some ranges empty (here everything
    clusters at the ends) must still number densely."""
    from politicamente_etl_spark.plans.catalog import CATALOG
    import tempfile, os  # noqa: E401

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 1000000, 1000001]], "doc_id long"
    )
    d = tempfile.mkdtemp(prefix="sparse_ids_")
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    rows = CATALOG["contiguous_id_assignment"].fn(spark, d).collect()
    rows.sort(key=lambda r: r["doc_id"])
    assert [r["global_id"] for r in rows] == [1, 2, 3, 4, 5]


# -- Matryoshka truncation recall --------------------------------------------------


def test_mrl_recall_bounds_and_full_dim_identity(spark, sf_dir):
    rows = {r["dims"]: r for r in q("mrl_truncation_recall", spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32}
    for r in rows.values():
        assert 0 <= r["overlap"] <= r["n_pairs"]
        assert abs(r["recall_at_10"] - r["overlap"] / r["n_pairs"]) < 1e-12
    # slicing to the FULL width must reproduce the baseline exactly
    from politicamente_etl_spark.operators import sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 8)
    full = sim.cosine_topk(emb, queries, k=10).select("query_id", "vec_id")
    emb64 = emb.select("vec_id", F.slice("embedding", 1, 64).alias("embedding"))
    q64 = queries.select("vec_id", F.slice("embedding", 1, 64).alias("embedding"))
    top64 = sim.cosine_topk(emb64, q64, k=10).select("query_id", "vec_id")
    assert top64.join(full, ["query_id", "vec_id"]).count() == full.count()


# -- incremental LSH index maintenance -----------------------------------------


def test_lsh_index_incremental_equals_rebuild(spark, tmp_path):
    """Row-level proof (stronger than the query's checksum): the index
    maintained from the change feed is exactly the index rebuilt from
    the final table state."""
    from politicamente_etl_spark.operators.dedup import with_minhash_signature
    from politicamente_etl_spark.sources.txlog import TxLogTable

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta tok{i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    base = docs.filter(F.col("doc_id") % 7 != 3)
    t = TxLogTable.create(spark, str(tmp_path / "t"), base)
    updates = docs.filter(
        (F.col("doc_id") % 11 == 4) & (F.col("doc_id") % 7 != 3)
    ).select("doc_id", F.concat("text", F.lit(" zz")).alias("text"))
    inserts = docs.filter(F.col("doc_id") % 7 == 3)
    t.merge(updates.unionByName(inserts), ["doc_id"])

    index0 = with_minhash_signature(t.snapshot(version=1)).drop("text")
    delta = t.table_changes(1, 2, ["doc_id"], ["text"])
    changed = delta.select("doc_id").distinct()
    fresh = with_minhash_signature(
        delta.filter(F.col("change_type").isin("insert", "update")).select(
            "doc_id", F.col("new_text").alias("text")
        )
    ).drop("text")
    incremental = index0.join(changed, "doc_id", "left_anti").unionByName(
        fresh
    )
    rebuilt = with_minhash_signature(t.snapshot()).drop("text")

    inc = sorted(map(tuple, incremental.collect()))
    reb = sorted(map(tuple, rebuilt.collect()))
    assert inc == reb
    # and the changeset really is smaller than the corpus (the point)
    assert fresh.count() < docs.count()


# -- PNG codec -----------------------------------------------------------------


def _png_forward_filter(ft, line, prev, nch):
    """Forward PNG filter (encoder side) — the spec's §9 equations, used
    to build test rasters that force every unfilter branch."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - nch] if i >= nch else 0
        b = prev[i]
        c = prev[i - nch] if i >= nch else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def test_png_all_filter_types_roundtrip():
    """A raster whose five scanlines are encoded with filter types
    0,1,2,3,4 must reconstruct to the original pixel bytes — this is
    the decoder's unfiltering logic under test, not just the header."""
    import zlib

    from politicamente_etl_spark.operators.multimodal import (
        _png_chunk,
        parse_png,
    )

    w, h, nch = 4, 5, 3
    rows = [
        bytes((r * 41 + i * 17) % 256 for i in range(w * nch))
        for r in range(h)
    ]
    raw = bytearray()
    prev = bytes(w * nch)
    for r, line in enumerate(rows):
        ft = r % 5
        raw += bytes([ft]) + _png_forward_filter(ft, line, prev, nch)
        prev = line
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    got = parse_png(png)
    assert got == {
        "width": w,
        "height": h,
        "n_channels": nch,
        "pixel_sum": sum(sum(line) for line in rows),
    }


def test_png_encode_parse_roundtrip_all_color_types():
    from politicamente_etl_spark.operators.multimodal import (
        encode_png,
        parse_png,
    )

    for color_type, nch in ((0, 1), (2, 3), (6, 4)):
        got = parse_png(encode_png(7, 3, 200, color_type=color_type))
        assert got == {
            "width": 7,
            "height": 3,
            "n_channels": nch,
            "pixel_sum": 7 * 3 * nch * 200,
        }


def test_png_crc_corruption_detected():
    import pytest as _pytest

    from politicamente_etl_spark.operators.multimodal import (
        encode_png,
        parse_png,
    )

    png = bytearray(encode_png(4, 4, 9))
    png[40] ^= 0xFF  # flip a byte inside IDAT without fixing its CRC
    with _pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(png))


def test_png_unsupported_depth_raises():
    import zlib

    import pytest as _pytest

    from politicamente_etl_spark.operators.multimodal import (
        _png_chunk,
        parse_png,
    )

    ihdr = (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes(
        [16, 2, 0, 0, 0]
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        parse_png(png)


def test_png_dispatch_through_decode_image():
    from politicamente_etl_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_png,
    )

    assert decode_image(encode_png(3, 2, 10))["pixel_sum"] == 3 * 2 * 3 * 10
    assert decode_image(encode_bmp(3, 2, 10))["pixel_sum"] == 3 * 2 * 3 * 10


def test_kalman_constant_series_converges():
    """On a constant series the level equals the observation and the
    gain converges to the Riccati fixed point k* solving
    k = (p+Q)/(p+Q+R), p = (1-k)(p+Q)."""
    xs = [5.0] * 400
    level, p, k = _scalar_kalman(xs)
    assert level == 5.0
    # fixed point: p* = (1-k*)(p*+Q) with k* = (p*+Q)/(p*+Q+R)
    pe = p + 0.1
    k_star = pe / (pe + 1.0)
    assert abs(k - k_star) < 1e-9


# -- clustering/layout evolution on the commit log --------------------------------


def test_append_with_new_cluster_layout(spark, tmp_path):
    """Appends may adopt a different cluster layout than create; the
    cluster column is consumed by the layout on BOTH paths, reads are
    exact across mixed layouts, and the schema check compares the
    LOGICAL schema (sans cluster col)."""
    from politicamente_etl_spark.sources.txlog import TxLogTable

    base = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        (F.col("id") % 4).alias("c4"),
    )
    t = TxLogTable.create(
        spark, str(tmp_path / "t"), base, cluster_file_col="c4"
    )
    more = spark.range(21, 31).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        (F.col("id") % 3).alias("c3"),
    )
    t.append(more, cluster_file_col="c3")
    snap = t.snapshot()
    assert "c4" not in snap.columns and "c3" not in snap.columns
    assert sorted(r.k for r in snap.collect()) == list(range(1, 31))
    # per-commit layout contract: one file per distinct cluster value
    h = {m["version"]: m for m in t.history()}
    assert len(h[1]["added"]) == 4 and len(h[2]["added"]) == 3
    # zonemap scan still prunes and returns exact rows on mixed layouts
    assert sorted(r.k for r in t.scan({"k": (5, 8)}).collect()) == [5, 6, 7, 8]
    # logical-schema check: appending mismatched columns still rejects
    import pytest as _pytest

    bad = spark.range(40, 42).select(F.col("id").alias("k"))
    with _pytest.raises(Exception):
        t.append(bad, cluster_file_col=None)


# -- harmonic centrality ------------------------------------------------------------


def test_harmonic_centrality_bounds(spark, sf_dir):
    """Σ 1/dist over ≤4 hops: bounded by n_reached (all dist=1) and
    at least n_reached/4 (all dist=4); 8 seed rows, seeds are the 8
    smallest edge-bearing part ids."""
    rows = q("harmonic_centrality_seeds", spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_reached"] >= 0
        lo = r["n_reached"] * 250_000
        hi = r["n_reached"] * 1_000_000
        assert lo <= r["harmonic_micro"] <= hi, r


# -- XML source/sink ---------------------------------------------------------------


def test_xml_roundtrip_survives_markup_characters(spark, tmp_path):
    """XML's escaping layer must return text content byte-exactly —
    including markup characters, quotes, and newlines."""
    rows = [
        (1, 'a <tag> & "quoted" text'),
        (2, "line one\nline two"),
        (3, "]]> cdata-terminator & <nested attr='x'/>"),
        (4, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "x")
    df.write.format("xml").option("rootTag", "d").option("rowTag", "r").save(
        path
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "r")
        .schema("doc_id long, text string")
        .load(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)


# -- soft dedup ------------------------------------------------------------------


def test_soft_dedup_mass_conservation(spark):
    """Down-weighting by 1/n_copies makes each distinct text contribute
    exactly one copy's token mass: effective mass == distinct-text mass
    regardless of how duplicates spread across sources."""
    rows = [
        (f"s{i % 2}", t)
        for i, t in enumerate(
            ["a b c", "a b c", "a b c", "d e", "d e", "f g h i"]
        )
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    h = docs.select(
        "source",
        F.md5("text").alias("th"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    c = h.groupBy("th").agg(F.count("*").alias("n_copies"))
    eff = (
        h.join(c, "th")
        .agg(
            F.sum(
                F.round(
                    1000000.0 * F.col("n_tok") / F.col("n_copies"), 0
                ).cast("long")
            ).alias("eff")
        )
        .first()["eff"]
    )
    distinct_mass = sum(len(t.split()) for t in {"a b c", "d e", "f g h i"})
    assert eff == distinct_mass * 1_000_000


# -- Huber robust mean -------------------------------------------------------------


def test_huber_mean_between_median_and_mean(spark, sf_dir):
    """One IRLS step pulls the estimate from the median toward the
    data, but down-weighted tails keep it inside sane bounds: the
    Huber mean lies within the observation hull, the weights sum to at
    most n (in micro units), and on a symmetric clean segment it lands
    near the plain mean."""
    rows = q("huber_mean_revenue_by_segment", spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r["sum_w_micro"] <= r["n"] * 1_000_000
        assert r["mad_cents"] > 0


def test_huber_downweights_outliers():
    """Scalar replica of the query's algebra: a gross outlier moves the
    plain mean far more than the Huber step."""
    xs = [100, 101, 102, 103, 104, 10_000]
    s = sorted(xs)
    m0 = s[(len(s) + 1) // 2 - 1]
    mad = sorted(abs(x - m0) for x in xs)[(len(xs) + 1) // 2 - 1]
    k = 1345
    ws = [
        1_000_000
        if abs(x - m0) * 1000 <= k * mad
        else round(1_000_000 * (k * mad) / (1000.0 * abs(x - m0)))
        for x in xs
    ]
    huber = sum(w * x for w, x in zip(ws, xs)) / sum(ws)
    mean = sum(xs) / len(xs)
    assert abs(huber - 102) < abs(mean - 102) / 10
