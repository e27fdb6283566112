"""Multi-format source/sink round-trips beyond parquet.

The reference reads `;`-separated latin-1 CSV and writes Postgres; a
production corpus pipeline additionally lands ORC and JSON-lines drops and
raw media files. Spark supports all three natively — these tests pin the
exact read-back semantics (types, row identity) so each format is a
first-class source, and exercise the `binaryFile` source as the real
ingestion path for the multimodal operators (one row per file with
content + metadata, feeding the same mapInPandas feature pass as the
parquet-borne payload column).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from politicamente_etl_spark.operators.multimodal import extract_media_features
from politicamente_etl_spark.sources.readers import load_table, read_jsonl


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC write → read preserves rows and types (nation dim)."""
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    nation.write.format("orc").mode("overwrite").save(path)
    back = spark.read.format("orc").load(path)
    assert back.schema == nation.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}


def test_jsonl_roundtrip_with_schema(spark, sf_dir, tmp_path):
    """JSON-lines write → schema'd read: explicit schema (no inference
    pass) reproduces the source rows; longs stay longs, doubles stay
    doubles."""
    region = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_jsonl")
    region.write.format("json").mode("overwrite").save(path)
    back = read_jsonl(spark, path, schema=region.schema).select(*region.columns)
    assert back.schema == region.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in region.collect()}


def test_binaryfile_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingestion: one row per media file (path, length,
    content). Renaming to the multimodal contract (doc_id via filename,
    media bytes, media_type) must feed extract_media_features unchanged —
    this is the production path for raw image/audio drops."""
    media_dir = tmp_path / "media"
    media_dir.mkdir()
    payloads = {i: bytes(f"fake-media-{i}", "utf-8") * (i + 1) for i in range(5)}
    for i, blob in payloads.items():
        (media_dir / f"{i}.bin").write_bytes(blob)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(media_dir))
    )
    assert files.count() == 5
    # length column comes from file metadata — no content read needed for it
    assert {"path", "modificationTime", "length", "content"} <= set(files.columns)

    media = files.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
    )
    feats = extract_media_features(media).collect()
    assert len(feats) == 5
    by_id = {r.doc_id: r for r in feats}
    import hashlib

    for i, blob in payloads.items():
        assert by_id[i].n_bytes == len(blob)
        assert by_id[i].content_md5 == hashlib.md5(blob).hexdigest()


def test_csv_roundtrip_tse_conventions(spark, sf_dir, tmp_path):
    """The reference's CSV conventions (`;`, latin-1, header) survive a
    write → read round-trip through read_tse_csv with an explicit schema."""
    from politicamente_etl_spark.sources.readers import read_tse_csv

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    ).limit(100)
    path = str(tmp_path / "cust_csv")
    (
        cust.write.option("sep", ";")
        .option("header", True)
        .option("encoding", "ISO-8859-1")
        .mode("overwrite")
        .csv(path)
    )
    back = read_tse_csv(spark, path, cust.schema).select(*cust.columns)
    assert back.schema == cust.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in cust.collect()}


def test_union_all_schema_drift(spark):
    """Vintage drift: a newer file carries an extra column — outer-align
    union fills NULL on the old side; strict mode still raises."""
    import pytest
    from pyspark.sql import functions as F

    from politicamente_etl_spark.operators.core import union_all

    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame(
        [(2, "b", "2024-01")], "id long, name string, vintage string"
    )
    out = union_all(old, new, allow_missing=True)
    assert set(out.columns) == {"id", "name", "vintage"}
    rows = {r.id: r for r in out.collect()}
    assert rows[1].vintage is None and rows[2].vintage == "2024-01"

    with pytest.raises(Exception):
        union_all(old, new).collect()


def test_minhash_cross_pairs_vs_self_join(spark, sf_dir):
    """The cross (batch x corpus) LSH must find exactly the self-join's
    cross-side pairs: split the corpus in two, run both shapes, compare."""
    from pyspark.sql import functions as F

    from politicamente_etl_spark.operators.dedup import (
        minhash_cross_pairs,
        minhash_near_dup_pairs,
    )
    from politicamente_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    corpus = docs.filter(F.col("doc_id") % 2 == 1)

    cross = {
        (r.batch_doc, r.corpus_doc, r.est_jaccard)
        for r in minhash_cross_pairs(batch, corpus).collect()
    }
    self_pairs = {
        # keep only odd-even pairs, normalized to (even=batch, odd=corpus)
        (r.doc_a if r.doc_a % 2 == 0 else r.doc_b,
         r.doc_b if r.doc_a % 2 == 0 else r.doc_a,
         r.est_jaccard)
        for r in minhash_near_dup_pairs(docs).collect()
        if (r.doc_a % 2) != (r.doc_b % 2)
    }
    assert cross == self_pairs


def test_malformed_csv_quarantine(spark, tmp_path):
    """A 100 TB ingest must not die on one bad line: rows that don't fit
    the schema land in the corrupt-capture column with the raw line
    preserved; clean rows parse normally; both halves come from ONE scan."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from politicamente_etl_spark.sources.readers import (
        quarantine_malformed,
        read_tse_csv,
    )

    p = tmp_path / "votes.csv"
    p.write_text(
        "SQ_CANDIDATO;QT_VOTOS\n"
        "111;10\n"
        "222;not_a_number\n"   # unparseable int → quarantined
        "333;30\n",
        encoding="ISO-8859-1",
    )
    schema = StructType(
        [
            StructField("SQ_CANDIDATO", StringType(), True),
            StructField("QT_VOTOS", IntegerType(), True),
        ]
    )
    df = read_tse_csv(spark, str(p), schema, corrupt_col="_corrupt")
    clean, bad = quarantine_malformed(df, "_corrupt")
    got = {r.SQ_CANDIDATO: r.QT_VOTOS for r in clean.collect()}
    assert got == {"111": 10, "333": 30}
    bad_rows = bad.collect()
    assert [r.raw_line for r in bad_rows] == ["222;not_a_number"]
    assert bad_rows[0].QT_VOTOS is None  # schema cols null on corrupt rows
    assert "_corrupt" not in clean.columns


# ---------------------------------------------------------------------------
# zipcsv Python DataSource (executor-parallel CSV-in-ZIP)
# ---------------------------------------------------------------------------


def _tse_zip(tmp_path, name="consulta_cand_2022.zip"):
    import zipfile

    zp = str(tmp_path / name)
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr(
            "consulta_cand_2022_SP.csv",
            'NM_CANDIDATO;NR_CPF\n"ANA";"123"\n"BO";"456"\n'.encode("latin-1"),
        )
        z.writestr(
            "consulta_cand_2022_RJ.csv",
            'NM_CANDIDATO;NR_CPF\n"ZÉ";"789"\n'.encode("latin-1"),
        )
        z.writestr(
            "consulta_cand_2022_BRASIL.csv",
            'NM_CANDIDATO;NR_CPF\n"ALL";"000"\n'.encode("latin-1"),
        )
    return zp


def test_zipcsv_member_parallel_scan(spark, tmp_path):
    """Each ZIP member is one input partition; rows and latin-1 content
    match a driver-extracted read_tse_csv of the same members."""
    from politicamente_etl_spark.sources.zipsource import register_zipcsv

    register_zipcsv(spark)
    zp = _tse_zip(tmp_path)
    df = spark.read.format("zipcsv").option("path", zp).load()
    assert df.columns == ["NM_CANDIDATO", "NR_CPF"]
    assert df.rdd.getNumPartitions() == 3  # one per member — the scale win
    rows = {(r.NM_CANDIDATO, r.NR_CPF) for r in df.collect()}
    assert rows == {("ANA", "123"), ("BO", "456"), ("ZÉ", "789"), ("ALL", "000")}


def test_zipcsv_consolidated_pruning(spark, tmp_path):
    """prefix+year options apply the reference's consolidated-file rule
    (extract.py:43-44): the BRASIL file shadows the per-state members."""
    from politicamente_etl_spark.sources.zipsource import register_zipcsv

    register_zipcsv(spark)
    zp = _tse_zip(tmp_path)
    df = (
        spark.read.format("zipcsv")
        .option("path", zp)
        .option("prefix", "consulta_cand")
        .option("year", "2022")
        .load()
    )
    assert [r.NM_CANDIDATO for r in df.collect()] == ["ALL"]


def test_zipcsv_schema_drift_missing_column(spark, tmp_path):
    """A member lacking a schema column yields NULLs for it (drift
    tolerance), instead of failing the scan."""
    import zipfile

    from pyspark.sql.types import StringType, StructField, StructType

    from politicamente_etl_spark.sources.zipsource import register_zipcsv

    register_zipcsv(spark)
    zp = str(tmp_path / "drift.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("a.csv", "x;y\n1;2\n".encode("latin-1"))
        z.writestr("b.csv", "x\n9\n".encode("latin-1"))
    schema = StructType(
        [StructField("x", StringType()), StructField("y", StringType())]
    )
    df = spark.read.format("zipcsv").schema(schema).option("path", zp).load()
    rows = {(r.x, r.y) for r in df.collect()}
    assert rows == {("1", "2"), ("9", None)}
