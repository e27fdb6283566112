"""Ingest (ZIP landing, pruning, cache) and CLI end-to-end tests, fully
offline: ZIP fixtures are built locally and the fetcher is injected.
"""

from __future__ import annotations

import os
import zipfile

import pytest

from politicamente_etl_spark import cli, schemas
from politicamente_etl_spark.sources import ingest

CAND_CSV = (
    "ANO_ELEICAO;NR_TURNO;DS_ELEICAO;SQ_CANDIDATO;NR_CANDIDATO;NM_CANDIDATO;"
    "NM_URNA_CANDIDATO;DS_CARGO;NR_PARTIDO;SG_PARTIDO;NM_PARTIDO\n"
    "2022;1;Eleições Gerais 2022;1001;131;JOÃO DA SILVA;JOÃO;GOVERNADOR;13;PT;Partido A\n"
    "2022;1;Eleições Gerais 2022;1002;451;MARIA SOUZA;MARIA;GOVERNADOR;45;PSDB;Partido B\n"
)
VOTES_CSV = (
    "SQ_CANDIDATO;QT_VOTOS;DS_SIT_TOT_TURNO\n"
    "1001;100;ELEITO\n1001;250;ELEITO\n1002;80;NÃO ELEITO\n"
)


def make_zip(path, members: dict[str, str]):
    with zipfile.ZipFile(path, "w") as z:
        for name, text in members.items():
            z.writestr(name, text.encode("latin-1"))


def test_download_zip_cache_and_force(tmp_path):
    calls = []

    def fetcher(url):
        calls.append(url)
        yield b"PK-fake"

    dest = str(tmp_path / "x.zip")
    ingest.download_zip("http://x/x.zip", dest, fetcher=fetcher)
    ingest.download_zip("http://x/x.zip", dest, fetcher=fetcher)  # cached: no-op
    assert len(calls) == 1  # `extract.py:19` skip-if-exists
    ingest.download_zip("http://x/x.zip", dest, force=True, fetcher=fetcher)
    assert len(calls) == 2  # --force-download re-fetches


def test_extract_prefers_consolidated(tmp_path):
    zp = str(tmp_path / "consulta_cand_2022.zip")
    make_zip(
        zp,
        {
            "consulta_cand_2022_SP.csv": CAND_CSV,
            "consulta_cand_2022_BRASIL.csv": CAND_CSV,
            "leiame.pdf": "x",
        },
    )
    out = ingest.extract_csvs(zp, "consulta_cand", 2022, str(tmp_path / "landing"))
    assert [os.path.basename(p) for p in out] == ["consulta_cand_2022_BRASIL.csv"]


def test_get_tse_data_distributed_union(spark, tmp_path):
    """Per-state shards (no consolidated file) → one multi-path scan."""
    zp = str(tmp_path / "data" / "consulta_cand_2022.zip")
    os.makedirs(os.path.dirname(zp))
    make_zip(
        zp,
        {
            "consulta_cand_2022_SP.csv": CAND_CSV,
            "consulta_cand_2022_RJ.csv": CAND_CSV,
        },
    )
    df = ingest.get_tse_data(
        spark,
        2022,
        "http://unused",
        "consulta_cand",
        schemas.CONSULTA_CAND,
        data_dir=str(tmp_path / "data"),
        fetcher=lambda url: iter([b""]),  # zip already cached → not called
    )
    assert df.count() == 4  # 2 files × 2 rows, union at the scan
    assert df.select("NM_CANDIDATO").distinct().count() == 2


@pytest.fixture()
def offline_env(tmp_path, monkeypatch):
    """Pre-place both ZIPs so the CLI never touches the network."""
    data = tmp_path / "data"
    data.mkdir()
    make_zip(
        str(data / "consulta_cand_2022.zip"),
        {"consulta_cand_2022_BRASIL.csv": CAND_CSV},
    )
    make_zip(
        str(data / "votacao_candidato_munzona_2022.zip"),
        {"votacao_candidato_munzona_2022_SP.csv": VOTES_CSV},
    )
    return {"data": str(data), "warehouse": str(tmp_path / "wh")}


def run_cli(spark, env, cmd):
    return cli.main(
        [cmd, "--year", "2022", "--data-dir", env["data"], "--warehouse", env["warehouse"]],
        spark=spark,
    )


def test_cli_full_flow(spark, offline_env, capsys):
    assert run_cli(spark, offline_env, "seed_all") == 0
    wh = offline_env["warehouse"]
    parties = spark.read.parquet(os.path.join(wh, "parties"))
    cands = spark.read.parquet(os.path.join(wh, "candidacies"))
    assert parties.count() == 2
    got = {r.sq_candidate_tse: r for r in cands.collect()}
    assert got["1001"].total_votes_received == 350  # zones summed
    assert got["1002"].status_resultado == "NÃO ELEITO"
    assert "2 candidacies updated, 0 vote keys unmatched" in capsys.readouterr().out


def test_cli_idempotent_rerun(spark, offline_env):
    run_cli(spark, offline_env, "seed_all")
    first = sorted(
        map(
            tuple,
            cli.read_sink(spark, offline_env["warehouse"], "candidacies")
            .drop("politician_id")  # uuids re-minted per run; natural cols stable
            .collect(),
        )
    )
    run_cli(spark, offline_env, "seed_all")
    second = sorted(
        map(
            tuple,
            cli.read_sink(spark, offline_env["warehouse"], "candidacies")
            .drop("politician_id")
            .collect(),
        )
    )
    assert first == second


def test_jsonl_roundtrip(spark, tmp_path):
    """read_jsonl/write_jsonl: explicit-schema scan returns exactly what was
    written, types intact."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from politicamente_etl_spark.sources.readers import read_jsonl
    from politicamente_etl_spark.sources.sinks import write_jsonl

    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "c")], schema)
    path = str(tmp_path / "out_jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema)
    assert back.schema == schema
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, None), (3, "c")]


def test_compact_small_files(spark, sf_dir, tmp_path):
    """compact() merges a many-file table into target_files without
    changing its contents."""
    import glob

    from politicamente_etl_spark.sources.readers import load_table
    from politicamente_etl_spark.sources.sinks import compact

    path = str(tmp_path / "frag")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(37).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 37
    before = orders.count()
    compact(spark, path, target_files=4)
    assert len(glob.glob(f"{path}/*.parquet")) <= 4
    assert spark.read.parquet(path).count() == before
