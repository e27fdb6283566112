"""Pipeline-fidelity tests: the four reference pipelines recomposed on
Spark, run against a tiny TSE-shaped latin-1 fixture (FIXTURES.md §A),
including the SURVEY.md §2.9 trap list as regression cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark import pipelines, schemas
from politicamente_etl_spark.sources.readers import prune_consolidated, read_tse_csv

# 11 columns the reference touches; edge rows per FIXTURES.md §A1:
# - party 13 repeated with differing NM_PARTIDO (keep-first dedup)
# - duplicate person rows (DISTINCT)
# - nickname containing '-' (concat-key collision trap §2.9.4)
# - party 99 excluded from the parties dim in the candidacies test (miss-drop)
CAND_HEADER = (
    "ANO_ELEICAO;NR_TURNO;DS_ELEICAO;SQ_CANDIDATO;NR_CANDIDATO;NM_CANDIDATO;"
    "NM_URNA_CANDIDATO;DS_CARGO;NR_PARTIDO;SG_PARTIDO;NM_PARTIDO"
)
CAND_ROWS = [
    "2022;1;Eleições Gerais Estaduais 2022;100000000001;1301;JOÃO DA SILVA;JOÃO;DEPUTADO ESTADUAL;13;PT;Partido dos Trabalhadores",
    "2022;1;Eleições Gerais Estaduais 2022;100000000002;1302;MARIA SOUZA;MARIA-ZÉ;DEPUTADO ESTADUAL;13;PT;PARTIDO DOS TRABALHADORES (GRAFIA 2)",
    "2022;1;Eleições Gerais Estaduais 2022;100000000003;4501;ANTÔNIO LIMA;TONICO;GOVERNADOR;45;PSDB;Partido da Social Democracia Brasileira",
    "2022;2;Eleições Gerais Estaduais 2022;100000000003;4501;ANTÔNIO LIMA;TONICO;GOVERNADOR;45;PSDB;Partido da Social Democracia Brasileira",
    "2022;1;Eleições Gerais Estaduais 2022;100000000004;9901;ZÉ NINGUÉM;ZÉ;DEPUTADO ESTADUAL;99;XX;Partido Fantasma",
    "2022;1;Eleições Gerais Estaduais 2022;100000000001;1301;JOÃO DA SILVA;JOÃO;DEPUTADO ESTADUAL;13;PT;Partido dos Trabalhadores",
]
VOTES_HEADER = "SQ_CANDIDATO;QT_VOTOS;DS_SIT_TOT_TURNO"
VOTES_ROWS = [
    "100000000001;1500;ELEITO",
    "100000000001;2500;ELEITO",
    "100000000003;900;NÃO ELEITO",
    "100000000003;100;NÃO ELEITO",
    "999999999999;7;SUPLENTE",
]


@pytest.fixture(scope="module")
def cand_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("tse") / "consulta_cand_2022_BRASIL.csv"
    p.write_bytes(("\n".join([CAND_HEADER, *CAND_ROWS]) + "\n").encode("latin-1"))
    return str(p)


@pytest.fixture(scope="module")
def votes_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("tse_votes") / "votacao_candidato_munzona_2022_SP.csv"
    p.write_bytes(("\n".join([VOTES_HEADER, *VOTES_ROWS]) + "\n").encode("latin-1"))
    return str(p)


@pytest.fixture(scope="module")
def cand(spark, cand_csv):
    return read_tse_csv(spark, cand_csv, schemas.CONSULTA_CAND)


def empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_tse_csv_roundtrip(cand):
    rows = cand.collect()
    assert len(rows) == len(CAND_ROWS)
    names = {r.NM_CANDIDATO for r in rows}
    assert "JOÃO DA SILVA" in names and "ANTÔNIO LIMA" in names  # latin-1 ok
    assert rows[0].SQ_CANDIDATO == "100000000001"  # string end-to-end §2.9.6


def test_prune_consolidated():
    shards = [f"consulta_cand_2022_{uf}.csv" for uf in ("SP", "RJ", "MG")]
    both = shards + ["consulta_cand_2022_BRASIL.csv", "leiame.pdf"]
    assert prune_consolidated(both, "consulta_cand", 2022) == [
        "consulta_cand_2022_BRASIL.csv"
    ]
    assert prune_consolidated(shards + ["leiame.pdf"], "consulta_cand", 2022) == shards


def test_seed_parties_keep_first_and_upsert(spark, cand):
    parties = pipelines.seed_parties(cand, empty(spark, schemas.PARTIES))
    got = {r.party_number: r for r in parties.collect()}
    assert set(got) == {13, 45, 99}
    # keep-first by min tiebreak: party 13 keeps the first-ranked NM/SG pair
    assert got[13].party_name == "PARTIDO DOS TRABALHADORES (GRAFIA 2)"
    assert sorted(r.party_id for r in got.values()) == [1, 2, 3]
    # idempotent: re-seeding the same data changes nothing
    again = pipelines.seed_parties(cand, parties)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, parties.collect()))


def test_seed_politicians_distinct_uuid_absent(spark, cand):
    pols = pipelines.seed_politicians(cand, empty(spark, schemas.POLITICIANS))
    rows = pols.collect()
    assert len(rows) == 4  # 6 file rows → 4 distinct (name, nickname) pairs
    assert len({r.politician_id for r in rows}) == 4  # uuids minted, unique
    again = pipelines.seed_politicians(cand, pols)
    # insert-if-absent: same people, same ids (no re-mint on conflict)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_seed_elections_hardcoded_dates(spark, cand):
    els = pipelines.seed_elections(cand, empty(spark, schemas.ELECTIONS))
    by_turn = {r.turn: r for r in els.collect()}
    assert len(by_turn) == 2
    assert by_turn[1].election_date.month == 10 and by_turn[1].election_date.day == 2
    assert by_turn[2].election_date.day == 30  # §2.9.5 exactly as hardcoded


def test_seed_candidacies_join_chain_and_missdrop(spark, cand):
    # parties dim deliberately missing party 99 → its row must drop (P6).
    parties = pipelines.seed_parties(
        cand.filter(F.col("NR_PARTIDO") != 99), empty(spark, schemas.PARTIES)
    )
    pols = pipelines.seed_politicians(cand, empty(spark, schemas.POLITICIANS))
    els = pipelines.seed_elections(cand, empty(spark, schemas.ELECTIONS))
    cands = pipelines.seed_candidacies(
        cand, parties, pols, els, empty(spark, schemas.CANDIDACIES)
    )
    rows = cands.collect()
    # 6 file rows − 1 duplicate (insert-if-absent) − 1 party-99 miss = 4
    assert len(rows) == 4
    assert all(r.sq_candidate_tse != "100000000004" for r in rows)
    assert all(r.total_votes_received is None for r in rows)


def test_update_results_sum_min_and_accounting(spark, cand, votes_csv):
    votes = read_tse_csv(spark, votes_csv, schemas.VOTACAO_MUNZONA)
    parties = pipelines.seed_parties(cand, empty(spark, schemas.PARTIES))
    pols = pipelines.seed_politicians(cand, empty(spark, schemas.POLITICIANS))
    els = pipelines.seed_elections(cand, empty(spark, schemas.ELECTIONS))
    cands = pipelines.seed_candidacies(
        cand, parties, pols, els, empty(spark, schemas.CANDIDACIES)
    )
    updated = pipelines.update_results(votes, cands)
    by_sq = {r.sq_candidate_tse: r for r in updated.collect()}
    assert by_sq["100000000001"].total_votes_received == 4000  # summed zones
    assert by_sq["100000000001"].status_resultado == "ELEITO"
    # both turns of candidate 3 get the same aggregate (key = sq only)
    assert by_sq["100000000003"].total_votes_received == 1000
    # untouched candidacy keeps NULLs (left-join + coalesce semantics)
    assert by_sq["100000000002"].total_votes_received is None
    acct = pipelines.update_results_accounting(votes, cands).collect()[0]
    assert acct.matched_keys == 2 and acct.unmatched_keys == 1  # ghost SQ warned
