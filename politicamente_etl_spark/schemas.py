"""Explicit schemas for every source and sink.

The reference infers CSV schemas per run (`extract.py:46`,
``low_memory=False`` forces a whole-file inference pass) — at 100 TB that is
an extra full scan, so every schema here is declared once as a StructType
(SURVEY.md §1.3-1.4).

Three schema families:
1. Driver synthetic star schema (``/root/testdata/sf*/*.parquet``) — declared
   for documentation/validation; parquet footers carry the authoritative types
   so readers do NOT pass these (avoids cast-on-read surprises).
2. TSE-shaped source schemas (the reference's CSV inputs, SURVEY.md §5.3).
3. Sink table schemas (the reference's four Postgres tables, SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# 1. Driver synthetic tables (FIXTURES.md §B)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# 2. TSE-shaped source schemas (reference inputs; SURVEY.md §5.3, FIXTURES.md §A)
#    Columns limited to those the reference actually touches
#    (`load.py:13,33,59,70-71,75,80-81,104-106,111`).
# ---------------------------------------------------------------------------

CONSULTA_CAND = StructType(
    [
        StructField("ANO_ELEICAO", IntegerType()),
        StructField("NR_TURNO", IntegerType()),
        StructField("DS_ELEICAO", StringType()),
        StructField("SQ_CANDIDATO", StringType()),  # string end-to-end (§2.9.6)
        StructField("NR_CANDIDATO", IntegerType()),
        StructField("NM_CANDIDATO", StringType()),
        StructField("NM_URNA_CANDIDATO", StringType()),
        StructField("DS_CARGO", StringType()),
        StructField("NR_PARTIDO", IntegerType()),
        StructField("SG_PARTIDO", StringType()),
        StructField("NM_PARTIDO", StringType()),
    ]
)

VOTACAO_MUNZONA = StructType(
    [
        StructField("SQ_CANDIDATO", StringType()),
        StructField("QT_VOTOS", LongType()),  # LongType: national sums overflow int32
        StructField("DS_SIT_TOT_TURNO", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# 3. Sink tables (reference Postgres schema, implied by SQL at
#    `load.py:20,40,63,88,120`; FIXTURES.md §A3)
# ---------------------------------------------------------------------------

PARTIES = StructType(
    [
        StructField("party_id", LongType()),
        StructField("party_number", IntegerType()),
        StructField("initials", StringType()),
        StructField("party_name", StringType()),
    ]
)

POLITICIANS = StructType(
    [
        StructField("politician_id", StringType()),  # uuid4 as string (§1.2)
        StructField("full_name", StringType()),
        StructField("nickname", StringType()),
    ]
)

ELECTIONS = StructType(
    [
        StructField("election_id", LongType()),
        StructField("election_date", DateType()),
        StructField("election_type", StringType()),
        StructField("turn", IntegerType()),
    ]
)

CANDIDACIES = StructType(
    [
        StructField("politician_id", StringType()),
        StructField("party_id", LongType()),
        StructField("election_id", LongType()),
        StructField("office", StringType()),
        StructField("electoral_number", IntegerType()),
        StructField("sq_candidate_tse", StringType()),
        StructField("total_votes_received", LongType()),
        StructField("status_resultado", StringType()),
    ]
)
