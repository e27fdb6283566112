"""CLI — the reference's `main.py` surface on the Spark engine.

Subcommands mirror `main.py:29-39` exactly (`seed_parties`,
`seed_politicians`, `seed_candidacies`, `update_results`) plus `seed_all`,
which the reference README advertises but never implemented (SURVEY.md
§2.9.7) — here it exists and runs the full chain in dependency order.

The "database" is a managed-parquet warehouse directory (one subdir per
sink table); every command reads the current table state, runs the pure
pipeline, and atomically rewrites the table. A JDBC Postgres sink could be
swapped in behind the same read/write seams (`df.write.jdbc`).

Usage:
    python -m politicamente_etl_spark.cli seed_parties --year 2022 \
        --data-dir data --warehouse warehouse
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import date

from pyspark.sql import DataFrame, SparkSession

from politicamente_etl_spark import pipelines, schemas
from politicamente_etl_spark.session import get_spark
from politicamente_etl_spark.sources import ingest
from politicamente_etl_spark.sources.sinks import write_managed

SINK_SCHEMAS = {
    "parties": schemas.PARTIES,
    "politicians": schemas.POLITICIANS,
    "elections": schemas.ELECTIONS,
    "candidacies": schemas.CANDIDACIES,
}


def read_sink(spark: SparkSession, warehouse: str, name: str) -> DataFrame:
    path = os.path.join(warehouse, name)
    if os.path.isdir(path):
        return spark.read.schema(SINK_SCHEMAS[name]).parquet(path)
    return spark.createDataFrame([], SINK_SCHEMAS[name])


def write_sink(df: DataFrame, warehouse: str, name: str) -> None:
    # Stage-then-swap: the pipeline output may read the table it replaces,
    # and overwriting a parquet dir mid-read corrupts it.
    path = os.path.join(warehouse, name)
    staged = path + ".staged"
    write_managed(df, staged, mode="overwrite")
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    os.replace(staged, path)


def _cand_source(spark: SparkSession, args) -> DataFrame | None:
    return ingest.get_tse_data(
        spark,
        args.year,
        args.cand_base_url,
        "consulta_cand",
        schemas.CONSULTA_CAND,
        data_dir=args.data_dir,
        force_download=args.force_download,
    )


def _votes_source(spark: SparkSession, args) -> DataFrame | None:
    return ingest.get_tse_data(
        spark,
        args.year,
        args.votes_base_url,
        "votacao_candidato_munzona",
        schemas.VOTACAO_MUNZONA,
        data_dir=args.data_dir,
        force_download=args.force_download,
    )


def cmd_seed_parties(spark, args) -> None:
    cand = _cand_source(spark, args)
    if cand is None:  # P5 null-guard (`load.py:11`)
        return
    out = pipelines.seed_parties(cand, read_sink(spark, args.warehouse, "parties"))
    write_sink(out, args.warehouse, "parties")


def cmd_seed_politicians(spark, args) -> None:
    cand = _cand_source(spark, args)
    if cand is None:
        return
    out = pipelines.seed_politicians(
        cand, read_sink(spark, args.warehouse, "politicians")
    )
    write_sink(out, args.warehouse, "politicians")


def cmd_seed_candidacies(spark, args) -> None:
    cand = _cand_source(spark, args)
    if cand is None:
        return
    elections = pipelines.seed_elections(
        cand, read_sink(spark, args.warehouse, "elections")
    )
    write_sink(elections, args.warehouse, "elections")
    out = pipelines.seed_candidacies(
        cand,
        read_sink(spark, args.warehouse, "parties"),
        read_sink(spark, args.warehouse, "politicians"),
        read_sink(spark, args.warehouse, "elections"),
        read_sink(spark, args.warehouse, "candidacies"),
    )
    write_sink(out, args.warehouse, "candidacies")


def cmd_update_results(spark, args) -> None:
    votes = _votes_source(spark, args)
    if votes is None:
        return
    cands = read_sink(spark, args.warehouse, "candidacies")
    acct = pipelines.update_results_accounting(votes, cands).collect()[0]
    out = pipelines.update_results(votes, cands)
    write_sink(out, args.warehouse, "candidacies")
    print(
        f"update_results: {acct.matched_keys} candidacies updated, "
        f"{acct.unmatched_keys} vote keys unmatched"
    )


def cmd_seed_all(spark, args) -> None:
    cmd_seed_parties(spark, args)
    cmd_seed_politicians(spark, args)
    cmd_seed_candidacies(spark, args)
    cmd_update_results(spark, args)


COMMANDS = {
    "seed_parties": cmd_seed_parties,
    "seed_politicians": cmd_seed_politicians,
    "seed_candidacies": cmd_seed_candidacies,
    "update_results": cmd_update_results,
    "seed_all": cmd_seed_all,
}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="politicamente-etl-spark",
        description="TSE election ETL on the PySpark engine",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for name in COMMANDS:
        p = sub.add_parser(name)
        p.add_argument("--year", type=int, default=date.today().year)
        p.add_argument("--force-download", action="store_true")
        p.add_argument("--data-dir", default="data")
        p.add_argument("--warehouse", default="warehouse")
        p.add_argument("--cand-base-url", default=ingest.TSE_CAND_BASE_URL)
        p.add_argument("--votes-base-url", default=ingest.TSE_VOTES_BASE_URL)
    return parser


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = spark or get_spark(app_name=f"etl-{args.command}")
    COMMANDS[args.command](spark, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
