"""CLI for the stateful corpus-ingest pipeline (corpus.py) — the
operational entrypoints a curation team schedules:

    python -m politicamente_etl_spark.corpus_cli init \
        --root /warehouse/corpus --seed /data/seed_docs.parquet
    python -m politicamente_etl_spark.corpus_cli ingest \
        --root /warehouse/corpus --batch /data/night_batch.parquet [--dry-run]
    python -m politicamente_etl_spark.corpus_cli stream \
        --root /warehouse/corpus --inbox /landing/docs/

`ingest` prints one JSON line with the verdict histogram (the signal a
scheduler alerts on: a duplicate-rate spike means a feed is looping).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark import corpus
from politicamente_etl_spark.session import get_spark


def cmd_init(spark: SparkSession, args: argparse.Namespace) -> None:
    corpus.init_corpus(spark, args.root, spark.read.parquet(args.seed))


def cmd_ingest(spark: SparkSession, args: argparse.Namespace) -> None:
    report = corpus.ingest_batch(
        spark,
        args.root,
        spark.read.parquet(args.batch),
        min_tokens=args.min_tokens,
        near_threshold=args.near_threshold,
        lm_gate=args.lm_gate,
        commit=not args.dry_run,
    )
    hist = {
        r["verdict"]: r["n"]
        for r in report.groupBy("verdict")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    print(json.dumps({"root": args.root, "dry_run": args.dry_run, "verdicts": hist}))


def cmd_stream(spark: SparkSession, args: argparse.Namespace) -> None:
    corpus.stream_ingest(
        spark,
        args.root,
        args.inbox,
        min_tokens=args.min_tokens,
        near_threshold=args.near_threshold,
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="politicamente-corpus",
        description="Stateful training-corpus admission pipeline",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_init = sub.add_parser("init")
    p_init.add_argument("--root", required=True)
    p_init.add_argument("--seed", required=True)

    p_ing = sub.add_parser("ingest")
    p_ing.add_argument("--root", required=True)
    p_ing.add_argument("--batch", required=True)
    p_ing.add_argument("--dry-run", action="store_true")
    p_ing.add_argument("--min-tokens", type=int, default=30)
    p_ing.add_argument("--near-threshold", type=float, default=0.5)
    p_ing.add_argument(
        "--lm-gate", type=float, default=None,
        help="reject docs whose mean bigram-LM log-prob under the corpus "
             "model falls below this (off by default)",
    )

    p_str = sub.add_parser("stream")
    p_str.add_argument("--root", required=True)
    p_str.add_argument("--inbox", required=True)
    p_str.add_argument("--min-tokens", type=int, default=30)
    p_str.add_argument("--near-threshold", type=float, default=0.5)
    return parser


COMMANDS = {"init": cmd_init, "ingest": cmd_ingest, "stream": cmd_stream}


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = spark or get_spark(app_name=f"corpus-{args.command}")
    COMMANDS[args.command](spark, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
