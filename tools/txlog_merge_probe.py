#!/usr/bin/env python
"""Quantify the file-pruned MERGE win: same narrow batch (0.4% of keys)
merged into the same 64-file sf0.1 orders table through

  (a) sinks.merge_upsert(backend="parquet")  — read + rewrite the WHOLE
      table (the pre-txlog path), and
  (b) TxLogTable.merge                       — zonemap preprune + semi-
      join, rewriting only the files that contain a matched key.

Prints wall time and files/bytes rewritten for both. Results recorded in
SURVEY.md (run manually, not in CI).

Usage: python tools/txlog_merge_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.session import get_spark  # noqa: E402
from politicamente_etl_spark.sources import sinks  # noqa: E402
from politicamente_etl_spark.sources.txlog import TxLogTable  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    spark = get_spark(app_name="txlog-merge-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="mergeprobe_")
    try:
        o = spark.read.parquet(f"{SRC}/orders.parquet").repartitionByRange(
            64, "o_orderkey"
        )
        # a key-CONTIGUOUS batch (the nightly pattern: updates land in
        # recent key/time ranges). A key-UNIFORM batch (every Nth key)
        # touches every range-partitioned file and file pruning cannot
        # help by construction — same property as Delta, and the reason
        # tables are clustered by their merge key.
        keys = spark.read.parquet(f"{SRC}/orders.parquet").agg(
            F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
        ).first()
        span = keys["hi"] - keys["lo"]
        lo = keys["lo"] + span // 2
        hi = lo + span // 100  # ~1% of the key space
        batch = (
            spark.read.parquet(f"{SRC}/orders.parquet")
            .filter(F.col("o_orderkey").between(lo, hi))
            .withColumn("o_orderpriority", F.lit("0-PROBE"))
        )
        n_batch = batch.count()

        # (a) whole-table rewrite path
        plain = os.path.join(base, "plain")
        o.write.parquet(plain)
        before = dir_bytes(plain)
        t0 = time.monotonic()
        sinks.merge_upsert(spark, plain, batch, ["o_orderkey"], backend="parquet")
        t_plain = time.monotonic() - t0
        rewritten_plain = dir_bytes(plain)

        # (b) txlog pruned merge
        tl_path = os.path.join(base, "tx")
        t = TxLogTable.create(spark, tl_path, o)
        t0 = time.monotonic()
        m = t.merge(batch, ["o_orderkey"])
        t_tx = time.monotonic() - t0
        st = m["merge_stats"]
        added_bytes = sum(
            os.path.getsize(os.path.join(tl_path, f)) for f in m["added"]
        )
        print(
            f"batch rows: {n_batch} (~{100.0 * n_batch / o.count():.2f}% of table); "
            f"table bytes: {before / 1e6:.1f} MB in 64 files"
        )
        print(
            f"(a) merge_upsert parquet backend: {t_plain:6.2f}s, "
            f"rewrote the full table ({rewritten_plain / 1e6:.1f} MB)"
        )
        print(
            f"(b) txlog file-pruned merge:      {t_tx:6.2f}s, rewrote "
            f"{st['files_rewritten']} files / preserved "
            f"{st['files_preserved']} / zonemap-skipped "
            f"{st['files_skipped_by_stats']} ({added_bytes / 1e6:.1f} MB written)"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
