#!/usr/bin/env python
"""Round-6 batch A/B scale probe: K×-replicated sf0.1 tables, timing the
new operator families at 1× vs K×. Expected shapes:

- txlog_zorder_storage_report — one clustering pass (min/max agg +
  map-side Morton + per-bucket writes) ⇒ ~linear in orders; file count
  CONSTANT (16 Z-buckets by construction).
- partition_pruning_report — partitioned write is the data pass; the
  pruned read touches the same in-range partitions with K× rows each ⇒
  ~linear, constant partition counts.
- orc_roundtrip_stats — format write+read+agg ⇒ ~linear.
- linkage_fs_weights — THE deliberate quadratic probe: blocked pair
  count is Σ|block_A|·|block_B|. Replicating customers into the SAME
  nations (fixed 25 blocks) must grow pairs ×K² — the documented
  contract that blocking-key cardinality has to scale with the data.
  Replicating into FRESH nations (blocks scale with data) must stay
  ~linear. Both are measured so the contract is a number, not a claim.

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SURVEY.md (run manually, not in CI).

Usage: python tools/r11_scale_probe.py [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.plans.catalog import CATALOG  # noqa: E402
from politicamente_etl_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(spark, k: int, out_dir: str, fresh_nations: bool) -> None:
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    max_ck = cust.agg(F.max("c_custkey")).collect()[0][0]
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0]
    max_ev = ev.agg(F.max("event_id")).collect()[0][0]
    parts_c, parts_o, parts_l, parts_e = [], [], [], []
    for i in range(k):
        c = cust.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(i * max_ck)
        ).withColumn(
            "c_name", F.concat(F.lit(f"R{i}"), F.col("c_name"))
        )
        if fresh_nations and i > 0:
            c = c.withColumn(
                "c_nationkey", F.col("c_nationkey") + F.lit(i * 25)
            )
        parts_c.append(c)
        parts_o.append(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * max_ok)
            ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * max_ck))
        )
        parts_l.append(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * max_ok)
            )
        )
        parts_e.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * max_ev))
        )
    for name, parts in (
        ("customer", parts_c),
        ("orders", parts_o),
        ("lineitem", parts_l),
        ("events", parts_e),
    ):
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


QUERIES = [
    "txlog_zorder_storage_report",
    "partition_pruning_report",
    "orc_roundtrip_stats",
    "linkage_fs_weights",
    # batch E/F (round 6): bloom build is one extra agg job ⇒ ~linear;
    # DV report is three snapshot aggregates + O(1) tombstone commits ⇒
    # ~linear (this row CAUGHT the NOT-IN literal blow-up: 19 s → 81 s
    # at 4× before the broadcast anti-join fix, flat after)
    "txlog_bloom_point_scan",
    "txlog_deletion_vector_report",
]


def run(spark, sf_dir: str, label: str) -> None:
    for name in QUERIES:
        t0 = time.monotonic()
        out = CATALOG[name].fn(spark, sf_dir)
        rows = out.count()
        dt = time.monotonic() - t0
        extra = ""
        if name == "linkage_fs_weights":
            r = {x.field: x for x in CATALOG[name].fn(spark, sf_dir).collect()}
            pairs = r["name_exact"].n_match + r["name_exact"].n_unmatch
            extra = f" pairs={pairs}"
        print(f"  [{label}] {name}: {dt:6.2f}s rows={rows}{extra}")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="r11-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"== 1x baseline ({SRC}) ==")
    run(spark, SRC, "1x")
    for fresh in (False, True):
        tag = "fresh-blocks" if fresh else "fixed-blocks"
        d = tempfile.mkdtemp(prefix=f"r11probe_{tag}_")
        try:
            replicate(spark, k, d, fresh_nations=fresh)
            print(f"== {k}x {tag} ({d}) ==")
            if fresh:
                run(spark, d, f"{k}x-{tag}")
            else:
                # only the linkage query cares about block layout; run
                # the full set once (fixed) and just linkage again (fresh)
                run(spark, d, f"{k}x-{tag}")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
