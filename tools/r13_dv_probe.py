#!/usr/bin/env python
"""Scale probe for row-index deletion vectors (round 8).

Claims measured, not asserted:
1. the DV sidecar is ∝ deleted ROWS (~address pairs), independent of
   table width or key width;
2. the manifest stays O(1) regardless of delete size;
3. the read-side overhead of applying a fixed DV is flat as the TABLE
   grows (broadcast anti-join on addresses — no table shuffle);
4. delete_where_rowindex commit cost is ∝ matched rows (the predicate
   scan), with zero data files rewritten.

Usage: python tools/r13_dv_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from politicamente_etl_spark.session import get_spark  # noqa: E402
from politicamente_etl_spark.sources.txlog import TxLogTable, _manifest_path  # noqa: E402


def du(path: str) -> int:
    total = 0
    for root, _d, fs in os.walk(path):
        for f in fs:
            total += os.path.getsize(os.path.join(root, f))
    return total


def bench_read(t, n=3) -> float:
    best = 9e9
    for _ in range(n):
        t0 = time.perf_counter()
        t.snapshot().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="dv-probe", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # -- sidecar/manifest size vs delete count (fixed 200k-row table) --
    for n_del_mod, tag in ((80, "2500_deletes"), (20, "10000_deletes"),
                           (5, "40000_deletes")):
        path = os.path.join(tempfile.mkdtemp(prefix="dvp_"), "t")
        df = spark.range(0, 200_000).selectExpr(
            "id as k", "id % 97 as grp", "cast(id * 3 as double) as v"
        )
        t = TxLogTable.create(spark, path, df)
        m = t.delete_where_rowindex(f"k % {n_del_mod} = 1")
        side = du(os.path.join(path, "_deletes"))
        man = os.path.getsize(_manifest_path(path, 2))
        out[tag] = {
            "n_rows_deleted": m["delete_stats"]["n_rows"],
            "sidecar_bytes": side,
            "manifest_bytes": man,
        }

    # -- read overhead of a FIXED DV as the table scales 1x -> 4x ------
    for n_rows, tag in ((200_000, "table_1x"), (800_000, "table_4x")):
        path = os.path.join(tempfile.mkdtemp(prefix="dvp_"), "t")
        df = spark.range(0, n_rows).selectExpr(
            "id as k", "id % 97 as grp", "cast(id * 3 as double) as v"
        )
        t = TxLogTable.create(spark, path, df)
        plain = bench_read(t)
        t0 = time.perf_counter()
        t.delete_where_rowindex("k % 40 = 1 and k < 400000")
        commit_sec = time.perf_counter() - t0
        with_dv = bench_read(t)
        out[tag] = {
            "read_plain_sec": round(plain, 4),
            "read_with_dv_sec": round(with_dv, 4),
            "dv_overhead_ratio": round(with_dv / plain, 3),
            "dv_commit_sec": round(commit_sec, 4),
        }

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
