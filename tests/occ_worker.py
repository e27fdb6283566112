"""Subprocess workers for the multi-process OCC race tests
(tests/test_occ_race.py). Two modes:

  python occ_worker.py link <table_path> <writer_id> <n_commits> <barrier>
      No Spark: hammer TxLogTable._try_commit (the os.link(2) claim,
      sources/txlog.py) in a rebase loop until `n_commits` wins. Emits
      one JSON line {"writer": id, "won": [versions...]}.

  python occ_worker.py append <table_path> <writer_id> <n_commits> <barrier>
      Own SparkSession (local[2]): race real append() commits — staging,
      constraint path, rebase-on-EEXIST — against a sibling process.
      Emits one JSON line {"writer": id, "versions": [...], "rows": N}.

The barrier file makes both workers start the race together: each
worker touches <barrier>.<writer_id> then spins until every sibling's
touch exists (writer ids are 0..n-1; the parent passes n via the
barrier filename suffix convention <barrier>=<dir>/go-<nprocs>).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _barrier(barrier: str, writer_id: int) -> None:
    nprocs = int(barrier.rsplit("-", 1)[1])
    open(f"{barrier}.{writer_id}", "w").close()
    deadline = time.time() + 60
    while time.time() < deadline:
        if all(os.path.exists(f"{barrier}.{i}") for i in range(nprocs)):
            return
        time.sleep(0.005)
    raise TimeoutError("barrier wait timed out")


def run_link(path: str, writer_id: int, n_commits: int, barrier: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from politicamente_etl_spark.sources.txlog import TxLogTable

    t = TxLogTable(None, path)  # _try_commit never touches .spark
    _barrier(barrier, writer_id)
    won: list[int] = []
    while len(won) < n_commits:
        version = t.latest_version() + 1
        manifest = {
            "version": version,
            "op": "append",
            "added": [],
            "removed": [],
            "writer": writer_id,
            "seq": len(won),
        }
        if t._try_commit(version, manifest):
            won.append(version)
        # on EEXIST: rebase (latest_version re-read) and retry — the
        # exact loop append() runs
    print(json.dumps({"writer": writer_id, "won": won}))


def run_append(path: str, writer_id: int, n_commits: int, barrier: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from politicamente_etl_spark.sources.txlog import TxLogTable

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"occ-worker-{writer_id}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = TxLogTable(spark, path)
    _barrier(barrier, writer_id)
    versions: list[int] = []
    rows = 0
    for i in range(n_commits):
        lo = writer_id * 1_000_000 + i * 1_000
        df = spark.range(lo, lo + 100).selectExpr(
            "id as k", f"{writer_id} as writer", f"{i} as seq"
        )
        versions.append(t.append(df))
        rows += 100
    print(json.dumps({"writer": writer_id, "versions": versions, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    mode, path, wid, n, barrier = sys.argv[1:6]
    if mode == "link":
        run_link(path, int(wid), int(n), barrier)
    elif mode == "append":
        run_append(path, int(wid), int(n), barrier)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
