"""TRUE multi-process OCC race coverage (VERDICT r7 item 2).

The txlog's optimistic-concurrency claim is `os.link(tmp, manifest)` —
EEXIST means another writer holds the version (sources/txlog.py,
_try_commit). The in-process audit (`txlog_concurrent_writers_audit`)
interleaves two HANDLES deterministically; these tests race the actual
syscall from separate OS PROCESSES, which is what the single-host
guarantee actually rests on: link(2) is atomic in the kernel's dentry
layer, so two processes claiming the same version get exactly one
winner regardless of scheduling.

Scope note (documented limitation, SURVEY §6): link(2) atomicity is a
LOCAL/NFS-posix property. On object stores (S3) there is no link(2) —
Delta uses a coordinating LogStore there; this txlog targets
shared-POSIX deployments, same as Delta's HDFS/file: LogStore.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "occ_worker.py")


def _spawn(mode: str, path: str, nprocs: int, n_commits: int):
    bdir = tempfile.mkdtemp(prefix="occ_barrier_")
    barrier = os.path.join(bdir, f"go-{nprocs}")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, path, str(i), str(n_commits), barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def test_link_claim_exactly_one_winner_per_version():
    """6 processes × 10 commits, no Spark: every version is claimed by
    exactly one process, no version is skipped, and losers converge by
    rebasing — 60 total commits land as versions 1..60."""
    from politicamente_etl_spark.sources.txlog import TxLogTable

    path = os.path.join(tempfile.mkdtemp(prefix="occ_link_"), "t")
    os.makedirs(path)
    nprocs, n_commits = 6, 10
    outs = _spawn("link", path, nprocs, n_commits)

    all_wins = [v for o in outs for v in o["won"]]
    assert sorted(all_wins) == list(range(1, nprocs * n_commits + 1)), (
        "versions must partition 1..N with no duplicate and no gap"
    )
    # each manifest on disk records the single writer that won it, and
    # it matches that writer's own claim
    t = TxLogTable(None, path)
    by_version = {}
    for o in outs:
        for v in o["won"]:
            by_version[v] = o["writer"]
    for m in t.history():
        assert m["writer"] == by_version[m["version"]]
    # commit_ts strictly monotonic across all 60 racing commits (the
    # Delta adjustment must survive cross-process clock ties)
    ts = [m["commit_ts_ms"] for m in sorted(t.history(), key=lambda m: m["version"])]
    assert all(b > a for a, b in zip(ts, ts[1:]))


@pytest.mark.slow
def test_append_race_two_spark_processes(spark, sf_dir):
    """Two OS processes with their OWN SparkSessions race real append()
    commits (staging + rebase-on-EEXIST) on one table: no lost update —
    every row of every commit is in the final snapshot — and the two
    writers' versions interleave over a contiguous range."""
    from pyspark.sql import functions as F

    from politicamente_etl_spark.sources.txlog import TxLogTable

    path = os.path.join(tempfile.mkdtemp(prefix="occ_append_"), "t")
    seed = spark.range(0, 10).selectExpr(
        "id as k", "cast(-1 as bigint) as writer", "cast(-1 as bigint) as seq"
    )
    TxLogTable.create(spark, path, seed)  # v1

    nprocs, n_commits = 2, 4
    outs = _spawn("append", path, nprocs, n_commits)

    claimed = sorted(v for o in outs for v in o["versions"])
    assert claimed == list(range(2, 2 + nprocs * n_commits)), (
        "append rebase must converge on a contiguous version range"
    )
    t = TxLogTable(spark, path)
    snap = t.snapshot()
    # no lost update: every (writer, seq) batch fully present
    per_batch = (
        snap.filter(F.col("writer") >= 0)
        .groupBy("writer", "seq")
        .count()
        .collect()
    )
    assert len(per_batch) == nprocs * n_commits
    assert all(r["count"] == 100 for r in per_batch)
    assert snap.count() == 10 + nprocs * n_commits * 100
