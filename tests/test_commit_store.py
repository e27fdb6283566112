"""CommitStore contract (VERDICT r8 item 4): the txlog's OCC rests on
ONE coordinated operation — atomic put-if-absent of a version manifest.
POSIX link(2) provides it locally (the default, exercised by
tests/test_occ_race.py across processes); an object-store deployment
plugs in a coordinator backed by conditional put (S3 If-None-Match,
GCS ifGenerationMatch=0) — the same split as Delta's LogStore. These
tests pin the seam's contract with a mock coordinator so a real
object-store implementation has an executable spec to pass.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading

import pytest

from politicamente_etl_spark.sources.txlog import (
    CommitStore,
    PosixLinkCommitStore,
    TxLogTable,
    _manifest_path,
)

pytestmark = pytest.mark.slow


class RecordingCommitStore(CommitStore):
    """Mock object-store coordinator: claims are arbitrated by an
    external table (here a lock-guarded set — the DynamoDB role in
    Delta's S3 store); the manifest bytes land via a plain
    non-atomic write, which is safe because the claim, not the file
    write, is the commit point for OTHER WRITERS, and the file is
    fully written before put_if_absent returns (readers list versions
    by filename)."""

    def __init__(self):
        self.claims: set[str] = set()
        self.lock = threading.Lock()
        self.calls: list[tuple[str, bool]] = []
        self.fail_next = 0  # simulate losing N races

    def put_if_absent(self, path: str, payload: str) -> bool:
        with self.lock:
            if self.fail_next > 0:
                self.fail_next -= 1
                self.calls.append((path, False))
                return False
            if path in self.claims or os.path.exists(path):
                self.calls.append((path, False))
                return False
            self.claims.add(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".staged"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, path)
        self.calls.append((path, True))
        return True


def _tmp(prefix):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


# -- contract: the primitive itself ---------------------------------------


@pytest.mark.parametrize("store_cls", [PosixLinkCommitStore, RecordingCommitStore])
def test_put_if_absent_exactly_one_winner(store_cls, tmp_path):
    store = store_cls()
    p = str(tmp_path / "log" / "00000000000000000001.json")
    results = [store.put_if_absent(p, f'{{"w": {i}}}') for i in range(5)]
    assert results == [True, False, False, False, False]
    with open(p) as fh:
        assert json.load(fh) == {"w": 0}, "loser must never clobber"


def test_put_if_absent_concurrent_threads(tmp_path):
    store = PosixLinkCommitStore()
    p = str(tmp_path / "log" / "00000000000000000007.json")
    wins: list[int] = []

    def claim(i):
        if store.put_if_absent(p, f'{{"w": {i}}}'):
            wins.append(i)

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    with open(p) as fh:
        assert json.load(fh)["w"] == wins[0]


def test_posix_store_leaves_no_staging_litter(tmp_path):
    store = PosixLinkCommitStore()
    p = str(tmp_path / "log" / "00000000000000000001.json")
    store.put_if_absent(p, "{}")
    store.put_if_absent(p, "{}")
    assert os.listdir(tmp_path / "log") == ["00000000000000000001.json"]


# -- contract: the table runs end-to-end on a mock coordinator -------------


def test_table_lifecycle_on_mock_coordinator(spark):
    store = RecordingCommitStore()
    path = _tmp("cstore_")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(0, 100).selectExpr("id as v", "id % 7 as grp"),
        commit_store=store,
    )
    t.append(spark.range(100, 120).selectExpr("id as v", "id % 7 as grp"))
    t.delete_where_logical("v", values=[1, 2, 3])
    t.merge(
        spark.range(0, 5).selectExpr("id as v", "cast(99 as bigint) as grp"),
        keys=["v"],
    )
    assert t.latest_version() == 4
    snap = t.snapshot()
    # 120 - 3 tombstoned + 3 re-INSERTED by the merge (v=1..3 are
    # unmatched after the delete, and upsert inserts unmatched keys)
    assert snap.count() == 120
    assert snap.filter("grp = 99").count() == 5
    # every commit went through the coordinator, none through link(2)
    assert len([c for c in store.calls if c[1]]) == 4
    assert {os.path.basename(p) for p, ok in store.calls if ok} == {
        f"{v:020d}.json" for v in range(1, 5)
    }
    # a fresh DEFAULT handle reads the same table (storage layout is
    # store-independent; only the claim is coordinated)
    assert TxLogTable(spark, path).snapshot().count() == 120


def test_append_rebases_on_coordinator_lost_race(spark):
    store = RecordingCommitStore()
    path = _tmp("cstore_race_")
    t = TxLogTable.create(
        spark, path, spark.range(0, 10).selectExpr("id as v"),
        commit_store=store,
    )
    store.fail_next = 2  # lose two claims before winning
    v = t.append(spark.range(10, 15).selectExpr("id as v"))
    assert v == 2
    assert t.snapshot().count() == 15
    falses = [c for c in store.calls if not c[1]]
    assert len(falses) == 2, "append must have retried through the store"


def test_clone_inherits_coordinator(spark):
    store = RecordingCommitStore()
    path = _tmp("cstore_clone_")
    t = TxLogTable.create(
        spark, path, spark.range(0, 10).selectExpr("id as v"),
        commit_store=store,
    )
    clone = t.clone_shallow(os.path.join(os.path.dirname(path), "c"))
    assert clone._commit_store is store
    assert clone.snapshot().count() == 10


def test_default_store_is_posix_link(spark):
    path = _tmp("cstore_default_")
    t = TxLogTable.create(spark, path, spark.range(0, 3).selectExpr("id as v"))
    assert isinstance(t._commit_store, PosixLinkCommitStore)
    assert os.path.exists(_manifest_path(path, 1))
