#!/usr/bin/env python
"""Round-7 delete-file sidecar probe (VERDICT r6 item 2's 'done' bar):
tombstone N vs 4N keys through BOTH storage forms and measure what each
costs FOREVER AFTER — the manifest bytes every subsequent reader parses,
the history() fold time, and the snapshot read time.

Expected shapes:
- sidecar form: manifest size FLAT at 4× (stores {path, key, n_keys});
  read cost flat-ish (broadcast anti-join against a parquet key set).
- inline form: manifest size ~linear in keys — the r6-verdict
  scale-killer this round removed from the default path (it remains
  correct and right for small compliance batches).

Writes nothing to the repo; probe data lands in /tmp. Results recorded
in SCALING.md (run manually, not in CI).

Usage: python tools/r12_sidecar_probe.py [N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.session import get_spark  # noqa: E402
from politicamente_etl_spark.sources.txlog import TxLogTable  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
ROWS = 400_000


def run(form: str, n_keys: int) -> dict:
    spark = run.spark
    root = tempfile.mkdtemp(prefix=f"sideprobe_{form}_{n_keys}_")
    path = os.path.join(root, "t")
    df = spark.range(1, ROWS + 1).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    t = TxLogTable.create(spark, path, df.repartition(8))
    keys = spark.range(1, n_keys + 1).select((F.col("id") * 16).alias("k"))
    t0 = time.perf_counter()
    if form == "sidecar":
        m = t.delete_where_logical("k", keys_df=keys)
    else:
        m = t.delete_where_logical(
            "k", [r[0] for r in keys.collect()]
        )
    commit_sec = time.perf_counter() - t0
    manifest_bytes = os.path.getsize(
        os.path.join(path, "_txlog", f"{m['version']:020d}.json")
    )
    t0 = time.perf_counter()
    for _ in range(20):
        TxLogTable(spark, path).history()
    history_sec = (time.perf_counter() - t0) / 20
    t0 = time.perf_counter()
    n = t.snapshot().count()
    read_sec = time.perf_counter() - t0
    shutil.rmtree(root)
    return {
        "form": form,
        "n_keys": n_keys,
        "commit_sec": round(commit_sec, 3),
        "manifest_bytes": manifest_bytes,
        "history_parse_sec": round(history_sec, 5),
        "snapshot_read_sec": round(read_sec, 3),
        "rows_surviving": n,
    }


def main() -> None:
    run.spark = get_spark(app_name="sidecar-probe", cpus="8")
    run.spark.sparkContext.setLogLevel("ERROR")
    results = [
        run("sidecar", N),
        run("sidecar", 4 * N),
        run("inline", N),
        run("inline", 4 * N),
    ]
    for r in results:
        print(json.dumps(r))
    s1, s4, i1, i4 = results
    print(
        json.dumps(
            {
                "sidecar_manifest_growth_at_4x": round(
                    s4["manifest_bytes"] / s1["manifest_bytes"], 3
                ),
                "inline_manifest_growth_at_4x": round(
                    i4["manifest_bytes"] / i1["manifest_bytes"], 3
                ),
                "sidecar_read_growth_at_4x": round(
                    s4["snapshot_read_sec"] / s1["snapshot_read_sec"], 2
                ),
                "sidecar_history_growth_at_4x": round(
                    s4["history_parse_sec"]
                    / max(s1["history_parse_sec"], 1e-9),
                    2,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
