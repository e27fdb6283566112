#!/usr/bin/env python
"""Probe: executor-parallel zipcsv scan vs driver-side extract-then-scan.

Builds a synthetic feed of N ZIP archives x M CSV members (R rows each),
then times (a) the zipcsv DataSource end-to-end aggregate and (b) the
ingest.py path: sequential driver unzip to a landing dir + parquet-style
CSV scan + the same aggregate. Prints one JSON line.

The point is the SHAPE, not the absolute numbers: zipcsv's wall-clock is
bounded by (members / cores) x member-parse time with zero landing I/O,
while the driver path pays a serial unzip of every byte before the first
task starts — the gap widens linearly with archive count.

    python tools/zip_scale_probe.py [n_zips] [members] [rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from politicamente_etl_spark.session import get_spark  # noqa: E402
from politicamente_etl_spark.sources.zipsource import register_zipcsv  # noqa: E402


def main() -> None:
    n_zips = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    members = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000

    spark = get_spark(app_name="zip-probe", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_zipcsv(spark)

    work = tempfile.mkdtemp(prefix="zip_probe_")
    paths = []
    body_rows = "\n".join(f"{i};w{i % 97} text token {i % 13}" for i in range(rows))
    for z in range(n_zips):
        zp = os.path.join(work, f"feed_{z}.zip")
        with zipfile.ZipFile(zp, "w") as zf:
            for m in range(members):
                zf.writestr(f"part_{m}.csv", f"doc_id;text\n{body_rows}")
        paths.append(zp)

    def agg_count(df) -> int:
        return df.selectExpr(
            "count(*) AS n", "count(DISTINCT text) AS d"
        ).collect()[0]["n"]

    # (a) executor-parallel zipcsv. One warmup pass first: the initial
    # Python-DataSource stage pays the session's Python-worker cold start
    # (~4-6 s on this box) exactly once per executor — bench.py's warmup
    # discipline applies here too, and a long-lived cluster pays it never.
    df = spark.read.format("zipcsv").option("path", ",".join(paths)).load()
    agg_count(df)
    t0 = time.perf_counter()
    n_a = agg_count(df)
    t_zipcsv = time.perf_counter() - t0

    # (b) driver-side extract, then distributed CSV scan (the serial
    # unzip is timed separately — it is the part that scales with archive
    # bytes while (a) parallelizes it away)
    t0 = time.perf_counter()
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    extracted = []
    for zp in paths:
        sub = os.path.join(landing, os.path.basename(zp))
        with zipfile.ZipFile(zp) as zf:
            zf.extractall(sub)
        extracted.append(sub)
    t_unzip = time.perf_counter() - t0
    csvs = [
        os.path.join(d, f) for d in extracted for f in os.listdir(d)
    ]
    df_b = (
        spark.read.schema("doc_id string, text string")
        .options(sep=";", header=True)
        .csv(csvs)
    )
    n_b = agg_count(df_b)
    t_extract = time.perf_counter() - t0

    shutil.rmtree(work, ignore_errors=True)
    assert n_a == n_b == n_zips * members * rows
    print(
        json.dumps(
            {
                "n_zips": n_zips,
                "members": members,
                "rows_per_member": rows,
                "total_rows": n_a,
                "zipcsv_warm_sec": round(t_zipcsv, 3),
                "extract_then_scan_sec": round(t_extract, 3),
                "serial_unzip_sec": round(t_unzip, 3),
                "partitions_zipcsv": df.rdd.getNumPartitions(),
            }
        )
    )


if __name__ == "__main__":
    main()
