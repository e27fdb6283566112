#!/usr/bin/env python
"""VERDICT r5 item 2 probe: the seq_pattern_support max_types guard.

Widens the event-type taxonomy W× (suffix each type with
pmod(event_id, W)) on the sf0.01 events table and runs
stats.seq_pattern_support with a cap K small enough that the widened
domains exceed it. What flatness must show:

- pattern-grid rows: T + T^2 + T^3 while T <= K, then EXACTLY
  K + K^2 + K^3 once the taxonomy outgrows the cap — flat between
  W=4 and W=16 even though the raw taxonomy grew 4x.
- wall time: flat once the cap binds (matching work is
  |sessions| x |grid|; the grid stops growing).
- the unguarded counterfactual is computed analytically
  (T + T^2 + T^3 from the distinct-type count), not run — at W=16 it
  is ~64x the capped grid and the whole point is not to build it.

Writes nothing to the repo; results recorded in SURVEY.md (run
manually, not in CI).

Usage: python tools/r6_seqpattern_guard_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.operators.stats import seq_pattern_support  # noqa: E402
from politicamente_etl_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_PROBE_SF_DIR", "/root/testdata/sf0.01")
CAP = 8  # small cap so W=4/W=16 both exceed it at probe scale


def main() -> None:
    spark = get_spark(app_name="r6-seqpattern-guard-probe")
    ev = spark.read.parquet(f"{SRC}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    print(f"events rows: {ev.count()}")
    for w in (1, 4, 16):
        widened = ev.withColumn(
            "event_type",
            F.concat_ws(
                "_", "event_type", F.pmod(F.col("event_id"), F.lit(w))
            ),
        )
        t_types = widened.select("event_type").distinct().count()
        uncapped_grid = t_types + t_types**2 + t_types**3
        t0 = time.monotonic()
        out = seq_pattern_support(widened, max_types=CAP)
        grid_rows = out.count()
        dt = time.monotonic() - t0
        eff = min(t_types, CAP)
        expect = eff + eff**2 + eff**3
        print(
            f"W={w:>2}: taxonomy={t_types:>3} grid_rows={grid_rows:>6} "
            f"(expect {expect}) uncapped_would_be={uncapped_grid:>8} "
            f"wall={dt:6.2f}s"
        )
        assert grid_rows == expect, (grid_rows, expect)
    spark.stop()


if __name__ == "__main__":
    main()
