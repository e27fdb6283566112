"""SparkSession factory.

The reference (`/root/reference/src/politicamente_etl/database.py:7-10`) builds
a new SQLAlchemy engine per call; our analogue is a process-wide SparkSession
configured once, with every knob that matters for both local testing and a
large cluster:

- AQE on (runtime join-strategy switch, partition coalescing, skew-join
  splitting) — this is what lets the same declarative plan survive a 100x
  scale-up without re-tuning.
- Arrow on (vectorized Python interop for the few pandas_udf code paths).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- shuffle.partitions sized to cores locally; on a real cluster this should
  be ~2-3x total executor cores or simply left to AQE's coalescing with a
  high initial partition number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "politicamente-etl-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or return) the configured SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) else '*'.
    """
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_shuffle = shuffle_partitions or (int(cpus) if str(cpus).isdigit() else 32)
    # local[] runs everything in the driver JVM; the 1g default heap both
    # GC-throttles wide shuffles and OOMs multi-GB probes. Sized for the
    # bench box; on a real cluster use spark-submit's --driver-memory /
    # --executor-memory instead (this conf only applies pre-JVM-start).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimensions (nation/region/part at our SFs; parties/elections in the
        # reference's domain) are tiny relative to facts — raise the broadcast
        # threshold so the dim-join chain never shuffles the fact table.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
