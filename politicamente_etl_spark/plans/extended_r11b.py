"""Round-6 batch B: three new surface families.

- Hive-style partition pruning, measured at the storage layer
  (`partition_pruning_report`) — the scan-layer twin of the txlog
  zonemap queries: the Spark side writes a day-partitioned layout and
  reports what a range read actually touched; the oracle derives the
  same numbers from date math alone.
- Fellegi-Sunter record linkage (`linkage_fs_weights`) — the
  m/u-probability estimation core of probabilistic entity resolution
  (Fellegi & Sunter 1969, the Splink/dedupe.io model), over blocked
  candidate pairs of a deterministically-dirtied twin file.
- ORC format roundtrip (`orc_roundtrip_stats`) — widens the
  source/sink format matrix (CSV/ZIP/JDBC/JSONL/parquet/txlog → +ORC)
  with a fidelity-proving aggregate.

Engine-parity rules as usual: integer/ppm outputs, decimal-snapped
money, no DATE/TIMESTAMP output columns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.functions.scalar import money_sum, sql_money_sum


def _register():
    from politicamente_etl_spark.plans.catalog import T, load_events, register

    @register(
        "partition_pruning_report",
        sql="""
        WITH e AS (
            SELECT epoch_us(ts) // 86400000000 AS pday FROM events
        ), b AS (
            SELECT MIN(pday) AS mn, MAX(pday) AS mx FROM e
        ), box AS (
            SELECT mn + (mx - mn + 1) * 1 // 3 AS lo,
                   mn + (mx - mn + 1) * 2 // 3 - 1 AS hi
            FROM b
        )
        SELECT (SELECT CAST(COUNT(DISTINCT pday) AS BIGINT) FROM e)
                   AS n_partitions_total,
               (SELECT CAST(COUNT(DISTINCT pday) AS BIGINT) FROM e, box
                 WHERE pday BETWEEN lo AND hi) AS n_files_read,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e, box
                 WHERE pday BETWEEN lo AND hi) AS n_rows_read
        """,
        tags=("ext-scan", "ext-sink"),
    )
    def q_partition_pruning_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Hive-style partition pruning, measured: events are WRITTEN
        day-partitioned (partitionBy(pday) after a repartition("pday")
        shuffle, so each day directory holds exactly one file —
        deterministic layout), then a day-range read (middle third of
        the span) reports what the scan touched: files contributing
        rows (distinct input_file_name == partition dirs opened, one
        file each) and rows read. The oracle computes the same three
        numbers from epoch-day math with no storage at all, so a green
        row certifies the partitioned layout holds exactly the
        expected partition set and the range read touches exactly the
        in-range partitions. The PLAN-level guarantee (PartitionFilters
        reach the scan, out-of-range dirs never listed) is pinned by
        tests/test_round11_ops.py.

        100 TB: partition-on-ingest-date is the first-line data layout
        for log tables — pruning cost is O(partitions) metadata, and a
        time-bounded query reads only its days. Partition by a coarse
        key (day, not hour*user) or small files eat the win."""
        ev = load_events(spark, sf_dir).select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("pday"),
        )
        b = ev.agg(F.min("pday").alias("mn"), F.max("pday").alias("mx")).first()
        lo = b.mn + (b.mx - b.mn + 1) * 1 // 3
        hi = b.mn + (b.mx - b.mn + 1) * 2 // 3 - 1
        path = os.path.join(tempfile.mkdtemp(prefix="partpruned_"), "events")
        ev.repartition("pday").write.partitionBy("pday").parquet(path)
        rdf = spark.read.parquet(path).filter(F.col("pday").between(lo, hi))
        n_files_read = rdf.select(F.input_file_name()).distinct().count()
        n_rows_read = rdf.count()
        n_total = spark.read.parquet(path).select("pday").distinct().count()
        return spark.createDataFrame(
            [(n_total, n_files_read, n_rows_read)],
            "n_partitions_total long, n_files_read long, n_rows_read long",
        )

    @register(
        "linkage_fs_weights",
        sql="""
        WITH a AS (
            SELECT c_custkey AS k, c_nationkey AS nk, c_name AS nm,
                   substring(c_name, length(c_name) - 2, 3) AS sfx,
                   c_mktsegment AS seg
            FROM customer
        ), b AS (
            SELECT c_custkey AS k, c_nationkey AS nk,
                   CASE WHEN c_custkey % 5 = 0
                        THEN substring(c_name, 1, length(c_name) - 1)
                        ELSE c_name END AS nm,
                   CASE WHEN c_custkey % 3 = 0
                        THEN 'UNKNOWN' ELSE c_mktsegment END AS seg
            FROM customer
        ), pairs AS (
            SELECT CASE WHEN a.k = b.k THEN 1 ELSE 0 END AS is_match,
                   CASE WHEN a.nm = b.nm THEN 1 ELSE 0 END AS ag_name,
                   CASE WHEN a.sfx = substring(b.nm, length(b.nm) - 2, 3)
                        THEN 1 ELSE 0 END AS ag_sfx,
                   CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS ag_seg
            FROM a JOIN b ON a.nk = b.nk
        ), agg AS (
            SELECT SUM(is_match) AS n_match,
                   SUM(1 - is_match) AS n_unmatch,
                   SUM(is_match * ag_name) AS m_name,
                   SUM((1 - is_match) * ag_name) AS u_name,
                   SUM(is_match * ag_sfx) AS m_sfx,
                   SUM((1 - is_match) * ag_sfx) AS u_sfx,
                   SUM(is_match * ag_seg) AS m_seg,
                   SUM((1 - is_match) * ag_seg) AS u_seg
            FROM pairs
        )
        SELECT field, CAST(n_match AS BIGINT) AS n_match,
               CAST(n_unmatch AS BIGINT) AS n_unmatch,
               CAST(m_agree * 1000000 // n_match AS BIGINT) AS m_ppm,
               CAST(u_agree * 1000000 // n_unmatch AS BIGINT) AS u_ppm
        FROM (
            SELECT 'name_exact' AS field, n_match, n_unmatch,
                   m_name AS m_agree, u_name AS u_agree FROM agg
            UNION ALL
            SELECT 'name_suffix3', n_match, n_unmatch, m_sfx, u_sfx FROM agg
            UNION ALL
            SELECT 'segment', n_match, n_unmatch, m_seg, u_seg FROM agg
        )
        """,
        tags=("ext-dedup", "ext-quality", "ext-stats"),
    )
    def q_linkage_fs_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Fellegi-Sunter probabilistic record linkage, the estimation
        half: customers are linked against a deterministically DIRTIED
        twin file (every 5th name truncated, every 3rd segment wiped —
        the reproducible stand-in for OCR noise / stale CRM exports),
        candidate pairs are generated by BLOCKING on nationkey, and
        per-field agreement is scored against ground truth (same
        custkey) to estimate each comparison field's m (P(agree|match))
        and u (P(agree|non-match)) in exact ppm. The three fields are
        chosen to span the design space: name_exact (high m, u=0 —
        near-unique identifier), name_suffix3 (high m, small u — a
        fuzzy key with collisions), segment (moderate m, LARGE u — a
        low-cardinality field worth little log-odds weight).

        Scale shape: ONE equi-join on the blocking key — the pair count
        is Σ|block_A|·|block_B|, controlled entirely by blocking-key
        cardinality (at 100 TB you block on (postcode, name-soundex),
        not nation); agreement scoring and the m/u rollup are map-side
        expressions + one bounded aggregate. No all-pairs product
        exists anywhere. Reference framing: the reference dedupes on
        exact keys only (load.py upsert); this is the probabilistic
        superset used for training-data entity resolution."""
        c = T(spark, sf_dir, "customer")
        a = c.select(
            F.col("c_custkey").alias("ak"),
            F.col("c_nationkey").alias("nk"),
            F.col("c_name").alias("anm"),
            F.expr("substring(c_name, length(c_name) - 2, 3)").alias("asfx"),
            F.col("c_mktsegment").alias("aseg"),
        )
        b = c.select(
            F.col("c_custkey").alias("bk"),
            F.col("c_nationkey").alias("nk"),
            F.when(
                F.col("c_custkey") % 5 == 0,
                F.expr("substring(c_name, 1, length(c_name) - 1)"),
            )
            .otherwise(F.col("c_name"))
            .alias("bnm"),
            F.when(F.col("c_custkey") % 3 == 0, F.lit("UNKNOWN"))
            .otherwise(F.col("c_mktsegment"))
            .alias("bseg"),
        )
        pairs = a.join(b, "nk").select(
            (F.col("ak") == F.col("bk")).cast("long").alias("is_match"),
            (F.col("anm") == F.col("bnm")).cast("long").alias("ag_name"),
            (
                F.col("asfx")
                == F.expr("substring(bnm, length(bnm) - 2, 3)")
            )
            .cast("long")
            .alias("ag_sfx"),
            (F.col("aseg") == F.col("bseg")).cast("long").alias("ag_seg"),
        )
        agg = pairs.agg(
            F.sum("is_match").alias("n_match"),
            F.sum(1 - F.col("is_match")).alias("n_unmatch"),
            *[
                F.sum(F.col("is_match") * F.col(f"ag_{f}")).alias(f"m_{f}")
                for f in ("name", "sfx", "seg")
            ],
            *[
                F.sum((1 - F.col("is_match")) * F.col(f"ag_{f}")).alias(
                    f"u_{f}"
                )
                for f in ("name", "sfx", "seg")
            ],
        )
        rows = []
        for field, f in (
            ("name_exact", "name"),
            ("name_suffix3", "sfx"),
            ("segment", "seg"),
        ):
            rows.append(
                agg.select(
                    F.lit(field).alias("field"),
                    F.col("n_match").cast("long").alias("n_match"),
                    F.col("n_unmatch").cast("long").alias("n_unmatch"),
                    F.expr(f"m_{f} * 1000000 div n_match")
                    .cast("long")
                    .alias("m_ppm"),
                    F.expr(f"u_{f} * 1000000 div n_unmatch")
                    .cast("long")
                    .alias("u_ppm"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    @register(
        "orc_roundtrip_stats",
        sql=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               {sql_money_sum('l_extendedprice', 'sum_price')}
        FROM lineitem GROUP BY 1, 2
        """,
        tags=("ext-scan", "ext-sink"),
    )
    def q_orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ORC format fidelity: lineitem's query columns round-trip
        through an ORC write+read (Spark's built-in columnar sibling to
        parquet — zlib-striped, with its own predicate-pushdown index),
        then aggregate per (returnflag, linestatus). The oracle runs on
        the ORIGINAL parquet, so a green row proves the ORC sink/source
        pair preserves values exactly (long/double/string round-trip,
        decimal-snapped money). Widens the format matrix: CSV-in-ZIP,
        JDBC, JSONL, parquet, txlog, +ORC.

        100 TB: format choice is a scan-cost lever, not a semantics
        one — this row is the regression gate for that claim."""
        li = T(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
        )
        path = os.path.join(tempfile.mkdtemp(prefix="orc_rt_"), "lineitem")
        li.write.orc(path)
        back = spark.read.orc(path)
        return back.groupBy("l_returnflag", "l_linestatus").agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("sum_qty"),
            money_sum("l_extendedprice", "sum_price"),
        )


_register()
