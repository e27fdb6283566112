"""Round-7 batch H: the XML source/sink pair (native in Spark 4 — the
former spark-xml package merged into core), widening the format matrix,
plus a schema-drift union audit across heterogeneous source vintages."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "xml_roundtrip_stats",
        sql="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(SUM(length(text)) AS BIGINT) AS chars_sum,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum
        FROM documents
        GROUP BY source
        """,
        tags=("ext-source", "ext-sink"),
    )
    def q_xml_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """XML source coverage (NATIVE in Spark 4 — SPARK-44751 merged
        the spark-xml package into core): write the documents table as
        row-tagged XML, read it back with an EXPLICIT schema (XML
        schema inference is a full extra scan at 100 TB, same rule as
        JSONL), and fingerprint per source against the original
        parquet. Equality proves the trip lossless through XML's
        entity-escaping layer (text content survives &/</> escaping
        byte-exactly). Completes the format matrix: CSV-in-ZIP, JDBC,
        JSONL, parquet, ORC, txlog, binaryFile, +XML — every format a
        migration off the reference's SQLAlchemy load path could
        encounter."""
        import atexit
        import shutil

        docs = T(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        base = tempfile.mkdtemp(prefix="xml_rt_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        path = os.path.join(base, "documents")
        (
            docs.write.format("xml")
            .option("rootTag", "documents")
            .option("rowTag", "doc")
            .save(path)
        )
        back = (
            spark.read.format("xml")
            .option("rowTag", "doc")
            .schema(
                "doc_id long, text string, lang string,"
                " source string, n_chars long"
            )
            .load(path)
        )
        # Spark's XML source reads an empty element back as NULL, not ''
        # (ADVICE r7): coalesce restores the empty string so the lossless
        # invariant holds even for text='' documents, instead of being
        # green only because the corpus happens to contain none
        back = back.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
        return back.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(F.length("text")).cast("long").alias("chars_sum"),
            F.sum("n_chars").cast("long").alias("n_chars_sum"),
        )

    @register(
        "txlog_time_travel_timestamp",
        sql="""
        WITH e AS (
            SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
        )
        SELECT 'as_of_v1' AS label, CAST(1 AS INT) AS resolved_version,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_rows,
               (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM e) AS key_sum
        UNION ALL
        SELECT 'between', 1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e),
               (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM e)
        UNION ALL
        SELECT 'as_of_v2', 2,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders)
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_txlog_time_travel_timestamp(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """TIMESTAMP AS OF time travel (Delta parity): commit times are
        stamped STRICTLY MONOTONIC at commit (wall clocks tie across
        fast consecutive commits — the Delta adjustment), so an as-of
        read at v1's exact commit time resolves v1, at any instant
        strictly before v2 resolves v1 (the 'between' row reads at
        commit_ts(v2)-1, which the monotonicity contract guarantees is
        ≥ commit_ts(v1)), and at v2's commit time resolves v2. The
        oracle pins the CONTENT each resolution must produce from pure
        SQL — wall-clock values never reach the compared rows, only
        the resolution DECISIONS they must imply."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        ork = T(spark, sf_dir, "orders").select("o_orderkey")
        even = ork.filter(F.col("o_orderkey") % 2 == 0)
        odd = ork.filter(F.col("o_orderkey") % 2 == 1)
        path = os.path.join(tempfile.mkdtemp(prefix="asof_"), "t")
        t = TxLogTable.create(spark, path, even)
        t.append(odd)
        ts = {m["version"]: m["commit_ts_ms"] for m in t.history()}
        probes = [
            ("as_of_v1", ts[1]),
            ("between", ts[2] - 1),
            ("as_of_v2", ts[2]),
        ]
        rows = []
        for label, probe_ts in probes:
            v = t.version_as_of(probe_ts)
            agg = t.snapshot(version=v).agg(
                F.count("*").cast("long").alias("n"),
                F.sum("o_orderkey").cast("long").alias("s"),
            ).first()
            rows.append((label, v, agg["n"], agg["s"]))
        return spark.createDataFrame(
            rows,
            "label string, resolved_version int, n_rows long, key_sum long",
        )

    @register(
        "txlog_sync_report",
        sql="""
        WITH src AS (
            SELECT o_orderkey, o_orderpriority,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN CAST(CAST(o_totalprice AS DECIMAL(27,4))
                                  + 50 AS DOUBLE)
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 5 != 0
        ), del AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted
            FROM orders WHERE o_orderkey % 3 != 0 AND o_orderkey % 5 = 0
        )
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
                   AS revenue,
               (SELECT n_deleted FROM del) AS n_deleted
        FROM src GROUP BY 1
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_txlog_sync_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Three-clause MERGE (Delta's WHEN MATCHED / NOT MATCHED / NOT
        MATCHED BY SOURCE) in ONE atomic commit — `sync_from`: the
        table (keys %3≠0) syncs to a source snapshot (keys %5≠0, some
        repriced), so matched keys update, source-new keys insert, and
        vanished keys DELETE via a key-tombstone sidecar riding the
        SAME manifest as the rewrite (readers see the old table or the
        fully synced one, never a half-state). The oracle aggregates
        the SOURCE directly: a green row proves the post-sync table's
        key set and values EQUAL the source — a surviving vanished key
        (the rewritten-file edge: dead rows must drop from rewrites
        explicitly since fresh files postdate the tombstone), a lost
        insert, or a stale update all hash-fail. n_deleted pins the
        tombstone accounting. 100 TB: rewrite ∝ files holding source
        keys; deletes are O(1) commit + sidecar bytes."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        base = o.filter(F.col("o_orderkey") % 3 != 0)
        dec = lambda c: F.col(c).cast("decimal(27,4)")  # noqa: E731
        source = o.filter(F.col("o_orderkey") % 5 != 0).select(
            "o_orderkey",
            "o_orderpriority",
            F.when(
                F.col("o_orderkey") % 7 == 0,
                (dec("o_totalprice") + 50).cast("double"),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        path = os.path.join(tempfile.mkdtemp(prefix="sync_"), "t")
        t = TxLogTable.create(spark, path, base.repartition(4))
        m = t.sync_from(source, ["o_orderkey"])
        return (
            t.snapshot()
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            )
            .withColumn(
                "n_deleted",
                F.lit(m["sync_stats"]["deleted_keys"]).cast("long"),
            )
        )

    @register(
        "lateral_topk_orders",
        sql="""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey < 50
        """,
        tags=("ext-rel", "ext-join"),
    )
    def q_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Correlated LATERAL subquery (SQL:1999 lateral join, Spark
        3.2+/SPARK-34382): top-2 orders per customer expressed as a
        per-row correlated ORDER BY … LIMIT — the form migrating SQL
        workloads actually write, complementing the window-function
        formulation (`window_topk_orders`). Catalyst decorrelates it
        into a join + per-key limit rather than executing per-row, so
        the declarative form keeps the distributed plan. The oracle is
        the IDENTICAL SQL on DuckDB: both engines must agree on the
        correlation semantics and the (price DESC, orderkey) total
        tie-break."""
        T(spark, sf_dir, "customer").createOrReplaceTempView("lat_c")
        T(spark, sf_dir, "orders").createOrReplaceTempView("lat_o")
        return spark.sql(
            """
            SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
            FROM lat_c c,
            LATERAL (SELECT o_orderkey, o_totalprice FROM lat_o o
                     WHERE o.o_custkey = c.c_custkey
                     ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
            WHERE c.c_custkey < 50
            """
        )

    @register(
        "soft_dedup_weights",
        sql="""
        WITH h AS (
            SELECT source, md5(text) AS th,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ), c AS (
            SELECT th, CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM h GROUP BY th
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
               CAST(SUM(CAST(round(1000000.0 * CAST(n_tok AS DOUBLE)
                        / CAST(n_copies AS DOUBLE)) AS BIGINT)) AS BIGINT)
                   AS effective_tokens_micro
        FROM h JOIN c USING (th)
        GROUP BY source
        """,
        tags=("ext-dedup", "ext-sampling"),
    )
    def q_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Soft deduplication (the SoftDeDup / SlimPajama-DC insight:
        instead of DROPPING duplicates, DOWN-WEIGHT each copy by
        1/n_copies so the duplicated content contributes exactly one
        copy's worth of expected training mass — no arbitrary canonical
        choice, repeated-but-valuable text keeps proportional signal):
        per source, raw token mass vs effective (weight-summed) mass
        under exact-dup counting. The weight join shuffles 16-byte
        digests, never text; per-doc weights micro-snap so the sums are
        exact. Plug the near-dup cluster size in place of n_copies for
        the fuzzy variant — the algebra is identical. The raw-vs-
        effective gap per source is the number a mixing policy feeds
        back into its budgets (dedup_savings_report's sampling twin)."""
        docs = T(spark, sf_dir, "documents").select("source", "text")
        h = docs.select(
            "source",
            F.md5("text").alias("th"),
            F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        )
        c = h.groupBy("th").agg(F.count("*").cast("long").alias("n_copies"))
        return (
            h.join(c, "th")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_tok").cast("long").alias("raw_tokens"),
                F.sum(
                    F.round(
                        1000000.0
                        * F.col("n_tok").cast("double")
                        / F.col("n_copies").cast("double"),
                        0,
                    ).cast("long")
                )
                .cast("long")
                .alias("effective_tokens_micro"),
            )
        )


_register()
