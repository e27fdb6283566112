"""Round-8 batch A: row-index deletion vectors on the commit-log table
(predicate deletes on keyless tables, DV-vs-copy-on-write cost split,
DV change feed) and the Spark 4 SQL surface (pipe syntax, SQL UDFs,
GROUP BY ALL, OFFSET pagination, parameterized SQL, lateral column
aliases).

Each query pairs a Spark-first plan with a DuckDB oracle; all compared
aggregates are exact integers (cents/counts/key checksums) so value
hashes match bit-for-bit across engines.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    # -- row-index deletion vectors ---------------------------------------

    @register(
        "txlog_rowindex_delete_proof",
        sql="""
        SELECT 'dv_keyed' AS label,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS val_sum,
               CAST(0 AS BIGINT) AS files_rewritten
        FROM orders WHERE o_orderkey % 11 != 3
        UNION ALL
        SELECT 'key_tombstone', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(o_orderkey) AS BIGINT), CAST(0 AS BIGINT)
        FROM orders WHERE o_orderkey % 11 != 3
        UNION ALL
        SELECT 'dv_keyless', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM lineitem WHERE l_returnflag != 'R'
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_txlog_rowindex_delete_proof(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Row-index DELETION VECTORS (Delta DV / Iceberg positional
        delete parity; VERDICT r7 item 3): `delete_where_rowindex`
        evaluates a SQL predicate once, records the matching rows'
        (data-root-relative path, row ordinal) addresses in a parquet
        sidecar, and commits one O(1) manifest — zero files rewritten
        (pinned per row). Three proofs in one result:

        - dv_keyed: predicate delete on a keyed table;
        - key_tombstone: the SAME logical delete via the key-based
          sidecar path — both rows must carry identical (count, key
          checksum), the cross-path parity the key-based form couldn't
          prove alone;
        - dv_keyless: predicate delete on a KEYLESS projection of
          lineitem (duplicate rows, no key column exists) — the delete
          shape key tombstones cannot express at all.

        100 TB: the read-side filter broadcasts row ADDRESSES (~16 B
        each) instead of key tuples, so a million-row correction
        delete is a ~MB broadcast regardless of key width, and the
        sidecar write is distributed (nothing ∝ delete size on the
        driver). Physical reclaim rides optimize(), which reads
        through the DV filter and materializes it."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        base = tempfile.mkdtemp(prefix="txlog_rowidx_")
        t1 = TxLogTable.create(spark, os.path.join(base, "a"), o)
        m1 = t1.delete_where_rowindex("o_orderkey % 11 = 3")
        t2 = TxLogTable.create(spark, os.path.join(base, "b"), o)
        m2 = t2.delete_where_logical(
            "o_orderkey", keys_df=o.filter(F.col("o_orderkey") % 11 == 3)
        )
        li = T(spark, sf_dir, "lineitem").select(
            F.col("l_quantity").cast("long").alias("qty"), "l_returnflag"
        )
        t3 = TxLogTable.create(spark, os.path.join(base, "c"), li)
        m3 = t3.delete_where_rowindex("l_returnflag = 'R'")

        def fp(t, label, col, rewritten):
            return t.snapshot().agg(
                F.lit(label).alias("label"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(col).cast("long").alias("val_sum"),
                F.lit(rewritten).cast("long").alias("files_rewritten"),
            )

        out = fp(t1, "dv_keyed", "o_orderkey",
                 m1["delete_stats"]["files_rewritten"])
        out = out.unionByName(
            fp(t2, "key_tombstone", "o_orderkey",
               m2["delete_stats"]["files_rewritten"])
        )
        return out.unionByName(
            fp(t3, "dv_keyless", "qty",
               m3["delete_stats"]["files_rewritten"])
        )

    @register(
        "txlog_dv_vs_cow_report",
        sql="""
        SELECT 'copy_on_write' AS path,
               TRUE AS rewrote_files,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                WHERE o_orderkey % 7 = 2) AS rows_deleted,
               CAST(COUNT(*) AS BIGINT) AS n_after,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum_after
        FROM orders WHERE o_orderkey % 7 != 2
        UNION ALL
        SELECT 'deletion_vector', FALSE,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                WHERE o_orderkey % 7 = 2),
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders WHERE o_orderkey % 7 != 2
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_txlog_dv_vs_cow_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The two delete strategies every lakehouse exposes, run
        side-by-side on identical tables and pinned to produce the SAME
        table contents with OPPOSITE physical cost profiles:
        copy-on-write (`delete_keys`) rewrites every containing file
        now (rewrote_files pinned TRUE — keys mod 7 touch all files)
        and pays zero read-time overhead after; merge-on-read
        (`delete_where_rowindex`) commits one sidecar (rewrote_files
        pinned FALSE) and defers the rewrite to optimize(). The choice
        at 100 TB is workload-shaped: CoW for GDPR erasure (bytes must
        go) and read-heavy tables, DV for frequent small corrections
        where rewrite amplification dominates. Equal (n_after,
        key_sum_after) across both rows is the semantic-equivalence
        gate."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        base = tempfile.mkdtemp(prefix="txlog_dvcow_")
        t_cow = TxLogTable.create(spark, os.path.join(base, "cow"), o)
        m_cow = t_cow.delete_keys(
            o.filter(F.col("o_orderkey") % 7 == 2).select("o_orderkey"),
            keys=["o_orderkey"],
        )
        t_dv = TxLogTable.create(spark, os.path.join(base, "dv"), o)
        m_dv = t_dv.delete_where_rowindex("o_orderkey % 7 = 2")

        def fp(t, label, rewrote, removed):
            return t.snapshot().agg(
                F.lit(label).alias("path"),
                F.lit(rewrote).alias("rewrote_files"),
                F.lit(removed).cast("long").alias("rows_deleted"),
                F.count("*").cast("long").alias("n_after"),
                F.sum("o_orderkey").cast("long").alias("key_sum_after"),
            )

        cow = fp(
            t_cow,
            "copy_on_write",
            m_cow["delete_stats"]["files_rewritten"] > 0,
            m_cow["delete_stats"]["rows_removed"],
        )
        dv = fp(
            t_dv,
            "deletion_vector",
            m_dv["delete_stats"]["files_rewritten"] > 0,
            m_dv["delete_stats"]["n_rows"],
        )
        return cow.unionByName(dv)

    @register(
        "txlog_dv_cdf_feed",
        sql="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_changes,
               CAST(COUNT(*) AS BIGINT) AS n_deletes,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS old_cust_sum,
               CAST(0 AS BIGINT) AS n_new_nonnull
        FROM orders WHERE o_orderkey % 7 = 2
        """,
        tags=("ext-sink", "ext-cdc"),
    )
    def q_txlog_dv_cdf_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Change data feed across a DELETION-VECTOR commit: the DV
        changes no data file, so the interval diff has zero
        changed-file work — the feed comes from ONE scan of the stable
        files semi-joined (broadcast) against the DV's row addresses,
        emitting exactly the logically deleted rows as 'delete'
        records with their old values. Pinned: every change is a
        delete, the key/old-value checksums equal the predicate's SQL
        relation, and new-value columns are all NULL. This is the
        incremental-consumer contract (sync jobs, materialized views)
        extended to positional deletes — cost ∝ deleted rows, never
        table size."""
        from politicamente_etl_spark.sources.txlog import TxLogTable

        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        path = os.path.join(tempfile.mkdtemp(prefix="txlog_dvcdf_"), "t")
        t = TxLogTable.create(spark, path, o)
        t.delete_where_rowindex("o_orderkey % 7 = 2")
        ch = t.table_changes(
            1, 2, keys=["o_orderkey"], compare_cols=["o_custkey"]
        )
        return ch.agg(
            F.count("*").cast("long").alias("n_changes"),
            F.sum(
                (F.col("change_type") == "delete").cast("long")
            ).cast("long").alias("n_deletes"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            F.sum("old_o_custkey").cast("long").alias("old_cust_sum"),
            F.sum(
                F.col("new_o_custkey").isNotNull().cast("long")
            ).cast("long").alias("n_new_nonnull"),
        )

    # -- Spark 4 SQL surface ------------------------------------------------

    @register(
        "pipe_syntax_revenue_report",
        sql="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem
        WHERE l_quantity < 24
        GROUP BY l_returnflag, l_linestatus
        HAVING COUNT(*) > 10
        """,
        tags=("ext-sql",),
    )
    def q_pipe_syntax_revenue_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """SQL PIPE SYNTAX (Spark 4, SPARK-49555): the same logical
        plan as the classic SELECT, written as a linear `FROM |> WHERE
        |> AGGREGATE ... GROUP BY |> WHERE` chain — each operator
        consumes the previous result, so query logic reads in
        execution order and composes without nesting. Purely frontend:
        Catalyst resolves pipes to the identical resolved plan, so
        predicate pushdown/codegen are unchanged (the oracle is the
        classic form — a hash match proves the equivalence). The
        post-aggregate `|> WHERE` is pipe-HAVING."""
        T(spark, sf_dir, "lineitem").createOrReplaceTempView(
            "pipe_lineitem_v"
        )
        return spark.sql(
            """
            FROM pipe_lineitem_v
            |> WHERE l_quantity < 24
            |> AGGREGATE COUNT(*) AS n_items,
                         SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                             AS cents
               GROUP BY l_returnflag, l_linestatus
            |> WHERE n_items > 10
            |> SELECT l_returnflag, l_linestatus, n_items, cents
            """
        )

    @register(
        "sql_udf_price_bands",
        sql="""
        SELECT CASE WHEN o_totalprice < 25000 THEN 'lo'
                    WHEN o_totalprice < 75000 THEN 'mid'
                    ELSE 'hi' END AS band,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY 1
        """,
        tags=("ext-sql", "ext-udf"),
    )
    def q_sql_udf_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SQL-language UDF (Spark 4.1, SPARK-46057 — CREATE FUNCTION
        ... RETURN <expr>): the banding rule is declared ONCE as a
        catalog object and reused across queries, but unlike a Python
        UDF it INLINES into the plan at resolution time — full codegen,
        predicate pushdown through it, zero serialization boundary.
        This is the right home for shared business logic at 100 TB:
        the registry gives reuse, the inlining keeps the hot path
        JVM-side (the oracle repeats the CASE literally; a hash match
        proves the function is transparent)."""
        spark.sql(
            """
            CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
            RETURNS STRING
            RETURN CASE WHEN p < 25000 THEN 'lo'
                        WHEN p < 75000 THEN 'mid'
                        ELSE 'hi' END
            """
        )
        T(spark, sf_dir, "orders").createOrReplaceTempView("sqludf_orders_v")
        return spark.sql(
            """
            SELECT price_band(o_totalprice) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM sqludf_orders_v
            GROUP BY 1
            """
        )

    @register(
        "group_by_all_priority_matrix",
        sql="""
        SELECT c_mktsegment, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
        """,
        tags=("ext-sql",),
    )
    def q_group_by_all_priority_matrix(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """GROUP BY ALL (Spark 3.4+/4): every non-aggregate select item
        becomes a grouping key automatically — removes the
        keep-two-lists-in-sync failure mode of wide rollups (add a
        dimension to SELECT, forget the GROUP BY, get a silent
        cartesian aggregate). Resolution-time sugar: the resolved plan
        is byte-identical to the explicit form (the oracle), and the
        join stays a broadcast of customer under AQE."""
        T(spark, sf_dir, "orders").createOrReplaceTempView("gball_orders_v")
        T(spark, sf_dir, "customer").createOrReplaceTempView(
            "gball_customer_v"
        )
        return spark.sql(
            """
            SELECT c_mktsegment, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM gball_orders_v JOIN gball_customer_v
              ON o_custkey = c_custkey
            GROUP BY ALL
            """
        )

    @register(
        "offset_pagination_orders",
        sql="""
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
        """,
        tags=("ext-sql",),
    )
    def q_offset_pagination_orders(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Stable keyset-free pagination: page 3 of the price leaderboard
        via ORDER BY + LIMIT/OFFSET (Spark 3.4+ OFFSET clause). The
        order includes the unique key as tiebreak, so pages are
        deterministic and non-overlapping — without it, equal prices
        straddle page boundaries nondeterministically (the classic
        pagination bug). Spark executes this as a global top-(60)
        (CollectLimit with offset), NOT a full sort: cost is O(n log
        60) map-side + one tiny reduce, which is why bounded-offset
        pagination scales and deep OFFSET (page 10⁶) structurally
        cannot — offset work is linear in skipped rows."""
        o = T(spark, sf_dir, "orders")
        return (
            o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .select(
                "o_orderkey",
                F.floor(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
            .offset(40)
            .limit(20)
        )

    @register(
        "parameterized_sql_filter",
        sql="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 150000.0 AND c_mktsegment = 'BUILDING'
        GROUP BY o_orderpriority
        """,
        tags=("ext-sql",),
    )
    def q_parameterized_sql_filter(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Named-parameter SQL (Spark 3.4+ `spark.sql(query, args=)`):
        values bind as typed LITERALS in the parsed plan — never string
        interpolation — so user input cannot splice SQL (injection-safe
        by construction) and Catalyst constant-folds/pushes the bound
        literal into the parquet scan exactly like a hand-written one.
        The repeated-query pattern at scale: one parsed template, many
        bindings."""
        T(spark, sf_dir, "orders").createOrReplaceTempView("param_orders_v")
        T(spark, sf_dir, "customer").createOrReplaceTempView(
            "param_customer_v"
        )
        return spark.sql(
            """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM param_orders_v JOIN param_customer_v
              ON o_custkey = c_custkey
            WHERE o_totalprice > :min_price AND c_mktsegment = :seg
            GROUP BY o_orderpriority
            """,
            args={"min_price": 150000.0, "seg": "BUILDING"},
        )

    @register(
        "lateral_alias_margin_chain",
        sql="""
        SELECT l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
                        - CAST(floor(l_extendedprice * 100) AS BIGINT)
                          * CAST(floor(l_discount * 100) AS BIGINT) // 100
                        - (CAST(floor(l_extendedprice * 100) AS BIGINT)
                           - CAST(floor(l_extendedprice * 100) AS BIGINT)
                             * CAST(floor(l_discount * 100) AS BIGINT) // 100)
                          * CAST(floor(l_tax * 100) AS BIGINT) // 100)
                    AS BIGINT) AS net_cents
        FROM lineitem
        GROUP BY l_linestatus
        """,
        tags=("ext-sql",),
    )
    def q_lateral_alias_margin_chain(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """LATERAL COLUMN ALIASES (Spark 3.4+, SPARK-27561): a SELECT
        item references earlier aliases in the SAME select list —
        `cents`, then `disc_cents` built FROM cents, then `net` from
        both — so a derivation chain reads top-to-bottom instead of
        exploding into nested subqueries or repeated expressions. The
        analyzer inlines the chain (one Project), so there's no extra
        plan node; the oracle writes the fully-expanded arithmetic and
        the hash match proves the inlining is exact. Integer cents with
        integer division keep both engines bit-identical."""
        T(spark, sf_dir, "lineitem").createOrReplaceTempView(
            "lca_lineitem_v"
        )
        return spark.sql(
            """
            SELECT l_linestatus,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(net) AS BIGINT) AS net_cents
            FROM (
                SELECT l_linestatus,
                       CAST(floor(l_extendedprice * 100) AS BIGINT)
                           AS cents,
                       cents * CAST(floor(l_discount * 100) AS BIGINT)
                           DIV 100 AS disc_cents,
                       cents - disc_cents AS gross,
                       gross - gross
                           * CAST(floor(l_tax * 100) AS BIGINT)
                           DIV 100 AS net
                FROM lca_lineitem_v
            )
            GROUP BY l_linestatus
            """
        )


_register()
