"""Round-7 batch G: the entity-resolution DECISION half of the
Fellegi-Sunter linkage (blocked match rule → connected components →
entity purity audit) and Merkle-style replica divergence detection via
order-independent bucket checksums."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politicamente_etl_spark.operators import dedup

# shared fingerprint: 32 bits of md5 over the integer row image —
# identical on both engines (the sampling.hash_bucket idiom)
_FP_SQL = (
    "CAST(('0x' || substring(md5(concat_ws(':',"
    " CAST(o_orderkey AS VARCHAR), CAST(cents AS VARCHAR))), 1, 8))"
    " AS BIGINT)"
)


def _register():
    from politicamente_etl_spark.plans.catalog import T, register

    @register(
        "linkage_entity_resolution",
        sql="""
        WITH RECURSIVE a AS (
            SELECT c_custkey AS k, c_nationkey AS nk,
                   substring(c_name, length(c_name) - 2, 3) AS sfx,
                   c_mktsegment AS seg
            FROM customer
        ), b AS (
            SELECT k, nk,
                   substring(bnm, length(bnm) - 2, 3) AS sfx,
                   seg
            FROM (
                SELECT c_custkey AS k, c_nationkey AS nk,
                       CASE WHEN c_custkey % 5 = 0
                            THEN substring(c_name, 1, length(c_name) - 1)
                            ELSE c_name END AS bnm,
                       CASE WHEN c_custkey % 3 = 0
                            THEN 'UNKNOWN' ELSE c_mktsegment END AS seg
                FROM customer
            )
        ), links AS (
            SELECT a.k * 2 AS src, b.k * 2 + 1 AS dst
            FROM a JOIN b ON a.nk = b.nk
            WHERE a.sfx = b.sfx AND a.seg = b.seg
        ), nodes AS (
            SELECT c_custkey * 2 AS node FROM customer
            UNION ALL
            SELECT c_custkey * 2 + 1 FROM customer
        ), edges AS (
            SELECT src, dst FROM links
            UNION ALL
            SELECT dst, src FROM links
        ), reach(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
        ), ents AS (
            SELECT node, MIN(label) AS entity_id FROM reach GROUP BY node
        ), audit AS (
            SELECT entity_id,
                   COUNT(*) AS n_records,
                   COUNT(DISTINCT node // 2) AS n_custkeys
            FROM ents GROUP BY entity_id
        )
        SELECT CAST(n_records AS BIGINT) AS entity_size,
               CAST(COUNT(*) AS BIGINT) AS n_entities,
               CAST(SUM(CASE WHEN n_custkeys = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pure
        FROM audit GROUP BY n_records
        """,
        tags=("ext-dedup", "ext-quality"),
    )
    def q_linkage_entity_resolution(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The DECISION half of record linkage (linkage_fs_weights is
        the estimation half): blocked candidate pairs between the
        customer file and its deterministically dirtied twin link when
        name_suffix3 AND segment agree; accepted links become edges in
        a bipartite record graph, connected components resolve ENTITIES
        (the same min-label propagation operator the near-dup clusters
        use — record ids encode as 2k / 2k+1), and the output audits
        resolution quality by entity size: how many entities of each
        size, and how many are PURE (all records share one true
        custkey). Over-merges from suffix collisions show up as large
        impure entities — the audit a production ER pipeline watches
        before applying merges. Scale: one blocked equi-join for
        candidates, diameter-bounded label propagation (tiny cliques),
        one bounded rollup; no all-pairs product anywhere."""
        c = T(spark, sf_dir, "customer")
        a = c.select(
            F.col("c_custkey").alias("ak"),
            F.col("c_nationkey").alias("nk"),
            F.expr("substring(c_name, length(c_name) - 2, 3)").alias("asfx"),
            F.col("c_mktsegment").alias("aseg"),
        )
        bnm = F.when(
            F.col("c_custkey") % 5 == 0,
            F.expr("substring(c_name, 1, length(c_name) - 1)"),
        ).otherwise(F.col("c_name"))
        b = c.withColumn("bnm", bnm).select(
            F.col("c_custkey").alias("bk"),
            F.col("c_nationkey").alias("nk"),
            F.expr("substring(bnm, length(bnm) - 2, 3)").alias("bsfx"),
            F.when(F.col("c_custkey") % 3 == 0, F.lit("UNKNOWN"))
            .otherwise(F.col("c_mktsegment"))
            .alias("bseg"),
        )
        links = a.join(b, "nk").filter(
            (F.col("asfx") == F.col("bsfx")) & (F.col("aseg") == F.col("bseg"))
        )
        pairs = links.select(
            (F.col("ak") * 2).alias("doc_a"),
            (F.col("bk") * 2 + 1).alias("doc_b"),
        )
        nodes = (
            c.select((F.col("c_custkey") * 2).alias("doc_id"))
            .unionByName(c.select((F.col("c_custkey") * 2 + 1).alias("doc_id")))
        )
        ents = dedup.near_dup_clusters(nodes, pairs).select(
            "doc_id", F.col("cluster_id").alias("entity_id")
        )
        audit = ents.groupBy("entity_id").agg(
            F.count("*").alias("n_records"),
            F.countDistinct(
                F.floor(F.col("doc_id") / 2)
            ).alias("n_custkeys"),
        )
        return audit.groupBy(
            F.col("n_records").cast("long").alias("entity_size")
        ).agg(
            F.count("*").cast("long").alias("n_entities"),
            F.sum(
                F.when(F.col("n_custkeys") == 1, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_pure"),
        )

    @register(
        "replica_divergence_buckets",
        sql=f"""
        WITH a AS (
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), b AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 997 = 0
                        THEN CAST(floor(o_totalprice * 100) AS BIGINT) + 1
                        ELSE CAST(floor(o_totalprice * 100) AS BIGINT)
                        END AS cents
            FROM orders WHERE o_orderkey % 1009 != 0
        ), ca AS (
            SELECT (CAST(('0x' || substring(md5(concat_ws(':', 'v1',
                        CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)
                    % 64) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM({_FP_SQL}) AS BIGINT) AS checksum
            FROM a GROUP BY 1
        ), cb AS (
            SELECT (CAST(('0x' || substring(md5(concat_ws(':', 'v1',
                        CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)
                    % 64) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM({_FP_SQL}) AS BIGINT) AS checksum
            FROM b GROUP BY 1
        )
        SELECT ca.bucket,
               ca.n_rows AS n_rows_a, cb.n_rows AS n_rows_b,
               ca.checksum AS checksum_a, cb.checksum AS checksum_b
        FROM ca JOIN cb USING (bucket)
        WHERE ca.checksum != cb.checksum OR ca.n_rows != cb.n_rows
        """,
        tags=("ext-quality", "ext-storage"),
    )
    def q_replica_divergence_buckets(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Merkle-style anti-entropy between two table replicas: each
        side folds its rows into 64 hash buckets (md5 bucket of the
        key) with an ORDER-INDEPENDENT checksum per bucket (sum of
        32-bit row fingerprints over the integer row image), and only
        buckets whose (count, checksum) disagree are reported — the
        replication-verification shape where two 100 TB replicas
        exchange 64 small rows instead of 100 TB, then repair only the
        divergent buckets' key ranges. Replica B is replica A with a
        deterministic fault injection (keys %1009 dropped, %997
        repriced by one cent), so the query must localize BOTH
        divergence kinds. One aggregate per side, a 64-row join; the
        probability a corrupt bucket's checksum collides is ~2^-32 per
        bucket — and the count check catches pure drops regardless."""
        o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        a = o.select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        b = (
            o.filter(F.col("o_orderkey") % 1009 != 0)
            .select(
                "o_orderkey",
                F.when(
                    F.col("o_orderkey") % 997 == 0,
                    F.floor(F.col("o_totalprice") * 100).cast("long") + 1,
                )
                .otherwise(
                    F.floor(F.col("o_totalprice") * 100).cast("long")
                )
                .alias("cents"),
            )
        )

        def side(df: DataFrame) -> DataFrame:
            fp = F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("o_orderkey").cast("string"),
                            F.col("cents").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            bucket = (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit("v1"),
                                F.col("o_orderkey").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 64
            )
            return (
                df.select(bucket.alias("bucket"), fp.alias("fp"))
                .groupBy("bucket")
                .agg(
                    F.count("*").cast("long").alias("n_rows"),
                    F.sum("fp").cast("long").alias("checksum"),
                )
            )

        ca = side(a)
        cb = side(b).select(
            "bucket",
            F.col("n_rows").alias("n_rows_b"),
            F.col("checksum").alias("checksum_b"),
        )
        return (
            ca.select(
                "bucket",
                F.col("n_rows").alias("n_rows_a"),
                F.col("checksum").alias("checksum_a"),
            )
            .join(cb, "bucket")
            .filter(
                (F.col("checksum_a") != F.col("checksum_b"))
                | (F.col("n_rows_a") != F.col("n_rows_b"))
            )
            .select(
                "bucket", "n_rows_a", "n_rows_b", "checksum_a", "checksum_b"
            )
        )

    @register(
        "txlog_layout_evolution_proof",
        sql="""
        WITH e AS (
            SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 2 = 0
        ), o AS (
            SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 2 = 1
        )
        SELECT 1 AS version,
               (SELECT CAST(COUNT(DISTINCT o_custkey % 4) AS BIGINT) FROM e)
                   AS n_files_added,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_rows,
               (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM e) AS key_sum
        UNION ALL
        SELECT 2,
               (SELECT CAST(COUNT(DISTINCT o_custkey % 3) AS BIGINT) FROM o),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders)
        """,
        tags=("ext-sink", "ext-storage"),
    )
    def q_txlog_layout_evolution_proof(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """PARTITION/CLUSTERING EVOLUTION on the commit log: version 1
        creates the table clustered one-file-per-value of custkey%4;
        version 2 APPENDS under a DIFFERENT layout (custkey%3) — layout
        is a per-commit physical property, not a table contract,
        because every read goes through the manifest's file list +
        per-file zonemaps (the Iceberg partition-evolution insight: no
        table rewrite to change layout, old files keep their old shape
        until optimize). The proof compares, per version: files added
        (must equal the DISTINCT CLUSTER VALUES of that commit — the
        one-file-per-value layout contract), snapshot row count and key
        checksum (mixed-layout reads are exact). The oracle derives all
        three from pure SQL over the source table, so a layout leak
        into row data, a dropped cluster column, or a misread nested
        dir hash-fails."""
        import os
        import tempfile

        from politicamente_etl_spark.sources.txlog import TxLogTable

        ork = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        even = ork.filter(F.col("o_orderkey") % 2 == 0).withColumn(
            "c4", F.col("o_custkey") % 4
        )
        odd = ork.filter(F.col("o_orderkey") % 2 == 1).withColumn(
            "c3", F.col("o_custkey") % 3
        )
        path = os.path.join(tempfile.mkdtemp(prefix="layout_evo_"), "t")
        t = TxLogTable.create(spark, path, even, cluster_file_col="c4")
        t.append(odd, cluster_file_col="c3")

        rows = []
        for m in sorted(t.history(), key=lambda m: m["version"]):
            snap = t.snapshot(version=m["version"])
            agg = snap.agg(
                F.count("*").cast("long").alias("n"),
                F.sum("o_orderkey").cast("long").alias("s"),
            ).first()
            rows.append(
                (m["version"], len(m["added"]), agg["n"], agg["s"])
            )
        return spark.createDataFrame(
            rows,
            "version int, n_files_added long, n_rows long, key_sum long",
        )

    from politicamente_etl_spark.plans.extended_r8 import (
        _CO_EDGE_SQL,
        _co_edges,
    )

    _hc_sweeps = ""
    for i in range(1, 5):
        _hc_sweeps += f""", h{i} AS (
            SELECT seed, node, MIN(dist) AS dist FROM (
                SELECT seed, node, dist FROM h{i - 1}
                UNION ALL
                SELECT h{i - 1}.seed, und.d, h{i - 1}.dist + 1
                FROM und JOIN h{i - 1} ON und.s = h{i - 1}.node
            ) GROUP BY 1, 2
        )"""

    @register(
        "harmonic_centrality_seeds",
        sql=f"""
        WITH {_CO_EDGE_SQL}, und AS (
            SELECT pa AS s, pb AS d FROM e
            UNION ALL SELECT pb AS s, pa AS d FROM e
        ), seeds AS (
            SELECT DISTINCT pa AS seed FROM e ORDER BY seed LIMIT 8
        ), h0 AS (
            SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist FROM seeds
        ){_hc_sweeps}
        SELECT seed,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
               CAST(SUM(CASE WHEN dist > 0
                    THEN CAST(round(1000000.0 / CAST(dist AS DOUBLE))
                              AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS harmonic_micro
        FROM h4 GROUP BY seed
        """,
        tags=("ext-graph",),
    )
    def q_harmonic_centrality_seeds(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Harmonic centrality (Boldi & Vigna's reachability-robust
        closeness: Σ 1/dist, naturally 0-weighting unreachable nodes)
        for 8 deterministic seed parts over the support-≥2 co-purchase
        graph, truncated at 4 hops — the k-source BFS shape: the
        frontier carries (seed, node, dist) triples, each sweep is one
        equi-join + min-merge, so state is O(k·V) and sweeps shuffle
        only the frontier (the standard scale trade: exact centrality
        for k probes instead of O(V²) for all nodes; HyperBall replaces
        the exact set with HLL registers in the same sweep loop).
        Distances micro-snap as round(1e6/d) so the sum is exact; the
        oracle unrolls the sweeps as SQL stages like bfs_hop_histogram
        and the n_reached witness pins the frontier set itself."""
        e = _co_edges(spark, sf_dir)
        und = e.select(
            F.col("pa").alias("s"), F.col("pb").alias("d")
        ).unionByName(
            e.select(F.col("pb").alias("s"), F.col("pa").alias("d"))
        )
        seeds = (
            e.select(F.col("pa").alias("seed"))
            .distinct()
            .orderBy("seed")
            .limit(8)
        )
        h = seeds.select(
            "seed", F.col("seed").alias("node"), F.lit(0).cast("long").alias("dist")
        )
        for _ in range(4):
            step = und.join(h, und.s == h.node).select(
                "seed", F.col("d").alias("node"), (F.col("dist") + 1).alias("dist")
            )
            h = (
                h.unionByName(step)
                .groupBy("seed", "node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint()
            )
        return h.groupBy("seed").agg(
            (F.count("*") - 1).cast("long").alias("n_reached"),
            F.sum(
                F.when(
                    F.col("dist") > 0,
                    F.round(1000000.0 / F.col("dist").cast("double"), 0).cast(
                        "long"
                    ),
                ).otherwise(0)
            )
            .cast("long")
            .alias("harmonic_micro"),
        )


_register()
