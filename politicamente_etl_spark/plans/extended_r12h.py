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
        return back.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(F.length("text")).cast("long").alias("chars_sum"),
            F.sum("n_chars").cast("long").alias("n_chars_sum"),
        )


_register()
