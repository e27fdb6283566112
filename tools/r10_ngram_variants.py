"""r10 experiment: plan shapes for ngram_jaccard_pairs variants.

Variants:
  cur      — spread + localCheckpoint(eager=False)   (r9 shape)
  nobar    — spread only                              (r8 shape + spread)
  reuse    — spread + explicit repartition(sh) on both sides
  noinfer  — nobar with InferFiltersFromGenerate excluded
  persist  — spread + persist()
Prints: Exchange / Generate / regexp count per variant plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from politicamente_etl_spark.operators.core import spread  # noqa: E402
from politicamente_etl_spark.operators.text import shingles_regex  # noqa: E402
from politicamente_etl_spark.session import get_spark  # noqa: E402
from politicamente_etl_spark.sources.readers import load_table  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="r10-ngram-variants", cpus="4")
spark.sparkContext.setLogLevel("ERROR")


def posting(df, id_col="doc_id", text_col="text"):
    return (
        spread(df.select(id_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.array_distinct(shingles_regex(text_col)).alias("shs"),
        )
        .select(
            F.col(id_col), F.size("shs").alias("n_sh"), F.explode("shs").alias("sh")
        )
        .withColumn("sh", F.xxhash64("sh"))
    )


def pairs(sh, id_col="doc_id", threshold=0.4):
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col("a.n_sh").alias("n_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def plan_of(df):
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def report(name, df):
    p = plan_of(df)
    print(
        f"{name:8s} Exchange={p.count(') Exchange')}"
        f" Generate={p.count(') Generate')}"
        f" regexp={p.count('regexp_extract_all')}"
        f" ScanRDD={p.count('Scan ExistingRDD')}"
        f" ScanPq={p.count('Scan parquet')}"
    )
    with open(f"/tmp/r10_ngram_{name}.txt", "w") as f:
        f.write(p)


docs = load_table(spark, sf_dir, "documents")

sh = posting(docs)
report("cur", pairs(sh.localCheckpoint(eager=False)))
report("nobar", pairs(sh))
report("reuse", pairs(sh.repartition("sh")))

spark.conf.set(
    "spark.sql.optimizer.excludedRules",
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
)
report("noinfer", pairs(posting(docs)))
report("noinf_r", pairs(posting(docs).repartition("sh")))
spark.conf.unset("spark.sql.optimizer.excludedRules")
