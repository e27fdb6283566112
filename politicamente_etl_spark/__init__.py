"""politicamente_etl_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities of
the reference ETL (politicamente-app/politicamente-etl, a pandas+SQLAlchemy
pipeline) as an idiomatic, distributed Spark engine:

- DataFrame/SQL-first: every operator is declared against Catalyst so that
  predicate pushdown, column pruning, join planning, AQE and whole-stage
  codegen apply automatically.
- Designed for 100 TB: broadcast joins for dimensions, partial aggregation,
  no driver-side collects in any operator, explicit partitioning knobs.
- Extended with LLM-data-pipeline operators: dedup (exact/MinHash/SimHash/
  n-gram Jaccard), similarity search over embeddings, text analysis, and
  multimodal column plumbing.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, sane shuffle sizing)
    schemas.py    explicit StructTypes (never infer at scale)
    sources/      readers (parquet star schema, TSE-shaped CSV) and sinks
                  (upsert / insert-if-absent / keyed-update as DF algebra)
    operators/    core relational ops, joins, aggregates, dedup, text, sim
    functions/    scalar expression helpers incl. oracle-deterministic money
    plans/        the query catalog: every operator as a named (Spark fn,
                  oracle SQL) pair consumed by __spark_entry__.py
    streaming/    Structured Streaming surface over the events table
    pipelines.py  the four reference pipelines recomposed on Spark
"""

__version__ = "0.1.0"
