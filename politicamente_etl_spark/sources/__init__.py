from politicamente_etl_spark.sources.readers import load_table, load_tables, read_tse_csv

__all__ = ["load_table", "load_tables", "read_tse_csv"]
