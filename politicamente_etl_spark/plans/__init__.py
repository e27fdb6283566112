from politicamente_etl_spark.plans.catalog import CATALOG, Query

__all__ = ["CATALOG", "Query"]
