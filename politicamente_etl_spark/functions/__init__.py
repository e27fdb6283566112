from politicamente_etl_spark.functions.scalar import (
    election_date,
    money,
    money_avg,
    money_sum,
    synth_key,
    uuid_col,
)

__all__ = ["election_date", "money", "money_avg", "money_sum", "synth_key", "uuid_col"]
