"""The local twin of the driver's correctness gate: every catalog query
runs on Spark AND on DuckDB (same parquet), results compared exactly.
A failure here is a failure in CORRECTNESS_r{N}.json — fix before commit.
"""

from __future__ import annotations

import pytest

from politicamente_etl_spark.plans.catalog import CATALOG
from politicamente_etl_spark.testing import run_parity


@pytest.mark.slow  # sim-covered: tests/driver_sim.py runs this sweep
@pytest.mark.parametrize("name", sorted(CATALOG))
def test_oracle_parity(name: str, spark, sf_dir: str):
    problems = run_parity(name, spark, sf_dir)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"n_name", "revenue", "n_items", "sum_qty"} == set(df.columns)


def test_contract_shape():
    import __spark_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls) <= set(qs)
    # the vast majority of the surface must be oracle-checked, not rows-only
    # (rows-only is reserved for approximate/engine-seeded ops: LSH, sketches)
    assert len(sqls) >= 0.9 * len(qs)
