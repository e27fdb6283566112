"""Round-8 property tests: deletion-vector semantics against the
filter-semantics oracle under randomized predicates, stacking order,
and restore interleavings — the storage layer must behave exactly like
`df.filter(...)` composed in commit order, for ANY predicate mix.

Spark-backed hypothesis runs are bounded (few examples, small tables):
each example builds a fresh txlog table, so the budget is table
creations, not assertions.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from politicamente_etl_spark.sources.txlog import TxLogTable

pytestmark = pytest.mark.slow  # hypothesis × SparkSession: full-tier only

# predicates over (v, grp) that are cheap, deterministic, and compose:
# (name, spark SQL predicate, python row predicate)
_PREDS = [
    ("grp_eq", "grp = {m}", lambda r, m: r[1] == m),
    ("v_mod", "v % 10 = {m}", lambda r, m: r[0] % 10 == m),
    ("v_lt", "v < {m}00", lambda r, m: r[0] < m * 100),
]


@settings(max_examples=5, deadline=None)
@given(
    picks=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 6)),
        min_size=1,
        max_size=3,
    )
)
def test_dv_stack_equals_filter_composition(spark_session, picks):
    """Any sequence of delete_where_rowindex commits must leave exactly
    the rows surviving every predicate — order-independent, since DVs
    only remove (a row dead at commit i stays dead)."""
    spark = spark_session
    n = 400
    rows = [(v, v % 7) for v in range(n)]
    df = spark.createDataFrame(rows, "v long, grp long")
    path = os.path.join(tempfile.mkdtemp(prefix="dvprop_"), "t")
    t = TxLogTable.create(spark, path, df)
    alive = set(rows)
    for idx, m in picks:
        name, sql_t, py = _PREDS[idx]
        t.delete_where_rowindex(sql_t.format(m=m))
        alive = {r for r in alive if not py(r, m)}
    got = {
        (r["v"], r["grp"]) for r in t.snapshot().select("v", "grp").collect()
    }
    assert got == alive


@settings(max_examples=4, deadline=None)
@given(
    m1=st.integers(0, 6),
    m2=st.integers(0, 9),
    restore_to=st.integers(1, 3),
)
def test_dv_restore_reproduces_any_target(spark_session, m1, m2, restore_to):
    """restore(v) == snapshot(v) for EVERY v in a history of two DV
    commits — the filter-barrier rule under arbitrary targets."""
    spark = spark_session
    df = spark.createDataFrame(
        [(v, v % 7) for v in range(300)], "v long, grp long"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="dvrest_"), "t")
    t = TxLogTable.create(spark, path, df)  # v1
    t.delete_where_rowindex(f"grp = {m1}")  # v2
    t.delete_where_rowindex(f"v % 10 = {m2}")  # v3
    want = {
        (r["v"], r["grp"])
        for r in t.snapshot(version=restore_to).select("v", "grp").collect()
    }
    t.restore(restore_to)  # v4
    got = {
        (r["v"], r["grp"]) for r in t.snapshot().select("v", "grp").collect()
    }
    assert got == want, f"restore({restore_to}) diverged from its target"


@pytest.fixture(scope="module")
def spark_session(spark):
    return spark
