"""Behavioral invariants for the round-8 (r13 batch) queries — the
properties the oracle hash can't express directly (cross-row algebra,
pagination set logic, sampling-error bounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from politicamente_etl_spark.plans.catalog import CATALOG

# sim-covered: every invariant here rides queries the driver sim and
# test_oracle_parity already execute; keep the fast tier under its
# 20-minute budget (VERDICT r7 item 7)
pytestmark = pytest.mark.slow


def test_mann_whitney_u_algebra(spark, sf_dir):
    rows = {
        r["seg"]: r
        for r in CATALOG["mann_whitney_u_segments"].fn(spark, sf_dir).collect()
    }
    b, m = rows["BUILDING"], rows["MACHINERY"]
    # U1 + U2 = n1*n2 (doubled units: 2*n1*n2) — exact rank algebra
    assert b["u_x2"] + m["u_x2"] == 2 * b["n"] * m["n"]
    # rank sums partition the pooled total: R1+R2 = N(N+1)/2 (doubled)
    n = b["n"] + m["n"]
    assert b["rank_sum_x2"] + m["rank_sum_x2"] == n * (n + 1)


def test_offset_pagination_pages_partition_topk(spark, sf_dir):
    o = CATALOG["offset_pagination_orders"]
    from politicamente_etl_spark.plans.catalog import T

    base = T(spark, sf_dir, "orders").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    top60 = [r["o_orderkey"] for r in base.limit(60).collect()]
    page3 = [r["o_orderkey"] for r in o.fn(spark, sf_dir).collect()]
    assert page3 == top60[40:60], "page 3 must be rows 41-60 exactly"


def test_hashsketch_buckets_are_near_equi_depth(spark, sf_dir):
    rows = CATALOG["equi_depth_histogram_hashsketch"].fn(
        spark, sf_dir
    ).collect()
    total = sum(r["n_rows"] for r in rows)
    assert len(rows) == 10
    for r in rows:
        assert 0.5 * total / 10 <= r["n_rows"] <= 1.5 * total / 10, (
            f"bucket {r['bucket']} holds {r['n_rows']} of {total}: "
            "sample-estimated deciles drifted beyond sampling error"
        )


def test_csv_quarantine_accounting_closes(spark, sf_dir):
    r = CATALOG["csv_quarantine_report"].fn(spark, sf_dir).first()
    assert r["n_bad"] > 0, "corruption rule must actually fire"
    assert r["n_good"] + r["n_bad"] == r["n_total"]
    assert r["bad_key_sum"] > 0, "quarantined rows must stay recoverable"


def test_curriculum_stages_are_contiguous(spark, sf_dir):
    rows = sorted(
        CATALOG["curriculum_schedule_by_difficulty"].fn(
            spark, sf_dir
        ).collect(),
        key=lambda r: r["bucket"],
    )
    # within the inspected head, stage position ranges must not overlap
    for a, b in zip(rows, rows[1:]):
        assert a["last_pos"] < b["first_pos"], (
            "difficulty stages interleave — curriculum order broken"
        )
    assert rows[0]["first_pos"] == 1


def test_bh_rejection_set_is_prefix(spark, sf_dir):
    rows = sorted(
        CATALOG["benjamini_hochberg_fdr_gates"].fn(spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    flags = [r["rejected"] for r in rows]
    # BH rejects exactly ranks 1..k*: once a False appears, no True after
    if False in flags:
        first_false = flags.index(False)
        assert not any(flags[first_false:]), "BH rejections must be a prefix"


def test_dv_proof_paths_agree(spark, sf_dir):
    rows = {
        r["label"]: r
        for r in CATALOG["txlog_rowindex_delete_proof"].fn(
            spark, sf_dir
        ).collect()
    }
    dv, kt = rows["dv_keyed"], rows["key_tombstone"]
    assert (dv["n_rows"], dv["val_sum"]) == (kt["n_rows"], kt["val_sum"])
    assert all(r["files_rewritten"] == 0 for r in rows.values())


def test_anova_levene_f_positive_and_finite(spark, sf_dir):
    import math

    a = CATALOG["anova_oneway_segments"].fn(spark, sf_dir).first()
    assert a["k_groups"] == 5
    assert a["ssb"] >= 0 and a["ssw"] > 0
    assert math.isfinite(a["f_stat"]) and a["f_stat"] >= 0
    w = CATALOG["levene_brown_forsythe_segments"].fn(spark, sf_dir).first()
    assert math.isfinite(w["w_stat"]) and w["w_stat"] >= 0


def test_hash_randomization_p_bounds(spark, sf_dir):
    r = CATALOG["hash_randomization_test"].fn(spark, sf_dir).first()
    assert r["n_reps"] == 199
    assert 0 <= r["n_exceed"] <= 199
    assert 1.0 / 200.0 <= r["p_value"] <= 1.0


def test_quarantine_reports_reconcile(spark, sf_dir):
    for name in ("csv_quarantine_report", "jsonl_quarantine_report"):
        r = CATALOG[name].fn(spark, sf_dir).first()
        assert r["n_bad"] > 0 and r["n_good"] + r["n_bad"] == r["n_total"]


def test_ordered_fold_is_order_invariant_of_input(spark):
    """The order-pinned reduction must give the SAME result no matter
    how the input rows arrive — that is its whole contract."""
    from politicamente_etl_spark.plans.extended_r13c import _ordered_sum
    from pyspark.sql import functions as F

    rows = [("b", 0.1), ("a", 1e15), ("c", -1e15), ("d", 0.3)]
    a = spark.createDataFrame(rows, "k string, v double")
    b = spark.createDataFrame(list(reversed(rows)), "k string, v double")
    ra = _ordered_sum(a, "k", F.col("v"), "s").first()["s"]
    rb = _ordered_sum(b.repartition(4), "k", F.col("v"), "s").first()["s"]
    assert ra == rb
