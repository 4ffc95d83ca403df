"""Semantic invariants for the drift/change-point queries."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables


def test_cusum_change_point_is_observed_day(spark, sf_dir):
    """The located change-point is an actual order day, the reported
    |CUSUM| is consistent with its signed value, and the mean is the
    truncated integer mean of the daily series."""
    r = QUERIES["daily_revenue_cusum_drift"](spark, sf_dir).first()
    assert r["abs_cusum_e2"] == abs(r["cusum_e2"])
    daily = (
        load_tables(spark, sf_dir)["orders"]
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "rev"
            )
        )
        .collect()
    )
    assert r["n_days"] == len(daily)
    assert r["mean_e2"] == sum(x["rev"] for x in daily) // len(daily)
    assert r["change_date"] in {str(x["d"]) for x in daily}


def test_psi_terms_sign_matches_share_shift(spark, sf_dir):
    """Every PSI term is non-negative (each (p2-p1)ln(p2/p1) term is a
    product of same-sign factors), and half counts cover every event
    of the types reported."""
    rows = QUERIES["event_type_psi_drift"](spark, sf_dir).collect()
    assert rows
    ev = load_tables(spark, sf_dir)["events"]
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["psi_term_e6"] >= 0
        assert r["n_h1"] + r["n_h2"] == totals[r["event_type"]]
        assert 0 <= r["share_h1_bp"] <= 10000
        assert 0 <= r["share_h2_bp"] <= 10000


def test_stl_decomposition_partitions_year(spark, sf_dir):
    """Twelve month rows whose day counts sum to the distinct order
    days; residual variance is non-negative everywhere."""
    rows = QUERIES["daily_revenue_stl_decomposition"](spark, sf_dir).collect()
    assert [r["month"] for r in rows] == list(range(1, 13))
    n_days = (
        load_tables(spark, sf_dir)["orders"]
        .select(F.to_date("o_orderdate"))
        .distinct()
        .count()
    )
    assert sum(r["n_days"] for r in rows) == n_days
    assert all(r["resid_var_d2"] >= 0 for r in rows)
