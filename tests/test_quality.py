"""Declarative data-quality operator behavior (operators/quality.py):
violation counting on deliberately dirty data, and the single-pass
plan contract."""

from __future__ import annotations

from event_driven_data_pipeline_for_e_commerce_spark.operators.quality import (
    accepted_values,
    in_range,
    matches,
    not_null,
    run_checks,
    unique,
)


def _dirty(spark):
    rows = [
        (1, "O", 10.0, "1-URGENT"),
        (2, "F", -5.0, "2-HIGH"),      # price below range
        (2, "X", 20.0, "9-BOGUS"),     # dup key, bad enum, bad format
        (None, "P", 1e12, None),       # null key, price above range
    ]
    return spark.createDataFrame(
        rows, "k long, status string, price double, prio string"
    )


def test_quality_rules_count_violations(spark):
    out = {
        (r["rule"], r["col_name"]): (r["n_violations"], r["passed"])
        for r in run_checks(
            _dirty(spark),
            [
                not_null("k"),
                unique("k"),
                accepted_values("status", ["O", "F", "P"]),
                in_range("price", 0, 100),
                matches("prio", r"[1-5]-[A-Z]+"),
            ],
        ).collect()
    }
    assert out == {
        ("not_null", "k"): (1, False),
        ("unique", "k"): (1, False),             # 3 non-null keys, 2 distinct
        ("accepted_values", "status"): (1, False),
        ("in_range", "price"): (2, False),
        ("matches", "prio"): (1, False),         # NULL prio is not a violation
    }


def test_quality_clean_table_passes(spark):
    clean = spark.createDataFrame(
        [(1, "O"), (2, "F")], "k long, status string"
    )
    out = run_checks(
        clean, [not_null("k"), unique("k"), accepted_values("status", ["O", "F"])]
    ).collect()
    assert all(r["passed"] for r in out)
    assert [r["rule"] for r in out] == ["not_null", "unique", "accepted_values"]


def test_quality_single_scan_plan(spark, sf_dir):
    """The rule suite must compile to ONE pass over the input: exactly
    one parquet scan of orders in the physical plan, no matter how many
    rules run."""
    from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES

    plan = QUERIES["orders_quality_checks"](spark, sf_dir)._jdf.queryExecution().simpleString()
    assert plan.count("orders.parquet") == 1, plan
