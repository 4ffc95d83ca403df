"""Silver cleansing semantics (ecom_Silver_Layer.ipynb:191-289):
dedup, median/zero numeric fill, Unknown/zip string fill,
load_timestamp, tolerant date parse + invalid-row drop, duration_days
truncation parity."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.operators.cleansing import (
    CleansePolicy,
    DateDurationConfig,
    cleanse,
)


def test_dedup_and_median_fill(spark):
    df = spark.createDataFrame(
        [
            ("a", 1.0), ("a", 1.0),       # exact dup -> one survives
            ("b", None), ("c", 3.0), ("d", 5.0),
        ],
        ["k", "v"],
    )
    out = cleanse(df, CleansePolicy(add_load_timestamp=False))
    rows = {(r["k"], r["v"]) for r in out.collect()}
    # median of [1,3,5] = 3 -> null filled with 3
    assert rows == {("a", 1.0), ("b", 3.0), ("c", 3.0), ("d", 5.0)}


def test_zero_fill_policy(spark):
    df = spark.createDataFrame([("a", None), ("b", 2.0)], ["k", "v"])
    out = cleanse(df, CleansePolicy(numeric_fill="zero", add_load_timestamp=False))
    assert {(r["k"], r["v"]) for r in out.collect()} == {("a", 0.0), ("b", 2.0)}


def test_string_fill_unknown_and_zip(spark):
    df = spark.createDataFrame(
        [("x", None, None)],
        "k string, city string, customer_zip_code_prefix string",
    )
    out = cleanse(df, CleansePolicy(add_load_timestamp=False))
    r = out.collect()[0]
    assert r["city"] == "Unknown"
    assert r["customer_zip_code_prefix"] == "0"  # zip/postal rule ipynb:232


def test_load_timestamp_added(spark):
    df = spark.createDataFrame([("a",)], ["k"])
    out = cleanse(df, CleansePolicy())
    assert "load_timestamp" in out.columns
    assert out.collect()[0]["load_timestamp"] is not None


def test_date_parse_drop_and_duration(spark):
    df = spark.createDataFrame(
        [
            ("o1", "2024-01-01 00:00:00", "2024-01-03 23:00:00"),  # 2.958 days -> 2
            ("o2", "01-02-2024 10:00", "03-02-2024 09:00"),        # dd-MM fmt, 1.958 -> 1
            ("o3", "Unknown", "2024-01-05 00:00:00"),              # unparseable -> dropped
        ],
        ["order_id", "start_ts", "end_ts"],
    )
    out = cleanse(
        df,
        CleansePolicy(
            add_load_timestamp=False,
            dates=DateDurationConfig(
                date_cols=("start_ts", "end_ts"), start_col="start_ts", end_col="end_ts"
            ),
        ),
    )
    got = {r["order_id"]: r["duration_days"] for r in out.collect()}
    assert got == {"o1": 2, "o2": 1}  # truncation parity with pandas .dt.days


def test_days_since_event_nonnegative(spark):
    df = spark.createDataFrame([("e1", "2024-01-01 00:00:00")], ["id", "event_timestamp"])
    out = cleanse(
        df,
        CleansePolicy(
            add_load_timestamp=False,
            dates=DateDurationConfig(date_cols=("event_timestamp",), since_col="event_timestamp"),
        ),
    )
    assert out.collect()[0]["days_since_event"] > 0
