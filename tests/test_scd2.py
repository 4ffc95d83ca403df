"""SCD2 behavioral test (SURVEY.md §5.2.3), replicating the reference's
own probe (Scd_Type2.sql:1-11 setup, :56-65 history check, :142-148
current-flag check): seed dim → mutate one key → merge → old row
expired + new current row; idempotent re-merge."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.operators.scd2 import (
    OPEN_END_TS,
    scd2_history,
    scd2_init,
    scd2_merge,
)

def T0():
    return F.lit("2024-01-01 00:00:00")


def T1():
    return F.lit("2024-02-01 00:00:00")


TRACKED = ["status", "total"]


def _base(spark):
    return spark.createDataFrame(
        [("o1", "created", 10.0), ("o2", "created", 20.0), ("o3", "paid", 30.0)],
        ["order_id", "status", "total"],
    )


def test_scd2_merge_expires_and_inserts(spark):
    dim = scd2_init(_base(spark), "order_id", TRACKED, T0(), sk_col="order_sk")
    staged = spark.createDataFrame(
        [
            ("o1", "delivered", 10.0),  # changed -> expire + new version
            ("o2", "created", 20.0),    # unchanged -> no-op
            ("o4", "created", 40.0),    # brand new -> insert
        ],
        ["order_id", "status", "total"],
    )
    merged = scd2_merge(dim, staged, "order_id", TRACKED, T1(), sk_col="order_sk")

    hist = {tuple(r) for r in scd2_history(merged, "order_id", "o1")
            .select("status", "is_current", F.col("valid_to").cast("string")).collect()}
    assert hist == {
        ("created", False, "2024-02-01 00:00:00"),
        ("delivered", True, OPEN_END_TS),
    }

    # untouched key keeps its single current row
    o2 = merged.filter(F.col("order_id") == "o2").collect()
    assert len(o2) == 1 and o2[0]["is_current"]

    # absent-from-staging key is NOT expired (MERGE only touches matches)
    o3 = merged.filter(F.col("order_id") == "o3").collect()
    assert len(o3) == 1 and o3[0]["is_current"]

    # new key inserted current, SK continues from max (init max = 3)
    o4 = merged.filter(F.col("order_id") == "o4").collect()
    assert len(o4) == 1 and o4[0]["is_current"] and o4[0]["order_sk"] > 3

    # exactly one current row per key (Scd_Type2.sql:142-148)
    cur_counts = (
        merged.filter("is_current").groupBy("order_id").count().collect()
    )
    assert all(r["count"] == 1 for r in cur_counts)


def test_scd2_merge_idempotent(spark):
    dim = scd2_init(_base(spark), "order_id", TRACKED, T0(), sk_col="order_sk")
    staged = _base(spark)  # identical contents
    merged = scd2_merge(dim, staged, "order_id", TRACKED, T1(), sk_col="order_sk")
    a = sorted(tuple(r) for r in dim.select("order_id", "row_hash", "is_current").collect())
    b = sorted(tuple(r) for r in merged.select("order_id", "row_hash", "is_current").collect())
    assert a == b


def test_scd2_write_atomic_swap(spark, tmp_path):
    from event_driven_data_pipeline_for_e_commerce_spark.operators.scd2 import scd2_write

    path = str(tmp_path / "scd2_dim")
    dim = scd2_init(_base(spark), "order_id", TRACKED, T0(), sk_col="order_sk")
    scd2_write(dim, path)
    assert spark.read.parquet(path).count() == 3
    staged = spark.createDataFrame([("o1", "delivered", 10.0)], ["order_id", "status", "total"])
    merged = scd2_merge(spark.read.parquet(path), staged, "order_id", TRACKED, T1(), sk_col="order_sk")
    # must materialize before overwriting its own input
    merged2 = spark.createDataFrame(merged.collect(), merged.schema)
    scd2_write(merged2, path)
    assert spark.read.parquet(path).count() == 4


def test_ranged_sk_matches_dense_sk(spark):
    """with_surrogate_key_ranged must emit byte-identical keys to the
    global-window dense form (the Scd_Type2.sql:33-34 contract) while
    planning no Window.orderBy without partitionBy."""
    from event_driven_data_pipeline_for_e_commerce_spark.operators.surrogate_keys import (
        with_surrogate_key_dense,
        with_surrogate_key_ranged,
    )

    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1001).alias("k"), (F.col("id") % 7).alias("v")
    )
    dense = {
        (r["k"], r["v"]): r["sk"]
        for r in with_surrogate_key_dense(df, "k", "sk", offset=5).collect()
    }
    ranged = {
        (r["k"], r["v"]): r["sk"]
        for r in with_surrogate_key_ranged(df, "k", "sk", offset=5).collect()
    }
    assert ranged == dense
    plan = with_surrogate_key_ranged(df, "k", "sk")._jdf.queryExecution().executedPlan().toString()
    # the window must be partition-local: every Window node carries a partitionBy
    import re

    for m in re.finditer(r"Window \[.*?\]", plan):
        assert "windowspecdefinition(__pid" in plan or "partitionBy" in m.group(0) or "__pid" in plan
