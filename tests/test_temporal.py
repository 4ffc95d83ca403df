"""as-of / range join operators: equivalence to the naive theta-join
semantics on real testdata, determinism, edge inclusion, and the
plan-shape guarantee (no cartesian) that justifies their existence."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.operators.temporal import (
    asof_join,
    range_join,
)
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"]


def test_asof_matches_naive_theta(spark, sf_dir):
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")

    got = {
        (r["event_id"], r["click_ts"])
        for r in asof_join(
            purchases, clicks, "user_id", "p_ts", "ts", payload=["ts"],
            payload_prefix="click_",
        ).collect()
    }
    naive = {
        (r["event_id"], r["click_ts"])
        for r in purchases.join(
            clicks.withColumnRenamed("ts", "c_ts"), "user_id", "left"
        )
        .groupBy("event_id")
        .agg(
            F.max(
                F.when(F.col("c_ts") < F.col("p_ts"), F.col("c_ts"))
            ).alias("click_ts")
        )
        .collect()
    }
    assert got == naive
    assert len(got) == purchases.count()  # every left row survives


def test_asof_exact_match_toggle(spark):
    rows = [(1, 10, "L"), (1, 10, "R"), (1, 5, "R"), (2, 7, "L")]
    df = spark.createDataFrame(rows, "k int, t int, side string")
    left = df.filter(F.col("side") == "L").select("k", "t")
    right = df.filter(F.col("side") == "R").select("k", F.col("t").alias("rt"))

    strict = asof_join(left, right, "k", "t", "rt", payload=["rt"])
    assert {(r["k"], r["asof_rt"]) for r in strict.collect()} == {(1, 5), (2, None)}

    exact = asof_join(left, right, "k", "t", "rt", payload=["rt"], allow_exact=True)
    assert {(r["k"], r["asof_rt"]) for r in exact.collect()} == {(1, 10), (2, None)}


def test_asof_tie_break_deterministic(spark):
    left = spark.createDataFrame([(1, 100)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 50, "a"), (1, 50, "b"), (1, 50, "c")], "k int, rt int, tag string"
    )
    out = asof_join(
        left, right, "k", "t", "rt", payload=["rt", "tag"], tie_break="tag"
    ).collect()
    assert out[0]["asof_tag"] == "c"  # latest tie_break wins, every run


def test_range_join_matches_naive_theta(spark, sf_dir):
    e = _events(spark, sf_dir)
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("v_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("c_ts")
    )
    got = {
        (r["vid"], r["cid"])
        for r in range_join(
            views, clicks, "user_id", "v_ts", "c_ts", 0, 7200
        ).collect()
    }
    naive = {
        (r["vid"], r["cid"])
        for r in views.join(clicks, "user_id")
        .filter(
            (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 7200 SECOND"))
        )
        .collect()
    }
    assert got == naive and len(got) > 0


def test_range_join_band_edges_inclusive(spark):
    left = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "k int, lt string")
    left = left.select("k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),   # gap 0 — inclusive lower
            (1, "2024-01-01 02:00:00"),   # gap = upper — inclusive upper
            (1, "2024-01-01 02:00:00.000001"),  # just past — excluded
        ],
        "k int, rt string",
    ).select("k", F.col("rt").cast("timestamp").alias("rt"))
    out = range_join(left, right, "k", "lt", "rt", 0, 7200).collect()
    assert len(out) == 2


def test_range_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:00")], "k int, lt string"
    ).select("k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "k int, rt string"
    ).select("k", F.col("rt").cast("timestamp").alias("rt"))
    out = range_join(left, right, "k", "lt", "rt", 0, 3600, how="left").collect()
    by_k = {r["k"]: r["rt"] for r in out}
    assert len(out) == 2 and by_k[1] is not None and by_k[2] is None


def test_range_join_left_null_columns_not_duplicated(spark):
    """A matched left row carrying a NULL column must appear exactly
    once: an anti-join on all left columns would never match the NULL
    row against itself (SQL equality) and emit it twice — matched AND
    as a spurious unmatched row."""
    left = spark.createDataFrame(
        [(1, None, "2024-01-01 00:00:00"), (2, "b", "2024-01-01 00:00:00")],
        "k int, extra string, lt string",
    ).select("k", "extra", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "k int, rt string"
    ).select("k", F.col("rt").cast("timestamp").alias("rt"))
    out = range_join(left, right, "k", "lt", "rt", 0, 3600, how="left").collect()
    assert len(out) == 2
    by_k = {r["k"]: r for r in out}
    assert by_k[1]["rt"] is not None and by_k[1]["extra"] is None
    assert by_k[2]["rt"] is None


def test_temporal_plans_avoid_cartesian(spark, sf_dir):
    """The reason these operators exist: neither may plan a nested-loop
    / cartesian product."""
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    for df in (
        asof_join(purchases, clicks, "user_id", "p_ts", "ts", payload=["ts"]),
        range_join(
            purchases.select("user_id", "p_ts"),
            clicks.select("user_id", F.col("ts").alias("c_ts")),
            "user_id", "p_ts", "c_ts", 0, 7200,
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
