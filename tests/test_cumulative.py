"""Two-pass ranged cumulative/rank operator (operators/cumulative.py)
— parity with the naive global-window form it replaces, including
duplicate order keys, negative values, and more partitions than rows."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from event_driven_data_pipeline_for_e_commerce_spark.operators.cumulative import (
    row_number_ranged,
    running_sum_ranged,
)


@pytest.fixture
def frame(spark):
    # duplicate cents values force the tie-break column to matter;
    # negative values exercise the prefix sums' sign handling
    rows = [
        (i, (i * 37) % 11 - 3, f"k{i:03d}")
        for i in range(257)
    ]
    return spark.createDataFrame(rows, "id long, cents long, key string")


def test_running_sum_matches_global_window(spark, frame):
    order = [F.desc("cents"), F.asc("key")]
    got = {
        r.key: r.cum
        for r in running_sum_ranged(frame, order, "cents", "cum").collect()
    }
    w = (
        Window.orderBy(F.desc("cents"), F.asc("key"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.key: r.cum
        for r in frame.select(
            "key", F.sum("cents").over(w).alias("cum")
        ).collect()
    }
    assert got == want


def test_row_number_matches_global_window(spark, frame):
    got = {
        r.key: r.i
        for r in row_number_ranged(
            frame, [F.asc("cents"), F.asc("key")], "i"
        ).collect()
    }
    w = Window.orderBy(F.asc("cents"), F.asc("key"))
    want = {
        r.key: r.i
        for r in frame.select(
            "key", F.row_number().over(w).cast("long").alias("i")
        ).collect()
    }
    assert got == want


def test_more_partitions_than_rows(spark):
    tiny = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "v long, k string"
    )
    got = sorted(
        (r.k, r.i)
        for r in row_number_ranged(
            tiny, [F.asc("v")], "i", partitions=16
        ).collect()
    )
    assert got == [("a", 1), ("b", 2), ("c", 3)]


def test_plan_window_is_pid_partitioned(spark, frame):
    df = running_sum_ranged(frame, [F.asc("cents"), F.asc("key")], "cents", "cum")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(__pid" in plan, plan
