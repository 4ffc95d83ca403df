"""Bounded pin-registry behavior (operators/pinning.py): the fix for
the one-cached-frame-per-query leak across a 200+ query batch session
(ADVICE r4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.operators import pinning
from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
    pin,
    release_pinned,
)


def test_pin_caps_tracked_frames_fifo(spark):
    release_pinned()
    frames = [
        pin(spark.range(10).withColumn("x", F.lit(i)))
        for i in range(pinning._PIN_CAP + 3)
    ]
    # registry never exceeds the cap; the oldest were evicted
    assert len(pinning._PINNED) == pinning._PIN_CAP
    assert pinning._PINNED[0] is frames[3]
    # evicted frames are unpersisted, recent ones still cached
    assert frames[0].storageLevel.useMemory is False
    assert frames[-1].storageLevel.useMemory is True
    # evicted frames still compute correctly (just uncached)
    assert frames[0].count() == 10
    assert release_pinned() == pinning._PIN_CAP
    assert pinning._PINNED == []


def test_release_pinned_unpersists_everything(spark):
    release_pinned()
    df = pin(spark.range(5))
    assert df.storageLevel.useMemory is True
    assert release_pinned(blocking=True) == 1
    assert df.storageLevel.useMemory is False
    assert df.count() == 5
