"""Aggregation operators (SURVEY.md §2.D G1-G12).

All are expressed as ``groupBy().agg()`` so Catalyst plans partial
(map-side) + final HashAggregate automatically — at 100 TB the partial
agg is what keeps the shuffle small. The funnel stage-alignment helper
(G12, reference ``app.py:237-242``) joins counts against a tiny literal
stage frame; the literal side is broadcast by the optimizer (it is a
LocalRelation), so alignment adds no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def frequency_count(df: DataFrame, col: str) -> DataFrame:
    """value_counts (G5, ``app.py:188,230-240``): counts ordered desc, key tie-break."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).orderBy(F.desc("cnt"), F.asc(col))


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    event_type_col: str = "event_type",
) -> DataFrame:
    """Funnel / conversion metrics aligned to a fixed ordered stage list.

    Reference: ``app.py:237-242`` (reindex to fixed category set with
    fill_value=0) and the README marts gold_funnel_metrics /
    gold_conversion_rates (``README.md:83``).

    Output: (stage_order int, event_type string, cnt long,
    conversion_pct double = 100*cnt/first-stage cnt, rounded 4dp).

    Scale note: the groupBy produces |stages| rows; the window over the
    aligned 4-row frame is trivially cheap, and the stage frame join is a
    broadcast of a LocalRelation — no extra shuffle beyond the count agg.
    """
    spark = events.sparkSession
    stage_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(stages)], ["stage_order", event_type_col]
    )
    counts = events.groupBy(event_type_col).agg(F.count(F.lit(1)).alias("cnt"))
    aligned = (
        stage_df.join(counts, event_type_col, "left")
        .select("stage_order", event_type_col, F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    w = Window.orderBy("stage_order").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        aligned.withColumn(
            "conversion_pct",
            F.round(F.col("cnt") * 100.0 / F.first("cnt").over(w), 4),
        )
        .orderBy("stage_order")
    )


def mode(df: DataFrame, col: str) -> DataFrame:
    """Most-common value (G9, ``app.py:374``) with deterministic tie-break."""
    return frequency_count(df, col).limit(1)


def argmax(df: DataFrame, key: str, value: str) -> DataFrame:
    """Top key by aggregated value (G8, ``app.py:511-528``)."""
    return (
        df.groupBy(key)
        .agg(F.sum(value).alias("total"))
        .orderBy(F.desc("total"), F.asc(key))
        .limit(1)
    )
