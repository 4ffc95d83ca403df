"""Join operators (SURVEY.md §2.C J1-J6).

Scale stance: dimension sides are explicitly ``broadcast()`` when they
are dims-by-construction (the reference hand-rolled this as python dict
maps, ``ecom_Gold_Layer.ipynb:37-48``); everything else is left to AQE,
which picks broadcast/shuffle/skew handling from runtime stats.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.datetimes import date_sk


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J2/J5: fact ⟕ dim with the dim broadcast — the idiomatic
    replacement for the reference's dict-map probe (UD4
    ``load_sk_map``, ecom_Gold_Layer.ipynb:37-42)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on, how)


def date_key_join(df: DataFrame, ts_col: str, out_col: str = "date_sk") -> DataFrame:
    """J6: date→surrogate-key lookup (ecom_Gold_Layer.ipynb:53-56,101-104).

    The reference materializes dim_date as a dict; computing
    ``yyyyMMdd`` directly is semantically identical, free of the join,
    and exactly reproduces the observed encoding
    (fact_order_lifecycle.csv:2 → 20251104).
    """
    return df.withColumn(out_col, date_sk(ts_col))


def cross_join(a: DataFrame, b: DataFrame) -> DataFrame:
    """J4: explicit cartesian product (``JOIN ... ON TRUE``,
    ecom_Gold_Layer.ipynb:81-82). Kept as its own tested operator; the
    engine's default fact build never uses it (SURVEY.md §7.3)."""
    return a.crossJoin(b)


def anti_join(src: DataFrame, tgt: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """The MERGE ``WHEN NOT MATCHED`` branch as a relational operator
    (Scd_Type2.sql:46-53)."""
    return src.join(tgt, on, "left_anti")
