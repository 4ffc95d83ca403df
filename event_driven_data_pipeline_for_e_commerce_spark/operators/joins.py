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


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: rows of the large side scatter across
    ``buckets`` sub-keys (salt varies WITHIN a key, so one hot key fans
    out over ``buckets`` reducers); the small side replicates once per
    salt. Join on (key, salt) — results are identical to the plain
    join, so the operator is oracle-checkable against one.

    AQE's skew-join split handles most cases automatically; explicit
    salting remains the tool when a single key exceeds what one task
    can hold even after AQE splitting, or when AQE is unavailable
    (streaming joins). Only inner/left are offered: replicating the
    small side would duplicate its unmatched rows under right/full.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l_salted = large.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")
    )
    s_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return l_salted.join(s_salted, [on, "__salt"], how).drop("__salt")
