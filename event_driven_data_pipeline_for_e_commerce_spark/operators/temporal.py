"""Temporal join operators Spark lacks natively: as-of join and range
(band) join.

The reference has no such joins (SURVEY.md §2.C: "No semi/anti/range/
as-of joins exist in the reference"), but its event-lifecycle model
(app.py:100-107 — latest state per order as of "now") is exactly the
degenerate case of an as-of join, and any event-correlation analysis
over its lifecycle stream needs a band join. Both are implemented as
compositions of existing DataFrame ops — no Python on the data path.

Scale design (the whole point of these rewrites):

- ``asof_join`` does NOT join at all: both sides are union-tagged and
  swept with one ordered window per key ("last non-null right payload
  so far"). Cost = one shuffle on the key + an external sort within
  partitions — identical to any windowed agg, immune to the
  O(|L|·|R|) blowup a naive theta-join suffers per key. This is the
  standard merge-sweep formulation (same idea pandas.merge_asof
  executes single-node; here each key partition sweeps independently
  on its executor).
- ``range_join`` quantizes time into buckets at least as wide as the
  band, so every left row lands in at most 2 buckets and every right
  row in exactly 1. The theta predicate becomes an EQUI-join on
  (keys…, bucket) — shuffle-partitionable, AQE-skew-splittable — with
  the exact band predicate applied as a residual filter. Candidate
  fanout is bounded by bucket width, not by key cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_SIDE, _PRIO, _BUCKET = "__asof_side", "__asof_prio", "__band_bucket"
_LID = "__range_left_id"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tie_break: str | None = None,
    allow_exact: bool = False,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row picks the latest right row
    with ``right_ts < left_ts`` (``<=`` when ``allow_exact``) per key.

    Returns all left columns plus ``payload`` columns from the matched
    right row, renamed ``{payload_prefix}{col}`` (NULL when no right
    row precedes). ``tie_break`` orders right rows that share a
    timestamp so the pick is deterministic (latest tie_break wins).
    """
    keys = [on] if isinstance(on, str) else list(on)
    # Right rows sort before the left row at equal ts iff exact matches
    # are allowed; strictly after otherwise.
    l_prio, r_prio = (1, 0) if allow_exact else (0, 1)

    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn(
        _PRIO, F.lit(l_prio)
    ).withColumn("__asof_ts", F.col(left_ts))
    r_proj = right.select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(f"{payload_prefix}{c}") for c in payload],
    ).withColumn(_SIDE, F.lit(0)).withColumn(_PRIO, F.lit(r_prio))

    out_payload = [f"{payload_prefix}{c}" for c in payload]
    for c in out_payload:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(r_proj.schema[c].dataType))
    for c in left.columns:
        if c not in r_proj.columns:
            r_proj = r_proj.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))

    order = [F.col("__asof_ts"), F.col(_PRIO)]
    if tie_break is not None:
        # right rows carry the tie column; left rows order after ties
        # regardless (prio dominates), so nulls are fine there
        tb = f"{payload_prefix}{tie_break}"
        if tb not in out_payload:
            raise ValueError(f"tie_break {tie_break!r} must be in payload")
        order.append(F.col(tb).asc_nulls_first())
    combined = l_tagged.unionByName(r_proj.select(*l_tagged.columns))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = combined.select(
        *[c for c in combined.columns if c not in out_payload],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in out_payload],
    )
    return swept.filter(F.col(_SIDE) == 1).select(*left.columns, *out_payload)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Band join: pair rows sharing ``on`` where
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    Columns must be disjoint apart from the key (alias beforehand).
    Implemented as an equi-join on (keys…, time bucket) — bucket width
    = band span, so each left row probes ≤2 buckets — plus the exact
    residual predicate. ``how`` may be "inner" or "left" (left rows
    with no partner survive with NULL right columns).
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # exact long microsecond arithmetic — unix_timestamp() would
    # truncate to seconds and mis-bucket band-edge rows
    lower_us, upper_us = lower_seconds * 1_000_000, upper_seconds * 1_000_000
    width_us = max(upper_us - lower_us, 1)

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    # row identity for the left-join unmatched recovery: anti-joining on
    # all left columns would drop-and-duplicate rows containing NULLs
    # (NULL never equals itself under SQL equality), so tag each left
    # row with a surrogate id first and anti-join on that
    l_src = left.withColumn(_LID, F.monotonically_increasing_id()) if how == "left" else left
    # left row's band [l+lower, l+upper] spans at most 2 width-sized
    # buckets; array_distinct collapses the aligned case. `div` is
    # integral long division — float floor(x/w) can round a hair-below
    # multiple UP at epoch-microsecond magnitudes and mis-bucket.
    l_exp = l_src.withColumn(
        _BUCKET,
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(
                        f"(unix_micros(`{left_ts}`) + {lower_us}L) div {width_us}L"
                    ),
                    F.expr(
                        f"(unix_micros(`{left_ts}`) + {upper_us}L) div {width_us}L"
                    ),
                )
            )
        ),
    )
    r_b = right.withColumn(
        _BUCKET, F.expr(f"unix_micros(`{right_ts}`) div {width_us}L")
    )
    band = (r_us >= l_us + lower_us) & (r_us <= l_us + upper_us)
    if how == "inner":
        return l_exp.join(r_b, [*keys, _BUCKET]).filter(band).drop(_BUCKET)
    # left join: run the inner plan, then re-attach unmatched left rows
    # (identified by surrogate id — null-safe by construction)
    matched = l_exp.join(r_b, [*keys, _BUCKET]).filter(band).drop(_BUCKET)
    right_only = [c for c in matched.columns if c not in l_src.columns]
    unmatched = l_src.join(matched.select(_LID).distinct(), [_LID], "left_anti")
    for c in right_only:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(matched.schema[c].dataType))
    return matched.unionByName(unmatched).drop(_LID)
