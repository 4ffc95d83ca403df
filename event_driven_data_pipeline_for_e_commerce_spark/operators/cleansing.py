"""Silver-layer cleansing (SURVEY.md §7.2 M2; reference UD3,
``ecom_Silver_Layer.ipynb:191-289``).

Faithful semantics, Spark-shaped execution:

- full-row dedup (``:198-199``)
- numeric NULL fill: 0 for the lifecycle table, per-column MEDIAN for
  everything else (``:203-221``) — medians are computed in ONE
  distributed agg pass, not one job per column
- string NULL fill: '0' for zip/postal-named columns, 'Unknown'
  otherwise (``:226-245``)
- ``load_timestamp`` audit column (``:248``)
- date handling for configured tables (``:253-281``): tolerant
  multi-format parse → drop rows with unparseable required dates →
  ``duration_days`` (end-start) or ``days_since_event`` (now-start),
  pandas ``.dt.days`` truncation parity

Everything is native Catalyst expressions; the whole cleanse is one
lazy plan (scan → project/filter chain) with a single extra job for
the median statistics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.datetimes import REFERENCE_TS_FORMATS, day_diff_trunc, tolerant_to_timestamp

NUMERIC_TYPES = {"int", "bigint", "smallint", "tinyint", "float", "double", "decimal"}

ZIP_COL_PATTERN = re.compile(r"postal|zip", re.IGNORECASE)


@dataclass
class DateDurationConfig:
    """ecom_Silver_Layer.ipynb:165-169 — which date columns a table has
    and what derived duration to compute."""

    date_cols: tuple[str, ...]
    start_col: str | None = None
    end_col: str | None = None  # with start_col -> duration_days
    since_col: str | None = None  # -> days_since_event vs now()


@dataclass
class CleansePolicy:
    numeric_fill: str = "median"  # "median" | "zero" (lifecycle tables use zero)
    string_fill: str = "Unknown"
    zip_string_fill: str = "0"
    add_load_timestamp: bool = True
    dates: DateDurationConfig | None = None
    ts_formats: tuple[str, ...] = tuple(REFERENCE_TS_FORMATS)


def _numeric_cols(df: DataFrame) -> list[str]:
    return [c for c, t in df.dtypes if t.split("(")[0] in NUMERIC_TYPES]


def _string_cols(df: DataFrame) -> list[str]:
    return [c for c, t in df.dtypes if t == "string"]


def cleanse(df: DataFrame, policy: CleansePolicy | None = None) -> DataFrame:
    """Apply the reference's Silver cleansing as one lazy plan."""
    policy = policy or CleansePolicy()

    out = df.dropDuplicates()

    num_cols = _numeric_cols(out)
    if num_cols:
        if policy.numeric_fill == "zero":
            out = out.na.fill({c: 0 for c in num_cols})
        else:
            # one distributed pass for every column median
            stats = out.agg(
                *[F.median(F.col(c)).alias(c) for c in num_cols]
            ).collect()[0]
            fills = {c: stats[c] for c in num_cols if stats[c] is not None}
            if fills:
                out = out.na.fill(fills)

    str_cols = _string_cols(out)
    if str_cols:
        fills = {
            c: (policy.zip_string_fill if ZIP_COL_PATTERN.search(c) else policy.string_fill)
            for c in str_cols
        }
        out = out.na.fill(fills)

    if policy.add_load_timestamp:
        out = out.withColumn("load_timestamp", F.current_timestamp())

    if policy.dates:
        cfg = policy.dates
        for c in cfg.date_cols:
            out = out.withColumn(c, tolerant_to_timestamp(F.col(c), policy.ts_formats))
        # drop rows whose required dates failed to parse (ipynb:264-276)
        out = out.na.drop(subset=list(cfg.date_cols))
        if cfg.start_col and cfg.end_col:
            out = out.withColumn(
                "duration_days", day_diff_trunc(cfg.end_col, cfg.start_col)
            )
        if cfg.since_col:
            out = out.withColumn(
                "days_since_event",
                day_diff_trunc(F.current_timestamp(), F.col(cfg.since_col)),
            )
    return out


# F21 table-conditional fill policy: per-table policies mirroring
# ecom_Silver_Layer.ipynb:156-169,203-245 (lifecycle fills 0, others
# median; zip/postal columns fill '0' via F17's name-pattern match)
REFERENCE_POLICIES: dict[str, CleansePolicy] = {
    "synthetic_order_lifecycle": CleansePolicy(
        numeric_fill="zero",
        dates=DateDurationConfig(date_cols=("event_timestamp",), since_col="event_timestamp"),
    ),
    "dim_order": CleansePolicy(
        dates=DateDurationConfig(
            date_cols=("order_purchase_timestamp", "order_delivered_customer_date"),
            start_col="order_purchase_timestamp",
            end_col="order_delivered_customer_date",
        ),
    ),
    "default": CleansePolicy(),
}
