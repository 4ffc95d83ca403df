"""Date/time scalar functions (SURVEY.md §2.H F1-F11).

These encode the reference's *exact* semantics, including the traps:

- F1 multi-format tolerant parse (``app.py:22-40``): try each format in
  order, NULL if none matches — pure ``coalesce(try_to_timestamp...)``,
  no UDF.
- F5 whole-day diff (``ecom_Silver_Layer.ipynb:271``): pandas
  ``.dt.days`` truncates the timedelta toward zero — NOT the same as
  Spark's calendar-boundary ``datediff``. We floor epoch-seconds.
- F9 date_sk encoding (yyyymmdd int, observed
  ``fact_order_lifecycle.csv:2``).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

# formats tried by the reference dashboard's to_datetime_safe (app.py:24-31)
REFERENCE_TS_FORMATS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "dd-MM-yyyy HH:mm",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm",
)


def tolerant_to_timestamp(col: Column | str, formats: Sequence[str] = REFERENCE_TS_FORMATS) -> Column:
    """F1/F2: first format that parses wins; NULL if none do.

    Spark-native realization of pandas ``to_datetime_safe`` (UD2 —
    app.py:22-40, replaced with pure SQL, no UDF) / BigQuery
    ``SAFE.PARSE_TIMESTAMP`` — stays in codegen.

    Only the explicit reference formats are attempted (no format-less
    fallback: it would bind bare times like '12:34' to the wall-clock
    date, breaking determinism). Parses outside year [1, 9999] — which
    Spark's proleptic calendar accepts but Python/pandas cannot
    represent (``datetime.MINYEAR == 1``) — are nulled to match the
    reference's NaT behavior.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in formats])
    return F.when(F.year(parsed).between(1, 9999), parsed)


def month_bucket(col: Column | str) -> Column:
    """F4: pandas ``dt.to_period("M").astype(str)`` → 'YYYY-MM' (app.py:130)."""
    return F.date_format(col, "yyyy-MM")


def date_sk(col: Column | str) -> Column:
    """F9: timestamp/date → yyyymmdd surrogate int (ecom_Gold_Layer.ipynb:53-56)."""
    return F.date_format(col, "yyyyMMdd").cast("long")


def day_diff_trunc(end: Column | str, start: Column | str) -> Column:
    """F5: exact pandas ``(end-start).dt.days`` parity — floor of whole
    seconds difference / 86400 (truncates partial days toward -inf on
    the floored-seconds delta), NOT calendar datediff."""
    e = F.unix_timestamp(end)
    s = F.unix_timestamp(start)
    return F.floor((e - s) / F.lit(86400))


def fractional_days(end: Column | str, start: Column | str) -> Column:
    """F6: ``.dt.total_seconds()/(24*3600)`` → fractional days (app.py:137-140)."""
    return (F.unix_timestamp(end) - F.unix_timestamp(start)) / F.lit(86400.0)
