"""Property-based differential tests (SURVEY.md §5.2.2) for the
semantic-parity traps: each property generates batches of adversarial
inputs with hypothesis and compares the engine's Spark expression
against the ORIGINAL semantics (pandas / python stdlib) — not against
a re-implementation of our own code.

One Spark job per hypothesis example (rows batched per example) keeps
the suite fast; deadline disabled because JVM job latency is noisy.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from event_driven_data_pipeline_for_e_commerce_spark.functions.datetimes import (
    day_diff_trunc,
    tolerant_to_timestamp,
)
from event_driven_data_pipeline_for_e_commerce_spark.functions.strings import row_hash
from event_driven_data_pipeline_for_e_commerce_spark.operators.dedup import (
    dedup_keyed_ordered,
)

SETTINGS = settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

# second-granularity timestamps in a calendar-safe span
ts_strategy = st.datetimes(
    min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2035, 1, 1)
).map(lambda d: d.replace(microsecond=0))


@SETTINGS
@given(st.lists(st.tuples(ts_strategy, ts_strategy), min_size=1, max_size=40))
def test_day_diff_matches_pandas_dt_days(spark, pairs):
    """F5: day_diff_trunc must reproduce pandas ``(end-start).dt.days``
    exactly — including NEGATIVE deltas, where ``Timedelta.days``
    floors toward -inf (a half-day deficit rounds DOWN a day), which
    calendar ``datediff`` would get wrong."""
    rows = [(i, s, e) for i, (s, e) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, s timestamp, e timestamp")
    got = {
        r["id"]: r["d"]
        for r in df.select("id", day_diff_trunc("e", "s").alias("d")).collect()
    }
    pdf = pd.DataFrame(rows, columns=["id", "s", "e"])
    want = (pdf["e"] - pdf["s"]).dt.days
    for i, w in zip(pdf["id"], want):
        assert got[i] == w, f"row {i}: spark={got[i]} pandas={w}"


FORMATS = [
    ("%Y-%m-%d %H:%M:%S", "{:%Y-%m-%d %H:%M:%S}"),
    ("%Y-%m-%d %H:%M", "{:%Y-%m-%d %H:%M}"),
    ("%d-%m-%Y %H:%M", "{:%d-%m-%Y %H:%M}"),
    ("%d/%m/%Y %H:%M:%S", "{:%d/%m/%Y %H:%M:%S}"),
    ("%d/%m/%Y %H:%M", "{:%d/%m/%Y %H:%M}"),
]


def _python_tolerant_parse(s: str):
    """The reference's to_datetime_safe (app.py:22-40) in python form:
    first format that parses wins, else None."""
    for fmt, _ in FORMATS:
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


@SETTINGS
@given(
    st.lists(
        st.one_of(
            st.tuples(ts_strategy, st.sampled_from(range(len(FORMATS)))).map(
                lambda t: FORMATS[t[1]][1].format(t[0])
            ),
            st.text(
                alphabet="0123456789-/: Unknowable",
                max_size=25,
            ).filter(lambda s: _python_tolerant_parse(s) is None),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_tolerant_parse_matches_python_strptime(spark, strings):
    """F1/F2: format-ordered tolerant parse — every well-formed string
    parses to the same instant python does; junk yields NULL, never an
    error (non-ANSI semantics)."""
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        r["id"]: r["t"]
        for r in df.select("id", tolerant_to_timestamp("s").alias("t")).collect()
    }
    for i, s in rows:
        want = _python_tolerant_parse(s)
        if want is None:
            # Spark appends a generic-format fallback attempt; a string
            # python rejects in all 5 formats may still parse there
            # (e.g. ISO with seconds+offset) — only assert no crash and
            # NULL for clearly junk strings without any digit pattern
            if not any(c.isdigit() for c in s):
                assert got[i] is None, f"{s!r} -> {got[i]}"
        else:
            assert got[i] == want, f"{s!r}: spark={got[i]} python={want}"


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=20)),
            st.one_of(st.none(), st.text(max_size=20)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_row_hash_matches_hashlib(spark, rows_in):
    """F12: md5 row hash must be byte-identical to the reference's
    TO_HEX(MD5(CONCAT(COALESCE(c,'')...))) — checked against hashlib."""
    rows = [(i, a, b) for i, (a, b) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    got = {
        r["id"]: r["h"] for r in df.select("id", row_hash(["a", "b"]).alias("h")).collect()
    }
    for i, a, b in rows:
        want = hashlib.md5(((a or "") + (b or "")).encode()).hexdigest()
        assert got[i] == want


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.floats(0, 100)),
        min_size=1,
        max_size=40,
    )
)
def test_ordered_dedup_matches_pandas_sort_drop(spark, rows_in):
    """B10: dedup_keyed_ordered == pandas sort_values + drop_duplicates
    (keep first) under a total order — incl. tie groups, where the
    unique tiebreak column decides identically on both sides."""
    rows = [(i, k, o, v) for i, (k, o, v) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, "id long, k int, o int, v double")
    got = sorted(
        (r["k"], r["id"]) for r in dedup_keyed_ordered(df, ["k"], ["o", "id"]).collect()
    )
    pdf = pd.DataFrame(rows, columns=["id", "k", "o", "v"])
    want = sorted(
        (int(r.k), int(r.id))
        for r in pdf.sort_values(["o", "id"]).drop_duplicates("k").itertuples()
    )
    assert got == want


@SETTINGS
@given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=41))
def test_median_matches_pandas(spark, values):
    """G10: Spark ``median`` is the exact (interpolated) median, not an
    approximation — must equal pandas for odd AND even counts."""
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got = df.agg(F.median("v").alias("m")).collect()[0]["m"]
    want = float(pd.Series(values).median())
    assert abs(got - want) <= 1e-9 * max(1.0, abs(want))


def test_salted_join_correct_under_extreme_skew(spark):
    """5M-row fact where ONE key owns 60% of all rows: the salted join
    must return exactly the plain join's aggregate result (salting is
    a physical rewrite, not a semantic one), with the hot key spread
    across all salt buckets. This is the at-scale skew scenario the
    testdata is too uniform to exercise."""
    import pyspark.sql.functions as F
    from event_driven_data_pipeline_for_e_commerce_spark.operators.joins import salted_join

    n = 5_000_000
    # key 7 takes ~60% of rows; the rest spread over 1000 keys
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 6, 7)
        .otherwise(F.pmod(F.col("id"), 1000))
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("g"), F.col("id") % 5).alias("grp")
    )
    plain = (
        fact.join(dim, "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s"))
    )
    salted = (
        salted_join(fact, dim, "k", buckets=16)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s"))
    )
    want = {r["grp"]: (r["n"], r["s"]) for r in plain.collect()}
    got = {r["grp"]: (r["n"], r["s"]) for r in salted.collect()}
    assert got == want
    assert sum(n for n, _ in got.values()) == n
