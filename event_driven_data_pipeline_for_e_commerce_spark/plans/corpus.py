"""The public query corpus: every operator from SURVEY.md §2 as a named
query over the driver testdata, paired with an ANSI-SQL oracle DuckDB
can run on the same parquet.

Contract (``__spark_entry__.py``): each QUERIES[name] takes
(spark, sf_dir) -> DataFrame; ORACLES[name] is the equivalent SQL.
Column names/aliases MUST match between the two — the driver sorts
columns by name before value-hashing.

Determinism rules applied throughout:
- every top-k / limit has a total-order tie-break on a unique key
- money/ratio outputs are rounded identically on both sides
- no wall-clock, no unseeded randomness
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggregates import funnel
from .tables import load_tables

FUNNEL_STAGES = ["view", "click", "signup", "purchase"]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable and its oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Flagship: lifecycle/conversion funnel (SURVEY §7.1; ST2/G12,
# reference app.py:237-242, README.md:83 gold_funnel_metrics)
# --------------------------------------------------------------------------

@query(
    "funnel",
    oracle="""
    WITH counts AS (
        SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
    ),
    stages(stage_order, event_type) AS (
        VALUES (1, 'view'), (2, 'click'), (3, 'signup'), (4, 'purchase')
    )
    SELECT
        s.stage_order,
        s.event_type,
        COALESCE(c.cnt, 0) AS cnt,
        ROUND(
            COALESCE(c.cnt, 0) * 100.0
            / FIRST_VALUE(COALESCE(c.cnt, 0)) OVER (ORDER BY s.stage_order),
            4
        ) AS conversion_pct
    FROM stages s LEFT JOIN counts c USING (event_type)
    ORDER BY s.stage_order
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return funnel(t["events"], FUNNEL_STAGES)
