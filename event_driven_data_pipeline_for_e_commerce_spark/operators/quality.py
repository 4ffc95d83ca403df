"""Declarative data-quality checks (the reference README's
'Automated testing and validation' aspiration, README.md:165 — no code
exists in the reference; this is the engine's concrete form).

A rule set compiles to ONE aggregation pass over the table — every
rule becomes a conditional-count expression inside the same
``agg(...)``, so a 50-rule suite still costs one scan with map-side
partial aggregation (the Great-Expectations-style per-rule-per-scan
loop would read 100 TB fifty times). The single result row unpivots to
one row per rule: (rule, col_name, n_violations, passed).

Rules:
- ``not_null(col)`` — NULL count
- ``unique(col)`` — rows minus distinct values (exact count_distinct;
  hash-only shuffle, values never move)
- ``accepted_values(col, values)`` — rows outside the enum
- ``in_range(col, lo, hi)`` — non-NULL rows outside [lo, hi]
- ``matches(col, regex)`` — non-NULL rows not fully matching
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Rule:
    """One check: ``kind`` names the rule type, ``col`` the column it
    guards, ``expr`` the violation-count aggregate."""

    kind: str
    col: str
    expr: Column

    @property
    def name(self) -> str:
        return f"{self.kind}:{self.col}"


def _cnt(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0))


def not_null(col: str) -> Rule:
    return Rule("not_null", col, _cnt(F.col(col).isNull()))


def unique(col: str) -> Rule:
    return Rule(
        "unique", col, F.count(F.col(col)) - F.count_distinct(F.col(col))
    )


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        "accepted_values",
        col,
        _cnt(F.col(col).isNotNull() & ~F.col(col).isin(*values)),
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        "in_range",
        col,
        _cnt(
            F.col(col).isNotNull()
            & ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)))
        ),
    )


def matches(col: str, regex: str) -> Rule:
    # anchored: rlike is a substring search, but the rule contract (and
    # SQL regexp_full_match oracles) is whole-value match
    return Rule(
        "matches",
        col,
        _cnt(F.col(col).isNotNull() & ~F.col(col).rlike(f"^(?:{regex})$")),
    )


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass. Output: (rule,
    col_name, n_violations bigint, passed boolean), one row per rule
    in declaration order — tiny, suitable for sinking to an audit
    table or failing a pipeline gate on ``passed = false``."""
    aggs = [
        r.expr.cast("bigint").alias(f"v{i}") for i, r in enumerate(rules)
    ]
    one = df.agg(*aggs)
    stacked = one.unpivot(
        [], [f"v{i}" for i in range(len(rules))], "rule_id", "n_violations"
    )
    meta = df.sparkSession.createDataFrame(
        [(f"v{i}", r.kind, r.col) for i, r in enumerate(rules)],
        "rule_id string, rule string, col_name string",
    )
    return (
        stacked.join(F.broadcast(meta), "rule_id")
        .select(
            "rule",
            "col_name",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
