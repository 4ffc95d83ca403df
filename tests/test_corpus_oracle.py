"""Oracle-differential tests (SURVEY.md §5.2.1): every corpus query vs
its DuckDB oracle at sf0.001 (fast) — the driver runs the same shape at
sf0.01."""

from __future__ import annotations

import pytest

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import ORACLES, QUERIES

from .oracle_utils import compare_query

# Full-corpus parametrized sweep: excluded from the default (driver-
# verify) pytest run via pytest.ini; run with -m "" for the full suite.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare_query(spark, sf_dir, df, ORACLES[name])


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
