"""SQL-surface parity: the engine's queries are expressible through
BOTH public Spark surfaces — `spark.sql(...)` on registered views and
the DataFrame API — with identical results.

The corpus oracles are written in ANSI-leaning DuckDB SQL; 106 of the
211 run VERBATIM on Spark SQL (the rest use DuckDB-specific functions
like list_dot_product / string_split_regex). This test pins a diverse
25-query subset and requires exact row-level equality between
`spark.sql(oracle_text)` and the DataFrame-API implementation — the
in-engine proof that a SQL-first user of the reference can bring
their queries over unchanged.
"""

from __future__ import annotations

import pytest

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import ORACLES, QUERIES
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables

# Diverse pinned subset of the 106 verbatim-portable oracles: filters,
# multi-way joins, windows, grouping sets, set ops, unpivot, TPC-H
# shapes, dedup, graph, sketch-contract, and round-4 additions.
PORTABLE = [
    "funnel", "filter_status_revenue", "dedup_keyed_ordered",
    "revenue_by_region", "brand_performance", "rollup_revenue",
    "median_acctbal_by_nation", "topk_orders", "pricing_summary",
    "customer_order_ranks", "nations_both_sides_intersect",
    "status_measures_unpivot", "q3_shipping_priority",
    "q9_product_type_profit", "q13_order_count_distribution",
    "q21_waiting_suppliers", "basket_part_pairs", "hll_rollup_contract",
    "part_copurchase_pagerank", "cart_abandonment_daily",
    "customer_pareto_abc", "part_revenue_gini",
    "functional_dependency_audit", "doc_exact_dedup",
    "purchase_attribution",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return sf_dir


def _norm(rows):
    """Spark SQL types ROUND(decimal-division) as Decimal while the
    DataFrame API yields double — same values, different carrier.
    Fold both to float before comparing."""
    import decimal

    return sorted(
        str(
            tuple(
                float(v) if isinstance(v, decimal.Decimal) else v
                for v in r
            )
        )
        for r in rows
    )


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_matches_dataframe_api(spark, sf_dir, views, name):
    sql_rows = _norm(spark.sql(ORACLES[name]).collect())
    df_rows = _norm(QUERIES[name](spark, sf_dir).collect())
    assert sql_rows == df_rows, name
