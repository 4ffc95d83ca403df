"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship funnel query on sf0.001;
``queries()``/``oracle_sql()`` expose the engine's full corpus
(event_driven_data_pipeline_for_e_commerce_spark.plans.corpus).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from event_driven_data_pipeline_for_e_commerce_spark.plans import corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (lifecycle/conversion funnel) on sf0.001."""
    return corpus.QUERIES["funnel"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(corpus.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(corpus.ORACLES)
