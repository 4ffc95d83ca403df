"""Testdata table loader.

Reads the driver-generated parquet star schema (TESTDATA.md) as lazy
DataFrames. Reads are plain ``spark.read.parquet`` so Catalyst pushes
filters/projections into the scan (PushedFilters / ReadSchema) — the
Spark-native equivalent of the reference's hand-written projected scans
(``ecom_Gold_Layer.ipynb:37-42``, SURVEY.md §2.A A3/A4).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import apply_session_semantics

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# columns stored as TIMESTAMP(NANOS) in the driver parquet
NANO_TS_COLUMNS = {"ts"}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Return {name: DataFrame} for every testdata table present in sf_dir."""
    apply_session_semantics(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            # TIMESTAMP(NANOS) columns arrive as long nanos-since-epoch
            # (see session.RUNTIME_CONF); convert to proper timestamps.
            # `ts div 1000` is exact integer division — no double rounding.
            for col, dtype in df.dtypes:
                if dtype == "bigint" and col in NANO_TS_COLUMNS:
                    df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
                elif dtype.startswith("timestamp_ntz"):
                    # Session read as NTZ anyway (conf applied too late or
                    # overridden): normalize — UTC session tz makes the
                    # cast value-identical.
                    df = df.withColumn(col, F.col(col).cast("timestamp"))
            out[name] = df
    return out
