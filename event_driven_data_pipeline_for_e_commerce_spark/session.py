"""SparkSession factory and session-level semantics.

The reference pipeline runs on BigQuery + pandas with these implicit
semantics (SURVEY.md §1.2-1.3):

- all timestamps UTC (``ecom_Silver_Layer.ipynb:173-183``)
- tolerant parsing: unparseable timestamp/number -> NULL, never error
  (``Scd_Type2.sql:19-23`` SAFE.PARSE_TIMESTAMP; ``app.py:22-40,94``)

We encode both at the session level: UTC session timezone (F3 — the
localize-naive/convert-aware normalization of ecom_Silver_Layer.ipynb:
173-183) and non-ANSI mode (F18 — casts return NULL on junk). AQE is
on so joins/skew re-plan at runtime — this is the 100 TB stance: let
the optimizer pick broadcast vs shuffle join from runtime stats
instead of hand-scheduling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable semantics every entry point applies, whether the
# session was built by us or handed in by a driver.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # testdata events.parquet stores TIMESTAMP(NANOS) which the Parquet
    # reader rejects; read as long-nanos and convert in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Timezone-less parquet timestamps (isAdjustedToUTC=false) otherwise
    # surface as TIMESTAMP_NTZ, which unix_micros/to_utc_timestamp
    # reject. With the session timezone pinned to UTC, reading them as
    # regular TIMESTAMP is value-identical and keeps every temporal
    # operator on one type.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Persisted frames (minhash signatures, SCD2 target, shingles)
    # otherwise pin their shuffle stages at the session's static
    # shuffle-partition count — a driver session's default 200 yields
    # 200 tiny tasks per cached-plan stage at small SF.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Let the planner pick shuffled-hash join where its size conditions
    # hold instead of always sorting both sides (optimization guide
    # §3.1/§9): a same-session interleaved A/B over the 10 join-heavy
    # headline queries measured 15.7s vs 17.8s (every query <= 1.0x,
    # best 0.72x on q21's double-EXISTS). Not a local-only knob — SHJ
    # skips both sort passes wherever a per-partition build side fits
    # in memory, which scales with shuffle partition count; AQE skew
    # splitting still applies, and the planner falls back to
    # sort-merge when its size estimates exceed the build budget, so
    # the OOM risk profile is the planner's standard one.
    "spark.sql.join.preferSortMergeJoin": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "edp-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a local session with the engine's semantics.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster this would be ~2-3x total cores; AQE coalesces down at
    runtime so oversizing is safe, undersizing is not.
    """
    n = shuffle_partitions or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{default_parallelism()}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    apply_session_semantics(spark)
    return spark


def apply_session_semantics(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable semantics to ANY session.

    Called from every public entry point so driver-provided sessions
    behave identically to ours (UTC, tolerant casts, AQE).
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # static conf on this build — already set or harmless default
            pass
    return spark
