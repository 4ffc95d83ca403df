"""Partitioning helpers for compute-bound stages.

Spark sizes scan partitions by BYTES (`spark.sql.files.maxPartitionBytes`,
with `openCostInBytes` preventing small files from splitting at all), and
a Parquet file can never split below row-group granularity. For IO-bound
relational work that's right; for compute-heavy per-row work (shingling,
hashing, vector math) a few-MB single-row-group text file becomes ONE
task and serializes the whole stage on one core. At 100 TB the scan
naturally yields thousands of splits, so the repartition below is a
no-op; on small inputs it buys full-core parallelism for one cheap
shuffle of the projected columns.

The small/large decision is metadata-only (input file list + local file
sizes) — it must NOT inspect the physical plan: under AQE, touching
``df.rdd`` executes query stages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Below this many input bytes a round-robin shuffle is cheap and the
# parallelism win dominates; above it the scan is already split.
SMALL_INPUT_BYTES = 256 * 1024 * 1024


def _local_path(uri: str) -> str | None:
    if uri.startswith("file:"):
        return uri[len("file:"):]
    if uri.startswith("/"):
        return uri
    return None


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition small scans up to ``min_partitions``
    (default: defaultParallelism). Large or already-parallel inputs are
    returned unchanged, so this never reshuffles data at scale."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= target:
        return df  # scan parallelism already at least the core count
    total = 0
    for f in files:
        p = _local_path(f)
        if p is None or not os.path.exists(p):
            return df  # size unknown (remote FS) — don't second-guess the scan
        total += os.path.getsize(p)
    if total > SMALL_INPUT_BYTES:
        return df
    return df.repartition(target)
