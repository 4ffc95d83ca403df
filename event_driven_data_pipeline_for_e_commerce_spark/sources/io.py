"""Sources & sinks (SURVEY.md §2.A A1-A8).

The reference's Bronze ingest concatenates every CSV in a folder with a
``source_table`` lineage column (ecom_Bronze_Layer.ipynb:38-44) and its
dashboard reads CSVs defensively (app.py:13-20). Spark-native forms:

- A1: one distributed ``read.csv`` over the glob + ``input_file_name()``
  — no per-file driver loop, files are split across executors.
- A5-A7: ``write.parquet`` with ``partitionBy`` (the BigQuery
  ``PARTITION BY DATE(...)`` equivalent) and ``sortWithinPartitions``
  (the ``CLUSTER BY`` approximation) — at scale this is what enables
  partition pruning + better row-group skipping.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Sequence
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import pin


def read_csv_dir(
    spark: SparkSession,
    path: str,
    lineage_col: str = "source_table",
    infer_schema: bool = True,
) -> DataFrame:
    """A1: scan every ``*.csv`` under ``path``, tagging rows with the
    originating file's basename (lineage), union-by-name across
    heterogeneous schemas (pd.concat parity, ecom_Bronze_Layer.ipynb:
    38-44; ``infer_schema`` mirrors the load job's ``autodetect``).

    Spark's multi-file CSV scan applies ONE schema positionally to
    every file — wrong when headers differ — so files are grouped by
    header line (driver reads one line per file: metadata-scale IO)
    and each group becomes one distributed scan; groups then
    ``unionByName`` with NULL fill for missing columns.
    """
    files = sorted(glob.glob(os.path.join(path, "*.csv")))
    groups: dict[str, list[str]] = {}
    for f in files:
        with open(f, encoding="utf-8", errors="replace") as fh:
            header = fh.readline()
        groups.setdefault(header, []).append(f)
    parts = []
    for group_files in groups.values():
        df = (
            spark.read.option("header", True)
            .option("inferSchema", infer_schema)
            .csv(group_files)
        )
        parts.append(
            df.withColumn(
                lineage_col, F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv", 1)
            )
        )
    if not parts:
        return spark.createDataFrame([], f"`{lineage_col}` string")
    return union_by_name(parts)


def safe_read_csv(spark: SparkSession, path: str) -> DataFrame:
    """A2: tolerant single-file scan — empty 0-column frame on missing
    file, PERMISSIVE mode on corrupt rows (app.py:13-20)."""
    if not os.path.exists(path):
        return spark.createDataFrame([], "struct<>")
    return spark.read.option("header", True).option("mode", "PERMISSIVE").csv(path)


def union_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """U1: schema-aligned union-all; missing columns become NULL
    (pd.concat parity, ecom_Bronze_Layer.ipynb:44)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet scan: ``mergeSchema`` unions
    the footer schemas of every file, so batches written before a
    column existed read back with NULLs instead of being silently
    projected through the newest file's schema Spark happened to pick.

    At 100 TB, schema merging reads every file FOOTER at planning time
    (metadata-scale, not data-scale) — acceptable for an evolving
    landing zone; compacted/curated zones should pin an explicit
    schema instead."""
    return spark.read.option("mergeSchema", True).parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    cluster_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """A5-A7: partitioned overwrite write with optional within-partition
    clustering (``PARTITION BY``/``CLUSTER BY`` of Scd_Type2.sql:91-92)."""
    if cluster_by:
        df = df.sortWithinPartitions(*cluster_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _split_top_level(schema: str) -> list[str]:
    """Split a DDL schema string on TOP-LEVEL commas only (ADVICE-r9):
    commas nested inside ``<...>`` (map/struct/array element types) or
    ``(...)`` (``decimal(38,0)`` precision args) belong to one field,
    so ``a map<string,int>, b decimal(10,2)`` yields exactly two
    tokens instead of the garbage a naive ``str.split`` produced."""
    fields: list[str] = []
    depth = 0
    start = 0
    for pos, ch in enumerate(schema):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(schema[start:pos])
            start = pos + 1
    fields.append(schema[start:])
    return fields


def _quarantine_schema(schema: str, corrupt_col: str) -> str:
    """Validate a caller DDL schema and append the corrupt-record
    column. Raises clearly (instead of a confusing Spark analysis
    error downstream) when the caller passed a non-string schema
    (e.g. a StructType — these readers take DDL strings only) or a
    schema that already contains the corrupt column (ADVICE-r8: the
    old string concatenation produced a duplicate-column failure)."""
    if not isinstance(schema, str):
        raise TypeError(
            "quarantine readers take a DDL schema string, got "
            f"{type(schema).__name__}; render a StructType with "
            ".simpleString()/toDDL first"
        )
    fields = [
        f.split()[0].strip("`").lower()
        for f in _split_top_level(schema)
        if f.strip()
    ]
    if corrupt_col.lower() in fields:
        raise ValueError(
            f"schema already contains the corrupt-record column "
            f"{corrupt_col!r}; pass a different corrupt_col or drop it "
            "from the schema"
        )
    return f"{schema}, {corrupt_col} string"


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """Error-row quarantine (SURVEY.md §4.1): PERMISSIVE scan with a
    corrupt-record column, split into (good, quarantined). The Spark
    realization of the reference's try/except-per-table isolation +
    stray-header filters (ecom_Silver_Layer.ipynb:303-320,
    Scd_Type2.sql:124-126) — bad rows are retained for inspection
    instead of silently dropped or fatally raised.

    The scan is cached before splitting: Spark's PERMISSIVE corrupt
    column is only populated while parsing, so filtering an uncached
    re-scan could re-parse and race with pushdown pruning of the
    corrupt column.
    """
    df = pin(
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(_quarantine_schema(schema, corrupt_col))
        .csv(path),
        critical=True,
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines twin of ``read_csv_quarantine`` — the interchange
    format LLM-corpus pipelines actually ship (one JSON object per
    line). PERMISSIVE scan with a corrupt-record column, split into
    (good, quarantined); malformed lines and type-mismatched fields
    land in the quarantine frame instead of failing the job or being
    silently nulled. Same reference surface as the CSV form (the
    try/except-per-table isolation, ecom_Silver_Layer.ipynb:303-320),
    extended to the corpus-native format.

    The scan is pinned before splitting for the same reason as the
    CSV form: the corrupt column is populated only during parsing, so
    an uncached re-scan could race with pushdown pruning of it. At
    100 TB the split is a map-side filter over one shared scan — no
    second read of the raw bytes."""
    df = pin(
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(_quarantine_schema(schema, corrupt_col))
        .json(path),
        critical=True,
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """A7 ``CLUSTER BY`` in its shuffle-eliminating form: a managed
    table bucketed (and optionally sorted) on the join/agg keys. Two
    tables bucketed the same way equi-join WITHOUT an Exchange on
    either side — the co-located-join layout for repeated 100 TB
    fact⋈fact joins. Size ``n_buckets`` so one bucket ≈ one task's
    memory budget at the target scale."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def ensure_database(spark: SparkSession, name: str) -> None:
    """A8: idempotent dataset create (the reference's ``Conflict``-catch
    on dataset/table creation, ecom_Silver_Layer.ipynb:325-330 + run
    log :14)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def save_managed_table(
    df: DataFrame, table: str, database: str | None = None, mode: str = "overwrite"
) -> str:
    """A5/A3: overwrite a managed catalog table (the BigQuery
    ``WRITE_TRUNCATE`` load) and return its qualified name for
    ``spark.table`` scans."""
    if database:
        ensure_database(df.sparkSession, database)
        table = f"{database}.{table}"
    df.write.mode(mode).format("parquet").saveAsTable(table)
    return table


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: Sequence[str] = (),
) -> int:
    """Compact a small-files parquet directory (the debris every
    micro-batch/streaming sink accumulates) into ~``target_file_bytes``
    files; returns the new file count. Streaming sinks write one file
    per partition per batch — at scale a day of 30s batches is ~3k
    files per partition, and scan planning + footer reads dominate.

    Metadata-only sizing (sum of current file sizes — no data pass),
    one round-robin repartition to the target count, optional
    ``sortWithinPartitions`` to restore clustering, then an atomic
    temp-write + swap (the same pattern scd2_write uses) so readers
    never see a half-compacted directory.
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
