"""Self-check harness mirroring the driver's DuckDB-oracle comparison:
row count + columns + order-insensitive value comparison."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare_query(spark, sf_dir: str, spark_df, oracle_sql: str):
    """Assert spark_df matches the oracle on cols + order-insensitive values."""
    # batch boundary: pins (correctness pins included) are released in
    # the finally even when an assertion fails — a red query must not
    # leak its pins into the next 290+ queries of the session
    from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
        release_pinned,
    )

    try:
        con = duckdb_con(sf_dir)
        oracle = con.execute(oracle_sql)
        o_cols = [d[0] for d in oracle.description]
        o_rows = oracle.fetchall()

        s_cols = spark_df.columns
        s_rows = [tuple(r) for r in spark_df.collect()]

        sc, sr = _norm_rows(s_cols, s_rows)
        oc, orr = _norm_rows(o_cols, o_rows)

        assert sc == oc, f"column mismatch: spark={sc} oracle={oc}"
        assert len(sr) == len(orr), (
            f"row count mismatch: spark={len(sr)} oracle={len(orr)}"
        )
        for i, (a, b) in enumerate(zip(sr, orr)):
            assert _rows_close(a, b), f"row {i} mismatch:\n  spark={a}\n  oracle={b}"
    finally:
        release_pinned()


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True
