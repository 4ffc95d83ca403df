"""Z-order clustered write: footer-statistics proof of
multi-dimensional data skipping (operators/zorder.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.operators.zorder import (
    write_zordered,
    zvalue,
)


def _file_spans(path, xcol, ycol):
    """Per-file (x_span * y_span) areas from parquet footer min/max —
    the region a reader must assume the file covers."""
    areas = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = {xcol: None, ycol: None}
        hi = {xcol: None, ycol: None}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in lo and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        areas.append(
            (hi[xcol] - lo[xcol] + 1) * (hi[ycol] - lo[ycol] + 1)
        )
    return areas


def test_zorder_write_tightens_file_regions(spark, tmp_path):
    """Writing along the Morton curve must shrink the average per-file
    (x, y) bounding area by a large factor vs the same rows written in
    hash order — the footer property that makes filters on EITHER
    column prune files at 100 TB."""
    df = (
        spark.range(0, 65536)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(8)  # destroy any incidental ordering
    )
    base = str(tmp_path / "plain")
    df.write.mode("overwrite").parquet(base)
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, [F.col("x"), F.col("y")], bits=8, n_files=8)

    full_area = 256 * 256
    plain = _file_spans(base, "x", "y")
    z = _file_spans(zpath, "x", "y")
    # unordered files each cover ~the whole key square
    assert sum(plain) / len(plain) > full_area * 0.8
    # z-ordered files cover tight sub-squares: 8 files over a 2^16
    # curve = 1/8 of the area each, up to Morton seam overlap
    assert sum(z) / len(z) < full_area * 0.3
    # and the data is intact
    back = spark.read.parquet(zpath)
    assert back.count() == 65536
    assert back.agg(F.sum("payload")).collect()[0][0] == 65536 * 65535 // 2


def test_zvalue_matches_audit_sql_form(spark):
    """The operator's zvalue must equal the audit query's SQL twin
    (round3b _zvalue_sql) — one Morton definition everywhere."""
    from event_driven_data_pipeline_for_e_commerce_spark.plans import corpus  # noqa: F401  (full registry first — avoids partial-import)
    from event_driven_data_pipeline_for_e_commerce_spark.plans.round3b_queries import (
        _zvalue_sql,
    )

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    got = df.select(
        zvalue([F.col("x"), F.col("y")], bits=8).alias("z"),
        F.expr(f"CAST({_zvalue_sql('x', 'y')} AS BIGINT)").alias("z_sql"),
    )
    assert got.filter(F.col("z") != F.col("z_sql")).count() == 0


def test_zvalue_three_dims_bijective(spark):
    """3-column interleave is a bijection on the 3x4-bit cube."""
    df = spark.range(0, 4096).select(
        (F.col("id") % 16).alias("a"),
        ((F.col("id") / 16) % 16).cast("long").alias("b"),
        (F.col("id") / 256).cast("long").alias("c"),
    )
    z = df.select(
        zvalue([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("z")
    )
    assert z.distinct().count() == 4096
    assert z.agg(F.max("z")).collect()[0][0] == 4095


def test_zvalue_bit_budget_guard():
    """ADVICE-r9: bits * len(cols) past the 63 usable signed-64 bits
    raises instead of silently overflowing the shift literal."""
    import pytest

    with pytest.raises(ValueError, match="63 usable bits"):
        zvalue([F.col("a"), F.col("b")], bits=32)
    with pytest.raises(ValueError, match="63 usable bits"):
        zvalue([F.col("a"), F.col("b"), F.col("c"), F.col("d")], bits=16)
    # 2 x 31 = 62 bits still fits
    zvalue([F.col("a"), F.col("b")], bits=31)


def test_zvalue_negative_inputs_fold_into_domain(spark):
    """ADVICE-r9: negative inputs pmod-fold into [0, 2**bits) — the
    z-value equals that of the folded non-negative twin, never a
    sign-corrupted code."""
    df = spark.createDataFrame(
        [(-1, 3), (-16, 5), (-255, 0)], "x long, y long"
    )
    got = df.select(
        zvalue([F.col("x"), F.col("y")], bits=4).alias("z"),
        zvalue(
            [F.pmod(F.col("x"), F.lit(16)), F.col("y")], bits=4
        ).alias("z_folded"),
    )
    rows = got.collect()
    assert all(r["z"] == r["z_folded"] for r in rows)
    assert all(0 <= r["z"] < 256 for r in rows)
