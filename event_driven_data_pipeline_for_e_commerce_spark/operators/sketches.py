"""Count-Min sketch primitives: a fixed-size, mergeable frequency
summary for keyspaces too large to count exactly (URLs, n-grams,
join keys at 100 TB).

The sketch is a depth x width counter grid held as a DataFrame of
(r, bucket, c) cells — at most depth*width rows regardless of input
size. Partition partials combine map-side, grids merge by cell-wise
addition (the same mergeable-partial contract as
``operators.incremental``), and a point query returns
min over rows of the probed cell, which never underestimates the true
count and overestimates by at most ~e/width of the stream length per
the classic Cormode-Muthukrishnan analysis.

Hashes are md5-derived: ONE digest ``md5('cms:<key>')`` per key, with
hash row r reading hex digit pair (2r+1, 2r+2) of that digest — so a
SQL oracle can recompute the identical sketch arithmetically; see
``plans.round3b_queries.cms_heavy_hitters``.

NULL contract: NULL keys are excluded from the sketch and from point
queries (``cms_cells``/``cms_estimate`` filter them). This matches
the SQL-oracle form ``md5('cms:' || CAST(k AS STRING))``, where a
NULL key propagates to a NULL hash and drops the row — whereas
Spark's ``concat_ws`` would silently skip the NULL and hash the bare
prefix, counting NULL keys into the sketch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_bucket(row_col: Column, key_col: Column, width: int = CMS_WIDTH) -> Column:
    """Bucket in [0, width) for hash row r: hex digits (2r+1, 2r+2) of
    ONE md5('cms:<key>') — plain codegen arithmetic, no UDF, and a
    single digest per key no matter the depth (md5's digit pairs are
    pairwise-independent enough for the CMS bound; one digest per row
    would cost depth x the hash work for no measurable accuracy gain
    at depth 4)."""
    h = F.md5(F.concat_ws(":", F.lit("cms"), key_col))
    pos = row_col * 2 + 1
    return (F.conv(F.substring(h, pos, 2), 16, 10).cast("long") % width).alias(
        "bucket"
    )


def cms_cells(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Map-side projection of each input row to its ``depth`` grid
    cells: (r, bucket) — the md5 is computed ONCE per input row, then
    exploded into depth (r, digit-pair-bucket) cells. No shuffle.
    NULL keys are dropped (module NULL contract).

    The digest is ALIASED in an inner projection before the cell
    array references it ``depth`` times: inlining the md5 into each
    array element re-evaluates it per cell (no CSE across array
    constructors — measured 1.7x slower at sf0.1), while CollapseProject
    keeps an aliased non-cheap expression materialized once."""
    h = F.md5(F.concat_ws(":", F.lit("cms"), F.col(key_col)))
    hashed = df.filter(F.col(key_col).isNotNull()).select(h.alias("__h"))
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (
                    F.conv(F.substring(F.col("__h"), 2 * i + 1, 2), 16, 10)
                    .cast("long")
                    % width
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return hashed.select(F.explode(cells).alias("cell")).select(
        "cell.r", "cell.bucket"
    )


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the (r, bucket, c) sketch for one input frame. The
    groupBy's map-side combine means each partition ships at most
    depth*width partial cells — constant shuffle volume."""
    return (
        cms_cells(df, key_col, depth, width)
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(a: DataFrame | None, b: DataFrame) -> DataFrame:
    """Cell-wise addition of two sketches built with the same config.
    ``a=None`` bootstraps (streaming first batch)."""
    if a is None:
        return b
    return (
        a.unionByName(b).groupBy("r", "bucket").agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: returns
    (<key_col>, cms_est). The sketch side is depth*width rows —
    always broadcast. LEFT join + coalesce-to-0: a probed cell the
    stream never touched has no sketch row, and its count is 0 — an
    inner join would silently drop that row from the MIN, returning
    an inflated estimate (min over only the colliding cells) or no
    output at all for a never-seen key; the correct CMS answer for a
    never-seen key is 0. NULL probe keys are dropped (module NULL
    contract)."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    probes = keys.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("k"), rows
    ).select("k", "r", cms_bucket(F.col("r"), F.col("k"), width))
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
        .select(F.col("k").alias(key_col), "cms_est")
    )
