"""Z-order (Morton-curve) clustered writes — multi-dimensional data
skipping as a LAYOUT operator, not just the audit query.

``zorder_locality_audit`` (plans/round3b_queries.py) proves the
z-value keeps both dimensions' ranges tight per bucket; this module
is the write path that exploits it: interleave the key bits, range-
partition the frame on the z-value, sort within partitions, and write
— so every parquet file's footer carries tight min/max on EVERY
z-ordered column and a filter on ANY of them prunes files/row-groups
at planning time. This is the Spark-native form of Delta/Iceberg's
``OPTIMIZE ZORDER BY`` and the multi-dimensional upgrade of the
reference's single-key ``CLUSTER BY order_id`` (Scd_Type2.sql:91-92).

At 100 TB the shape is: one range exchange on the z-value (sampled
range boundaries — no global sort through one task), map-side sort
within each output task, and footer statistics do the rest at read
time. Nothing here is driver-side except the column expression.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zvalue(cols: Sequence[Column], bits: int = 8) -> Column:
    """Morton (bit-interleaved) code of 2+ integer columns, ``bits``
    bits each: col 0 occupies bit positions 0, k, 2k, ...; col 1
    positions 1, k+1, ...; etc. (k = number of columns). Plain
    shift/mod arithmetic — whole-stage codegen, no UDF. Callers
    bucket their natural keys into the bit budget first (e.g.
    ``pmod(key, 256)`` or a digit/band rollup) — the curve needs a
    bounded domain, not raw keys.

    Contract enforcement (ADVICE-r9): ``bits * len(cols)`` must fit a
    signed 64-bit z-value (> 63 raises ``ValueError`` instead of
    silently overflowing the ``1 << (k*i+j)`` literal), and each
    column is folded into the non-negative ``[0, 2**bits)`` domain
    with ``pmod`` before bit extraction, so negative inputs map to a
    deterministic bucket instead of the wrong z-value that arithmetic
    ``shiftright`` + signed ``%`` produced."""
    k = len(cols)
    if k < 2:
        raise ValueError("zvalue interleaves >= 2 columns")
    if k * bits > 63:
        raise ValueError(
            f"zvalue bit budget {k} cols x {bits} bits = {k * bits} "
            "exceeds the 63 usable bits of a signed 64-bit z-value; "
            "lower bits or pre-bucket into fewer columns"
        )
    terms = []
    for j, c in enumerate(cols):
        c = F.pmod(c.cast("long"), F.lit(1 << bits))
        for i in range(bits):
            terms.append(
                (F.shiftright(c, i) % 2).cast("long")
                * (1 << (k * i + j))
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: Sequence[Column],
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of
    ``zcols``: range-repartition on the z-value (sampled boundaries —
    the exchange never funnels rows through one task), sort within
    each partition, write one file per range. Every file's footer
    then bounds a tight hyper-rectangle in z-space, so predicates on
    ANY z-ordered dimension skip most files — the property
    ``tests/test_zorder.py`` asserts against the footer statistics
    of an unordered write of the same rows."""
    z = zvalue(zcols, bits).alias("__zvalue")
    (
        df.withColumn("__zvalue", z)
        .repartitionByRange(n_files, "__zvalue")
        .sortWithinPartitions("__zvalue")
        .drop("__zvalue")
        .write.mode(mode)
        .parquet(path)
    )
