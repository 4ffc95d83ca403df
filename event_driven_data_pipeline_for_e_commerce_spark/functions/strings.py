"""String/hash scalar functions (SURVEY.md §2.H F12-F17)."""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column


def row_hash(cols: Sequence[Column | str]) -> Column:
    """F12: change-detection row hash — ``TO_HEX(MD5(CONCAT(COALESCE(c,'')...)))``
    (Scd_Type2.sql:25-32). Byte-identical to the BigQuery expression for
    string inputs; non-strings are cast to string first."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat(*parts))


def truncate_ellipsis(col: Column | str, n: int = 10) -> Column:
    """F16: display truncation ``str[:n] + '...'`` (app.py:536)."""
    return F.concat(F.substring(col, 1, n), F.lit("..."))
