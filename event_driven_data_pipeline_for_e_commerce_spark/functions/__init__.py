from .datetimes import (  # noqa: F401
    date_sk,
    day_diff_trunc,
    fractional_days,
    month_bucket,
    tolerant_to_timestamp,
)
from .strings import row_hash, truncate_ellipsis  # noqa: F401
