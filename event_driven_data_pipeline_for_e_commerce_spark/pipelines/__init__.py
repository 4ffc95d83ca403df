from .medallion import (  # noqa: F401
    bronze_ingest,
    build_dim_date,
    fact_order_items,
    fact_order_lifecycle,
    silver_build,
)
