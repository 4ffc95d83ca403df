from .streams import (  # noqa: F401
    dedup_stream,
    read_event_stream,
    scd2_foreach_batch,
    sessionize,
    streaming_funnel_counts,
    windowed_revenue,
)
