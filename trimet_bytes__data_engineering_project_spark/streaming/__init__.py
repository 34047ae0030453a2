from .dedup import run_streaming_dedup  # noqa: F401
from .pipeline import (  # noqa: F401
    dedup_within_watermark,
    hourly_rollup,
    run_ingest_pipeline,
    streaming_breadcrumbs,
    trip_sessions,
)
from .stateful import segment_trips_batch, segment_trips_stateful  # noqa: F401
