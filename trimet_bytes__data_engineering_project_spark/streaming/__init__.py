from .dedup import run_streaming_dedup  # noqa: F401
from .multimodal import (  # noqa: F401
    features_from_store,
    frames_from_store,
    run_streaming_media_features,
)
from .index import (  # noqa: F401
    bootstrap_ivf_quantizer,
    run_streaming_ivf_index,
    run_streaming_knn_serve,
    run_streaming_lsh_index,
)
from .pipeline import (  # noqa: F401
    dedup_within_watermark,
    hourly_rollup,
    parse_kafka_breadcrumbs,
    run_ingest_pipeline,
    stream_static_enrich,
    stream_stream_interval_join,
    streaming_breadcrumbs,
    streaming_breadcrumbs_kafka,
    trip_sessions,
)
from .stateful import segment_trips_batch, segment_trips_stateful  # noqa: F401
