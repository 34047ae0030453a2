from .pipeline import run_ingest_pipeline, streaming_breadcrumbs  # noqa: F401
