from .transform import breadcrumb_table, enrich_breadcrumbs, trip_table  # noqa: F401
from .validate import (  # noqa: F401
    breadcrumb_validators,
    quarantine_split,
    stop_event_validators,
)
