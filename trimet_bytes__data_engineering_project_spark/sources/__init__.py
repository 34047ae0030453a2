from .readers import (  # noqa: F401
    load_driver_tables,
    read_breadcrumb_json,
    read_stop_event_html,
    read_vehicle_ids,
)
