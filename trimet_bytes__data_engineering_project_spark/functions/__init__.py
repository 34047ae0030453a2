from .geo import haversine_m  # noqa: F401
from .scalar import (  # noqa: F401
    act_time_timestamp,
    bounding_box,
    day_name,
    is_digits,
    parse_opd_date,
    pg_dow,
    service_key_from_ts,
    service_key_from_weekday,
)
from .windows import (  # noqa: F401
    backfill_clip,
    dedup_first_row,
    odometer_speed,
    running_avg,
    trip_order_window,
)
