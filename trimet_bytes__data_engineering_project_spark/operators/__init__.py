from .ann_index import (  # noqa: F401
    ivf_index_probe,
    kmeans_centroids,
    lsh_index_probe,
    write_ivf_index,
    write_lsh_index,
)
from .asof import asof_join, asof_join_skewed  # noqa: F401
from .sampling import (  # noqa: F401
    domain_mixture,
    pack_sequences,
    stratified_sample,
    train_val_test_split,
)
from .rangejoin import interval_range_join  # noqa: F401
from .skew import salted_agg, salted_join, with_salt  # noqa: F401
from .transform import breadcrumb_table, enrich_breadcrumbs, trip_table  # noqa: F401
from .validate import (  # noqa: F401
    breadcrumb_validators,
    quarantine_split,
    stop_event_validators,
)
