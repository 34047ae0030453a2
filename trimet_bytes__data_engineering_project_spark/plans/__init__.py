from .registry import ORACLES, QUERIES, query  # noqa: F401
from .tables import epoch_us, load_table  # noqa: F401

# importing the corpus modules populates the registry
from . import core  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
