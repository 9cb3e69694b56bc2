"""Declared query inventory (SURVEY.md §2) + DuckDB oracle twins.

Importing this package populates the registry with every implemented
query. ``__spark_entry__.py`` re-exports it as the driver contract.
"""

from .registry import ORACLE, QUERIES  # noqa: F401
from . import reference_queries  # noqa: F401  (registers on import)
from . import extension_queries  # noqa: F401  (registers on import)
from . import pipeline_queries  # noqa: F401  (registers on import)
from . import analytics_queries  # noqa: F401  (registers on import)
from . import advanced_queries  # noqa: F401  (registers on import)
from . import roundfive_queries  # noqa: F401  (registers on import)
from . import roundsix_queries  # noqa: F401  (registers on import)
from . import evaluation_queries  # noqa: F401  (registers on import)
from . import mixture_queries  # noqa: F401  (registers on import)
from . import trainops_queries  # noqa: F401  (registers on import)
from . import drift_queries  # noqa: F401  (registers on import)
from . import clustering_queries  # noqa: F401  (registers on import)
from . import roundseven_queries  # noqa: F401  (registers on import)
from . import roundeight_queries  # noqa: F401  (registers on import)
from . import roundnine_queries  # noqa: F401  (registers on import)
from . import roundten_queries  # noqa: F401  (registers on import)
from . import roundeleven_queries  # noqa: F401  (registers on import)
from . import roundeleven_b_queries  # noqa: F401  (registers on import)
from . import roundeleven_c_queries  # noqa: F401  (registers on import)
from . import roundtwelve_queries  # noqa: F401  (registers on import)
from . import roundthirteen_queries  # noqa: F401  (registers on import)
from . import roundfourteen_queries  # noqa: F401  (registers on import)
