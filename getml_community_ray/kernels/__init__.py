from .aggregations import (  # noqa: F401
    ALL_AGGREGATIONS,
    DECOMPOSABLE,
    EWMA_HALF_LIVES,
    NEEDS_TS,
    grouped_aggregate,
)
