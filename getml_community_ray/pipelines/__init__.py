"""End-to-end pipelines: tiered rollup with retention, FastProp window
features, SQL transpilation, driver query registry."""

from .fastprop import FastPropSpec, fastprop_features, time_series_features  # noqa: F401
from .rollup import (  # noqa: F401
    RollupConfig,
    rollup,
    rollup_decomposable,
    rollup_decomposable_clustered_long,
    rollup_decomposable_long,
    rollup_holistic,
    rollup_holistic_clustered_long,
    rollup_holistic_long,
)
from .transpile import fastprop_to_sql  # noqa: F401
from .pipeline import Pipeline  # noqa: F401
