"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: tiered holistic rollup
    of the events stream (full agg vocabulary sample, all tiers)."""
    from getml_community_ray.pipelines.rollup import RollupConfig, rollup_holistic

    import ray.data as rd

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["ts", "event_type", "value"],
    )
    cfg = RollupConfig(
        source_col="event_type",
        ts_col="ts",
        value_col="value",
        tiers={"1m": 60, "1h": 3600, "1d": 86400},
        aggs=[
            "count", "sum", "avg", "min", "max", "median", "q25", "q90",
            "stddev", "var", "mode", "count_distinct", "first", "last",
            "trend", "ewma_1h", "time_since_last_maximum", "avg_time_between",
        ],
        num_partitions=8,
    )
    tiers = rollup_holistic(ds, cfg)
    out = None
    for name, d in tiers.items():
        import pyarrow as pa

        d = d.map_batches(
            lambda b, n=name: b.append_column(
                "tier", pa.array([n] * len(b), type=pa.string())
            ),
            batch_format="pyarrow",
        )
        out = d if out is None else out.union(d)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from getml_community_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from getml_community_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
