"""fastprop_to_sql: the generated DuckDB SQL must reproduce the Ray
pipeline's output (reference to_sql parity, SQLMaker.cpp)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from getml_community_ray.pipelines.fastprop import FastPropSpec, time_series_features
from getml_community_ray.pipelines.transpile import fastprop_to_sql


def _events(rng, n=800, keys=4):
    ts = 1_700_000_000 + np.sort(rng.uniform(0, 2 * 86400, n))
    return pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, keys, n).astype(np.int64),
            "ts": (ts * 1e6).astype("int64").astype("datetime64[us]"),
            "val": np.rint(rng.normal(50, 20, n) * 100),  # integer cents
        }
    )


@pytest.mark.parametrize(
    "aggs,lags",
    [
        (["count", "sum", "avg", "min", "max", "median"], 0),
        (["count", "sum"], 2),
        (["ewma_1h", "trend"], 0),
    ],
)
def test_transpiled_sql_matches_ray(ray_session, aggs, lags):
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = _events(rng)
    spec = FastPropSpec(
        key_col="key",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["val"],
        aggs=aggs,
        id_cols=["eid"],
        horizon_s=0.0 if lags else 60.0,
        memory_s=0.0 if lags else 6 * 3600.0,
        lag_delta_s=3600.0 if lags else 0.0,
        n_lags=lags,
        num_partitions=4,
    )
    got = (
        time_series_features(rd.from_pandas(df), spec)
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )

    sql = fastprop_to_sql(
        spec, population_table="events", peripheral_table="events"
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(sql).df().sort_values("eid").reset_index(drop=True)

    assert len(got) == len(want)
    for c in got.columns:
        g = got[c].to_numpy()
        w = want[c].to_numpy()
        if g.dtype.kind == "f":
            assert np.allclose(g, w, rtol=1e-9, atol=1e-9, equal_nan=True), c
        elif g.dtype.kind == "M":
            assert (g.astype("datetime64[us]") == w.astype("datetime64[us]")).all(), c
        else:
            assert (g == w).all(), c
