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


def test_sqlite_dialect_executes_and_matches(ray_session):
    """The sqlite dialect is EXECUTABLE (stdlib sqlite3): time stamps are
    float epoch seconds — the reference engine's own ts model
    (FloatOpParser.cpp:86-111; getML ships a sqlite3 runner,
    getml/sqlite3/). Same frame, Ray (timestamp[us]) vs sqlite (float s)."""
    import sqlite3

    import ray.data as rd

    rng = np.random.default_rng(5)
    df = _events(rng, n=600)
    spec = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=["count", "sum", "avg", "min", "max"],
        id_cols=["eid"], horizon_s=60.0, memory_s=4 * 3600.0,
        num_partitions=4,
    )
    got = (
        time_series_features(rd.from_pandas(df), spec)
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )

    sql = fastprop_to_sql(
        spec, population_table="events", peripheral_table="events",
        dialect="sqlite",
    )
    con = sqlite3.connect(":memory:")
    ts_sec = df["ts"].astype("int64").to_numpy() / 1e6  # exact (< 2^53 us)
    con.execute("CREATE TABLE events (eid INTEGER, key INTEGER, ts REAL, val REAL)")
    con.executemany(
        "INSERT INTO events VALUES (?,?,?,?)",
        list(zip(df["eid"].tolist(), df["key"].tolist(),
                 ts_sec.tolist(), df["val"].tolist())),
    )
    cur = con.execute(sql)
    names = [c[0] for c in cur.description]
    want = pd.DataFrame(cur.fetchall(), columns=names).sort_values(
        "eid").reset_index(drop=True)

    for c in ["val__count", "val__sum", "val__avg", "val__min", "val__max"]:
        g = got[c].to_numpy(dtype=float)
        w = want[c].to_numpy(dtype=float)
        assert np.allclose(g, w, rtol=1e-9, atol=1e-9, equal_nan=True), c


def test_postgres_dialect_executes_on_duckdb(ray_session):
    """Second executable dialect twin (beyond the default duckdb dialect in
    test_transpiled_sql_matches_ray and the sqlite twin above): the postgres
    dialect's fragment set — FILTER (WHERE ...), INTERVAL 'x' SECOND, quoted
    "identifiers" — is a DuckDB-parseable subset, so the emitted postgres SQL
    can be EXECUTED on duckdb and compared against the Ray pipeline. Guards
    the per-dialect fragment tables in transpile.py with a live run, not just
    string asserts (reference dialect set: getml/pipeline/dialect.py)."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    df = _events(rng, n=700)
    spec = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"],
        aggs=["count", "sum", "avg", "min", "max", "stddev", "median"],
        id_cols=["eid"], horizon_s=60.0, memory_s=4 * 3600.0,
        num_partitions=4,
    )
    got = (
        time_series_features(rd.from_pandas(df), spec)
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )

    sql = fastprop_to_sql(
        spec, population_table="events", peripheral_table="events",
        dialect="postgres",
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


def test_dialect_emission_shapes():
    """Non-executable dialects: spot-check the dialect-specific fragments
    and the capability gates."""
    spec = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=["count", "sum"], id_cols=["eid"],
        horizon_s=0.0, memory_s=0.0, lag_delta_s=3600.0, n_lags=2,
    )
    kw = dict(population_table="pop", peripheral_table="peri")

    pg = fastprop_to_sql(spec, dialect="postgres", **kw)
    assert "INTERVAL '" in pg and 'AS "val__count__lag0"' in pg
    assert "FILTER (WHERE" in pg

    my = fastprop_to_sql(spec, dialect="mysql", **kw)
    assert "INTERVAL 7200.0 SECOND" in my and "`val__count__lag0`" in my
    assert "CASE WHEN" in my and "FILTER" not in my

    bq = fastprop_to_sql(spec, dialect="bigquery", **kw)
    assert "TIMESTAMP_SUB" in bq and "`val__sum__lag1`" in bq

    ms = fastprop_to_sql(spec, dialect="tsql", **kw)
    assert "DATEADD(second, -7200" in ms and "[val__count__lag0]" in ms

    sp = fastprop_to_sql(spec, dialect="spark", **kw)
    assert "INTERVAL 7200.0 SECOND" in sp and "CASE WHEN" in sp

    ew = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=["ewma_1h"], id_cols=["eid"],
        memory_s=3600.0,
    )
    assert "UNIX_TIMESTAMP" in fastprop_to_sql(ew, dialect="mysql", **kw)
    assert "UNIX_MICROS" in fastprop_to_sql(ew, dialect="bigquery", **kw)

    bad = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=["median"], id_cols=["eid"],
        memory_s=3600.0,
    )
    with pytest.raises(ValueError):
        fastprop_to_sql(bad, dialect="mysql", **kw)
    with pytest.raises(ValueError):
        fastprop_to_sql(bad, dialect="sqlite", **kw)

    # reference dialect-name aliases (getml/pipeline/dialect.py:33-43):
    # human_readable_sql renders like sqlite3; spark_sql == spark
    assert fastprop_to_sql(spec, dialect="human_readable_sql", **kw) == \
        fastprop_to_sql(spec, dialect="sqlite3", **kw) == \
        fastprop_to_sql(spec, dialect="sqlite", **kw)
    assert fastprop_to_sql(spec, dialect="spark_sql", **kw) == \
        fastprop_to_sql(spec, dialect="spark", **kw)


def test_upper_bound_transpiles():
    spec = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=["count"], id_cols=["eid"],
        horizon_s=60.0, memory_s=3600.0, upper_ts_col="valid_until",
    )
    sql = fastprop_to_sql(
        spec, population_table="pop", peripheral_table="peri"
    )
    assert "e.valid_until IS NULL OR e.valid_until >" in sql
