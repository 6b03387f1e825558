"""FastProp point-in-time propositionalization vs a brute-force scalar
oracle (reference match rule: t - horizon - memory < pts <= t - horizon,
Matchmaker.hpp:92-137; lag buckets FastProp.cpp:1255-1290)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from getml_community_ray.kernels import oracle
from getml_community_ray.pipelines.fastprop import (
    FastPropSpec,
    fastprop_features,
    time_series_features,
)

AGGS = [
    "count", "sum", "avg", "min", "max", "median", "stddev", "mode",
    "count_distinct", "first", "last", "trend", "ewma_1h",
    "time_since_last_maximum", "avg_time_between",
]


def _mk_events(rng, n, n_keys, t0=1_700_000_000):
    ts = t0 + np.sort(rng.uniform(0, 3 * 86400, n))
    return pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, n_keys, n).astype(np.int64),
            "ts": (ts * 1e6).astype("int64").astype("datetime64[us]"),
            "val": np.round(rng.normal(50, 20, n), 2),
        }
    )


def _brute(pop, peri, horizon_s, lower_s, upper_s, aggs):
    """lower_s/upper_s: window (t - lower, t - upper] in seconds."""
    rows = {}
    pts_all = peri["ts"].astype("int64").to_numpy() / 1e6  # us -> sec
    pop_t = pop["ts"].astype("int64").to_numpy() / 1e6
    for (_, r), t in zip(pop.iterrows(), pop_t):
        m = (peri["key"].to_numpy() == r["key"]) & (
            pts_all > t - lower_s
        ) & (pts_all <= t - upper_s)
        sub = peri[m].sort_values(["ts", "val"], kind="stable")
        vals = sub["val"].tolist()
        ts = (sub["ts"].astype("int64").to_numpy() / 1e6).tolist()
        rows[int(r["eid"])] = {
            a: oracle.compute(a, vals, ts, t) for a in aggs
        }
    return rows


@pytest.mark.parametrize("seed", [0, 7])
def test_self_join_full_vocab(ray_session, seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    df = _mk_events(rng, 400, 5)
    ds = rd.from_pandas(df)
    spec = FastPropSpec(
        key_col="key",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["val"],
        aggs=AGGS,
        id_cols=["eid"],
        horizon_s=60.0,
        memory_s=6 * 3600.0,
        num_partitions=4,
    )
    out = time_series_features(ds, spec).to_pandas().set_index("eid")
    assert len(out) == len(df)
    exp = _brute(df, df, 60.0, 60.0 + 6 * 3600.0, 60.0, AGGS)
    for eid, want in exp.items():
        got = out.loc[eid]
        for a in AGGS:
            g, w = float(got[f"val__{a}"]), float(want[a])
            if np.isnan(w):
                assert np.isnan(g), (eid, a)
            else:
                assert g == pytest.approx(w, rel=1e-12, abs=1e-9), (eid, a)


def test_two_table_and_lags(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    peri = _mk_events(rng, 500, 4)
    # population: one prediction point per (key, hour-end)
    pop = (
        peri[["key", "ts"]]
        .assign(
            ts=(peri["ts"].dt.floor("h") + pd.Timedelta(hours=1)).astype(
                "datetime64[us]"
            )
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )
    pop["eid"] = np.arange(len(pop), dtype=np.int64)

    spec = FastPropSpec(
        key_col="key",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["val"],
        aggs=["count", "sum", "max"],
        id_cols=["eid"],
        lag_delta_s=3600.0,
        n_lags=3,
        num_partitions=4,
    )
    out = (
        fastprop_features(rd.from_pandas(pop), rd.from_pandas(peri), spec)
        .to_pandas()
        .set_index("eid")
    )
    assert len(out) == len(pop)
    for i in range(3):
        exp = _brute(pop, peri, 0.0, (i + 1) * 3600.0, i * 3600.0, ["count", "sum", "max"])
        for eid, want in exp.items():
            got = out.loc[eid]
            for a in ["count", "sum", "max"]:
                g, w = float(got[f"val__{a}__lag{i}"]), float(want[a])
                if np.isnan(w):
                    assert np.isnan(g), (eid, a, i)
                else:
                    assert g == pytest.approx(w, rel=1e-12, abs=1e-9), (eid, a, i)


def test_nan_to_zero(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(1)
    df = _mk_events(rng, 50, 3)
    spec = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=["avg"], id_cols=["eid"],
        horizon_s=86400.0 * 10, memory_s=60.0,  # empty windows
        nan_to_zero=True, num_partitions=2,
    )
    out = time_series_features(ds=rd.from_pandas(df), spec=spec).to_pandas()
    assert (out["val__avg"] == 0.0).all()


def test_time_bucket_split_matches_unsplit(ray_session):
    """(key, time-range) split with overlap replication is result-invariant,
    including on a pathological hot key (80% of rows on one key)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = _mk_events(rng, 4000, 10)
    df.loc[: int(len(df) * 0.8), "key"] = 1  # hot key

    base = dict(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=["count", "sum", "avg", "median", "last"],
        id_cols=["eid"], horizon_s=30.0, memory_s=3600.0, num_partitions=8,
    )
    ds = rd.from_pandas(df).repartition(4)
    plain = (
        time_series_features(ds, FastPropSpec(**base))
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    split = (
        time_series_features(
            ds, FastPropSpec(**base, time_bucket_s=3700.0)
        )
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        plain.sort_index(axis=1), split.sort_index(axis=1)
    )
    # bucket width below the window must be rejected
    with pytest.raises(ValueError):
        time_series_features(
            ds, FastPropSpec(**base, time_bucket_s=1800.0)
        ).to_pandas()


def test_upper_time_stamp_bound(ray_session):
    """Per-row expiry (Matchmaker.hpp:92-137): match iff upper is NaN or
    upper + horizon > population ts — verified against a brute-force scan."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = _mk_events(rng, 1200, 6)
    life = rng.uniform(0, 7200, len(df))
    life[rng.random(len(df)) < 0.3] = np.nan  # 30% never expire
    up_us = df["ts"].astype("int64").to_numpy() + life * 1e6
    df["valid_until"] = pd.Series(up_us).astype("datetime64[us]")

    spec = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=["count", "sum", "min", "max", "median"],
        id_cols=["eid"], horizon_s=60.0, memory_s=5400.0,
        num_partitions=8, upper_ts_col="valid_until",
    )
    ds = rd.from_pandas(df).repartition(4)
    got = (
        fastprop_features(ds, ds, spec)
        .to_pandas().sort_values("eid").set_index("eid")
    )

    pop_t = df["ts"].astype("int64").to_numpy() / 1e6
    peri_t = pop_t
    up_s = up_us / 1e6  # NaN stays NaN
    key = df["key"].to_numpy()
    val = df["val"].to_numpy()
    for i in rng.choice(len(df), 80, replace=False):
        t = pop_t[i]
        m = (
            (key == key[i])
            & (peri_t > t - 60.0 - 5400.0)
            & (peri_t <= t - 60.0)
            & (np.isnan(up_s) | (up_s + 60.0 > t))
        )
        sub = np.flatnonzero(m)
        order = np.lexsort((val[sub], peri_t[sub]))
        vals = val[sub][order].tolist()
        ts = peri_t[sub][order].tolist()
        eid = int(df["eid"].iloc[i])
        for a in ["count", "sum", "min", "max", "median"]:
            want = oracle.compute(a, vals, ts, t)
            have = got.loc[eid, f"val__{a}"]
            if np.isnan(want):
                assert np.isnan(have), (eid, a, have)
            else:
                assert abs(want - have) < 1e-9, (eid, a, want, have)
