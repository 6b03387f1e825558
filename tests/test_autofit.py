"""FastProp fit-time feature search: candidate grammar, kernel exactness vs
a pandas brute force, selection behavior, and an end-to-end predictive
quality floor (the reference's test_interstate94.py:38-63 pattern)."""

import numpy as np
import pandas as pd
import pytest

from getml_community_ray.pipelines.autofit import (
    AutoFitSpec,
    DEFAULT_AGGS,
    SQL_SAFE_AGGS,
    autofit,
    autofit_features,
    enumerate_candidates,
)


def _toy(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    ts = pd.to_datetime(
        1.7e9 + np.sort(rng.uniform(0, 2 * 86400, n)), unit="s"
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 25, n),
            "ts": ts,
            "value": rng.normal(10, 3, n).round(2),
            "etype": rng.choice(["a", "b", "c"], n),
        }
    )
    return df


def _spec(**kw):
    base = dict(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        numeric_cols=["value"],
        id_cols=["event_id"],
        categorical_cols=["etype"],
        category_values={"etype": ["a", "b"]},
        same_unit_pairs=[("__ts__", "__ts__"), ("value", "value")],
        aggs=["count", "avg", "max", "min", "sum", "trend"],
        horizon_s=60.0,
        memory_s=3600.0,
        num_features=8,
        num_partitions=4,
    )
    base.update(kw)
    return AutoFitSpec(**base)


def test_enumeration_grammar():
    spec = _spec()
    cands = enumerate_candidates(spec, spec.category_values)
    names = {c.name for c in cands}
    assert len(names) == len(cands)  # unique names
    # conditions: none + etype=a + etype=b
    # per condition: numeric(1x6) + same_unit(2x6) + atb(1); indicators
    # (2x6) only when the condition does not fix etype
    assert len(cands) == (6 + 12 + 12 + 1) + 2 * (6 + 12 + 1)
    assert "value__avg" in names
    assert "etype==a__sum" in names
    assert "ts_minus_ts__min" in names
    assert "value__max__where_etype=b" in names
    assert "avg_time_between__where_etype=a" in names
    # full default agg set enumerates too (first/last/mode included)
    full = enumerate_candidates(
        _spec(aggs=list(DEFAULT_AGGS)), spec.category_values
    )
    assert any(c.agg == "mode" for c in full)


def test_kernel_matches_bruteforce(ray_session):
    import ray.data as rd

    df = _toy()
    spec = _spec()
    cands = enumerate_candidates(spec, spec.category_values)
    ds = rd.from_pandas(df)
    feats = (
        autofit_features(ds, ds, spec, cands)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    dfx = df.copy()
    dfx["tsec"] = dfx.ts.astype("int64") / 1e6
    for _, row in dfx.sample(25, random_state=3).iterrows():
        w = dfx[
            (dfx.user_id == row.user_id)
            & (dfx.tsec > row.tsec - 3660.0)
            & (dfx.tsec <= row.tsec - 60.0)
        ]
        f = feats[feats.event_id == row.event_id].iloc[0]
        assert f["value__count"] == len(w)
        wa = w[w.etype == "a"]
        assert abs(
            f["value__sum__where_etype=a"] - (wa.value.sum() if len(wa) else 0.0)
        ) < 1e-9
        assert abs(
            f["etype==b__avg"] - ((w.etype == "b").mean() if len(w) else 0.0)
        ) < 1e-12
        expect = (row.tsec - w.tsec).min() if len(w) else 0.0
        assert abs(f["ts_minus_ts__min"] - expect) < 1e-6
        expect = (row.value - w.value).max() if len(w) else 0.0
        assert abs(f["value_minus_value__max"] - expect) < 1e-9


def test_autofit_selects_signal_features(ray_session):
    """Plant a signal: target = trailing count of the user's events. The
    search must rank value__count (or an equivalent count-family feature)
    first."""
    import ray.data as rd

    df = _toy(seed=5)
    dfx = df.copy()
    dfx["tsec"] = dfx.ts.astype("int64") / 1e6
    tgt = np.empty(len(dfx))
    for i, row in dfx.iterrows():
        w = dfx[
            (dfx.user_id == row.user_id)
            & (dfx.tsec > row.tsec - 3660.0)
            & (dfx.tsec <= row.tsec - 60.0)
        ]
        tgt[i] = len(w)
    df["target"] = tgt + np.random.default_rng(1).normal(0, 0.01, len(df))
    ds = rd.from_pandas(df)
    spec = _spec(aggs=["count", "avg", "max"], num_features=4)
    res = autofit(ds, ds, spec, target_col="target")
    assert res.r2, "no candidates scored"
    best = max(res.r2, key=res.r2.get)
    assert "count" in best, best
    assert res.r2[best] > 0.99
    # transform computes exactly the selected columns
    tf = res.transform(ds, ds).to_pandas()
    for c in res.selected:
        assert c.name in tf.columns
    assert len(tf) == len(df)


def test_autofit_sampling_and_discovery(ray_session):
    """sampling_factor < 1 scores on a subset but transform covers all rows;
    category discovery picks the most frequent values."""
    import ray.data as rd

    df = _toy(seed=7)
    # skew etype so discovery has a clear top-2
    df.loc[: len(df) // 2, "etype"] = "a"
    ds = rd.from_pandas(df)
    spec = _spec(
        category_values=None,
        n_most_frequent=2,
        sampling_factor=0.5,
        num_features=6,
        aggs=["count", "avg"],
    )
    res = autofit(ds, ds, spec, target_col="value")
    assert res.category_values["etype"][0] == "a"
    assert len(res.category_values["etype"]) == 2
    assert len(res.selected) == 6
    tf = res.transform(ds, ds).to_pandas()
    assert len(tf) == len(df)


def test_e2e_quality_floor(ray_session):
    """Reference pattern (tests/pipeline/test_interstate94.py:38-63): the
    automated search + OLS on the selected features must clear an R² floor
    on a signal-bearing dataset."""
    import ray.data as rd

    from getml_community_ray.stages.predictors import (
        LinearRegression,
        regression_metrics,
    )

    rng = np.random.default_rng(11)
    df = _toy(seed=11)
    dfx = df.copy()
    dfx["tsec"] = dfx.ts.astype("int64") / 1e6
    # target = 2 * trailing avg + trailing count + noise
    tgt = np.empty(len(dfx))
    for i, row in dfx.iterrows():
        w = dfx[
            (dfx.user_id == row.user_id)
            & (dfx.tsec > row.tsec - 3660.0)
            & (dfx.tsec <= row.tsec - 60.0)
        ]
        tgt[i] = 2.0 * (w.value.mean() if len(w) else 0.0) + len(w)
    df["target"] = tgt + rng.normal(0, 0.1, len(df))
    ds = rd.from_pandas(df)

    spec = _spec(aggs=list(SQL_SAFE_AGGS), num_features=10)
    res = autofit(ds, ds, spec, target_col="target")
    feats = res.transform(ds, ds, target_col="target")
    model = LinearRegression([c.name for c in res.selected], "target").fit(feats)
    met = regression_metrics(
        model.predict(feats), target_col="target", pred_col="prediction"
    )
    assert met["r2"] > 0.98, met
