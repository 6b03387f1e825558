"""Gradient-boosted trees: quality floors (the reference anchors its e2e
tests on metric floors, tests/pipeline/test_interstate94.py:63), exact
partition-invariance, and determinism."""

import numpy as np
import pandas as pd
import pytest

from getml_community_ray.stages.gbm import GradientBoostedTrees
from getml_community_ray.stages.predictors import (
    LinearRegression,
    auc,
    regression_metrics,
)


def _nonlinear_frame(n=8000, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    y = (
        np.sin(X[:, 0] * 2)
        + 0.5 * X[:, 1] ** 2
        + 1.5 * (X[:, 2] > 0)
        + rng.normal(scale=0.1, size=n)
    )
    return pd.DataFrame({"f0": X[:, 0], "f1": X[:, 1], "f2": X[:, 2], "y": y})


@pytest.fixture(scope="module")
def frame():
    return _nonlinear_frame()


def _fit(ds, **kw):
    kw.setdefault("n_estimators", 25)
    kw.setdefault("max_depth", 4)
    kw.setdefault("learning_rate", 0.3)
    return GradientBoostedTrees(["f0", "f1", "f2"], "y", **kw).fit(ds)


def test_gbm_beats_linear_on_nonlinear(ray_session, frame):
    import ray.data as rd

    ds = rd.from_pandas(frame).repartition(8)
    gbm = _fit(ds)
    m = regression_metrics(gbm.predict(ds), target_col="y", pred_col="prediction")
    lin = LinearRegression(["f0", "f1", "f2"], "y").fit(ds)
    ml = regression_metrics(lin.predict(ds), target_col="y", pred_col="prediction")
    assert m["r2"] > 0.9
    assert ml["r2"] < 0.5


def test_gbm_partition_invariant_and_deterministic(ray_session, frame):
    """Given FIXED bin edges, the distributed histograms are exact sums
    accumulated in digest-sorted order — the fitted model must be
    bit-identical across partitionings and across repeat fits. (Edge
    FITTING itself is quantile-of-quantiles and so partitioning-dependent,
    like XGBoost hist mode — covered by the closeness check.)"""
    import ray.data as rd

    small = frame.iloc[:3000]
    ref = _fit(rd.from_pandas(small).repartition(1), n_estimators=10)
    p_ref = ref.predict(rd.from_pandas(small)).to_pandas()["prediction"].to_numpy()

    for parts in (1, 7):
        g = GradientBoostedTrees(
            ["f0", "f1", "f2"], "y", n_estimators=10, max_depth=4,
            learning_rate=0.3,
        )
        g.bin_edges_ = ref.bin_edges_
        g.fit(rd.from_pandas(small).repartition(parts))
        p = g.predict(rd.from_pandas(small)).to_pandas()["prediction"].to_numpy()
        if parts == 1:
            # same partitioning as ref: bit-identical (digest-sorted sums)
            np.testing.assert_array_equal(p_ref, p)
        else:
            # different block layout: same trees, leaf values differ only
            # by float accumulation order
            np.testing.assert_allclose(p_ref, p, rtol=1e-10, atol=1e-12)
            assert [t.feature for t in g.trees_] == [
                t.feature for t in ref.trees_
            ]

    # full fits (edges refit) under different partitionings stay close
    alt = _fit(rd.from_pandas(small).repartition(7), n_estimators=10)
    p_alt = alt.predict(rd.from_pandas(small)).to_pandas()["prediction"].to_numpy()
    corr = np.corrcoef(p_ref, p_alt)[0, 1]
    assert corr > 0.99


def test_gbm_logistic_auc_floor(ray_session, frame):
    import ray.data as rd

    df = frame.copy()
    df["y"] = (df["y"] > df["y"].median()).astype(float)
    ds = rd.from_pandas(df).repartition(8)
    gbm = GradientBoostedTrees(
        ["f0", "f1", "f2"], "y", n_estimators=20, max_depth=3,
        learning_rate=0.3, objective="logistic",
    ).fit(ds)
    scored = gbm.predict_proba(ds)
    assert auc(scored, target_col="y", score_col="proba") > 0.95


def test_gbm_in_pipeline_facade(ray_session):
    """Pipeline(FastProp -> GBM) end-to-end: R^2 floor on a synthetic
    time-series where the target is a NONLINEAR function of the trailing
    window stats (linreg structurally cannot reach the floor)."""
    import ray.data as rd

    from getml_community_ray.pipelines.fastprop import FastPropSpec
    from getml_community_ray.pipelines.pipeline import Pipeline

    rng = np.random.default_rng(7)
    n = 6000
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 86400 * 10, n)), unit="s"
    )
    users = rng.integers(0, 20, n)
    value = rng.normal(10, 3, n)
    df = pd.DataFrame(
        {"event_id": np.arange(n), "user_id": users, "ts": ts, "value": value}
    )
    # target: nonlinear in the trailing-2h mean of value
    df = df.sort_values(["user_id", "ts"])
    tgt = np.empty(len(df))
    for u, g in df.groupby("user_id"):
        v = g["value"].to_numpy()
        t = g["ts"].astype("int64").to_numpy() / 1e9
        for i in range(len(g)):
            w = v[(t >= t[i] - 7200) & (t <= t[i])]
            tgt[df.index.get_indexer(g.index)[i]] = np.sin(w.mean() / 3.0) * 5
    df["target"] = tgt + rng.normal(scale=0.05, size=len(df))
    ds = rd.from_pandas(df.reset_index(drop=True)).repartition(4)

    spec = FastPropSpec(
        key_col="user_id", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["value"], aggs=["count", "avg", "max"],
        id_cols=["event_id"], horizon_s=0.0, memory_s=7200.0,
        num_partitions=4,
    )
    pipe = Pipeline(
        feature_spec=spec,
        predictor=GradientBoostedTrees(
            n_estimators=40, max_depth=4, learning_rate=0.2
        ),
    )
    pipe.fit(ds, ds, target_col="target")
    s = pipe.score(ds, ds, target_col="target")
    assert s["r2"] > 0.9

    lin = Pipeline(feature_spec=spec, predictor=LinearRegression([], ""))
    lin.fit(ds, ds, target_col="target")
    s_lin = lin.score(ds, ds, target_col="target")
    assert s["r2"] > s_lin["r2"]
