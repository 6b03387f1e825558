"""Predictors + metrics: distributed partial-moment fits vs numpy oracles
computed on the same data (reference predictor layer,
`src/engine/include/predictors/*.hpp`, `src/engine/src/engine/score.cpp`)."""

import numpy as np
import pandas as pd
import pytest

from getml_community_ray.stages.predictors import (
    LinearRegression,
    LogisticRegression,
    StandardScaler,
    auc,
    classification_metrics,
    regression_metrics,
)


def _frame(rng, n=2000):
    x1 = rng.normal(0, 2, n)
    x2 = rng.uniform(-1, 3, n)
    y = 3.0 * x1 - 1.5 * x2 + 0.7 + rng.normal(0, 0.5, n)
    return pd.DataFrame({"x1": x1, "x2": x2, "y": y})


def test_linear_regression_matches_lstsq(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    df = _frame(rng)
    m = LinearRegression(["x1", "x2"], "y").fit(rd.from_pandas(df, override_num_blocks=7))
    A = np.column_stack([df.x1, df.x2, np.ones(len(df))])
    ref, *_ = np.linalg.lstsq(A, df.y.to_numpy(), rcond=None)
    assert m.coef_[0] == pytest.approx(ref[0], rel=1e-9)
    assert m.coef_[1] == pytest.approx(ref[1], rel=1e-9)
    assert m.intercept_ == pytest.approx(ref[2], rel=1e-9)

    pred = m.predict(rd.from_pandas(df, override_num_blocks=5)).to_pandas()
    met = regression_metrics(
        rd.from_pandas(pred, override_num_blocks=5),
        target_col="y",
        pred_col="prediction",
    )
    e = pred.y - pred.prediction
    assert met["rmse"] == pytest.approx(float(np.sqrt((e**2).mean())), rel=1e-12)
    assert met["mae"] == pytest.approx(float(e.abs().mean()), rel=1e-12)
    ss_tot = float(((pred.y - pred.y.mean()) ** 2).sum())
    assert met["r2"] == pytest.approx(1.0 - float((e**2).sum()) / ss_tot, rel=1e-9)


def test_standard_scaler(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(1)
    df = _frame(rng, 500)
    sc = StandardScaler(["x1", "x2"]).fit(rd.from_pandas(df, override_num_blocks=3))
    out = sc.transform(rd.from_pandas(df, override_num_blocks=3)).to_pandas()
    for c in ("x1", "x2"):
        assert out[c].mean() == pytest.approx(0.0, abs=1e-12)
        assert out[c].std(ddof=0) == pytest.approx(1.0, rel=1e-12)


def test_logistic_regression_separable(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    n = 1500
    x = rng.normal(0, 1, n)
    y = (x + rng.normal(0, 0.3, n) > 0).astype(np.float64)
    df = pd.DataFrame({"x": x, "y": y})
    m = LogisticRegression(["x"], "y", lr=1.0, n_iter=40).fit(
        rd.from_pandas(df, override_num_blocks=4)
    )
    scored = m.predict_proba(rd.from_pandas(df, override_num_blocks=4)).to_pandas()
    met = classification_metrics(
        rd.from_pandas(scored), target_col="y", proba_col="proba"
    )
    assert met["accuracy"] > 0.9
    assert m.coef_[0] > 1.0  # learned the right direction, deterministically
    m2 = LogisticRegression(["x"], "y", lr=1.0, n_iter=40).fit(
        rd.from_pandas(df, override_num_blocks=9)
    )
    assert m2.coef_[0] == pytest.approx(m.coef_[0], rel=1e-12)  # partition-invariant


def test_auc_exact_with_ties(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 3000
    score = np.round(rng.uniform(0, 1, n), 2)  # heavy ties
    y = (rng.uniform(0, 1, n) < score).astype(np.float64)
    df = pd.DataFrame({"s": score, "y": y})

    got = auc(rd.from_pandas(df, override_num_blocks=6), target_col="y", score_col="s")

    # oracle: average-rank Mann-Whitney
    order = np.argsort(score, kind="stable")
    s_sorted, y_sorted = score[order], y[order]
    ranks = np.empty(n)
    i = 0
    while i < n:
        j = i
        while j < n and s_sorted[j] == s_sorted[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0
        i = j
    npos, nneg = y.sum(), n - y.sum()
    want = (ranks[y_sorted == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert got == pytest.approx(want, rel=1e-12)
