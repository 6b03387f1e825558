"""End-to-end Pipeline facade test with a metric floor — the reference's
e2e test style (tests/pipeline/test_interstate94.py asserts R² > 0.981):
a synthetic target that is a linear function of true window features must
be recovered with R² > 0.95 by fit -> predict -> score."""

import numpy as np
import pandas as pd
import pytest

from getml_community_ray.pipelines.fastprop import FastPropSpec
from getml_community_ray.pipelines.pipeline import Pipeline
from getml_community_ray.stages.predictors import LinearRegression


def _data(seed=0, n=3000, keys=6):
    rng = np.random.default_rng(seed)
    ts = 1_700_000_000 + np.sort(rng.uniform(0, 3 * 86400, n))
    peri = pd.DataFrame(
        {
            "key": rng.integers(0, keys, n).astype(np.int64),
            "ts": (ts * 1e6).astype("int64").astype("datetime64[us]"),
            "val": np.rint(rng.normal(50, 20, n)),
        }
    )
    # population: hourly prediction points per key
    pop = (
        peri[["key", "ts"]]
        .assign(ts=(peri["ts"].dt.floor("h") + pd.Timedelta(hours=1)).astype("datetime64[us]"))
        .drop_duplicates()
        .reset_index(drop=True)
    )
    pop["pid"] = np.arange(len(pop), dtype=np.int64)

    # ground-truth target from TRUE window features over (t-6h, t]
    pts = peri["ts"].astype("int64").to_numpy()
    pv = peri["val"].to_numpy()
    pk = peri["key"].to_numpy()
    y = np.empty(len(pop))
    for i, r in pop.iterrows():
        t = int(r["ts"].value // 1000)  # ns -> us
        m = (pk == r["key"]) & (pts > t - 6 * 3600 * 1_000_000) & (pts <= t)
        cnt = m.sum()
        avg = pv[m].mean() if cnt else 0.0
        y[i] = 2.0 * avg + 3.0 * cnt + 5.0
    pop["y"] = y + np.random.default_rng(1).normal(0, 0.5, len(pop))
    return pop, peri


def test_pipeline_fit_predict_score(ray_session):
    import ray.data as rd

    pop, peri = _data()
    spec = FastPropSpec(
        key_col="key",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["val"],
        aggs=["avg", "count"],
        id_cols=["pid"],
        horizon_s=0.0,
        memory_s=6 * 3600.0,
        num_partitions=4,
    )
    pipe = Pipeline(
        feature_spec=spec,
        predictor=LinearRegression([], ""),
    )
    pipe.fit(rd.from_pandas(pop), rd.from_pandas(peri), target_col="y")
    assert pipe.feature_cols_ == ["val__avg", "val__count"]

    scores = pipe.score(rd.from_pandas(pop), rd.from_pandas(peri), target_col="y")
    assert scores["r2"] > 0.95, scores

    preds = pipe.predict(rd.from_pandas(pop), rd.from_pandas(peri)).to_pandas()
    assert len(preds) == len(pop)
    # coefficients recover the generating process (~2x avg + 3x count)
    coef = dict(zip(pipe.predictor.feature_cols, pipe.predictor.coef_))
    assert coef["val__avg"] == pytest.approx(2.0, abs=0.2)
    assert coef["val__count"] == pytest.approx(3.0, abs=0.2)

    sql = pipe.to_sql("pop", "peri")
    assert "val__avg" in sql and "LEFT JOIN peri" in sql
