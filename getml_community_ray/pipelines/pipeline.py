"""User-facing Pipeline facade — the reference's primary API shape
(`getml/pipeline/pipeline.py`: Pipeline(data_model, preprocessors,
feature_learners, predictors) with fit/transform/predict/score), composed
from this engine's stages:

    pipe = Pipeline(
        preprocessors=[Seasonal(["ts"])],
        feature_spec=FastPropSpec(...),      # the FastProp feature learner
        predictor=LinearRegression(...),     # fitted on generated features
    )
    pipe.fit(population_ds, peripheral_ds, target_col="y")
    feats = pipe.transform(population_ds, peripheral_ds)
    preds = pipe.predict(population_ds, peripheral_ds)
    pipe.score(population_ds, peripheral_ds, target_col="y")
    sql   = pipe.to_sql("pop", "peri")       # transpiled feature spec

Staging (`transform.cpp:420-461`): preprocessors run on the PERIPHERAL
side before feature generation (they only append columns); the feature
learner is the point-in-time FastProp; the predictor trains on the feature
matrix with NaN/Inf replaced by 0.0 (FastProp.cpp:100).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pyarrow as pa

from .fastprop import FastPropSpec, fastprop_features


class Pipeline:
    def __init__(
        self,
        *,
        feature_spec: FastPropSpec,
        preprocessors: list | None = None,
        predictor=None,
    ):
        self.preprocessors = list(preprocessors or [])
        self.feature_spec = replace(feature_spec, nan_to_zero=True)
        self.predictor = predictor
        self.feature_cols_: list[str] | None = None
        self.scores_: dict | None = None

    # -- internals ---------------------------------------------------------

    def _stage(self, peripheral_ds, fit: bool):
        ds = peripheral_ds
        for p in self.preprocessors:
            if fit:
                p.fit(ds)
            ds = p.transform(ds)
        return ds

    def _features(self, population_ds, peripheral_ds, fit: bool,
                  extra_cols: list[str] | None = None):
        peri = self._stage(peripheral_ds, fit=fit)
        spec = self.feature_spec
        if extra_cols:
            spec = replace(
                spec, id_cols=list(dict.fromkeys(spec.id_cols + extra_cols))
            )
        return fastprop_features(population_ds, peri, spec)

    # -- API ---------------------------------------------------------------

    def _carry_target(self, population_ds, target_col: str):
        """Carry the target through feature generation under an alias when
        its name collides with a peripheral value column (tag_pop would
        otherwise null it out)."""
        spec = self.feature_spec
        if target_col not in spec.value_cols and target_col != spec.key_col:
            return population_ds, target_col
        alias = f"__target_{target_col}"

        def add_alias(b: pa.Table) -> pa.Table:
            return b.append_column(alias, b[target_col])

        return (
            population_ds.map_batches(
                add_alias, batch_format="pyarrow", zero_copy_batch=True
            ),
            alias,
        )

    def fit(self, population_ds, peripheral_ds, *, target_col: str | None = None):
        """Fit preprocessors, generate features and (optionally) fit the
        predictor against `target_col` carried on the population table."""
        if target_col:
            population_ds, target_col = self._carry_target(
                population_ds, target_col
            )
        extra = [target_col] if target_col else []
        feats = self._features(population_ds, peripheral_ds, fit=True,
                               extra_cols=extra)
        spec = self.feature_spec
        self.feature_cols_ = [
            f"{c}__{a}{suffix}"
            for suffix, _, _ in spec.windows()
            for c in spec.value_cols
            for a in spec.aggs
        ]
        if self.predictor is not None:
            if target_col is None:
                raise ValueError("target_col required to fit a predictor")
            self.predictor.feature_cols = self.feature_cols_
            self.predictor.target_col = target_col
            self.predictor.fit(feats)
        return self

    def transform(self, population_ds, peripheral_ds):
        """Feature matrix for new data (fitted preprocessors, same spec)."""
        return self._features(population_ds, peripheral_ds, fit=False)

    def predict(self, population_ds, peripheral_ds, out_col: str = "prediction"):
        if self.predictor is None:
            raise ValueError("no predictor configured")
        feats = self.transform(population_ds, peripheral_ds)
        if self._is_classifier():
            return self.predictor.predict_proba(feats, out_col=out_col)
        return self.predictor.predict(feats, out_col=out_col)

    def _is_classifier(self) -> bool:
        """A predictor is probabilistic iff it exposes predict_proba AND its
        objective (when it has one, e.g. GBM) is logistic."""
        p = self.predictor
        return hasattr(p, "predict_proba") and getattr(
            p, "objective", "logistic"
        ) == "logistic"

    def score(self, population_ds, peripheral_ds, *, target_col: str):
        """Reference pipeline.score: regression metrics of the predictor on
        this data (classification metrics when the predictor is logistic)."""
        from ..stages.predictors import (
            classification_metrics,
            regression_metrics,
        )

        population_ds, target_col = self._carry_target(population_ds, target_col)
        extra = [target_col]
        feats = self._features(population_ds, peripheral_ds, fit=False,
                               extra_cols=extra)
        if self._is_classifier():
            scored = self.predictor.predict_proba(feats, out_col="prediction")
            self.scores_ = classification_metrics(
                scored, target_col=target_col, proba_col="prediction"
            )
        else:
            scored = self.predictor.predict(feats, out_col="prediction")
            self.scores_ = regression_metrics(
                scored, target_col=target_col, pred_col="prediction"
            )
        return self.scores_

    def to_sql(self, population_table: str, peripheral_table: str) -> str:
        """Transpile the feature spec to portable SQL (reference to_sql)."""
        from .transpile import fastprop_to_sql

        return fastprop_to_sql(
            self.feature_spec,
            population_table=population_table,
            peripheral_table=peripheral_table,
        )
