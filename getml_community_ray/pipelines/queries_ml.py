"""Driver-contract queries for the predictor/metric layer, with DuckDB
regr_* / window-rank oracles. Results are single-row tables rounded 6 dp
fixed-point on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.partitioning import auto_partitions


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _r6f(x: float) -> float:
    return float(np.rint(float(x) * 1e6) / 1e6)


def q_linreg_lineitem(sf_dir: str):
    """Simple OLS l_extendedprice ~ l_quantity + fit metrics; one row."""
    from ..stages.predictors import LinearRegression, regression_metrics

    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])
    m = LinearRegression(["l_quantity"], "l_extendedprice").fit(ds)
    pred = m.predict(ds)
    met = regression_metrics(
        pred, target_col="l_extendedprice", pred_col="prediction"
    )
    return pd.DataFrame(
        {
            "slope": [_r6f(m.coef_[0])],
            "intercept": [_r6f(m.intercept_)],
            "r2": [_r6f(met["r2"])],
            "rmse": [_r6f(met["rmse"])],
            "mae": [_r6f(met["mae"])],
        }
    )


SQL_LINREG = """
WITH f AS (
  SELECT regr_slope(l_extendedprice, l_quantity) AS s,
         regr_intercept(l_extendedprice, l_quantity) AS b,
         regr_r2(l_extendedprice, l_quantity) AS r
  FROM lineitem),
e AS (
  SELECT l_extendedprice - (f.s * l_quantity + f.b) AS err
  FROM lineitem, f)
SELECT CAST(round(f.s * 1e6) AS BIGINT) / 1000000.0 AS slope,
       CAST(round(f.b * 1e6) AS BIGINT) / 1000000.0 AS intercept,
       CAST(round(f.r * 1e6) AS BIGINT) / 1000000.0 AS r2,
       CAST(round(sqrt(avg(err * err)) * 1e6) AS BIGINT) / 1000000.0 AS rmse,
       CAST(round(avg(abs(err)) * 1e6) AS BIGINT) / 1000000.0 AS mae
FROM e, f
GROUP BY f.s, f.b, f.r
"""


def q_auc_purchase_value(sf_dir: str):
    """Exact tie-aware ROC AUC of `value` predicting event_type='purchase'
    (distributed sort + streaming rank pass)."""
    import pyarrow.compute as pc

    from ..stages.predictors import auc

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    ds = ds.map_batches(
        lambda b: pa.table(
            {
                "y": pc.cast(pc.equal(b["event_type"], "purchase"), pa.float64()),
                "s": b["value"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pd.DataFrame({"auc": [_r6f(auc(ds, target_col="y", score_col="s"))]})


SQL_AUC = """
WITH d AS (
  SELECT value AS s,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events),
ranked AS (
  SELECT y, AVG(rn) OVER (PARTITION BY s) AS ar
  FROM (SELECT s, y, row_number() OVER (ORDER BY s) AS rn FROM d))
SELECT CAST(round(
         (SUM(ar) FILTER (y = 1.0)
          - COUNT(*) FILTER (y = 1.0) * (COUNT(*) FILTER (y = 1.0) + 1) / 2.0)
         / (COUNT(*) FILTER (y = 1.0) * COUNT(*) FILTER (y = 0.0)) * 1e6)
       AS BIGINT) / 1000000.0 AS auc
FROM ranked
"""


def q_logreg_purchase(sf_dir: str):
    """Scaler -> logistic regression -> accuracy/cross-entropy/AUC. GD is
    deterministic (zero init, fixed lr/iterations), so the oracle UNROLLS
    the 25 iterations into 25 SQL CTE layers (sql_oracles.sql_logreg_purchase)
    — an exact twin up to summation order, absorbed by 6dp rounding."""
    import pyarrow.compute as pc

    from ..stages.predictors import (
        LogisticRegression,
        StandardScaler,
        auc,
        classification_metrics,
    )

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "y": pc.cast(pc.equal(b["event_type"], "purchase"), pa.float64()),
                "value": b["value"],
                "hour": pc.cast(pc.hour(b["ts"]), pa.float64()),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    sc = StandardScaler(["value", "hour"]).fit(ds)
    scaled = sc.transform(ds)
    m = LogisticRegression(["value", "hour"], "y", lr=1.0, n_iter=25).fit(scaled)
    scored = m.predict_proba(sc.transform(ds))
    met = classification_metrics(scored, target_col="y", proba_col="proba")
    a = auc(scored, target_col="y", score_col="proba")
    return pd.DataFrame(
        {
            "coef_value": [_r6f(m.coef_[0])],
            "coef_hour": [_r6f(m.coef_[1])],
            "intercept": [_r6f(m.intercept_)],
            "accuracy": [_r6f(met["accuracy"])],
            "cross_entropy": [_r6f(met["cross_entropy"])],
            "auc": [_r6f(a)],
        }
    )


def _sql_logreg() -> str:
    from .sql_oracles import sql_logreg_purchase

    return sql_logreg_purchase(n_iter=25, lr=1.0)


ML_QUERIES = {
    "linreg_lineitem": q_linreg_lineitem,
    "auc_purchase_value": q_auc_purchase_value,
    "logreg_purchase": q_logreg_purchase,
}

ML_ORACLE_SQL = {
    "linreg_lineitem": SQL_LINREG,
    "auc_purchase_value": SQL_AUC,
    "logreg_purchase": _sql_logreg(),
}


def q_feature_selection_lineitem(sf_dir: str):
    """select_features: rank lineitem numeric columns by R² against
    l_extendedprice, keep top 3 (rounded 6 dp; rank ties broken by name)."""
    from ..stages.predictors import select_features

    feats = ["l_quantity", "l_discount", "l_tax", "l_suppkey"]
    ds = _read(sf_dir, "lineitem", columns=feats + ["l_extendedprice"])
    top = select_features(
        ds, feature_cols=feats, target_col="l_extendedprice", k=3
    )
    return pd.DataFrame(
        {
            "feature": [f for f, _ in top],
            "r2": [_r6f(r) for _, r in top],
            "rank": [float(i + 1) for i in range(len(top))],
        }
    )


SQL_FEATURE_SELECTION = """
WITH scores AS (
  SELECT 'l_quantity' AS feature,
         regr_r2(l_extendedprice, l_quantity) AS r2 FROM lineitem
  UNION ALL
  SELECT 'l_discount', regr_r2(l_extendedprice, l_discount) FROM lineitem
  UNION ALL
  SELECT 'l_tax', regr_r2(l_extendedprice, l_tax) FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', regr_r2(l_extendedprice, l_suppkey) FROM lineitem)
SELECT feature,
       CAST(round(r2 * 1e6) AS BIGINT) / 1000000.0 AS r2,
       CAST(row_number() OVER (ORDER BY r2 DESC, feature ASC) AS DOUBLE)
           AS rank
FROM scores
QUALIFY rank <= 3
"""

ML_QUERIES["feature_selection_lineitem"] = q_feature_selection_lineitem
ML_ORACLE_SQL["feature_selection_lineitem"] = SQL_FEATURE_SELECTION


def q_pipeline_e2e_events(sf_dir: str):
    """Full Pipeline facade through the driver contract: FastProp features
    (trailing 2h count/avg/max per user) -> linear regression predicting
    the event's own value -> per-event predictions + fit R^2. OLS is
    closed-form, so the oracle recomputes the same centered normal
    equations by Cramer's rule (sql_oracles.sql_pipeline_e2e_events);
    facade exactness is also covered by tests/test_pipeline_facade.py."""
    from .fastprop import FastPropSpec
    from .pipeline import Pipeline
    from ..stages.predictors import LinearRegression

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["value"],
        aggs=["count", "avg", "max"],
        id_cols=["event_id"],
        horizon_s=60.0,
        memory_s=2 * 3600.0,
        num_partitions=auto_partitions(),
    )
    pipe = Pipeline(feature_spec=spec, predictor=LinearRegression([], ""))
    pipe.fit(ds, ds, target_col="value")
    scores = pipe.score(ds, ds, target_col="value")
    preds = pipe.predict(ds, ds).to_pandas()
    out = preds[["event_id", "prediction"]].sort_values("event_id")
    out["prediction"] = np.rint(out["prediction"].to_numpy() * 1e6) / 1e6
    out["fit_r2"] = _r6f(scores["r2"])
    return out.reset_index(drop=True)


def _sql_pipeline_e2e() -> str:
    from .sql_oracles import sql_pipeline_e2e_events

    return sql_pipeline_e2e_events(horizon_s=60.0, memory_s=7200.0)


ML_QUERIES["pipeline_e2e_events"] = q_pipeline_e2e_events
ML_ORACLE_SQL["pipeline_e2e_events"] = _sql_pipeline_e2e()


def _autofit_spec():
    from .autofit import AutoFitSpec, SQL_SAFE_AGGS

    return AutoFitSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        numeric_cols=["value"],
        id_cols=["event_id"],
        categorical_cols=["event_type"],
        category_values={"event_type": ["click", "purchase", "view"]},
        same_unit_pairs=[("__ts__", "__ts__"), ("value", "value")],
        aggs=list(SQL_SAFE_AGGS),
        horizon_s=60.0,
        memory_s=7200.0,
        num_features=20,
        sampling_factor=1.0,
        num_partitions=auto_partitions(),
    )


def q_fastprop_autofit_events(sf_dir: str):
    """FastProp fit-time feature search through the driver contract:
    enumerate the candidate grammar (numeric x aggs, category indicators,
    category-equality conditions, same-unit pop-peri differences incl. the
    time-since family, avg_time_between), evaluate EVERY candidate per
    population row in one partitioned kernel pass, score each by simple-OLS
    R² against the target in one streaming pass, return the top 20 as
    (feature, r2, rank). Oracle recomputes every candidate + the R² guard +
    the ranking in SQL (pipelines/autofit.autofit_scores_sql)."""
    from ..stages.predictors import select_features
    from .autofit import autofit_features, enumerate_candidates

    spec = _autofit_spec()
    ds = _read(
        sf_dir, "events",
        columns=["event_id", "ts", "user_id", "value", "event_type"],
    )
    cands = enumerate_candidates(spec, spec.category_values)
    feats = autofit_features(ds, ds, spec, cands, target_col="value")
    scored = select_features(
        feats,
        feature_cols=[c.name for c in cands],
        target_col="value",
        k=len(cands),
    )
    df = pd.DataFrame(scored, columns=["feature", "r2"])
    # rank by ROUNDED r2 (6dp) so rank ties resolve identically to the
    # oracle regardless of last-ulp summation differences
    df["r2"] = np.rint(df["r2"].to_numpy() * 1e6) / 1e6
    df = df.sort_values(["r2", "feature"], ascending=[False, True])
    df["rank"] = np.arange(1, len(df) + 1)
    return df.head(spec.num_features).reset_index(drop=True)


def _sql_autofit() -> str:
    from .autofit import autofit_scores_sql, enumerate_candidates

    spec = _autofit_spec()
    cands = enumerate_candidates(spec, spec.category_values)
    return autofit_scores_sql(
        spec, cands,
        population_table="events",
        peripheral_table="events",
        target_col="value",
        top_k=spec.num_features,
    )


ML_QUERIES["fastprop_autofit_events"] = q_fastprop_autofit_events
ML_ORACLE_SQL["fastprop_autofit_events"] = _sql_autofit()


def q_gbm_lineitem_price(sf_dir: str):
    """Distributed histogram GBDT (the reference's XGBoost-predictor analog,
    stages/gbm.py) regressing l_extendedprice on quantity/discount/tax.
    Tree construction is not SQL-expressible, so the oracle is a PINNED
    GOLDEN (the CRC-pin stance of tokens_passthrough_sequences): the model
    is deterministic end to end — digest-sorted tree-reduced histogram
    merges, fsum base score, arrival-order-independent bin edges — so the
    6dp metrics + model shape are pinned per scale factor (selected by the
    table's row count in SQL). Quality floors / partition invariance are
    covered by tests/test_gbm.py."""
    from ..stages.gbm import GradientBoostedTrees
    from ..stages.predictors import regression_metrics

    feats = ["l_quantity", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", columns=feats + ["l_extendedprice"])
    m = GradientBoostedTrees(
        feats, "l_extendedprice",
        n_estimators=20, max_depth=4, learning_rate=0.3,
    ).fit(ds)
    met = regression_metrics(
        m.predict(ds), target_col="l_extendedprice", pred_col="prediction"
    )
    return pd.DataFrame(
        {
            "r2": [_r6f(met["r2"])],
            "rmse": [_r6f(met["rmse"])],
            "n_trees": [float(len(m.trees_))],
            "n_nodes": [float(sum(len(t.feature) for t in m.trees_))],
        }
    )


ML_QUERIES["gbm_lineitem_price"] = q_gbm_lineitem_price
# Pinned-golden oracle (see q_gbm_lineitem_price docstring): expected
# values recomputed-and-verified across fresh sessions at both driver
# scale factors; row count selects the pin. An unpinned sf yields NULLs
# -> loud hash mismatch, never a silent pass.
SQL_GBM_GOLDEN = """
WITH n AS (SELECT count(*) AS c FROM lineitem)
SELECT
  CASE c WHEN 6000 THEN 0.04702   WHEN 60000 THEN 0.004888     END AS r2,
  CASE c WHEN 6000 THEN 29421.51325 WHEN 60000 THEN 30009.042381 END AS rmse,
  CASE c WHEN 6000 THEN 20.0      WHEN 60000 THEN 20.0         END AS n_trees,
  CASE c WHEN 6000 THEN 610.0     WHEN 60000 THEN 620.0        END AS n_nodes
FROM n
"""
ML_ORACLE_SQL["gbm_lineitem_price"] = SQL_GBM_GOLDEN
