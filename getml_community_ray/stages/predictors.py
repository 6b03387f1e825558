"""Predictors + metrics: the reference's predictor layer re-expressed as
distributed partial-moment passes over a Dataset.

Reference surface (cites into /root/reference):
- StandardScaler: `src/engine/include/predictors/StandardScaler.hpp`
- LinearRegression (own normal-equation/GD impl):
  `src/engine/include/predictors/LinearRegression.hpp`
- LogisticRegression (own gradient descent):
  `src/engine/include/predictors/LogisticRegression.hpp`
- metrics accuracy/AUC/cross-entropy/MAE/RMSE/R2:
  `src/engine/include/metrics/{Accuracy,AUC,CrossEntropy,MAE,RMSE,RSquared}.hpp`,
  `src/engine/src/engine/score.cpp`

Ray-Data-first design:
- every fit is one or two streaming aggregate passes: `map_batches` emits
  per-batch partial sums (means, centered cross-moments d x d, gradients),
  `Dataset.sum()` merges them; only O(d^2) scalars ever reach the driver.
- predict/transform broadcast the tiny coefficient state into a stateless
  `map_batches` closure.
- LinearRegression uses TWO passes (means first, then centered normal
  equations) — numerically equivalent to single-pass covariance updates
  (what DuckDB's regr_* uses), so results agree to ~1e-12 instead of the
  ~1e-6 of raw-moment normal equations.
- AUC is exact with average-rank tie handling: distributed `ds.sort(score)`
  then ONE streaming pass over ordered batches carrying (offset, open tie
  group) across block boundaries — O(1) driver memory.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa


def _sum_table(ds, build, schema_cols):
    """map_batches -> one partial row per batch -> Dataset.sum merge.

    Returns dict col -> float. `build(batch) -> dict[str, float]`.
    """

    def partial(b: pa.Table) -> pa.Table:
        d = build(b)
        return pa.table({k: pa.array([float(v)]) for k, v in d.items()})

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = agg.sum(schema_cols)
    if isinstance(out, dict):
        return {c: out[f"sum({c})"] for c in schema_cols}
    return {schema_cols[0]: out}


@dataclass
class ScalerState:
    cols: list[str]
    mean: np.ndarray
    std: np.ndarray


class StandardScaler:
    """fit: one pass (sum, sumsq, n) per column; transform: (x - mean)/std.
    std is the population standard deviation; zero-variance columns pass
    through unscaled (std -> 1), matching the reference's guard."""

    def __init__(self, cols: list[str]):
        self.cols = list(cols)
        self.state: ScalerState | None = None

    def fit(self, ds):
        cols = self.cols

        def build(b: pa.Table) -> dict[str, float]:
            out = {"n": float(len(b))}
            for c in cols:
                x = np.asarray(b[c], dtype=np.float64)
                out[f"s_{c}"] = float(x.sum())
                out[f"q_{c}"] = float((x * x).sum())
            return out

        names = ["n"] + [f"s_{c}" for c in cols] + [f"q_{c}" for c in cols]
        s = _sum_table(ds, build, names)
        n = s["n"]
        mean = np.array([s[f"s_{c}"] / n for c in cols])
        var = np.array(
            [s[f"q_{c}"] / n - (s[f"s_{c}"] / n) ** 2 for c in cols]
        )
        std = np.sqrt(np.maximum(var, 0.0))
        std[std == 0.0] = 1.0
        self.state = ScalerState(cols, mean, std)
        return self

    def transform(self, ds):
        st = self.state
        assert st is not None, "fit first"

        def f(b: pa.Table) -> pa.Table:
            for i, c in enumerate(st.cols):
                x = np.asarray(b[c], dtype=np.float64)
                z = (x - st.mean[i]) / st.std[i]
                b = b.set_column(b.column_names.index(c), c, pa.array(z))
            return b

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class LinearRegression:
    """OLS via two-pass centered normal equations.

    Pass 1: column means. Pass 2: centered Gram matrix X'X and X'y
    (flattened into O(d^2) partial-sum columns). Solve on the driver.
    """

    def __init__(self, feature_cols: list[str], target_col: str):
        self.feature_cols = list(feature_cols)
        self.target_col = target_col
        self.coef_: np.ndarray | None = None
        self.intercept_: float | None = None

    def fit(self, ds):
        fc, tc = self.feature_cols, self.target_col
        d = len(fc)

        def means_build(b: pa.Table) -> dict[str, float]:
            out = {"n": float(len(b))}
            for c in fc + [tc]:
                out[f"s_{c}"] = float(np.asarray(b[c], dtype=np.float64).sum())
            return out

        names = ["n"] + [f"s_{c}" for c in fc + [tc]]
        s = _sum_table(ds, means_build, names)
        n = s["n"]
        mx = np.array([s[f"s_{c}"] / n for c in fc])
        my = s[f"s_{tc}"] / n

        def gram_build(b: pa.Table) -> dict[str, float]:
            X = np.stack(
                [np.asarray(b[c], dtype=np.float64) - mx[i] for i, c in enumerate(fc)],
                axis=1,
            )
            y = np.asarray(b[tc], dtype=np.float64) - my
            G = X.T @ X
            g = X.T @ y
            out = {}
            for i in range(d):
                for j in range(i, d):
                    out[f"g_{i}_{j}"] = float(G[i, j])
                out[f"b_{i}"] = float(g[i])
            return out

        names2 = [f"g_{i}_{j}" for i in range(d) for j in range(i, d)] + [
            f"b_{i}" for i in range(d)
        ]
        s2 = _sum_table(ds, gram_build, names2)
        G = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                G[i, j] = G[j, i] = s2[f"g_{i}_{j}"]
        g = np.array([s2[f"b_{i}"] for i in range(d)])
        if d == 0:
            coef = np.array([])
        else:
            # Minimum-norm solve with a relative eigenvalue cutoff, always.
            # A near-singular Gram matrix (collinear features — common after
            # an automated feature search selects e.g. count and
            # count_distinct together) makes np.linalg.solve amplify
            # last-ulp differences from distributed summation order into
            # visibly different coefficients between runs; truncating
            # eigenvalues below 1e-10 * max is deterministic and stable.
            w, V = np.linalg.eigh(G)
            cut = float(w[-1]) * 1e-10
            keep = w > cut
            inv_w = np.where(keep, 1.0 / np.where(keep, w, 1.0), 0.0)
            coef = V @ (inv_w * (V.T @ g))
        self.coef_ = coef
        self.intercept_ = float(my - mx @ coef)
        self._n = n
        return self

    def predict(self, ds, out_col: str = "prediction"):
        fc = self.feature_cols
        coef, b0 = self.coef_, self.intercept_
        assert coef is not None

        def f(b: pa.Table) -> pa.Table:
            yhat = np.full(len(b), b0, dtype=np.float64)
            for i, c in enumerate(fc):
                yhat += coef[i] * np.asarray(b[c], dtype=np.float64)
            return b.append_column(out_col, pa.array(yhat))

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class LogisticRegression:
    """Binary logistic regression by full-batch gradient descent: each
    iteration is ONE streaming pass emitting partial gradients (the
    reference also hand-rolls GD, LogisticRegression.hpp). Deterministic:
    zero init, fixed learning rate / iteration count."""

    def __init__(
        self,
        feature_cols: list[str],
        target_col: str,
        lr: float = 0.5,
        n_iter: int = 50,
    ):
        self.feature_cols = list(feature_cols)
        self.target_col = target_col
        self.lr = lr
        self.n_iter = n_iter
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0

    def fit(self, ds):
        fc, tc = self.feature_cols, self.target_col
        d = len(fc)
        w = np.zeros(d)
        b0 = 0.0
        # materialize the PROJECTED training frame once: n_iter streaming
        # passes re-reading the full source would multiply the I/O by
        # n_iter; the projection is only the d+1 training columns and the
        # object store spills it if it exceeds memory.
        ds = ds.select_columns(fc + [tc]).materialize()
        for _ in range(self.n_iter):
            w_c, b_c = w.copy(), b0

            def build(batch: pa.Table) -> dict[str, float]:
                X = np.stack(
                    [np.asarray(batch[c], dtype=np.float64) for c in fc], axis=1
                )
                y = np.asarray(batch[tc], dtype=np.float64)
                z = X @ w_c + b_c
                p = 1.0 / (1.0 + np.exp(-z))
                r = p - y
                out = {"n": float(len(batch)), "gb": float(r.sum())}
                g = X.T @ r
                for i in range(d):
                    out[f"g_{i}"] = float(g[i])
                return out

            names = ["n", "gb"] + [f"g_{i}" for i in range(d)]
            s = _sum_table(ds, build, names)
            n = s["n"]
            w = w - self.lr * np.array([s[f"g_{i}"] for i in range(d)]) / n
            b0 = b0 - self.lr * s["gb"] / n
        self.coef_, self.intercept_ = w, b0
        return self

    def predict_proba(self, ds, out_col: str = "proba"):
        fc = self.feature_cols
        w, b0 = self.coef_, self.intercept_

        def f(b: pa.Table) -> pa.Table:
            X = np.stack([np.asarray(b[c], dtype=np.float64) for c in fc], axis=1)
            p = 1.0 / (1.0 + np.exp(-(X @ w + b0)))
            return b.append_column(out_col, pa.array(p))

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# metrics (score.cpp / metrics/*.hpp) — each ONE streaming partial-sum pass
# ---------------------------------------------------------------------------


def regression_metrics(ds, *, target_col: str, pred_col: str) -> dict[str, float]:
    """RMSE, MAE, R2 in a single pass (R2 uses sum/sumsq of y)."""

    def build(b: pa.Table) -> dict[str, float]:
        y = np.asarray(b[target_col], dtype=np.float64)
        p = np.asarray(b[pred_col], dtype=np.float64)
        e = y - p
        return {
            "n": float(len(b)),
            "se": float((e * e).sum()),
            "ae": float(np.abs(e).sum()),
            "sy": float(y.sum()),
            "qy": float((y * y).sum()),
        }

    s = _sum_table(ds, build, ["n", "se", "ae", "sy", "qy"])
    n = s["n"]
    ss_tot = s["qy"] - s["sy"] ** 2 / n
    return {
        "rmse": float(np.sqrt(s["se"] / n)),
        "mae": s["ae"] / n,
        "r2": 1.0 - s["se"] / ss_tot if ss_tot > 0 else float("nan"),
        "n": n,
    }


def classification_metrics(
    ds, *, target_col: str, proba_col: str, threshold: float = 0.5
) -> dict[str, float]:
    """Accuracy + cross-entropy in one pass (probabilities clipped to
    [1e-15, 1-1e-15] like the reference's CrossEntropy guard)."""

    def build(b: pa.Table) -> dict[str, float]:
        y = np.asarray(b[target_col], dtype=np.float64)
        p = np.clip(np.asarray(b[proba_col], dtype=np.float64), 1e-15, 1 - 1e-15)
        acc = float(((p >= threshold) == (y > 0.5)).sum())
        xent = float(-(y * np.log(p) + (1 - y) * np.log1p(-p)).sum())
        return {"n": float(len(b)), "acc": acc, "xent": xent}

    s = _sum_table(ds, build, ["n", "acc", "xent"])
    return {
        "accuracy": s["acc"] / s["n"],
        "cross_entropy": s["xent"] / s["n"],
        "n": s["n"],
    }


def auc(ds, *, target_col: str, score_col: str) -> float:
    """Exact ROC AUC with average-rank ties: Mann-Whitney U statistic.

    AUC = (sum of positive ranks - npos(npos+1)/2) / (npos * nneg), ranks
    1-based over ascending score, ties get the average rank. Distributed
    sort orders the data; one streaming driver pass accumulates rank sums,
    carrying the open tie group across block boundaries.
    """
    sorted_ds = ds.select_columns([score_col, target_col]).sort(score_col)
    offset = 0
    rank_pos = 0.0
    npos = 0.0
    nneg = 0.0
    # open tie group state: (score, count, positives)
    tie_score, tie_n, tie_pos = None, 0, 0.0
    for b in sorted_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        sc = np.asarray(b[score_col], dtype=np.float64)
        y = np.asarray(b[target_col], dtype=np.float64)
        n = len(sc)
        if n == 0:
            continue
        # close carried tie group if first score differs
        if tie_score is not None and sc[0] != tie_score:
            avg_rank = offset + (tie_n + 1) / 2.0
            rank_pos += tie_pos * avg_rank
            offset += tie_n
            tie_score, tie_n, tie_pos = None, 0, 0.0
        # run-length encode equal scores within the batch
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = sc[1:] != sc[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for s0, s1 in zip(starts, ends):
            cnt = int(s1 - s0)
            pos = float(y[s0:s1].sum())
            if s1 == n:  # last run may continue into the next batch
                if tie_score is not None and sc[s0] == tie_score:
                    tie_n += cnt
                    tie_pos += pos
                else:
                    tie_score, tie_n, tie_pos = float(sc[s0]), cnt, pos
            else:
                if tie_score is not None and sc[s0] == tie_score:
                    cnt += tie_n
                    pos += tie_pos
                    tie_score, tie_n, tie_pos = None, 0, 0.0
                avg_rank = offset + (cnt + 1) / 2.0
                rank_pos += pos * avg_rank
                offset += cnt
        npos += float(y.sum())
        nneg += float((1.0 - y).sum())
    if tie_score is not None:
        avg_rank = offset + (tie_n + 1) / 2.0
        rank_pos += tie_pos * avg_rank
    if npos == 0 or nneg == 0:
        return float("nan")
    return (rank_pos - npos * (npos + 1) / 2.0) / (npos * nneg)


class XGBoostPredictor:
    """Reference XGBoost wrapper analog
    (`src/engine/include/predictors/XGBoostPredictor.hpp`). xgboost is not
    in this environment — the class import-guards it and raises with a
    clear message; the fit/predict surface mirrors LinearRegression so the
    integration point is plumbed and testable."""

    def __init__(self, feature_cols: list[str], target_col: str, **params):
        try:
            import xgboost  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "XGBoostPredictor requires the 'xgboost' package, which is "
                "not available in this environment; use LinearRegression / "
                "LogisticRegression, or install xgboost"
            ) from e
        self.feature_cols = list(feature_cols)
        self.target_col = target_col
        self.params = params

    def fit(self, ds):  # pragma: no cover - unreachable without xgboost
        raise NotImplementedError

    def predict(self, ds):  # pragma: no cover
        raise NotImplementedError


def select_features(ds, *, feature_cols: list[str], target_col: str, k: int):
    """Top-k features by R² against the target (FastProp feature selection,
    `FastProp.cpp:1479-1509` select_features; R² math `RSquared.cpp:17-110`).

    For a single feature, OLS R² = corr(x, y)² — computed for ALL features
    in one streaming partial-moment pass (sums, squares, cross products).
    Deterministic tie-break: r2 desc, then feature name asc. Returns a list
    of (feature, r2) of length <= k.
    """
    fc = list(feature_cols)

    def build(b: pa.Table) -> dict[str, float]:
        y = np.asarray(b[target_col], dtype=np.float64)
        out = {
            "n": float(len(b)),
            "sy": float(y.sum()),
            "qy": float((y * y).sum()),
        }
        for c in fc:
            x = np.asarray(b[c], dtype=np.float64)
            out[f"s_{c}"] = float(x.sum())
            out[f"q_{c}"] = float((x * x).sum())
            out[f"p_{c}"] = float((x * y).sum())
        return out

    names = ["n", "sy", "qy"] + [
        f"{p}_{c}" for c in fc for p in ("s", "q", "p")
    ]
    s = _sum_table(ds, build, names)
    n = s["n"]
    var_y = s["qy"] - s["sy"] ** 2 / n
    scored = []
    for c in fc:
        var_x = s[f"q_{c}"] - s[f"s_{c}"] ** 2 / n
        cov = s[f"p_{c}"] - s[f"s_{c}"] * s["sy"] / n
        r2 = (cov * cov) / (var_x * var_y) if var_x > 0 and var_y > 0 else 0.0
        scored.append((c, float(r2)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]
