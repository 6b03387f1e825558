"""Exact, vectorized per-group aggregation kernels.

Reproduces the aggregation vocabulary and edge-case semantics of the reference
engine (getml-community, `src/engine/include/helpers/Aggregations.hpp` and
`src/engine/include/fastprop/algorithm/Aggregator.hpp`) as numpy kernels that
compute EVERY group of a sorted batch at once — no Python loop over groups.

Semantics pinned to the reference (file:line cites into /root/reference):

- nulls: non-finite inputs (NaN/Inf) are filtered before aggregation
  (Aggregator.hpp:449-456 `is_not_nan_or_inf`); `count` counts the remaining
  entries (Aggregations.hpp:65-74).
- sum -> 0.0 on empty (Aggregations.hpp:508-517); avg -> NaN on empty (:51-61).
- var is the POPULATION variance (/n), NaN on empty (:675-693); stddev = sqrt
  (:502-504).
- skew / kurtosis: mean of ((x-mu)/sigma)^{3,4}; 0.0 when all values are equal
  (:473-498, :302-327 `all_same` guard). kurtosis is NOT excess kurtosis.
- variation_coefficient = var / mean (not sigma/mu); NaN when mean is 0 or
  null (:697-707).
- median: sort, mean of the two middles for even n (:360-374).
- quantile(q): sort; ix = floor((n-1)q); linear interpolation
  v[ix]*(1-share) + v[ix+1]*share (:444-469).
- mode: most frequent; ties -> SMALLEST value (std::map value order +
  max_element keeping the first maximum, :388-402, :714-733).
- num_max / num_min: count of entries equal to max / min; 0.0 on empty
  (:406-440).
- count_distinct (:142-161), count_distinct_over_count -> NaN on empty
  (:164-174), count minus count distinct (Aggregator.hpp:300-302).
- first / last: value at min / max timestamp; ties -> first element in
  iteration order (min_element/max_element with strict '<', :283-298,
  :333-347). Iteration order here is (ts ascending, stable input order).
- ewma(h): sum(w*v)/sum(w), w = exp(ln0.5 * dt / h), dt = t_out - t_in;
  NaN when sum(w) == 0 (:175-205); half-life constants 1s..365d.
- ewma_trend(h): weighted OLS of v on dt; returns intercept mean_y -
  beta*mean_x; mean_y when xx == 0; NaN when sum(w) == 0 (:208-278).
- trend: unweighted OLS over (dt, v); intercept; mean_y when xx == 0
  (:619-671).
- time_since_{first,last}_{maximum,minimum}: dt of the extreme; tie-breaks
  among equal values: FIRST-MAX -> larger dt (earliest), LAST-MAX -> smaller
  dt (latest), FIRST-MIN -> larger dt, LAST-MIN -> smaller dt (:519-615).
- avg_time_between: (max-min)/(count-1) over timestamps; 0.0 when count <= 1
  (Aggregator.hpp:428-446).
- count_above_mean / count_below_mean: strict comparisons vs mean; 0.0 when
  all values are equal (Aggregations.hpp:76-113).

Input contract for `grouped_aggregate`:
    rows are pre-sorted by (group_id, ts) with a STABLE sort; group ids are
    dense ints in [0, n_groups). `t_out[g]` is the per-group output timestamp
    (window / bucket end) used for dt = t_out - ts.
"""

from __future__ import annotations

import numpy as np

LOG05 = float(np.log(0.5))

# Half-life constants in seconds (reference Aggregator.hpp:168-175; timestamps
# are float seconds since epoch throughout the reference engine).
EWMA_HALF_LIVES: dict[str, float] = {
    "1s": 1.0,
    "1m": 60.0,
    "1h": 3600.0,
    "1d": 86400.0,
    "7d": 7.0 * 86400.0,
    "30d": 30.0 * 86400.0,
    "90d": 90.0 * 86400.0,
    "365d": 365.0 * 86400.0,
}

QUANTILES: dict[str, float] = {
    "q1": 0.01,
    "q5": 0.05,
    "q10": 0.10,
    "q25": 0.25,
    "q75": 0.75,
    "q90": 0.90,
    "q95": 0.95,
    "q99": 0.99,
}

_BASIC = [
    "count",
    "sum",
    "avg",
    "min",
    "max",
    "median",
    "stddev",
    "var",
    "skew",
    "kurtosis",
    "mode",
    "num_max",
    "num_min",
    "count_distinct",
    "count_distinct_over_count",
    "count_minus_count_distinct",
    "variation_coefficient",
    "count_above_mean",
    "count_below_mean",
]
_TS_BASED = [
    "first",
    "last",
    "trend",
    "avg_time_between",
    "time_since_first_maximum",
    "time_since_first_minimum",
    "time_since_last_maximum",
    "time_since_last_minimum",
]

ALL_AGGREGATIONS: list[str] = (
    _BASIC
    + list(QUANTILES)
    + _TS_BASED
    + [f"ewma_{k}" for k in EWMA_HALF_LIVES]
    + [f"ewma_trend_{k}" for k in EWMA_HALF_LIVES]
)

# Aggregations whose per-bucket result can be reconstructed exactly from
# mergeable partial states (count/sum/min/max/argmin-ts/argmax-ts) — these
# cascade across retention tiers (1m -> 1h -> 1d) without touching raw rows.
DECOMPOSABLE = frozenset(
    ["count", "sum", "min", "max", "first", "last", "avg"]
)

# Aggregations that need the ts column (and t_out for the dt-based family).
NEEDS_TS = frozenset(
    _TS_BASED
    + [f"ewma_{k}" for k in EWMA_HALF_LIVES]
    + [f"ewma_trend_{k}" for k in EWMA_HALF_LIVES]
)


def _segments(gids: np.ndarray, n_groups: int):
    """counts + start offsets per group for rows sorted by group id."""
    counts = np.bincount(gids, minlength=n_groups).astype(np.int64)
    starts = np.zeros(n_groups, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return counts, starts


def _seg_reduce(ufunc, arr: np.ndarray, starts: np.ndarray, counts: np.ndarray, empty):
    """ufunc.reduceat over segments, with empty segments set to `empty`.

    reduceat runs over the starts of NON-empty segments only: those are
    strictly increasing and < len(arr), so each reduce spans exactly one
    segment (clamping empty-segment starts instead would truncate a
    preceding segment that ends at the array end)."""
    out = np.full(len(starts), empty, dtype=np.float64)
    nonempty = counts > 0
    if len(arr) and nonempty.any():
        out[nonempty] = ufunc.reduceat(arr, starts[nonempty])
    return out


def _first_last_occurrence(mask: np.ndarray, gids: np.ndarray, n_groups: int):
    """For rows sorted by group: index of the first and last True per group.

    Returns (first_idx, last_idx, has_any) arrays of length n_groups; indices
    are only valid where has_any.
    """
    idx = np.flatnonzero(mask)
    first = np.zeros(n_groups, dtype=np.int64)
    last = np.zeros(n_groups, dtype=np.int64)
    has = np.zeros(n_groups, dtype=bool)
    if len(idx):
        g = gids[idx]  # ascending because gids are sorted
        ug, first_pos = np.unique(g, return_index=True)
        last_pos = np.searchsorted(g, ug, side="right") - 1
        first[ug] = idx[first_pos]
        last[ug] = idx[last_pos]
        has[ug] = True
    return first, last, has


def grouped_aggregate(
    aggs: list[str],
    gids: np.ndarray,
    values: np.ndarray,
    n_groups: int,
    ts: np.ndarray | None = None,
    t_out: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Compute `aggs` for every group at once.

    gids:    int array, SORTED ascending (stable w.r.t. ts within group).
    values:  float64 values aligned with gids (NaN/Inf treated as null).
    ts:      float64 seconds, aligned; required for NEEDS_TS aggs. Rows must
             be sorted by (gid, ts) stable.
    t_out:   float64 per-group output timestamp, length n_groups.
    Returns {agg_name: float64 array of length n_groups}.
    """
    gids = np.asarray(gids, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)

    need_ts = any(a in NEEDS_TS for a in aggs)
    if need_ts:
        if ts is None:
            raise ValueError("ts required for time-based aggregations")
        ts = np.asarray(ts, dtype=np.float64)
        if t_out is None:
            raise ValueError("t_out required for time-based aggregations")
        t_out = np.asarray(t_out, dtype=np.float64)

    # Filter non-finite inputs (Aggregator.hpp:449-456).
    finite = np.isfinite(values)
    if not finite.all():
        gids_f = gids[finite]
        v = values[finite]
        t = ts[finite] if need_ts else None
    else:
        gids_f, v = gids, values
        t = ts if need_ts else None

    counts, starts = _segments(gids_f, n_groups)
    empty = counts == 0
    nonempty = ~empty
    cnt_f = counts.astype(np.float64)

    out: dict[str, np.ndarray] = {}
    cache: dict[str, np.ndarray] = {}

    def _sum():
        if "sum" not in cache:
            cache["sum"] = np.bincount(gids_f, weights=v, minlength=n_groups)
        return cache["sum"]

    def _avg():
        if "avg" not in cache:
            with np.errstate(invalid="ignore", divide="ignore"):
                a = _sum() / cnt_f
            a[empty] = np.nan
            cache["avg"] = a
        return cache["avg"]

    def _min():
        if "min" not in cache:
            cache["min"] = _seg_reduce(np.minimum, v, starts, counts, np.nan)
        return cache["min"]

    def _max():
        if "max" not in cache:
            cache["max"] = _seg_reduce(np.maximum, v, starts, counts, np.nan)
        return cache["max"]

    def _var():
        if "var" not in cache:
            mu = _avg()
            d = v - mu[gids_f]
            with np.errstate(invalid="ignore", divide="ignore"):
                vv = np.bincount(gids_f, weights=d * d, minlength=n_groups) / cnt_f
            vv[empty] = np.nan
            cache["var"] = vv
        return cache["var"]

    def _all_same():
        # per-group: n<=1 or min==max  (Aggregations.hpp:736-757)
        if "all_same" not in cache:
            same = np.ones(n_groups, dtype=bool)
            m = counts > 1
            same[m] = _min()[m] == _max()[m]
            cache["all_same"] = same
        return cache["all_same"]

    # Sorted-within-group values for order statistics.
    def _sorted_vals():
        if "sv" not in cache:
            order = np.lexsort((v, gids_f))
            cache["sv"] = v[order]
        return cache["sv"]

    def _runs():
        """Run-length encoding of equal values within groups (sorted)."""
        if "runs" not in cache:
            sv = _sorted_vals()
            n = len(sv)
            if n == 0:
                cache["runs"] = (
                    np.empty(0, np.int64),
                    np.empty(0, np.float64),
                    np.empty(0, np.int64),
                )
            else:
                # sorting values within groups preserves the (sorted) gid order
                change = np.empty(n, dtype=bool)
                change[0] = True
                np.logical_or(
                    sv[1:] != sv[:-1], gids_f[1:] != gids_f[:-1], out=change[1:]
                )
                run_starts = np.flatnonzero(change)
                run_gid = gids_f[run_starts]
                run_val = sv[run_starts]
                run_cnt = np.diff(np.append(run_starts, n))
                cache["runs"] = (run_gid, run_val, run_cnt)
        return cache["runs"]

    def _quantile(q: float):
        sv = _sorted_vals()
        res = np.full(n_groups, np.nan)
        m = nonempty
        if m.any():
            ixf = (cnt_f[m] - 1.0) * q
            ix = np.floor(ixf).astype(np.int64)
            share = ixf - ix
            lo = starts[m] + ix
            hi = np.minimum(lo + 1, starts[m] + counts[m] - 1)
            res[m] = sv[hi] * share + sv[lo] * (1.0 - share)
        return res

    def _dt():
        if "dt" not in cache:
            cache["dt"] = t_out[gids_f] - t
        return cache["dt"]

    def _ewma(h: float):
        dt = _dt()
        with np.errstate(over="ignore", under="ignore"):
            w = np.exp(LOG05 * dt / h)
        sw = np.bincount(gids_f, weights=w, minlength=n_groups)
        swv = np.bincount(gids_f, weights=w * v, minlength=n_groups)
        with np.errstate(invalid="ignore", divide="ignore"):
            res = swv / sw
        res[sw == 0.0] = np.nan
        return res

    def _trend_core(w: np.ndarray | None):
        """OLS intercept of v on dt, optionally weighted. Reference
        Aggregations.hpp:619-671 (trend) / :208-278 (ewma_trend)."""
        x = _dt()
        if w is None:
            sw = cnt_f
            swx = np.bincount(gids_f, weights=x, minlength=n_groups)
            swy = _sum()
        else:
            sw = np.bincount(gids_f, weights=w, minlength=n_groups)
            swx = np.bincount(gids_f, weights=w * x, minlength=n_groups)
            swy = np.bincount(gids_f, weights=w * v, minlength=n_groups)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_x = swx / sw
            mean_y = swy / sw
        xc = x - mean_x[gids_f]
        yc = v - mean_y[gids_f]
        # association matters for exactness: w * (xc*xc), never (w*xc)*xc —
        # denormal intermediates would lose mantissa bits for tiny weights
        if w is None:
            xx_w = xc * xc
            xy_w = xc * yc
        else:
            xx_w = w * (xc * xc)
            xy_w = w * (xc * yc)
        xx = np.bincount(gids_f, weights=xx_w, minlength=n_groups)
        xy = np.bincount(gids_f, weights=xy_w, minlength=n_groups)
        with np.errstate(invalid="ignore", divide="ignore"):
            beta = xy / xx
            res = mean_y - mean_x * beta
        res = np.where(xx == 0.0, mean_y, res)
        res[sw == 0.0] = np.nan
        return res

    def _extreme_dt(which: str):
        """time_since_{first,last}_{maximum,minimum}; rows sorted by
        (gid, ts) -> first occurrence = earliest ts = largest dt."""
        target = _max() if which.endswith("maximum") else _min()
        mask = v == target[gids_f]
        first, last, has = _first_last_occurrence(mask, gids_f, n_groups)
        idx = first if which.startswith("first") else last
        res = np.full(n_groups, np.nan)
        res[has] = t_out[has] - t[idx[has]]
        return res

    for a in aggs:
        if a == "count":
            r = cnt_f.copy()
        elif a == "sum":
            r = _sum().copy()
        elif a == "avg":
            r = _avg().copy()
        elif a == "min":
            r = _min().copy()
        elif a == "max":
            r = _max().copy()
        elif a == "var":
            r = _var().copy()
        elif a == "stddev":
            with np.errstate(invalid="ignore"):
                r = np.sqrt(_var())
        elif a in ("skew", "kurtosis"):
            p = 3 if a == "skew" else 4
            with np.errstate(invalid="ignore", divide="ignore"):
                sd = np.sqrt(_var())
                z = (v - _avg()[gids_f]) / sd[gids_f]
                r = np.bincount(
                    gids_f[np.isfinite(z)],
                    weights=z[np.isfinite(z)] ** p,
                    minlength=n_groups,
                ) / cnt_f
            r[_all_same()] = 0.0
            r[empty] = np.nan
        elif a == "variation_coefficient":
            mu = _avg()
            with np.errstate(invalid="ignore", divide="ignore"):
                r = _var() / mu
            r[(mu == 0.0) | ~np.isfinite(mu)] = np.nan
        elif a == "median":
            r = _quantile(0.5)
        elif a in QUANTILES:
            r = _quantile(QUANTILES[a])
        elif a == "mode":
            run_gid, run_val, run_cnt = _runs()
            r = np.full(n_groups, np.nan)
            if len(run_gid):
                rc_counts, rc_starts = _segments(run_gid, n_groups)
                best = _seg_reduce(
                    np.maximum, run_cnt.astype(np.float64), rc_starts, rc_counts, 0.0
                )
                is_best = run_cnt == best[run_gid]
                first, _, has = _first_last_occurrence(is_best, run_gid, n_groups)
                r[has] = run_val[first[has]]
        elif a == "count_distinct":
            run_gid, _, _ = _runs()
            r = np.bincount(run_gid, minlength=n_groups).astype(np.float64)
        elif a == "count_distinct_over_count":
            run_gid, _, _ = _runs()
            with np.errstate(invalid="ignore", divide="ignore"):
                r = np.bincount(run_gid, minlength=n_groups) / cnt_f
            r[empty] = np.nan
        elif a == "count_minus_count_distinct":
            run_gid, _, _ = _runs()
            r = cnt_f - np.bincount(run_gid, minlength=n_groups)
        elif a == "num_max":
            mx = _max()
            mask = v == mx[gids_f]
            r = np.bincount(gids_f[mask], minlength=n_groups).astype(np.float64)
        elif a == "num_min":
            mn = _min()
            mask = v == mn[gids_f]
            r = np.bincount(gids_f[mask], minlength=n_groups).astype(np.float64)
        elif a in ("count_above_mean", "count_below_mean"):
            mu = _avg()
            cmp = v > mu[gids_f] if a == "count_above_mean" else v < mu[gids_f]
            r = np.bincount(gids_f[cmp], minlength=n_groups).astype(np.float64)
            r[_all_same()] = 0.0
        elif a == "first":
            r = np.full(n_groups, np.nan)
            r[nonempty] = v[starts[nonempty]]
        elif a == "last":
            # first element of the max-ts run within each group
            n = len(t)
            r = np.full(n_groups, np.nan)
            if n:
                ends = starts + counts - 1
                last_ts = np.full(n_groups, np.nan)
                last_ts[nonempty] = t[ends[nonempty]]
                mask = t == last_ts[gids_f]
                first, _, has = _first_last_occurrence(mask, gids_f, n_groups)
                r[has] = v[first[has]]
        elif a == "trend":
            r = _trend_core(None)
        elif a.startswith("ewma_trend_"):
            h = EWMA_HALF_LIVES[a[len("ewma_trend_"):]]
            dt = _dt()
            with np.errstate(over="ignore", under="ignore"):
                w = np.exp(LOG05 * dt / h)
            r = _trend_core(w)
        elif a.startswith("ewma_"):
            r = _ewma(EWMA_HALF_LIVES[a[len("ewma_"):]])
        elif a == "avg_time_between":
            tmax = _seg_reduce(np.maximum, t, starts, counts, np.nan)
            tmin = _seg_reduce(np.minimum, t, starts, counts, np.nan)
            with np.errstate(invalid="ignore", divide="ignore"):
                r = (tmax - tmin) / (cnt_f - 1.0)
            r[counts <= 1] = 0.0
        elif a.startswith("time_since_"):
            r = _extreme_dt(a[len("time_since_"):])
        else:
            raise ValueError(f"unknown aggregation: {a}")
        out[a] = np.asarray(r, dtype=np.float64)
    return out


def finalize_feature(arr: np.ndarray) -> np.ndarray:
    """NaN/Inf outputs become 0.0 in the feature matrix
    (reference FastProp.cpp:100)."""
    out = np.asarray(arr, dtype=np.float64).copy()
    out[~np.isfinite(out)] = 0.0
    return out
