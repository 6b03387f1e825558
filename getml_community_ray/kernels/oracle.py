"""Scalar reference oracle: straight-line Python transliteration of the
reference's aggregation semantics (`/root/reference/src/engine/include/helpers/
Aggregations.hpp`, `src/engine/include/fastprop/algorithm/Aggregator.hpp`).

Deliberately slow and loop-based — used only in tests as the ground truth the
vectorized kernels in `aggregations.py` must match.
"""

from __future__ import annotations

import math

import numpy as np

from .aggregations import EWMA_HALF_LIVES, QUANTILES

LOG05 = math.log(0.5)


def _exp(x: float) -> float:
    """np.exp, not math.exp: the vectorized kernels use numpy's libm path and
    the two can differ by 1 ulp, which ill-conditioned ewma_trend amplifies."""
    return float(np.exp(x))


def _finite(vals):
    return [v for v in vals if math.isfinite(v)]


def _finite_pairs(ts, vals):
    return [(t, v) for t, v in zip(ts, vals) if math.isfinite(v)]


def count(vals):
    return float(len(_finite(vals)))


def sum_(vals):
    s = 0.0
    for v in _finite(vals):
        s += v
    return s


def avg(vals):
    n = count(vals)
    if n == 0.0:
        return math.nan
    return sum_(vals) / n


def minimum(vals):
    vs = _finite(vals)
    if not vs:
        return math.nan
    m = vs[0]
    for v in vs[1:]:
        if v < m:
            m = v
    return m


def maximum(vals):
    vs = _finite(vals)
    if not vs:
        return math.nan
    m = vs[0]
    for v in vs[1:]:
        if v > m:
            m = v
    return m


def var(vals):
    vs = _finite(vals)
    n = float(len(vs))
    if n == 0.0:
        return math.nan
    mean = sum_(vs) / n
    acc = 0.0
    for v in vs:
        d = v - mean
        acc += d * d / n
    return acc


def stddev(vals):
    return math.sqrt(var(vals)) if count(vals) else math.nan


def _all_same(vs):
    return len(vs) <= 1 or all(v == vs[0] for v in vs)


def skew(vals):
    vs = _finite(vals)
    n = float(len(vs))
    if n == 0.0:
        return math.nan
    if _all_same(vs):
        return 0.0
    mean = avg(vs)
    sd = stddev(vs)
    acc = 0.0
    for v in vs:
        d = (v - mean) / sd
        acc += d * d * d / n
    return acc


def kurtosis(vals):
    vs = _finite(vals)
    n = float(len(vs))
    if n == 0.0:
        return math.nan
    if _all_same(vs):
        return 0.0
    mean = avg(vs)
    sd = stddev(vs)
    acc = 0.0
    for v in vs:
        d = (v - mean) / sd
        acc += d * d * d * d / n
    return acc


def variation_coefficient(vals):
    mean = avg(vals)
    if not math.isfinite(mean) or mean == 0.0:
        return math.nan
    return var(vals) / mean


def median(vals):
    vs = sorted(_finite(vals))
    if not vs:
        return math.nan
    n = len(vs)
    if n % 2 == 0:
        return (vs[n // 2 - 1] + vs[n // 2]) / 2.0
    return vs[n // 2]


def quantile(q, vals):
    vs = sorted(_finite(vals))
    if not vs:
        return math.nan
    ixf = (len(vs) - 1) * q
    ix = int(ixf)
    if ix == len(vs) - 1:
        return vs[ix]
    share = ixf - ix
    return vs[ix + 1] * share + vs[ix] * (1.0 - share)


def mode(vals):
    vs = _finite(vals)
    if not vs:
        return math.nan
    freq: dict[float, int] = {}
    for v in vs:
        freq[v] = freq.get(v, 0) + 1
    # std::map iterates in ascending key order; max_element keeps the first
    # maximum -> smallest value among ties.
    best_v, best_c = None, -1
    for v in sorted(freq):
        if freq[v] > best_c:
            best_v, best_c = v, freq[v]
    return best_v


def num_max(vals):
    m = maximum(vals)
    if math.isnan(m):
        return 0.0
    return float(sum(1 for v in _finite(vals) if v == m))


def num_min(vals):
    m = minimum(vals)
    if math.isnan(m):
        return 0.0
    return float(sum(1 for v in _finite(vals) if v == m))


def count_distinct(vals):
    return float(len(set(_finite(vals))))


def count_distinct_over_count(vals):
    n = count(vals)
    if n == 0.0:
        return math.nan
    return count_distinct(vals) / n


def count_minus_count_distinct(vals):
    return count(vals) - count_distinct(vals)


def count_above_mean(vals):
    vs = _finite(vals)
    if _all_same(vs):
        return 0.0
    mean = avg(vs)
    return float(sum(1 for v in vs if v > mean))


def count_below_mean(vals):
    vs = _finite(vals)
    if _all_same(vs):
        return 0.0
    mean = avg(vs)
    return float(sum(1 for v in vs if v < mean))


def first(ts, vals):
    """Value at the smallest ts; ties -> first in iteration order."""
    pairs = _finite_pairs(ts, vals)
    if not pairs:
        return math.nan
    best = pairs[0]
    for p in pairs[1:]:
        if p[0] < best[0]:
            best = p
    return best[1]


def last(ts, vals):
    """Value at the largest ts; ties -> first in iteration order
    (max_element keeps the first maximum)."""
    pairs = _finite_pairs(ts, vals)
    if not pairs:
        return math.nan
    best = pairs[0]
    for p in pairs[1:]:
        if best[0] < p[0]:
            best = p
    return best[1]


def ewma(half_life, ts, vals, t_out):
    pairs = [(t_out - t, v) for t, v in _finite_pairs(ts, vals)]
    sum_w = 0.0
    for dt, _ in pairs:
        sum_w += _exp(LOG05 * dt / half_life)
    if sum_w == 0.0:
        return math.nan
    sum_wv = 0.0
    for dt, v in pairs:
        sum_wv += _exp(LOG05 * dt / half_life) * v
    return sum_wv / sum_w


def _trend_pairs(pairs, weights):
    sum_w = sum(weights)
    if sum_w == 0.0:
        return math.nan
    mean_x = sum(w * x for w, (x, _) in zip(weights, pairs)) / sum_w
    mean_y = sum(w * y for w, (_, y) in zip(weights, pairs)) / sum_w
    # association mirrors the C++ exactly: (xc*xc)*w and (xc*yc)*w
    # (Aggregations.hpp:250-270 calc_xx/calc_xy)
    xx = sum(((x - mean_x) * (x - mean_x)) * w for w, (x, _) in zip(weights, pairs))
    if xx == 0.0:
        return mean_y
    xy = sum(
        ((x - mean_x) * (y - mean_y)) * w for w, (x, y) in zip(weights, pairs)
    )
    beta = xy / xx
    return mean_y - mean_x * beta


def trend(ts, vals, t_out):
    pairs = [(t_out - t, v) for t, v in _finite_pairs(ts, vals)]
    if not pairs:
        return math.nan
    return _trend_pairs(pairs, [1.0] * len(pairs))


def ewma_trend(half_life, ts, vals, t_out):
    pairs = [(t_out - t, v) for t, v in _finite_pairs(ts, vals)]
    weights = [_exp(LOG05 * dt / half_life) for dt, _ in pairs]
    return _trend_pairs(pairs, weights)


def time_since_first_maximum(ts, vals, t_out):
    pairs = [(t_out - t, v) for t, v in _finite_pairs(ts, vals)]
    if not pairs:
        return math.nan
    best = pairs[0]
    for p in pairs[1:]:
        # max_element with (value, then dt) ordering
        if (best[1], best[0]) < (p[1], p[0]):
            best = p
    return best[0]


def time_since_last_maximum(ts, vals, t_out):
    pairs = [(t_out - t, v) for t, v in _finite_pairs(ts, vals)]
    if not pairs:
        return math.nan
    best = pairs[0]
    for p in pairs[1:]:
        # equal values: smaller dt wins (latest occurrence)
        if best[1] < p[1] or (best[1] == p[1] and best[0] > p[0]):
            best = p
    return best[0]


def time_since_first_minimum(ts, vals, t_out):
    pairs = [(t_out - t, v) for t, v in _finite_pairs(ts, vals)]
    if not pairs:
        return math.nan
    best = pairs[0]
    for p in pairs[1:]:
        # min_element: smaller value wins; equal values -> larger dt wins
        if p[1] < best[1] or (p[1] == best[1] and p[0] > best[0]):
            best = p
    return best[0]


def time_since_last_minimum(ts, vals, t_out):
    pairs = [(t_out - t, v) for t, v in _finite_pairs(ts, vals)]
    if not pairs:
        return math.nan
    best = pairs[0]
    for p in pairs[1:]:
        if p[1] < best[1] or (p[1] == best[1] and p[0] < best[0]):
            best = p
    return best[0]


def avg_time_between(ts, vals):
    """Over matched timestamps of rows with a usable value; 0.0 if count<=1
    (Aggregator.hpp:428-446)."""
    tt = [t for t, _ in _finite_pairs(ts, vals)]
    n = float(len(tt))
    if n <= 1.0:
        return 0.0
    return (max(tt) - min(tt)) / (n - 1.0)


def compute(agg: str, vals, ts=None, t_out=None):
    """Dispatch by kernel name (same names as aggregations.ALL_AGGREGATIONS)."""
    simple = {
        "count": count, "sum": sum_, "avg": avg, "min": minimum,
        "max": maximum, "var": var, "stddev": stddev, "skew": skew,
        "kurtosis": kurtosis, "variation_coefficient": variation_coefficient,
        "median": median, "mode": mode, "num_max": num_max,
        "num_min": num_min, "count_distinct": count_distinct,
        "count_distinct_over_count": count_distinct_over_count,
        "count_minus_count_distinct": count_minus_count_distinct,
        "count_above_mean": count_above_mean,
        "count_below_mean": count_below_mean,
    }
    if agg in simple:
        return simple[agg](vals)
    if agg in QUANTILES:
        return quantile(QUANTILES[agg], vals)
    if agg == "first":
        return first(ts, vals)
    if agg == "last":
        return last(ts, vals)
    if agg == "trend":
        return trend(ts, vals, t_out)
    if agg == "avg_time_between":
        return avg_time_between(ts, vals)
    if agg.startswith("ewma_trend_"):
        return ewma_trend(EWMA_HALF_LIVES[agg[len("ewma_trend_"):]], ts, vals, t_out)
    if agg.startswith("ewma_"):
        return ewma(EWMA_HALF_LIVES[agg[len("ewma_"):]], ts, vals, t_out)
    if agg.startswith("time_since_"):
        fn = {
            "first_maximum": time_since_first_maximum,
            "last_maximum": time_since_last_maximum,
            "first_minimum": time_since_first_minimum,
            "last_minimum": time_since_last_minimum,
        }[agg[len("time_since_"):]]
        return fn(ts, vals, t_out)
    raise ValueError(f"unknown aggregation: {agg}")
