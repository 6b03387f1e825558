"""Vectorized grouped kernels vs the scalar oracle transliterated from the
reference (Aggregations.hpp / Aggregator.hpp). Exact for integer-ish results,
1e-12 relative tolerance for float accumulations (summation order differs)."""

import math

import numpy as np
import pytest

from getml_community_ray.kernels import (
    ALL_AGGREGATIONS,
    grouped_aggregate,
)
from getml_community_ray.kernels import oracle
from getml_community_ray.kernels.aggregations import finalize_feature


def _make_groups(rng, n_groups, max_rows, with_ties=True, with_nan=True):
    """Random grouped rows sorted by (gid, ts) stable; some empty groups."""
    gids, ts, vals = [], [], []
    for g in range(n_groups):
        n = int(rng.integers(0, max_rows))
        if n == 0:
            continue
        t = np.sort(rng.uniform(0, 3600, n))
        if with_ties and n > 3:
            t[1] = t[0]  # ts tie
        v = rng.choice([1.0, 2.0, 2.0, 3.0, 7.5, -4.0], size=n) if with_ties \
            else rng.normal(10, 5, n)
        if with_nan and n > 2:
            v[rng.integers(0, n)] = np.nan
        gids.extend([g] * n)
        ts.extend(t)
        vals.extend(v)
    order = np.lexsort((np.asarray(ts), np.asarray(gids, dtype=np.int64)))
    return (
        np.asarray(gids, dtype=np.int64)[order],
        np.asarray(vals)[order],
        np.asarray(ts)[order],
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_all_aggs_match_oracle(seed):
    rng = np.random.default_rng(seed)
    n_groups = 25
    gids, vals, ts = _make_groups(rng, n_groups, 40)
    t_out = np.full(n_groups, 4000.0)

    res = grouped_aggregate(ALL_AGGREGATIONS, gids, vals, n_groups, ts, t_out)

    for g in range(n_groups):
        m = gids == g
        gv, gt = list(vals[m]), list(ts[m])
        for agg in ALL_AGGREGATIONS:
            expected = oracle.compute(agg, gv, gt, float(t_out[g]))
            actual = float(res[agg][g])
            if expected is None or (isinstance(expected, float) and math.isnan(expected)):
                assert math.isnan(actual), (agg, g, actual)
            else:
                assert actual == pytest.approx(expected, rel=1e-12, abs=1e-12), (
                    agg,
                    g,
                    gv,
                    gt,
                )


def test_empty_group_semantics():
    """FIXTURES.md F2 edge rows: empty bucket -> SUM 0.0, AVG NaN, COUNT 0."""
    gids = np.array([1, 1], dtype=np.int64)  # group 0 empty
    vals = np.array([5.0, 5.0])
    ts = np.array([1.0, 2.0])
    t_out = np.array([10.0, 10.0])
    res = grouped_aggregate(ALL_AGGREGATIONS, gids, vals, 2, ts, t_out)
    assert res["sum"][0] == 0.0
    assert math.isnan(res["avg"][0])
    assert res["count"][0] == 0.0
    assert math.isnan(res["min"][0]) and math.isnan(res["max"][0])
    assert res["num_max"][0] == 0.0 and res["num_min"][0] == 0.0
    assert res["avg_time_between"][0] == 0.0  # count<=1 -> 0.0
    assert math.isnan(res["median"][0])
    assert math.isnan(res["first"][0]) and math.isnan(res["last"][0])
    # finalize: NaN -> 0.0 (FastProp.cpp:100)
    assert finalize_feature(res["avg"])[0] == 0.0


def test_all_equal_and_single_value_semantics():
    gids = np.array([0, 0, 0, 1], dtype=np.int64)
    vals = np.array([3.0, 3.0, 3.0, 9.0])
    ts = np.array([1.0, 2.0, 3.0, 5.0])
    t_out = np.array([10.0, 10.0])
    res = grouped_aggregate(ALL_AGGREGATIONS, gids, vals, 2, ts, t_out)
    assert res["skew"][0] == 0.0 and res["kurtosis"][0] == 0.0
    assert res["var"][1] == 0.0
    assert res["avg_time_between"][1] == 0.0
    assert res["num_max"][0] == 3.0
    assert res["count_above_mean"][0] == 0.0
    assert res["mode"][0] == 3.0
    # trend of constant: xx != 0 but y centered = 0 -> intercept = mean_y = 3
    assert res["trend"][0] == pytest.approx(3.0)


def test_variation_coefficient_nan_path():
    gids = np.array([0, 0], dtype=np.int64)
    vals = np.array([1.0, -1.0])  # mean == 0 -> NaN
    res = grouped_aggregate(["variation_coefficient"], gids, vals, 1)
    assert math.isnan(res["variation_coefficient"][0])


def test_mode_tie_breaks_to_smallest():
    gids = np.zeros(4, dtype=np.int64)
    vals = np.array([5.0, 2.0, 5.0, 2.0])
    res = grouped_aggregate(["mode"], gids, vals, 1)
    assert res["mode"][0] == 2.0


def test_first_last_ts_ties():
    """Ties -> first element in iteration order (stable by input)."""
    gids = np.zeros(3, dtype=np.int64)
    ts = np.array([1.0, 1.0, 1.0])
    vals = np.array([7.0, 8.0, 9.0])
    res = grouped_aggregate(["first", "last"], gids, vals, 1, ts, np.array([2.0]))
    assert res["first"][0] == 7.0
    assert res["last"][0] == 7.0  # max_element keeps first among equal ts


def test_time_since_tie_breaks():
    gids = np.zeros(4, dtype=np.int64)
    ts = np.array([1.0, 2.0, 3.0, 4.0])
    vals = np.array([9.0, 1.0, 9.0, 1.0])
    t_out = np.array([10.0])
    res = grouped_aggregate(
        [
            "time_since_first_maximum",
            "time_since_last_maximum",
            "time_since_first_minimum",
            "time_since_last_minimum",
        ],
        gids, vals, 1, ts, t_out,
    )
    assert res["time_since_first_maximum"][0] == 9.0   # max at ts=1
    assert res["time_since_last_maximum"][0] == 7.0    # max at ts=3
    assert res["time_since_first_minimum"][0] == 8.0   # min at ts=2
    assert res["time_since_last_minimum"][0] == 6.0    # min at ts=4


def test_quantile_interpolation_matches_reference_formula():
    gids = np.zeros(4, dtype=np.int64)
    vals = np.array([1.0, 2.0, 3.0, 10.0])
    res = grouped_aggregate(["q25", "median", "q75"], gids, vals, 1)
    assert res["q25"][0] == pytest.approx(1.75)   # ix=0.75 -> 1*0.25+2*0.75
    assert res["median"][0] == pytest.approx(2.5)
    assert res["q75"][0] == pytest.approx(3.0 * 0.75 + 10.0 * 0.25)


def test_trailing_empty_group_min_max():
    """Regression: a non-empty group ending at the array end, followed by
    empty groups, must not have its reduceat segment truncated (the
    empty-start clamp bug found via FastProp empty windows)."""
    gids = np.asarray([0, 0, 1, 1, 1], dtype=np.int64)
    vals = np.asarray([5.0, 2.0, 9.0, 8.0, 1.0])
    ts = np.asarray([1.0, 2.0, 1.0, 2.0, 3.0])
    n_groups = 4  # groups 2 and 3 empty
    res = grouped_aggregate(
        ["min", "max", "count", "sum"], gids, vals, n_groups, ts,
        np.full(n_groups, 10.0),
    )
    assert res["min"][1] == 1.0 and res["max"][1] == 9.0
    assert math.isnan(res["min"][2]) and math.isnan(res["min"][3])
    assert res["count"][2] == 0.0 and res["sum"][2] == 0.0
