"""Property-based tests (hypothesis): codec round-trips over adversarial
float/timestamp patterns, kernel invariants vs the scalar oracle."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from getml_community_ray.kernels import grouped_aggregate
from getml_community_ray.kernels import oracle
from getml_community_ray.stages.codec import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e15, max_value=1e15,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_floats, min_size=0, max_size=200))
def test_gorilla_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.float64)
    out = gorilla_decode(gorilla_encode(arr), len(arr))
    assert out.tobytes() == arr.tobytes()  # bit-exact


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**48), min_size=0, max_size=200
    )
)
def test_dod_roundtrip(ts):
    arr = np.sort(np.asarray(ts, dtype=np.int64))
    out = dod_decode(dod_encode(arr), len(arr))
    assert (out == arr).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # gid
            st.floats(allow_nan=False, allow_infinity=False, width=64,
                      min_value=-1e6, max_value=1e6)
            | st.just(float("nan"))
            | st.just(float("inf"))
            | st.just(float("-inf")),
            st.floats(min_value=0.0, max_value=3600.0, allow_nan=False),
        ),
        min_size=0,
        max_size=120,
    )
)
def test_kernels_match_oracle_random(rows):
    n_groups = 5
    rows.sort(key=lambda r: (r[0], r[2]))
    gids = np.asarray([r[0] for r in rows], dtype=np.int64)
    vals = np.asarray([r[1] for r in rows], dtype=np.float64)
    ts = np.asarray([r[2] for r in rows], dtype=np.float64)
    t_out = np.full(n_groups, 4000.0)
    aggs = [
        "count", "sum", "avg", "min", "max", "median", "q25", "stddev",
        "mode", "num_max", "count_distinct", "first", "last", "trend",
        "ewma_1h", "time_since_last_maximum", "avg_time_between",
    ]
    res = grouped_aggregate(aggs, gids, vals, n_groups, ts, t_out)
    for g in range(n_groups):
        m = gids == g
        gv, gt = list(vals[m]), list(ts[m])
        for a in aggs:
            want = oracle.compute(a, gv, gt, float(t_out[g]))
            got = float(res[a][g])
            if want is None or (isinstance(want, float) and math.isnan(want)):
                assert math.isnan(got), (a, g, gv)
            else:
                assert got == want or abs(got - want) <= 1e-9 * max(
                    1.0, abs(want)
                ), (a, g, gv, gt, got, want)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=400),
    st.integers(2, 20),
    st.data(),
)
def test_heavy_hitter_batch_screen_superset(keys, k, data):
    """The pigeonhole invariant behind stages/groupby.heavy_hitters: for ANY
    split of the rows into batches, the union of per-batch candidates
    (batch count * k > batch size) is a superset of the true heavy hitters
    (total count * k > n) — so the confirm pass can never miss one."""
    arr = np.asarray(keys, dtype=np.int64)
    n = len(arr)
    # random batch split
    n_cuts = data.draw(st.integers(0, min(10, n - 1)))
    cuts = sorted(
        data.draw(
            st.lists(st.integers(1, n - 1), min_size=n_cuts,
                     max_size=n_cuts, unique=True)
        )
    ) if n > 1 else []
    batches = np.split(arr, cuts)

    cands = set()
    for b in batches:
        if len(b) == 0:
            continue
        uniq, cnt = np.unique(b, return_counts=True)
        cands.update(uniq[cnt * k > len(b)].tolist())

    uniq, cnt = np.unique(arr, return_counts=True)
    heavy = set(uniq[cnt * k > n].tolist())
    assert heavy <= cands, (heavy - cands, k, cuts)
