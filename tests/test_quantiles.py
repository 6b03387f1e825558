"""Exact multi-pass quantiles (stages/quantiles.py) vs sorted brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def brute(vals: np.ndarray, q_pcts):
    s = np.sort(vals)
    n = len(s)
    out = {}
    for q in q_pcts:
        k = max(1, -(-q * n // 100))
        out[q] = int(s[k - 1])
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "gen",
    [
        lambda rng: rng.integers(-50_000, 50_000, size=30_000),
        lambda rng: rng.zipf(1.3, size=20_000).astype(np.int64),
        lambda rng: np.repeat(rng.integers(0, 5, size=100), 137),
        lambda rng: rng.integers(0, 3, size=7),
    ],
)
def test_exact_quantiles_matches_brute(gen):
    import ray.data as rd

    from getml_community_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(13)
    vals = gen(rng).astype(np.int64)
    q_pcts = [1, 25, 50, 90, 99, 100]

    def make_ds():
        return rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(5)

    out = exact_quantiles(make_ds, value_col="v", q_pcts=q_pcts,
                          n_buckets=16)  # tiny buckets -> forces many passes
    got = dict(zip(out["q_pct"].to_pylist(), out["value"].to_pylist()))
    assert got == brute(vals, q_pcts)


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_partition_invariance():
    import ray.data as rd

    from getml_community_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(29)
    vals = rng.integers(0, 10**9, size=50_000).astype(np.int64)
    outs = []
    for parts in (1, 3, 17):
        def make_ds(parts=parts):
            return rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(parts)

        out = exact_quantiles(make_ds, value_col="v", q_pcts=[50, 95])
        outs.append(out.to_pylist())
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == [
        {"q_pct": 50, "value": brute(vals, [50])[50]},
        {"q_pct": 95, "value": brute(vals, [95])[95]},
    ]
