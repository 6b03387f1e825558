"""HyperLogLog: register reproducibility, merge = single-pass, error."""
import numpy as np
import pandas as pd

from getml_community_ray.kernels.sketches import (
    _bitlen_u64,
    hll_estimate,
    hll_rows,
)


def test_bitlen_exact():
    vals = np.array([0, 1, 2, 3, 4, 2**52, 2**53 + 1, 2**63, 2**64 - 1],
                    dtype=np.uint64)
    exp = np.array([v.bit_length() for v in vals.tolist()])
    assert (_bitlen_u64(vals) == exp).all()


def test_hll_error_across_cardinalities():
    rng = np.random.default_rng(11)
    for exact in (500, 20_000, 1_000_000):
        keys = rng.integers(0, 2**62, exact * 2).astype(np.uint64)
        keys = np.unique(keys)[:exact]
        _, reg, rho = hll_rows(keys, np.zeros(len(keys), np.int64), 1, p=10)
        dense = np.zeros(1024, np.int64)
        dense[reg] = rho
        est = hll_estimate(dense, p=10)
        assert abs(est - exact) / exact < 0.08, (exact, est)


def test_hll_partition_invariance(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.groupby import hll_count_distinct

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50_000, 80_000),
            "g": rng.choice(["x", "y"], 80_000),
        }
    )
    outs = []
    for blocks in (1, 13):
        ds = rd.from_pandas(df).repartition(blocks)
        out = hll_count_distinct(ds, key_col="k", group_col="g", p=8)
        outs.append(
            out.to_pandas().sort_values(["grp", "reg"]).reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    # estimate from the merged registers tracks the exact count
    for g in ("x", "y"):
        sub = outs[0][outs[0].grp == g]
        dense = np.zeros(256, np.int64)
        dense[sub.reg.to_numpy()] = sub.rho.to_numpy()
        exact = df[df.g == g].k.nunique()
        est = hll_estimate(dense, p=8)
        assert abs(est - exact) / exact < 0.15
