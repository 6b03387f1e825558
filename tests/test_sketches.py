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


def test_histogram_quantile_bound(ray_session):
    import ray.data as rd

    from getml_community_ray.kernels.sketches import histogram_quantile
    from getml_community_ray.stages.groupby import grouped_histogram

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "v": np.concatenate(
                [rng.normal(0, 1, 40_000), rng.exponential(5, 40_000)]
            ),
            "g": np.repeat(["n", "e"], 40_000),
        }
    )
    outs = []
    for blocks in (1, 9):
        ds = rd.from_pandas(df).repartition(blocks)
        h = grouped_histogram(ds, value_col="v", group_col="g", n_bins=128)
        outs.append(
            h.to_pandas().sort_values(["grp", "bin"]).reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])  # partition-invariant
    for g in ("n", "e"):
        vals = df[df.g == g].v.to_numpy()
        sub = outs[0][outs[0].grp == g]
        width = (vals.max() - vals.min()) / 128
        for q in (0.1, 0.5, 0.9, 0.99):
            est = histogram_quantile(
                sub.bin.to_numpy(), sub.cnt.to_numpy(),
                mn=vals.min(), mx=vals.max(), n_bins=128, q=q,
            )
            assert abs(est - np.quantile(vals, q)) <= width + 1e-12


def test_histogram_degenerate_group(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.groupby import grouped_histogram

    df = pd.DataFrame({"v": [3.5] * 10, "g": ["x"] * 10})
    h = grouped_histogram(
        rd.from_pandas(df), value_col="v", group_col="g", n_bins=16
    ).to_pandas()
    assert len(h) == 1 and h.bin.iloc[0] == 0 and h.cnt.iloc[0] == 10


def test_cms_counters_partition_invariance_and_estimate(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from getml_community_ray.kernels.sketches import cms_point_estimate
    from getml_community_ray.stages.groupby import cms_counters

    rng = np.random.default_rng(3)
    keys = rng.zipf(1.5, size=5000).astype(np.int64) % 997
    tbl = pa.table({"k": pa.array(keys)})
    a = (
        cms_counters(rd.from_arrow(tbl), key_col="k", depth=4, width=256)
        .to_pandas().sort_values(["row_j", "slot"]).reset_index(drop=True)
    )
    b = (
        cms_counters(
            rd.from_arrow(tbl).repartition(13), key_col="k", depth=4,
            width=256,
        )
        .to_pandas().sort_values(["row_j", "slot"]).reset_index(drop=True)
    )
    assert a.equals(b)
    # every row's counters sum to n
    assert (a.groupby("row_j")["cnt"].sum() == len(keys)).all()
    dense = np.zeros((4, 256), dtype=np.int64)
    dense[a["row_j"], a["slot"]] = a["cnt"]
    # point estimates upper-bound true counts and are close for hot keys
    from collections import Counter

    true = Counter(keys.tolist())
    hot = [k for k, _ in true.most_common(5)]
    for k in hot:
        est = cms_point_estimate(dense, k, depth=4, width=256)
        assert est >= true[k]
        assert est <= true[k] + len(keys) * 2.0 / 256 * 4


def test_grouped_histogram_quantiles_vs_duckdb(ray_session):
    """Distributed PromQL-style histogram_quantile fold: exact match with
    the DuckDB twin (identical bin + estimate arithmetic), and the
    estimate is within one bin width of the true quantile."""
    import duckdb
    import ray.data as rd

    from getml_community_ray.kernels.sketches import (
        sql_grouped_histogram_quantiles,
    )
    from getml_community_ray.stages.groupby import grouped_histogram_quantiles

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "grp": rng.choice(["a", "b", "c"], n),
            "value": rng.gamma(2.0, 50.0, n),
        }
    )
    got = (
        grouped_histogram_quantiles(
            rd.from_pandas(df).repartition(6),
            value_col="value", group_col="grp", n_bins=32,
            qs=(0.5, 0.9, 0.99),
        )
        .to_pandas().sort_values(["grp", "q"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        sql_grouped_histogram_quantiles(
            "t", value_col="value", group_col="grp", n_bins=32,
            qs=(0.5, 0.9, 0.99),
        )
    ).df()
    assert len(got) == len(want) == 9
    assert (got["grp"].to_numpy() == want["grp"].to_numpy()).all()
    assert (got["n"].to_numpy(dtype=np.int64)
            == want["n"].to_numpy(dtype=np.int64)).all()
    assert (got["q"].to_numpy() == want["q"].to_numpy()).all()
    assert (got["q_est"].to_numpy() == want["q_est"].to_numpy()).all()

    # error bound: within one bin width of the exact quantile
    for g, sub in df.groupby("grp"):
        v = np.sort(sub["value"].to_numpy())
        width = (v.max() - v.min()) / 32
        for q in (0.5, 0.9, 0.99):
            exact = v[max(0, int(np.ceil(q * len(v))) - 1)]
            est = got[(got["grp"] == g) & (got["q"] == q)]["q_est"].iloc[0]
            assert abs(est - exact) <= width + 1e-9, (g, q)


def test_heavy_hitters_exact_and_partition_invariant(ray_session):
    """phi-heavy hitters: exact counts, strict > n/k threshold, identical
    at different partitionings, empty result keeps its schema."""
    import pandas as pd
    import ray.data as rd

    from getml_community_ray.stages.groupby import heavy_hitters

    rng = np.random.default_rng(7)
    # Zipf-ish skew: a few keys dominate
    keys = rng.zipf(1.5, size=20_000).astype(np.int64) % 500
    df = pd.DataFrame({"k": keys})
    vc = df["k"].value_counts()
    k_param = 50
    want = sorted(vc[vc * k_param > len(df)].index.tolist())

    for blocks in (3, 11):
        out = heavy_hitters(
            lambda: rd.from_pandas(df, override_num_blocks=blocks),
            key_col="k", k=k_param,
        ).to_pandas()
        assert out["k"].tolist() == want
        got_counts = dict(zip(out["k"], out["n"]))
        assert got_counts == {int(x): int(vc[x]) for x in want}

    # empty result keeps the (key, n) schema (ds.schema(); note
    # Dataset.to_pandas drops columns for any 0-row dataset)
    empty = heavy_hitters(
        lambda: rd.from_pandas(pd.DataFrame({"k": np.arange(100, dtype=np.int64)})),
        key_col="k", k=5,
    )
    sch = empty.schema()
    assert sch.names == ["k", "n"] and empty.count() == 0
