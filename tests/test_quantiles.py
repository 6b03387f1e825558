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


@pytest.mark.usefixtures("ray_session")
def test_irate_last_two_brute():
    import pandas as pd
    import ray.data as rd

    from getml_community_ray.stages.keyed import irate_last_two

    rng = np.random.default_rng(5)
    n = 4000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 20, n)),
            "ts": pa.array(
                rng.integers(0, 3600 * 6 * 10**6, n).astype("datetime64[us]")
            ),
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(rng.integers(-1000, 1000, n).astype(np.int64)),
        }
    )
    out = (
        irate_last_two(
            rd.from_arrow(t).repartition(7),
            key_col="k", ts_col="ts", id_col="id", value_col="v",
            width_s=3600, num_partitions=3,
        )
        .to_pandas()
        .sort_values(["k", "bucket_ts"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["b"] = df["ts"].astype("int64") // (3600 * 10**6)
    exp = []
    for (k, bkt), g in df.groupby(["k", "b"]):
        g = g.sort_values(["ts", "id"])
        if len(g) < 2:
            continue
        exp.append(
            (k, bkt * 3600 * 10**6,
             int(g["v"].iloc[-1] - g["v"].iloc[-2]),
             int(g["ts"].astype("int64").iloc[-1]
                 - g["ts"].astype("int64").iloc[-2]))
        )
    exp = pd.DataFrame(exp, columns=["k", "bts", "dv", "dt_us"]).sort_values(
        ["k", "bts"]
    ).reset_index(drop=True)
    assert len(out) == len(exp)
    assert (out["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (out["bucket_ts"].astype("int64").to_numpy()
            == exp["bts"].to_numpy()).all()
    assert (out["dv"].to_numpy() == exp["dv"].to_numpy()).all()
    assert (out["dt_us"].to_numpy() == exp["dt_us"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_keyed_delta_brute():
    import ray.data as rd

    from getml_community_ray.stages.keyed import keyed_delta

    rng = np.random.default_rng(9)
    n = 500
    t = pa.table(
        {
            "k": pa.array(rng.permutation(np.repeat(np.arange(10), 50))),
            "o": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
            "v": pa.array(rng.integers(0, 10**6, n).astype(np.int64)),
        }
    )
    out = (
        keyed_delta(rd.from_arrow(t).repartition(4),
                    key_col="k", order_col="o", value_col="v",
                    num_partitions=3)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    exp = df.groupby("k")["v"].diff()
    assert np.array_equal(
        out["delta"].to_numpy(na_value=-10**18),
        exp.to_numpy(na_value=-10**18),
    )


@pytest.mark.usefixtures("ray_session")
def test_grouped_exact_quantiles_brute():
    import ray.data as rd

    from getml_community_ray.stages.quantiles import grouped_exact_quantiles

    rng = np.random.default_rng(17)
    n = 30_000
    keys = rng.choice(np.array(["a", "b", "c", "dd"]), size=n)
    # per-key different ranges + duplicates + negatives
    vals = np.where(
        keys == "a", rng.integers(-100, 100, n),
        np.where(keys == "b", rng.integers(0, 10**9, n),
                 rng.integers(5, 8, n)),
    ).astype(np.int64)

    def make_ds():
        return rd.from_arrow(
            pa.table({"k": pa.array(keys), "v": pa.array(vals)})
        ).repartition(6)

    out = grouped_exact_quantiles(
        make_ds, key_col="k", value_col="v", q_pcts=[10, 50, 99],
        n_buckets=8,  # force many refinement passes
    ).to_pandas()
    got = {(r["key"], r["q_pct"]): r["value"] for _, r in out.iterrows()}
    for k in np.unique(keys):
        kv = np.sort(vals[keys == k])
        for q in (10, 50, 99):
            rk = max(1, -(-q * len(kv) // 100))
            assert got[(k, q)] == kv[rk - 1], (k, q)


@pytest.mark.usefixtures("ray_session")
def test_irate_and_delta_empty_blocks():
    """Empty input blocks must project to the SAME combined schema as
    non-empty ones (heterogeneous block schemas can fail Ray's block
    concat in the hash exchange) — regression for the r3 audit finding."""
    import ray.data as rd

    from getml_community_ray.stages.keyed import irate_last_two, keyed_delta

    t = pa.table(
        {
            "k": pa.array(np.array([1, 1, 2], dtype=np.int64)),
            "ts": pa.array(
                np.array([10**6, 2 * 10**6, 3 * 10**6]).astype("datetime64[us]")
            ),
            "id": pa.array(np.arange(3, dtype=np.int64)),
            "v": pa.array(np.array([5, 9, 7], dtype=np.int64)),
        }
    )
    empty = t.slice(0, 0)
    # union of a populated and an EMPTY dataset forces empty blocks
    # through the combiner
    ds = rd.from_arrow(t).union(rd.from_arrow(empty)).repartition(4)
    out = irate_last_two(
        ds, key_col="k", ts_col="ts", id_col="id", value_col="v",
        width_s=3600, num_partitions=2,
    ).to_pandas()
    assert len(out) == 1
    assert int(out["dv"].iloc[0]) == 4

    # keyed_delta with a tz-aware order column + empty blocks: the empty
    # branch must emit the same tz-stripped timestamp('us') schema
    t2 = pa.table(
        {
            "k": t["k"],
            "o": t["ts"].cast(pa.timestamp("us", tz="UTC")),
            "v": t["v"],
        }
    )
    ds2 = rd.from_arrow(t2).union(rd.from_arrow(t2.slice(0, 0))).repartition(4)
    out2 = keyed_delta(
        ds2, key_col="k", order_col="o", value_col="v", num_partitions=2,
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    assert len(out2) == 3
    assert out2["delta"].isna().sum() == 2  # first row of each key
    assert int(out2["delta"].dropna().iloc[0]) == 4


@pytest.mark.usefixtures("ray_session")
def test_weighted_exact_quantiles_brute():
    import ray.data as rd

    from getml_community_ray.stages.quantiles import weighted_exact_quantiles

    rng = np.random.default_rng(21)
    n = 5_000
    v = rng.integers(-10_000, 10_000, n)
    w = rng.integers(1, 9, n)
    t = pa.table({"v": pa.array(v), "w": pa.array(w)})

    def brute(qs):
        order = np.argsort(v, kind="stable")
        vs, ws = v[order], w[order]
        cw = np.cumsum(ws)
        W = int(cw[-1])
        out = {}
        for q in qs:
            tgt = max(1, (q * W + 99) // 100)
            out[q] = int(vs[np.searchsorted(cw, tgt)])
        return out

    for blocks in (1, 4, 9):
        res = weighted_exact_quantiles(
            lambda b=blocks: rd.from_arrow(t).repartition(b),
            value_col="v", weight_col="w", q_pcts=[0, 25, 50, 90, 100],
        ).to_pylist()
        want = brute([0, 25, 50, 90, 100])
        assert res == [
            {"q_pct": q, "value": want[q]} for q in (0, 25, 50, 90, 100)
        ], (blocks, res)

    # forced multi-pass: huge value range with a tiny bucket grid
    res2 = weighted_exact_quantiles(
        lambda: rd.from_arrow(t), value_col="v", weight_col="w",
        q_pcts=[50], n_buckets=8,
    ).to_pylist()
    assert res2[0]["value"] == brute([50])[50]
