"""asof_join: backward point-in-time lookup vs a brute-force oracle."""
import numpy as np
import pandas as pd
import pytest


def _brute(left: pd.DataFrame, right: pd.DataFrame, tol_us=None):
    out = []
    for _, lr in left.iterrows():
        cand = right[(right.k == lr.k) & (right.ts_us <= lr.ts_us)]
        if tol_us is not None:
            cand = cand[lr.ts_us - cand.ts_us <= tol_us]
        if len(cand):
            # last among max ts in input order
            best = cand[cand.ts_us == cand.ts_us.max()].iloc[-1]
            out.append(best.v)
        else:
            out.append(np.nan)
    return np.array(out)


def _frames(seed=7, n_l=300, n_r=200, str_key=False):
    rng = np.random.default_rng(seed)
    keys = np.array(["a", "b", "c", "never_right"]) if str_key else np.arange(6)
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": rng.choice(keys, n_l),
            "ts_us": rng.integers(0, 10_000_000, n_l),
        }
    )
    rkeys = keys[:-1] if str_key else keys[:-1]
    right = pd.DataFrame(
        {
            "k": rng.choice(rkeys, n_r),
            "ts_us": rng.integers(0, 10_000_000, n_r),
            "v": rng.normal(size=n_r),
        }
    )
    return left, right


def _run(left, right, tol_s=None, parts=5, self_join=False):
    import ray.data as rd

    from getml_community_ray.stages.asof import asof_join

    l = left.copy()
    l["ts"] = pd.to_datetime(l.pop("ts_us"), unit="us")
    r = right.copy()
    r["ts"] = pd.to_datetime(r.pop("ts_us"), unit="us")
    if self_join:
        # one table, sides split by a flag column — exercises the fused
        # single-operator tagger path via left_ds is right_ds
        l2 = l.assign(side="l", v=np.nan)
        r2 = r.assign(side="r", lid=-1)
        both = pd.concat([l2, r2], ignore_index=True)
        ds = rd.from_pandas(both)
        lds = ds.filter(expr="side == 'l'")
        rds = ds.filter(expr="side == 'r'")
        out = asof_join(
            lds, rds, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], id_cols=["lid"],
            tolerance_s=tol_s, num_partitions=parts,
        )
    else:
        out = asof_join(
            rd.from_pandas(l), rd.from_pandas(r), on="k", left_ts="ts",
            right_ts="ts", value_cols=["v"], id_cols=["lid"],
            tolerance_s=tol_s, num_partitions=parts,
        )
    df = out.to_pandas().sort_values("lid").reset_index(drop=True)
    return df


@pytest.mark.parametrize("str_key", [False, True])
def test_asof_matches_brute_force(ray_session, str_key):
    left, right = _frames(str_key=str_key)
    df = _run(left, right)
    exp = _brute(left.sort_values("lid"), right)
    got = df["v_asof"].to_numpy()
    assert np.allclose(got, exp, equal_nan=True)


def test_asof_tolerance(ray_session):
    left, right = _frames(seed=13)
    tol_s = 1.5
    df = _run(left, right, tol_s=tol_s)
    exp = _brute(left.sort_values("lid"), right, tol_us=int(tol_s * 1e6))
    assert np.allclose(df["v_asof"].to_numpy(), exp, equal_nan=True)
    # tolerance must strictly reduce or keep the match count
    df0 = _run(left, right)
    assert df["v_asof"].notna().sum() <= df0["v_asof"].notna().sum()


def test_asof_partition_invariance(ray_session):
    left, right = _frames(seed=29)
    a = _run(left, right, parts=2)["v_asof"].to_numpy()
    b = _run(left, right, parts=17)["v_asof"].to_numpy()
    assert np.allclose(a, b, equal_nan=True)


def test_asof_self_dataset_fused(ray_session):
    """left_ds is right_ds goes through the fused single-operator tagger:
    every row is both a left row and a right candidate (ts <= ts always
    matches itself — the latest right row at or before each ts)."""
    import ray.data as rd

    from getml_community_ray.stages.asof import asof_join

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "lid": np.arange(50),
            "k": rng.choice(3, 50),
            "ts": pd.to_datetime(rng.integers(0, 1_000_000, 50), unit="us"),
            "v": rng.normal(size=50),
        }
    )
    ds = rd.from_pandas(df)
    out = asof_join(
        ds, ds, on="k", left_ts="ts", right_ts="ts", value_cols=["v"],
        id_cols=["lid"], num_partitions=4,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # self-match: the latest right ts <= own ts is the row itself (unique ts
    # per key with this seed) — verify against brute force
    b = pd.DataFrame(
        {"k": df.k, "ts_us": df.ts.astype("int64"), "v": df.v}
    )
    l = pd.DataFrame({"lid": df.lid, "k": df.k, "ts_us": df.ts.astype("int64")})
    exp = _brute(l, b)
    assert np.allclose(out["v_asof"].to_numpy(), exp, equal_nan=True)


def test_rolling_rows_brute_force(ray_session):
    """rolling_rows vs a per-row pandas brute force, incl. partial head
    windows and partition invariance."""
    import ray.data as rd

    from getml_community_ray.stages.windows import rolling_rows

    rng = np.random.default_rng(17)
    n = 800
    df = pd.DataFrame(
        {
            "lid": np.arange(n),
            "k": rng.choice(["a", "b", "c"], n),
            "ts": pd.to_datetime(rng.integers(0, 1_000_000, n), unit="us"),
            "v": rng.integers(-50, 50, n).astype(np.float64),
        }
    )
    outs = []
    for parts in (2, 11):
        out = rolling_rows(
            rd.from_pandas(df), key_col="k", ts_col="ts", value_col="v",
            id_cols=["lid"], window_rows=4, num_partitions=parts,
        ).to_pandas().sort_values("lid").reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])
    got = outs[0]
    sdf = df.sort_values(["k", "ts", "lid"]).reset_index(drop=True)
    roll = sdf.groupby("k")["v"].rolling(4, min_periods=1)
    for agg, col in (("sum", "r_sum"), ("min", "r_min"), ("max", "r_max"),
                     ("count", "r_count"), ("mean", "r_avg")):
        exp = getattr(roll, agg)().reset_index(level=0, drop=True)
        exp = pd.Series(exp.to_numpy(), index=sdf.lid).sort_index().to_numpy()
        assert np.allclose(got[col].to_numpy(), exp), agg


def test_range_join_brute_force(ray_session):
    """range_join vs brute force: long intervals spanning many buckets,
    overlap stacking, partition invariance, oversize-interval guard."""
    import ray.data as rd

    from getml_community_ray.stages.rangejoin import range_join

    rng = np.random.default_rng(41)
    n_p, n_i = 1200, 300
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_p),
            "k": rng.choice(["a", "b", "c"], n_p),
            "ts_us": rng.integers(0, 20_000_000, n_p),
        }
    )
    start = rng.integers(0, 20_000_000, n_i)
    ln = rng.integers(0, 5_000_000, n_i)
    ivl = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], n_i),
            "s_us": start,
            "e_us": start + ln,
            "iid": np.arange(n_i),
        }
    )
    exp = pts.merge(ivl, on="k")
    exp = exp[(exp.ts_us >= exp.s_us) & (exp.ts_us <= exp.e_us)]
    exp = set(zip(exp.pid, exp.iid))

    p = pts.assign(ts=pd.to_datetime(pts.ts_us, unit="us")).drop(columns="ts_us")
    iv = ivl.assign(
        start_ts=pd.to_datetime(ivl.s_us, unit="us"),
        end_ts=pd.to_datetime(ivl.e_us, unit="us"),
    ).drop(columns=["s_us", "e_us"])
    got_sets = []
    for parts, bucket in ((3, 5.0), (11, 0.5)):  # 0.5s bucket: 10+ replicas
        out = range_join(
            rd.from_pandas(p), rd.from_pandas(iv), on="k", point_ts="ts",
            start_ts="start_ts", end_ts="end_ts", point_id_cols=["pid"],
            interval_cols=["iid"], max_interval_s=5.0, bucket_s=bucket,
            num_partitions=parts,
        ).to_pandas()
        got_sets.append(set(zip(out.pid, out.iid)))
        assert len(out) == len(got_sets[-1])  # no duplicate pairs
    assert got_sets[0] == exp
    assert got_sets[1] == exp

    with pytest.raises(Exception, match="max_interval_s"):
        range_join(
            rd.from_pandas(p), rd.from_pandas(iv), on="k", point_ts="ts",
            start_ts="start_ts", end_ts="end_ts", point_id_cols=["pid"],
            interval_cols=["iid"], max_interval_s=1.0, num_partitions=3,
        ).to_pandas()


def test_asof_time_bucket_split_equality(ray_session):
    """(key, time-bucket) split asof == key-only asof (tolerance bounds
    the lookback, replication covers bucket crossings)."""
    left, right = _frames(seed=47, n_l=600, n_r=500)
    import ray.data as rd

    from getml_community_ray.stages.asof import asof_join

    l = left.assign(ts=pd.to_datetime(left.ts_us, unit="us")).drop(columns="ts_us")
    r = right.assign(ts=pd.to_datetime(right.ts_us, unit="us")).drop(columns="ts_us")
    kw = dict(on="k", left_ts="ts", right_ts="ts", value_cols=["v"],
              id_cols=["lid"], tolerance_s=2.0)
    a = asof_join(rd.from_pandas(l), rd.from_pandas(r),
                  num_partitions=4, **kw).to_pandas()
    b = asof_join(rd.from_pandas(l), rd.from_pandas(r), num_partitions=4,
                  time_bucket_s=2.5, **kw).to_pandas()
    a = a.sort_values("lid").reset_index(drop=True)
    b = b.sort_values("lid").reset_index(drop=True)
    assert np.allclose(a["v_asof"], b["v_asof"], equal_nan=True)

    with pytest.raises(ValueError, match="time_bucket_s requires tolerance"):
        asof_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                  left_ts="ts", right_ts="ts", value_cols=["v"],
                  id_cols=["lid"], time_bucket_s=2.0, num_partitions=4)


def test_interval_overlap_join_brute(ray_session):
    """Brute-force oracle for the interval-interval overlap join:
    half-open overlap, exactly-once pairs, multi-bucket spans, partition
    invariance."""
    import pandas as pd
    import ray.data as rd

    from getml_community_ray.stages.rangejoin import interval_overlap_join

    rng = np.random.default_rng(31)
    nl, nr = 400, 300
    DAY = 86_400_000_000

    def mk(n, tag):
        s = rng.integers(0, DAY, n)
        ln = rng.integers(1, 3_600_000_000, n)  # up to 1h
        return pd.DataFrame({
            f"id_{tag}": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 6, n),
            "s": s.astype("datetime64[us]"),
            "e": (s + ln).astype("datetime64[us]"),
        })

    L, R = mk(nl, "a"), mk(nr, "b")
    out = interval_overlap_join(
        rd.from_pandas(L, override_num_blocks=5),
        rd.from_pandas(R, override_num_blocks=3),
        on="k", left_start="s", left_end="e", right_start="s",
        right_end="e", left_cols=["id_a"], right_cols=["id_b"],
        max_interval_s=3600.0, bucket_s=1800.0, num_partitions=4,
    ).to_pandas()

    ls, le = L["s"].astype("int64"), L["e"].astype("int64")
    rs, re = R["s"].astype("int64"), R["e"].astype("int64")
    want = set()
    for i in range(nl):
        for j in range(nr):
            if (L["k"][i] == R["k"][j] and ls[i] < re[j] and rs[j] < le[i]):
                want.add((i, j))
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == want
    assert len(out) == len(want)  # exactly-once, no dup pairs

    # partition invariance
    out2 = interval_overlap_join(
        rd.from_pandas(L, override_num_blocks=2),
        rd.from_pandas(R, override_num_blocks=7),
        on="k", left_start="s", left_end="e", right_start="s",
        right_end="e", left_cols=["id_a"], right_cols=["id_b"],
        max_interval_s=3600.0, bucket_s=600.0, num_partitions=9,
    ).to_pandas()
    assert set(zip(out2["id_a"], out2["id_b"])) == want
