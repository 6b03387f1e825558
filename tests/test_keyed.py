"""Keyed ordered analytics (stages/keyed.py) vs DuckDB window functions:
window-function family, latest-by-key compaction, interval coverage."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _events(rng, n=900, keys=7, tie_frac=0.2):
    # deliberately create ts ties (both within and across keys) so RANK,
    # the ROWS frame and the compaction tie-break all get exercised
    ts = 1_700_000_000_000_000 + rng.integers(0, 5_000, n) * 60_000_000
    return pd.DataFrame(
        {
            "eid": rng.permutation(n).astype(np.int64),
            "key": rng.integers(0, keys, n).astype(np.int64),
            "ts": ts.astype("datetime64[us]"),
            "cents": rng.integers(-500, 10_000, n).astype(np.int64),
        }
    )


@pytest.mark.parametrize("seed,parts", [(0, 1), (1, 5), (2, 16)])
def test_window_funcs_vs_duckdb(ray_session, seed, parts):
    import ray.data as rd

    from getml_community_ray.stages.keyed import keyed_window_funcs

    df = _events(np.random.default_rng(seed))
    got = (
        keyed_window_funcs(
            rd.from_pandas(df).repartition(4),
            key_col="key", ts_col="ts", value_col="cents", id_col="eid",
            num_partitions=parts,
        )
        .to_pandas()
        .sort_values(["key", "ts", "eid"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        SELECT eid, key, ts, cents,
               SUM(cents) OVER (PARTITION BY key ORDER BY ts, eid) AS cum_cents,
               ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts, eid) AS row_number,
               RANK() OVER (PARTITION BY key ORDER BY ts) AS rank,
               LAG(cents) OVER (PARTITION BY key ORDER BY ts, eid) AS lag_cents,
               cents - LAG(cents) OVER (PARTITION BY key ORDER BY ts, eid)
                   AS delta_cents
        FROM e ORDER BY key, ts, eid
        """
    ).df()
    assert len(got) == len(want)
    for c in ["eid", "key", "cents", "cum_cents", "row_number", "rank"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for c in ["lag_cents", "delta_cents"]:
        g, w = got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float)
        assert ((np.isnan(g) & np.isnan(w)) | (g == w)).all(), c
    assert (
        got["ts"].to_numpy().astype("datetime64[us]")
        == want["ts"].to_numpy().astype("datetime64[us]")
    ).all()


@pytest.mark.parametrize("seed", [0, 3])
def test_latest_by_key_vs_duckdb(ray_session, seed):
    import ray.data as rd

    from getml_community_ray.stages.keyed import latest_by_key

    df = _events(np.random.default_rng(seed), n=600, keys=40)
    got = (
        latest_by_key(
            rd.from_pandas(df).repartition(5),
            key_col="key", ts_col="ts", id_col="eid", num_partitions=4,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        SELECT eid, key, ts, cents FROM e
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY key ORDER BY ts DESC, eid DESC) = 1
        ORDER BY key
        """
    ).df()
    assert len(got) == len(want)
    for c in ["eid", "key", "cents"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_interval_coverage_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import interval_coverage

    rng = np.random.default_rng(7)
    n = 800
    s = rng.integers(0, 100_000, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 12, n).astype(np.int64),
            "s_us": s,
            # mix: overlapping, nested, zero-length and far-apart intervals
            "e_us": s + rng.integers(0, 5_000, n).astype(np.int64),
        }
    )
    got = (
        interval_coverage(
            rd.from_pandas(df).repartition(4),
            key_col="key", start_us_col="s_us", end_us_col="e_us",
            num_partitions=5,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("iv", df)
    want = con.execute(
        """
        WITH w AS (
          SELECT key, s_us AS s, e_us AS e,
                 MAX(e_us) OVER (PARTITION BY key ORDER BY s_us, e_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM iv
        )
        SELECT key,
               SUM(GREATEST(e - GREATEST(s, COALESCE(pmax, s)), 0)) AS covered,
               COUNT(*) AS n_intervals
        FROM w GROUP BY key ORDER BY key
        """
    ).df()
    assert len(got) == len(want)
    for c in ["key", "covered", "n_intervals"]:
        assert (
            got[c].to_numpy(dtype=np.int64) == want[c].to_numpy(dtype=np.int64)
        ).all(), c


def test_interval_coverage_brute(ray_session):
    """Exact union length vs a brute-force boolean-grid check."""
    import ray.data as rd

    from getml_community_ray.stages.keyed import interval_coverage

    rng = np.random.default_rng(11)
    n = 300
    s = rng.integers(0, 2_000, n).astype(np.int64)
    e = s + rng.integers(0, 300, n).astype(np.int64)
    key = rng.integers(0, 5, n).astype(np.int64)
    df = pd.DataFrame({"key": key, "s_us": s, "e_us": e})
    got = (
        interval_coverage(
            rd.from_pandas(df), key_col="key",
            start_us_col="s_us", end_us_col="e_us", num_partitions=3,
        )
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    for k in np.unique(key):
        grid = np.zeros(3_000, dtype=bool)
        for a, b in zip(s[key == k], e[key == k]):
            grid[a:b] = True
        assert got.loc[got["key"] == k, "covered"].iloc[0] == grid.sum(), k


def test_window_funcs_partition_invariance(ray_session):
    """Result identical across input block layouts and partition counts."""
    import ray.data as rd

    from getml_community_ray.stages.keyed import keyed_window_funcs

    df = _events(np.random.default_rng(5), n=400)
    outs = []
    for blocks, parts in [(1, 2), (7, 3), (3, 9)]:
        outs.append(
            keyed_window_funcs(
                rd.from_pandas(df).repartition(blocks),
                key_col="key", ts_col="ts", value_col="cents", id_col="eid",
                num_partitions=parts,
            )
            .to_pandas()
            .sort_values(["key", "ts", "eid"])
            .reset_index(drop=True)
        )
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_time_weighted_avg_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import time_weighted_avg

    rng = np.random.default_rng(13)
    n = 700
    df = pd.DataFrame(
        {
            "eid": rng.permutation(n).astype(np.int64),
            "key": rng.integers(0, 25, n).astype(np.int64),  # some 1-row keys
            "t_us": rng.integers(0, 10_000, n).astype(np.int64) * 1_000_000,
            "v": rng.integers(-200, 800, n).astype(np.int64),
        }
    )
    got = (
        time_weighted_avg(
            rd.from_pandas(df).repartition(4),
            key_col="key", ts_us_col="t_us", value_col="v", id_col="eid",
            num_partitions=5,
        )
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH w AS (
          SELECT key, t_us AS t, v,
                 LAG(t_us) OVER (PARTITION BY key ORDER BY t_us, eid) AS pt,
                 LAG(v) OVER (PARTITION BY key ORDER BY t_us, eid) AS pv
          FROM e
        )
        SELECT key,
               CAST(SUM(CASE WHEN pt IS NULL THEN 0
                             ELSE (v + pv) * (t - pt) END) AS BIGINT) AS area2,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS span_us,
               CAST(CAST(SUM(CASE WHEN pt IS NULL THEN 0
                                  ELSE (v + pv) * (t - pt) END) AS DOUBLE)
                    / 2.0 / (MAX(t) - MIN(t)) AS DOUBLE) AS twa
        FROM w GROUP BY key HAVING MAX(t) > MIN(t) ORDER BY key
        """
    ).df()
    assert len(got) == len(want)
    for c in ["key", "area2", "span_us"]:
        assert (got[c].to_numpy(dtype=np.int64)
                == want[c].to_numpy(dtype=np.int64)).all(), c
    assert (got["twa"].to_numpy() == want["twa"].to_numpy()).all()


def test_pivot_counts_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.groupby import pivot_counts

    rng = np.random.default_rng(17)
    n = 900
    cats_all = np.array(["a", "b", "c", "d", "zz"])
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 30, n).astype(np.int64),
            "cat": cats_all[rng.integers(0, len(cats_all), n)],
        }
    )
    # deliberately UNSORTED category list (exercises the argsort mapping)
    got = (
        pivot_counts(
            rd.from_pandas(df).repartition(5),
            key_col="key", cat_col="cat", categories=["c", "a", "d"],
        )
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        SELECT key,
               CAST(SUM(CASE WHEN cat = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS c_c,
               CAST(SUM(CASE WHEN cat = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
               CAST(SUM(CASE WHEN cat = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS c_d,
               CAST(SUM(CASE WHEN cat NOT IN ('c','a','d') THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_other
        FROM e GROUP BY key ORDER BY key
        """
    ).df()
    assert len(got) == len(want)
    for c in ["key", "c_c", "c_a", "c_d", "c_other"]:
        assert (got[c].to_numpy(dtype=np.int64)
                == want[c].to_numpy(dtype=np.int64)).all(), c


def _lttb_reference(t, v, n_out):
    """Straightforward per-point LTTB from the Steinarsson 2013 pseudocode
    (independent of the vectorized kernel): fixed buckets over the
    interior points, next-bucket centroid, earliest-max tie-break."""
    n = len(t)
    if n <= n_out:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    sel = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo = edges[i + 1]
        nhi = edges[i + 2] if i + 2 < len(edges) else n
        if nhi > nlo:
            cx = float(np.mean(t[nlo:nhi]))
            cy = float(np.mean(v[nlo:nhi]))
        else:
            cx, cy = float(t[n - 1]), float(v[n - 1])
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (t[a] - cx) * (v[j] - v[a]) - (t[a] - t[j]) * (cy - v[a])
            )
            if area > best_area:
                best, best_area = j, area
        sel.append(best)
        a = best
    sel.append(n - 1)
    return sel


def test_lttb_vs_reference_impl(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import lttb_downsample

    rng = np.random.default_rng(21)
    frames = []
    for k in range(4):
        n = int(rng.integers(40, 400))
        t = np.sort(rng.choice(10_000_000, size=n, replace=False)).astype(
            np.int64
        )
        v = rng.normal(0, 100, n)
        frames.append(pd.DataFrame({"key": k, "t_us": t, "v": v}))
    df = pd.concat(frames, ignore_index=True)

    n_out = 50
    got = (
        lttb_downsample(
            rd.from_pandas(df).repartition(3),
            key_col="key", ts_us_col="t_us", value_col="v", n_out=n_out,
            num_partitions=3,
        )
        .to_pandas().sort_values(["key", "t_us"]).reset_index(drop=True)
    )
    for k, sub in df.groupby("key"):
        t = sub["t_us"].to_numpy()
        v = sub["v"].to_numpy()
        sel = _lttb_reference(t, v, n_out)
        g = got[got["key"] == k]
        assert len(g) == min(len(t), n_out), k
        assert (g["t_us"].to_numpy() == t[sel]).all(), k
        assert (g["v"].to_numpy() == v[sel]).all(), k
    # endpoints always kept
    for k, sub in df.groupby("key"):
        g = got[got["key"] == k]
        assert g["t_us"].iloc[0] == sub["t_us"].min()
        assert g["t_us"].iloc[-1] == sub["t_us"].max()


@pytest.mark.parametrize("seed,parts", [(3, 1), (4, 7)])
def test_cusum_changepoint_vs_duckdb(ray_session, seed, parts):
    import ray.data as rd

    from getml_community_ray.stages.keyed import cusum_changepoint

    df = _events(np.random.default_rng(seed))
    got = (
        cusum_changepoint(
            rd.from_pandas(df).repartition(4),
            key_col="key", ts_col="ts", value_col="cents", id_col="eid",
            num_partitions=parts,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH w AS (
          SELECT key, ts, eid,
                 SUM(cents) OVER (PARTITION BY key ORDER BY ts, eid) AS pre,
                 ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts, eid) AS i,
                 SUM(cents) OVER (PARTITION BY key) AS tot,
                 COUNT(*) OVER (PARTITION BY key) AS n
          FROM e
        )
        SELECT key, n AS n_rows, ABS(n * pre - i * tot) AS cusum_stat,
               i AS cp_i, ts AS cp_ts
        FROM w
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY key ORDER BY ABS(n * pre - i * tot) DESC, ts, eid
        ) = 1
        ORDER BY key
        """
    ).df()
    assert len(got) == len(want)
    for c in ["key", "n_rows", "cusum_stat", "cp_i"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (
        got["cp_ts"].to_numpy("datetime64[us]")
        == want["cp_ts"].to_numpy("datetime64[us]")
    ).all()


def test_cusum_changepoint_brute(ray_session):
    """Independent per-key brute force: python ints (no overflow concerns),
    first index attaining the max statistic."""
    import ray.data as rd

    from getml_community_ray.stages.keyed import cusum_changepoint

    df = _events(np.random.default_rng(11), n=400, keys=5)
    got = (
        cusum_changepoint(
            rd.from_pandas(df),
            key_col="key", ts_col="ts", value_col="cents", id_col="eid",
            num_partitions=3,
        )
        .to_pandas()
        .set_index("key")
        .sort_index()
    )
    for k, g in df.sort_values(["ts", "eid"]).groupby("key"):
        v = [int(x) for x in g["cents"]]
        n, tot = len(v), sum(v)
        pre = 0
        best, best_i = -1, -1
        for i, x in enumerate(v, start=1):
            pre += x
            s = abs(n * pre - i * tot)
            if s > best:
                best, best_i = s, i
        row = got.loc[k]
        assert int(row["cusum_stat"]) == best
        assert int(row["cp_i"]) == best_i
        assert int(row["n_rows"]) == n


def test_cusum_bigint_fallback():
    """The object-dtype exact lane must agree with the int64 lane on data
    that fits both, and not overflow on data that doesn't."""
    import pandas as pd
    import pyarrow as pa

    from getml_community_ray.stages import keyed

    # craft values large enough that n * prefix overflows int64
    # big enough that bound = n * (max|prefix| + |total|) exceeds 2^62:
    # prefix_max = 300 * 2^50 ~ 3.4e17, bound ~ 2e20
    big = np.int64(1) << 50
    df = pd.DataFrame(
        {
            "eid": np.arange(600, dtype=np.int64),
            "key": np.repeat(np.arange(2, dtype=np.int64), 300),
            "ts": pd.to_datetime(
                1_700_000_000_000_000 + np.arange(600) * 1_000_000, unit="us"
            ),
            "cents": np.full(600, big, dtype=np.int64),
        }
    )
    # run just the partition kernel via the public op on a local dataset
    import ray.data as rd

    got = (
        keyed.cusum_changepoint(
            rd.from_pandas(df),
            key_col="key", ts_col="ts", value_col="cents", id_col="eid",
            num_partitions=1,
        )
        .to_pandas()
        .sort_values("key")
    )
    # constant series: n*pre - i*tot == 0 for every i -> stat 0, cp_i 1
    assert (got["cusum_stat"].to_numpy() == 0).all()
    assert (got["cp_i"].to_numpy() == 1).all()


@pytest.mark.parametrize("seed,parts", [(5, 1), (6, 9)])
def test_mad_anomaly_vs_duckdb(ray_session, seed, parts):
    import ray.data as rd

    from getml_community_ray.stages.keyed import mad_anomaly_counts

    df = _events(np.random.default_rng(seed), n=700, keys=6)
    got = (
        mad_anomaly_counts(
            rd.from_pandas(df).repartition(4),
            key_col="key", value_col="cents", k_num=3, k_den=2,
            num_partitions=parts,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH m AS (
          SELECT key, COUNT(*) AS n_rows,
                 CAST(2 * MEDIAN(cents) AS BIGINT) AS med2
          FROM e GROUP BY key
        ), d AS (
          SELECT e.key, ABS(2 * e.cents - m.med2) AS dev, m.med2, m.n_rows
          FROM e JOIN m USING (key)
        ), md AS (
          SELECT key, CAST(2 * MEDIAN(dev) AS BIGINT) AS mad22
          FROM d GROUP BY key
        )
        SELECT d.key, MIN(d.n_rows) AS n_rows, MIN(d.med2) AS med2,
               MIN(md.mad22) AS mad22,
               CAST(SUM(CASE WHEN 4 * d.dev > 3 * md.mad22
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        FROM d JOIN md USING (key)
        GROUP BY d.key ORDER BY d.key
        """
    ).df()
    assert len(got) == len(want)
    for c in ["key", "n_rows", "med2", "mad22", "n_anomalies"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_mad_anomaly_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import mad_anomaly_counts

    rng = np.random.default_rng(12)
    df = _events(rng, n=301, keys=3)  # odd-ish sizes hit both median arms
    got = (
        mad_anomaly_counts(
            rd.from_pandas(df), key_col="key", value_col="cents",
            num_partitions=2,
        )
        .to_pandas()
        .set_index("key")
        .sort_index()
    )
    for k, g in df.groupby("key"):
        v = np.sort(g["cents"].to_numpy(np.int64))
        n = len(v)
        med2 = int(v[(n - 1) // 2]) + int(v[n // 2])
        dev = np.sort(np.abs(2 * g["cents"].to_numpy(np.int64) - med2))
        mad22 = int(dev[(n - 1) // 2]) + int(dev[n // 2])
        n_anom = int(
            (4 * np.abs(2 * g["cents"].to_numpy(np.int64) - med2) > 3 * mad22).sum()
        )
        row = got.loc[k]
        assert int(row["med2"]) == med2
        assert int(row["mad22"]) == mad22
        assert int(row["n_anomalies"]) == n_anom
        assert int(row["n_rows"]) == n


@pytest.mark.parametrize("seed,parts", [(3, 1), (4, 6)])
def test_ohlc_bars_vs_duckdb(ray_session, seed, parts):
    import ray.data as rd

    from getml_community_ray.stages.keyed import ohlc_bars

    df = _events(np.random.default_rng(seed))
    got = (
        ohlc_bars(
            rd.from_pandas(df).repartition(5),
            key_col="key", ts_col="ts", value_col="cents", id_col="eid",
            bucket_s=3600, num_partitions=parts,
        )
        .to_pandas()
        .sort_values(["key", "bucket_us"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH w AS (
          SELECT key, (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
                 cents,
                 FIRST_VALUE(cents) OVER (
                     PARTITION BY key,
                       (epoch_us(ts) // 3600000000) * 3600000000
                     ORDER BY epoch_us(ts), eid) AS open_v,
                 FIRST_VALUE(cents) OVER (
                     PARTITION BY key,
                       (epoch_us(ts) // 3600000000) * 3600000000
                     ORDER BY epoch_us(ts) DESC, eid DESC) AS close_v
          FROM e
        )
        SELECT key, bucket_us, MIN(open_v) AS open_v, MAX(cents) AS high_v,
               MIN(cents) AS low_v, MIN(close_v) AS close_v,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_v
        FROM w GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"bucket_us": np.int64}), want.astype(got.dtypes.to_dict())
    )


def test_acf_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import acf_keyed

    df = _events(np.random.default_rng(7), n=600, keys=5)
    got = (
        acf_keyed(
            rd.from_pandas(df).repartition(4),
            key_col="key", ts_col="ts", value_col="cents", id_col="eid",
            lags=(1, 2, 5), num_partitions=4,
        )
        .to_pandas()
        .sort_values(["key", "lag"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    lag_sql = " UNION ALL ".join(
        f"""SELECT key, {L} AS lag, cents AS b,
            LAG(cents, {L}) OVER (PARTITION BY key ORDER BY ts, eid) AS a
            FROM e"""
        for L in (1, 2, 5)
    )
    want = con.execute(
        f"""
        SELECT key, CAST(lag AS BIGINT) AS lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
               CAST(SUM(a*a) AS BIGINT) AS saa,
               CAST(SUM(b*b) AS BIGINT) AS sbb,
               CAST(SUM(a*b) AS BIGINT) AS sab
        FROM ({lag_sql}) WHERE a IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_acf_overflow_guard(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import acf_keyed

    df = pd.DataFrame(
        {
            "eid": np.arange(4, dtype=np.int64),
            "key": np.zeros(4, dtype=np.int64),
            "ts": pd.to_datetime(
                np.arange(4) * 1_000_000, unit="us"
            ).astype("datetime64[us]"),
            "cents": np.full(4, 2**32, dtype=np.int64),  # v^2 = 2^64
        }
    )
    with pytest.raises(Exception, match="int64|OverflowError|pre-scale"):
        acf_keyed(
            rd.from_pandas(df), key_col="key", ts_col="ts",
            value_col="cents", id_col="eid", lags=(1,), num_partitions=1,
        ).to_pandas()


def test_gap_detect_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import gap_detect

    df = _events(np.random.default_rng(11), n=700, keys=6)
    got = (
        gap_detect(
            rd.from_pandas(df).repartition(4),
            key_col="key", ts_col="ts", id_col="eid",
            threshold_s=1800, num_partitions=4,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH d AS (
          SELECT key,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY key ORDER BY epoch_us(ts), eid) AS delta
          FROM e
        )
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(CASE WHEN delta > 1800000000 THEN 1 END), 0)
                    AS BIGINT) AS n_gaps,
               CAST(COALESCE(MAX(CASE WHEN delta > 1800000000 THEN delta END),
                    0) AS BIGINT) AS max_gap_us,
               CAST(COALESCE(SUM(CASE WHEN delta > 1800000000 THEN delta END),
                    0) AS BIGINT) AS total_gap_us
        FROM d GROUP BY 1 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_funnel_depth_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import funnel_depth

    rng = np.random.default_rng(13)
    n = 800
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 40, n).astype(np.int64),
            "ts": (
                1_700_000_000_000_000
                + rng.integers(0, 10_000, n) * 60_000_000
            ).astype("datetime64[us]"),
            "typ": rng.choice(["a", "b", "c", "x"], n),
        }
    )
    W = 3600 * 24
    got = (
        funnel_depth(
            rd.from_pandas(df).repartition(4),
            key_col="key", ts_col="ts", type_col="typ",
            steps=["a", "b", "c"], window_s=W, num_partitions=4,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    wus = W * 1_000_000
    want = con.execute(
        f"""
        WITH u1 AS (SELECT key, MIN(epoch_us(ts)) AS t1 FROM e
                    WHERE typ = 'a' GROUP BY 1),
        u2 AS (SELECT e.key, MIN(epoch_us(e.ts)) AS t2 FROM e
               JOIN u1 ON e.key = u1.key
               WHERE e.typ = 'b' AND epoch_us(e.ts) > u1.t1
                     AND epoch_us(e.ts) <= u1.t1 + {wus} GROUP BY 1),
        u3 AS (SELECT e.key, MIN(epoch_us(e.ts)) AS t3 FROM e
               JOIN u2 ON e.key = u2.key
               WHERE e.typ = 'c' AND epoch_us(e.ts) > u2.t2
                     AND epoch_us(e.ts) <= u2.t2 + {wus} GROUP BY 1),
        allu AS (SELECT DISTINCT key FROM e)
        SELECT a.key,
               CAST(CASE WHEN t1 IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS depth, t1, t2, t3
        FROM allu a LEFT JOIN u1 USING (key) LEFT JOIN u2 USING (key)
        LEFT JOIN u3 USING (key) ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_cohort_retention_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import cohort_retention

    rng = np.random.default_rng(17)
    n = 1000
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 60, n).astype(np.int64),
            "ts": (
                1_700_000_000_000_000
                + rng.integers(0, 40 * 86400, n) * 1_000_000
            ).astype("datetime64[us]"),
        }
    )
    wid = 604_800 * 1_000_000
    got = (
        cohort_retention(
            rd.from_pandas(df).repartition(5),
            key_col="key", ts_col="ts", bucket_s=604_800, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["cohort_us", "offset"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        f"""
        WITH f AS (SELECT key, MIN(epoch_us(ts) // {wid} * {wid}) AS coh
                   FROM e GROUP BY 1),
        a AS (SELECT DISTINCT key, epoch_us(ts) // {wid} * {wid} AS b FROM e)
        SELECT f.coh AS cohort_us,
               CAST((a.b - f.coh) // {wid} AS BIGINT) AS "offset",
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM a JOIN f USING (key) GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_threshold_episodes_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import threshold_episodes

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 25, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
            "ts": (
                1_700_000_000_000_000 + rng.integers(0, 10**7, n) * 1_000_000
            ).astype("datetime64[us]"),
            "v": rng.uniform(0, 100, n),
        }
    )
    got = (
        threshold_episodes(
            rd.from_pandas(df).repartition(6),
            key_col="key", ts_col="ts", id_col="eid", value_col="v",
            threshold=70.0, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["key", "episode_ix"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH f AS (
          SELECT key, epoch_us(ts) AS tus, eid, v, (v > 70.0) AS above,
                 ROW_NUMBER() OVER (PARTITION BY key ORDER BY tus, eid) AS rn,
                 ROW_NUMBER() OVER (PARTITION BY key, (v > 70.0)
                                    ORDER BY tus, eid) AS rn2
          FROM e
        ), g AS (SELECT * FROM f WHERE above),
        ep AS (
          SELECT key, MIN(tus) AS start_us, MAX(tus) AS end_us,
                 CAST(COUNT(*) AS BIGINT) AS n_events, MAX(v) AS v_max
          FROM g GROUP BY key, rn - rn2
        )
        SELECT key,
               ROW_NUMBER() OVER (PARTITION BY key ORDER BY start_us) - 1
                   AS episode_ix,
               start_us, end_us, n_events, v_max
        FROM ep ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_threshold_episodes_partition_invariance(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import threshold_episodes

    rng = np.random.default_rng(29)
    n = 800
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 8, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
            "ts": (
                1_700_000_000_000_000 + rng.integers(0, 10**6, n) * 1_000_000
            ).astype("datetime64[us]"),
            "v": rng.uniform(0, 10, n),
        }
    )

    def run(nparts, nhash):
        return (
            threshold_episodes(
                rd.from_pandas(df).repartition(nparts),
                key_col="key", ts_col="ts", id_col="eid", value_col="v",
                threshold=5.0, num_partitions=nhash,
            )
            .to_pandas()
            .sort_values(["key", "episode_ix"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1, 2), run(9, 5))


def test_xcorr_counts_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import xcorr_counts

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame(
        {
            "ts": (
                1_700_000_000_000_000 + rng.integers(0, 200 * 3600, n) * 1_000_000
            ).astype("datetime64[us]"),
            "typ": rng.choice(["a", "b", "c"], n),
        }
    )
    got = (
        xcorr_counts(
            rd.from_pandas(df).repartition(5),
            ts_col="ts", type_col="typ", type_x="a", type_y="b",
            bucket_s=3600, lags=(0, 2, 5),
        )
        .to_pandas().sort_values("lag").reset_index(drop=True)
    )
    # brute force
    tus = df["ts"].astype("int64").to_numpy()
    bkt = (tus // 3_600_000_000) * 3_600_000_000
    sel = df["typ"].isin(["a", "b"]).to_numpy()
    lo, hi = bkt[sel].min(), bkt[sel].max()
    n_b = int((hi - lo) // 3_600_000_000) + 1
    x = np.zeros(n_b, np.int64)
    y = np.zeros(n_b, np.int64)
    for t, b in zip(df["typ"], bkt):
        if t == "a":
            x[(b - lo) // 3_600_000_000] += 1
        elif t == "b":
            y[(b - lo) // 3_600_000_000] += 1
    for _, r in got.iterrows():
        k = int(r["lag"])
        a, c = x[: n_b - k] if k else x, y[k:] if k else y
        assert r["n"] == n_b - k
        assert r["sx"] == a.sum() and r["sy"] == c.sum()
        assert r["sxx"] == np.dot(a, a) and r["syy"] == np.dot(c, c)
        assert r["sxy"] == np.dot(a, c)
    assert list(got["lag"]) == [0, 2, 5]


def test_sax_words_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import sax_words

    rng = np.random.default_rng(37)
    n = 2500
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 20, n).astype(np.int64),
            "ts": (
                1_700_000_000_000_000
                + rng.integers(0, 20 * 86400, n) * 1_000_000
            ).astype("datetime64[us]"),
            "cents": rng.integers(0, 10000, n).astype(np.int64),
        }
    )
    bps = (2500, 5000, 7500)
    got = (
        sax_words(
            rd.from_pandas(df).repartition(6),
            key_col="key", ts_col="ts", cents_col="cents",
            word_s=86400, paa=4, breakpoints_cents=bps, num_partitions=4,
        )
        .to_pandas().sort_values(["key", "window_us"])
        .reset_index(drop=True)
    )
    # brute force
    wus, sus = 86400 * 10**6, 21600 * 10**6
    tus = df["ts"].astype("int64")
    agg = {}
    for k, t, c in zip(df["key"], tus, df["cents"]):
        w, s = (t // wus) * wus, (t % wus) // sus
        e = agg.setdefault((k, w), [[0, 0] for _ in range(4)])
        e[s][0] += c
        e[s][1] += 1
    rows = []
    for (k, w), segs in sorted(agg.items()):
        word = tot = 0
        for i, (s, cnt) in enumerate(segs):
            sym = 4 if cnt == 0 else sum(s > bp * cnt for bp in bps)
            word += sym * 5**i
            tot += cnt
        rows.append((k, w, word, tot))
    want = pd.DataFrame(rows, columns=["key", "window_us", "word",
                                       "n_events"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_interarrival_hist_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import interarrival_hist

    rng = np.random.default_rng(43)
    n = 1500
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 30, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
            "ts": (
                1_700_000_000_000_000 + rng.integers(0, 10**8, n)
            ).astype("datetime64[us]"),
        }
    )
    got = (
        interarrival_hist(
            rd.from_pandas(df).repartition(5),
            key_col="key", ts_col="ts", id_col="eid", num_partitions=4,
        )
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH d AS (
          SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY key ORDER BY epoch_us(ts), eid) AS delta
          FROM e
        )
        SELECT CAST(CASE WHEN delta = 0 THEN 0
                         ELSE LENGTH(BIN(delta)) END AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_deltas
        FROM d WHERE delta IS NOT NULL GROUP BY 1 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_transition_counts_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import transition_counts

    rng = np.random.default_rng(47)
    n = 1200
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 15, n).astype(np.int64),
            "eid": np.arange(n, dtype=np.int64),
            "ts": (
                1_700_000_000_000_000 + rng.integers(0, 10**7, n) * 1000
            ).astype("datetime64[us]"),
            "st": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    got = (
        transition_counts(
            rd.from_pandas(df).repartition(6),
            key_col="key", ts_col="ts", id_col="eid", state_col="st",
            num_partitions=4,
        )
        .to_pandas().sort_values(["from_state", "to_state"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH p AS (
          SELECT st AS to_state,
                 LAG(st) OVER (PARTITION BY key
                               ORDER BY epoch_us(ts), eid) AS from_state
          FROM e
        )
        SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
        FROM p WHERE from_state IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_seasonal_baseline_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.keyed import seasonal_baseline_anomalies

    rng = np.random.default_rng(59)
    n = 2000
    df = pd.DataFrame(
        {
            "typ": rng.choice(["x", "y"], n),
            "ts": (
                1_700_000_000_000_000
                + rng.integers(0, 30 * 86400, n) * 1_000_000
            ).astype("datetime64[us]"),
            "cents": rng.integers(0, 10000, n).astype(np.int64),
        }
    )
    got = (
        seasonal_baseline_anomalies(
            rd.from_pandas(df).repartition(5),
            type_col="typ", ts_col="ts", cents_col="cents",
            bucket_s=3600, period=24, threshold_cents=2000,
        )
        .to_pandas().reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute(
        """
        WITH b AS (
          SELECT typ, (epoch_us(ts) // 3600000000) % 24 AS phase, cents AS c
          FROM e
        ),
        p AS (SELECT typ, phase, CAST(SUM(c) AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM b GROUP BY 1, 2)
        SELECT b.typ, CAST(b.phase AS BIGINT) AS phase, p.n,
               p.s AS sum_cents,
               CAST(COALESCE(SUM(CASE WHEN ABS(b.c * p.n - p.s) > p.n * 2000
                                      THEN 1 END), 0) AS BIGINT)
                   AS n_anomalous
        FROM b JOIN p USING (typ, phase)
        GROUP BY 1, 2, 3, 4 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
