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
