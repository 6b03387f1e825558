"""Gap-fill fixtures (FIXTURES.md F3): known dropped ticks, exact oracle."""

import numpy as np
import pyarrow as pa

from getml_community_ray.stages.gapfill import GapFiller, gapfill_group, infer_period_us

US = 1_000_000


def test_gapfill_group_basic():
    # grid period 10s, ticks 0..9, ticks 3 and 7 dropped; slight jitter
    period = 10 * US
    ks = np.array([0, 1, 2, 4, 5, 6, 8, 9], dtype=np.int64)
    jitter = np.array([0, 11, 23, 7, 19, 2, 31, 13], dtype=np.int64) * 1000
    t0 = 1_700_000_000 * US
    ts = t0 + ks * period + jitter
    v = np.array([1.0, 2.0, 3.0, 5.0, 6.0, 7.0, 9.0, 10.0])

    assert infer_period_us(ts) == period

    gts, ff, lin, filled = gapfill_group(ts, v)
    assert len(gts) == 10
    assert filled.sum() == 2
    assert bool(filled[3]) and bool(filled[7])
    # forward fill: missing tick 3 takes value at tick 2; tick 7 takes tick 6
    assert ff[3] == 3.0 and ff[7] == 7.0
    # linear interpolation between true observed points
    g3 = t0 + 3 * period
    expect3 = np.interp(g3, ts, v)
    assert lin[3] == expect3
    # observed ticks keep exact values
    np.testing.assert_array_equal(ff[~filled], v)
    np.testing.assert_array_equal(lin[~filled], v)


def test_gapfill_sparse_series():
    """>50% of ticks unobserved (the sf0.001 regime): the median delta is a
    multiple of the true period, so a median-based estimator builds a coarser
    grid. The min-delta-anchored estimator must still recover the base
    period — regression for the verified sf0.001 wrong answer."""
    period = 3600 * US  # hourly grid
    rng = np.random.default_rng(7)
    ks = np.flatnonzero(rng.random(400) < 0.35)  # ~65% of ticks missing
    # make sure at least one adjacent pair exists
    ks = np.union1d(ks, [10, 11])
    t0 = 1_700_000_000 * US
    ts = t0 + ks.astype(np.int64) * period
    assert np.median(np.diff(ts)) > period  # the old estimator's failure mode
    assert infer_period_us(ts) == period

    v = rng.normal(size=len(ks))
    gts, ff, lin, filled = gapfill_group(ts, v)
    assert len(gts) == ks[-1] - ks[0] + 1
    assert filled.sum() == len(gts) - len(ks)
    np.testing.assert_array_equal(ff[~filled], v)


def test_gapfill_sparse_with_jitter():
    """Sparse grid + <0.5% jitter: per-delta base estimates d/round(d/min)
    still median out to the true period."""
    period = 60 * US
    rng = np.random.default_rng(13)
    ks = np.union1d(np.flatnonzero(rng.random(300) < 0.4), [5, 6])
    jitter = rng.integers(-period // 250, period // 250, size=len(ks))
    ts = 1_600_000_000 * US + ks.astype(np.int64) * period + jitter
    assert infer_period_us(ts) == period


def test_gapfiller_stage_on_synthetic_corpus():
    from getml_community_ray.sources.synth import generate_shard

    tbl = generate_shard(0, 1, 4000, n_sources=3, seed=11, with_tokens=False)
    stage = GapFiller(source_col="source", ts_col="event_ts", value_col="n_tok")
    out = stage(tbl)
    src = np.asarray(out["source"]).astype(str)
    filled = np.asarray(out["was_filled"])
    # ~2% dropped ticks per source -> some fills, none at the ends
    assert 0 < filled.mean() < 0.06
    # grid is strictly regular per source
    gts = np.asarray(out["grid_ts"].cast(pa.int64()))
    for s in np.unique(src):
        d = np.diff(gts[src == s])
        assert len(np.unique(d)) == 1
    # no NaNs in filled columns
    assert np.isfinite(np.asarray(out["n_tok_ff"])).all()
    assert np.isfinite(np.asarray(out["n_tok_lin"])).all()


def test_gapfill_pipeline(ray_session):
    import ray.data as rd

    from getml_community_ray.sources.synth import generate_shard
    from getml_community_ray.stages.gapfill import gapfill

    tbl = generate_shard(0, 1, 3000, n_sources=4, seed=3, with_tokens=False)
    ds = rd.from_arrow(tbl)
    out = gapfill(ds, num_partitions=4).to_pandas()
    assert {"source", "grid_ts", "n_tok_ff", "n_tok_lin", "was_filled"} == set(
        out.columns
    )
    # distributed result == single-batch stage result (order-insensitive)
    stage = GapFiller(source_col="source", ts_col="event_ts", value_col="n_tok")
    expected = stage(tbl).to_pandas()
    a = out.sort_values(["source", "grid_ts"]).reset_index(drop=True)
    b = expected.sort_values(["source", "grid_ts"]).reset_index(drop=True)
    assert a.equals(b)
