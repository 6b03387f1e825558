"""Clustered (boundary-only-shuffle) lanes must equal the unclustered lanes
exactly on the event-time-clustered synthetic corpus, and must reject
unsorted input instead of silently double-counting."""

import numpy as np
import pandas as pd
import pytest

from getml_community_ray.pipelines.rollup import (
    RollupConfig,
    rollup_decomposable_clustered_long,
    rollup_decomposable_long,
    rollup_holistic_clustered_long,
    rollup_holistic_long,
)

HOL_AGGS = [
    "count", "sum", "avg", "min", "max", "median", "q90", "stddev", "mode",
    "count_distinct", "first", "last", "trend", "ewma_1h",
]


def _sorted_df(ds):
    df = ds.to_pandas()
    key = [c for c in ("tier", "source", "bucket_ts") if c in df.columns]
    return df.sort_values(key).reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    from getml_community_ray.sources.synth import generate_sequences

    d = str(tmp_path_factory.mktemp("clustered_corpus"))
    generate_sequences(d, n_rows=60_000, n_shards=6, seed=7, with_tokens=False)
    return d


def _read(corpus):
    import ray.data as rd

    return rd.read_parquet(corpus, columns=["source", "event_ts", "n_tok"])


def test_decomposable_clustered_equals_unclustered(ray_session, corpus):
    cfg = RollupConfig(retention={}, num_partitions=8, combine_batch_size=8192,
                       cache_intermediates=False)
    a = _sorted_df(rollup_decomposable_long(_read(corpus), cfg))
    b = _sorted_df(rollup_decomposable_clustered_long(_read(corpus), cfg))
    assert len(a) == len(b)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, rtol=0, atol=0, equal_nan=True), c
        else:
            assert (av == bv).all(), c


def test_holistic_clustered_equals_unclustered(ray_session, corpus):
    cfg = RollupConfig(aggs=HOL_AGGS, retention={}, num_partitions=8,
                       combine_batch_size=8192, cache_intermediates=False)
    a = _sorted_df(rollup_holistic_long(_read(corpus), cfg))
    b = _sorted_df(rollup_holistic_clustered_long(_read(corpus), cfg))
    assert len(a) == len(b)
    assert sorted(a.columns) == sorted(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, rtol=1e-12, atol=1e-12, equal_nan=True), c
        else:
            assert (av == bv).all(), c


def test_clustered_rejects_unsorted(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame(
        {
            "source": rng.choice(["a", "b", "c"], n),  # interleaved sources
            "event_ts": (1_700_000_000_000_000 + rng.integers(0, 10**9, n)).astype(
                "datetime64[us]"
            ),
            "n_tok": rng.integers(8, 100, n).astype(np.int32),
        }
    )
    cfg = RollupConfig(retention={}, num_partitions=4, combine_batch_size=2048,
                       cache_intermediates=False)
    with pytest.raises(Exception, match="clustered"):
        rollup_decomposable_clustered_long(
            rd.from_pandas(df), cfg
        ).count()


@pytest.mark.parametrize("seed,shards", [(1, 3), (13, 10)])
def test_clustered_equality_more_layouts(ray_session, tmp_path_factory, seed, shards):
    """Clustered == unclustered across different shard layouts/seeds."""
    from getml_community_ray.sources.synth import generate_sequences

    d = str(tmp_path_factory.mktemp(f"cl_{seed}_{shards}"))
    generate_sequences(d, n_rows=30_000, n_shards=shards, seed=seed,
                       with_tokens=False)
    cfg = RollupConfig(retention={}, num_partitions=5,
                       cache_intermediates=False)
    a = _sorted_df(rollup_decomposable_long(_read(d), cfg))
    b = _sorted_df(rollup_decomposable_clustered_long(_read(d), cfg))
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, rtol=0, atol=0, equal_nan=True), c
        else:
            assert (av == bv).all(), c


def test_clustered_single_source_and_tiny(ray_session, tmp_path_factory):
    """Edge shapes: one source; tiny corpus smaller than one bucket."""
    import pandas as pd
    import ray.data as rd

    # single source, ts-sorted
    n = 5000
    ts = (1_700_000_000_000_000 + np.arange(n, dtype=np.int64) * 7_000_000)
    df = pd.DataFrame(
        {
            "source": np.repeat("only", n),
            "event_ts": ts.astype("datetime64[us]"),
            "n_tok": (np.arange(n) % 300 + 8).astype(np.int32),
        }
    )
    cfg = RollupConfig(retention={}, num_partitions=4, cache_intermediates=False)
    a = _sorted_df(rollup_decomposable_long(rd.from_pandas(df, override_num_blocks=4), cfg))
    b = _sorted_df(
        rollup_decomposable_clustered_long(rd.from_pandas(df, override_num_blocks=4), cfg)
    )
    assert len(a) == len(b)
    assert np.allclose(
        a.select_dtypes("number").to_numpy(),
        b.select_dtypes("number").to_numpy(),
        equal_nan=True,
    )

    tiny = df.head(3)
    at = _sorted_df(rollup_decomposable_long(rd.from_pandas(tiny), cfg))
    bt = _sorted_df(rollup_decomposable_clustered_long(rd.from_pandas(tiny), cfg))
    assert len(at) == len(bt) == 3 * 1  # 3 tiers x 1 bucket each


def test_file_overlap_guard(ray_session, tmp_path_factory):
    """An overlapping (late/re-emitted) shard must trip the footer-stats
    guard; with source_paths passed, the lane falls back to the unclustered
    merge and the result stays exact."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from getml_community_ray.stages.rollup import clustered_files_nonoverlapping

    d = str(tmp_path_factory.mktemp("overlap"))
    t0 = 1_700_000_000_000_000
    n = 4000

    def shard(offset_us, path):
        ts = (t0 + offset_us + np.arange(n, dtype=np.int64) * 5_000_000)
        tbl = pa.table(
            {
                "source": pa.array(np.repeat("s0", n)),
                "event_ts": pa.array(ts).cast(pa.timestamp("us")),
                "n_tok": pa.array((np.arange(n) % 90 + 8).astype(np.int32)),
            }
        )
        pq.write_table(tbl, path, row_group_size=2000)

    a, b = os.path.join(d, "a.parquet"), os.path.join(d, "b.parquet")
    shard(0, a)
    shard(n * 5_000_000 // 2, b)  # second shard overlaps the first's tail
    assert not clustered_files_nonoverlapping([a, b], ts_col="event_ts")

    # disjoint shards pass the guard
    c = os.path.join(d, "c.parquet")
    shard(n * 5_000_000 + 1, c)
    assert clustered_files_nonoverlapping([a, c], ts_col="event_ts")

    cfg = RollupConfig(retention={}, num_partitions=4, cache_intermediates=False)
    read = lambda: rd.read_parquet([a, b])  # noqa: E731
    want = _sorted_df(rollup_decomposable_long(read(), cfg))
    got = _sorted_df(
        rollup_decomposable_clustered_long(read(), cfg, source_paths=[a, b])
    )
    assert len(want) == len(got)
    for col in want.columns:
        av, bv = want[col].to_numpy(), got[col].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, rtol=0, atol=0, equal_nan=True), col
        else:
            assert (av == bv).all(), col


def test_validate_rejects_overlapping_runs_same_batch():
    """Two time-overlapping runs of one source inside a single batch must
    raise instead of double-emitting interior buckets."""
    from getml_community_ray.stages.rollup import _validate_clustered

    ts = np.array([0, 10, 20, 5, 6, 7, 15, 25], dtype=np.int64) * 10**6
    src = np.array(["a", "a", "a", "b", "b", "a", "a", "a"])
    with pytest.raises(ValueError, match="overlap"):
        _validate_clustered(src, ts)

    # non-overlapping split runs are fine
    ts2 = np.array([0, 10, 20, 5, 6, 30, 40, 50], dtype=np.int64) * 10**6
    _validate_clustered(src, ts2)


def test_fused_lanes_equal_two_pass(corpus, ray_session):
    """The fused single-pass lanes (vouched clustered layout, post-hoc
    boundary-interval verification) must equal the two-pass clustered
    lanes exactly."""
    import glob

    from getml_community_ray.pipelines.rollup import (
        read_clustered_paths,
        rollup_decomposable_clustered_fused,
        rollup_holistic_clustered_fused,
    )

    paths = sorted(glob.glob(f"{corpus}/*.parquet"))
    cols = ["source", "event_ts", "n_tok"]

    cfg = RollupConfig(
        retention={}, num_partitions=4, cache_intermediates=False,
        assume_clustered=True,
    )
    a = _sorted_df(rollup_decomposable_clustered_fused(paths, cfg))
    b = _sorted_df(
        rollup_decomposable_clustered_long(
            read_clustered_paths(paths, columns=cols), cfg
        )
    )
    pd.testing.assert_frame_equal(a, b)

    cfg2 = RollupConfig(
        aggs=HOL_AGGS, retention={}, num_partitions=4,
        cache_intermediates=False, assume_clustered=True,
    )
    c = _sorted_df(rollup_holistic_clustered_fused(paths, cfg2))
    d = _sorted_df(
        rollup_holistic_clustered_long(
            read_clustered_paths(paths, columns=cols), cfg2
        )
    )
    pd.testing.assert_frame_equal(c, d)


def test_fused_vouch_violation_fails_loudly(tmp_path, ray_session):
    """assume_clustered=True on a corpus whose per-source ranges DO overlap
    across files must raise (post-hoc boundary-interval check), never
    silently double-emit interior buckets."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from getml_community_ray.pipelines.rollup import (
        rollup_decomposable_clustered_fused,
    )

    d = str(tmp_path)

    def shard(path, t0):
        n = 5000
        ts = (np.arange(n, dtype=np.int64) * 1_000_000 + t0).astype(
            "datetime64[us]"
        )
        pq.write_table(
            pa.table(
                {
                    "source": pa.array(["s0"] * n),
                    "event_ts": pa.array(ts),
                    "n_tok": pa.array(np.arange(n, dtype=np.int32)),
                }
            ),
            path,
        )

    a, b = os.path.join(d, "a.parquet"), os.path.join(d, "b.parquet")
    shard(a, 0)
    shard(b, 1_000_000_000)  # overlaps a's interior (a spans ~5000s)

    cfg = RollupConfig(
        retention={}, num_partitions=2, cache_intermediates=False,
        assume_clustered=True,
    )
    with pytest.raises(ValueError, match="overlap"):
        rollup_decomposable_clustered_fused([a, b], cfg).count()


def test_fused_row_group_split_equal(tmp_path, ray_session):
    """A file bigger than max_task_rows splits into row-group spans; a
    span cut inside a source-run must produce identical results (cut
    buckets become boundary on both sides and merge exactly)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from getml_community_ray.pipelines.rollup import (
        _fused_task_items,
        rollup_decomposable_clustered_fused,
        rollup_decomposable_long,
        rollup_holistic_clustered_fused,
        rollup_holistic_long,
    )

    # one file, two sorted source runs, tiny row groups
    n = 6000
    half = n // 2
    ts = np.concatenate(
        [np.arange(half), np.arange(half)]
    ) * 7_000_000 + 1_000_000_000
    src = np.array(["a"] * half + ["b"] * half)
    p = os.path.join(str(tmp_path), "big.parquet")
    pq.write_table(
        pa.table(
            {
                "source": pa.array(src),
                "event_ts": pa.array(ts.astype("datetime64[us]")),
                "n_tok": pa.array((np.arange(n) * 13 % 97).astype(np.int32)),
            }
        ),
        p,
        row_group_size=500,
    )

    cfg = RollupConfig(
        retention={}, num_partitions=3, cache_intermediates=False,
        assume_clustered=True, max_task_rows=1200,
    )
    items = _fused_task_items([p], cfg.max_task_rows)
    assert len(items) >= 4  # the file actually split

    want = _sorted_df(rollup_decomposable_long(rd.read_parquet(p), cfg))
    got = _sorted_df(rollup_decomposable_clustered_fused([p], cfg))
    pd.testing.assert_frame_equal(got, want)

    cfg2 = RollupConfig(
        aggs=HOL_AGGS, retention={}, num_partitions=3,
        cache_intermediates=False, assume_clustered=True, max_task_rows=1200,
    )
    want2 = _sorted_df(rollup_holistic_long(rd.read_parquet(p), cfg2))
    got2 = _sorted_df(rollup_holistic_clustered_fused([p], cfg2))
    pd.testing.assert_frame_equal(got2, want2)


def test_rewrite_clustered_enables_fused_auto(ray_session, tmp_path_factory):
    """The interleaved bench layout fails the footer guard; after
    rewrite_clustered the guard PROVES the layout (no vouch) and the fused
    lane matches the sort-based lane on the original shards; every column
    (tokens included) round-trips byte-equal."""
    import glob
    import zlib

    import pyarrow.parquet as pq

    from getml_community_ray.pipelines.rollup import (
        rewrite_clustered,
        rollup_decomposable_clustered_fused,
    )
    from getml_community_ray.sources.synth import generate_sequences
    from getml_community_ray.stages.rollup import (
        clustered_files_nonoverlapping,
    )

    src = str(tmp_path_factory.mktemp("rw_src"))
    generate_sequences(src, n_rows=30_000, n_shards=5, seed=23,
                       with_tokens=True)
    src_paths = sorted(glob.glob(f"{src}/*.parquet"))
    assert not clustered_files_nonoverlapping(src_paths, ts_col="event_ts")

    out_dir = str(tmp_path_factory.mktemp("rw_out"))
    manifest = rewrite_clustered(
        src_paths, out_dir, bucket_s=6 * 3600.0
    ).to_pandas()
    new_paths = sorted(glob.glob(f"{out_dir}/*.parquet"))
    assert sorted(manifest.path) == new_paths
    n_src = sum(pq.ParquetFile(p).metadata.num_rows for p in src_paths)
    assert manifest.rows.sum() == n_src
    assert clustered_files_nonoverlapping(new_paths, ts_col="event_ts")

    # fused lane now runs on "auto" — no vouch — and matches the
    # sort-based lane over the ORIGINAL shards
    cfg_auto = RollupConfig(retention={}, num_partitions=8,
                            cache_intermediates=False)  # assume="auto"
    a = _sorted_df(rollup_decomposable_clustered_fused(new_paths, cfg_auto))
    b = _sorted_df(rollup_decomposable_long(_read(src), cfg_auto))
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, rtol=0, atol=0, equal_nan=True), c
        else:
            assert (av == bv).all(), c

    # token byte-equality through the rewrite
    def tok_crc(paths):
        acc = {}
        for p in paths:
            t = pq.read_table(p, columns=["doc_id", "tokens"])
            ids = t["doc_id"].to_pylist()
            for i, arr in enumerate(t["tokens"].to_pylist()):
                acc[ids[i]] = zlib.crc32(np.asarray(arr, np.int32).tobytes())
        return acc
    assert tok_crc(src_paths) == tok_crc(new_paths)


def test_both_fused_equals_single_lanes(corpus, ray_session):
    """rollup_both_clustered_fused (one decode feeding both kernels) must
    be bit-equal to running the two fused lanes separately."""
    import glob

    from getml_community_ray.pipelines.rollup import (
        rollup_both_clustered_fused,
        rollup_decomposable_clustered_fused,
        rollup_holistic_clustered_fused,
    )

    paths = sorted(glob.glob(f"{corpus}/*.parquet"))
    cfg_d = RollupConfig(
        retention={}, num_partitions=4, cache_intermediates=False,
        assume_clustered=True,
    )
    cfg_h = RollupConfig(
        aggs=HOL_AGGS, retention={}, num_partitions=4,
        cache_intermediates=False, assume_clustered=True,
    )
    both_d, both_h = rollup_both_clustered_fused(paths, cfg_d, cfg_h)
    pd.testing.assert_frame_equal(
        _sorted_df(both_d),
        _sorted_df(rollup_decomposable_clustered_fused(paths, cfg_d)),
    )
    pd.testing.assert_frame_equal(
        _sorted_df(both_h),
        _sorted_df(rollup_holistic_clustered_fused(paths, cfg_h)),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_holistic_tiled_kernel_bit_equal(seed):
    """Cache-tiled interior/states kernels must be bit-identical to the
    untiled kernel on adversarial layouts: runs spanning many tiles,
    single-row runs, duplicate values, buckets at tile cuts."""
    import pyarrow as pa

    from getml_community_ray.stages.rollup import HolisticClustered

    rng = np.random.default_rng(seed)
    rows = []
    t0 = 1_600_000_000_000_000
    for s in range(rng.integers(2, 6)):
        n = int(rng.integers(1, 4000))
        ts = t0 + np.cumsum(rng.integers(0, 90_000_000, size=n))
        vals = rng.integers(0, 40, size=n)
        rows.append((f"src{s}", ts, vals))
    src = np.concatenate([[s] * len(ts) for s, ts, _ in rows])
    ts = np.concatenate([ts for _, ts, _ in rows])
    vals = np.concatenate([v for _, _, v in rows]).astype(np.float64)
    batch = pa.table(
        {
            "source": pa.array(src),
            "event_ts": pa.array(ts).cast(pa.timestamp("us")),
            "n_tok": pa.array(vals),
        }
    )
    kw = dict(
        source_col="source", ts_col="event_ts", value_col="n_tok",
        tiers={"1m": 60, "1h": 3600, "1d": 86400}, aggs=HOL_AGGS,
        num_partitions=16,
    )
    un = HolisticClustered(**kw, tile_rows=10**9)
    ti = HolisticClustered(**kw, tile_rows=64)
    assert un.interior(batch).equals(ti.interior(batch))
    a = un.states(batch).to_pandas()
    b = ti.states(batch).to_pandas()
    key = list(a.columns)
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_decomposable_tiled_kernel_bit_equal(seed):
    """Tiled fast-path partials must be bit-identical to the untiled
    kernel (same groups, same order, same _boundary flags)."""
    import pyarrow as pa

    from getml_community_ray.stages.rollup import tiered_partials_clustered

    rng = np.random.default_rng(100 + seed)
    rows = []
    t0 = 1_600_000_000_000_000
    for s in range(rng.integers(2, 6)):
        n = int(rng.integers(1, 4000))
        ts = t0 + np.cumsum(rng.integers(0, 90_000_000, size=n))
        vals = rng.integers(0, 40, size=n)
        rows.append((f"src{s}", ts, vals))
    src = np.concatenate([[s] * len(ts) for s, ts, _ in rows])
    ts = np.concatenate([ts for _, ts, _ in rows])
    vals = np.concatenate([v for _, _, v in rows]).astype(np.float64)
    batch = pa.table(
        {
            "source": pa.array(src),
            "event_ts": pa.array(ts).cast(pa.timestamp("us")),
            "n_tok": pa.array(vals),
        }
    )
    kw = dict(
        source_col="source", ts_col="event_ts", value_col="n_tok",
        tiers=[("1m", 60), ("1h", 3600), ("1d", 86400)], first_last=True,
    )
    un = tiered_partials_clustered(batch, **kw, tile_rows=10**9)
    ti = tiered_partials_clustered(batch, **kw, tile_rows=64)
    assert un.combine_chunks().equals(ti.combine_chunks())


def test_fused_sink_equals_plasma(ray_session, corpus, tmp_path_factory):
    """sink_dir mode: tasks write the product to partitioned Parquet inside
    the task and return a manifest — reading the sink back must equal the
    non-sink fused lane bit-for-bit, and the manifest row counts must sum
    to the product row count (decomposable + holistic, sharded side
    channel)."""
    import glob
    import ray.data as rd

    from getml_community_ray.pipelines.rollup import (
        rollup_decomposable_clustered_fused,
        rollup_holistic_clustered_fused,
    )

    paths = sorted(glob.glob(f"{corpus}/*.parquet"))

    for lane_fn, extra in [
        (rollup_decomposable_clustered_fused, {}),
        (rollup_holistic_clustered_fused, {"aggs": HOL_AGGS}),
    ]:
        base_cfg = RollupConfig(
            retention={}, num_partitions=8, cache_intermediates=False,
            assume_clustered=True, side_channel_shards=3, **extra,
        )
        want = _sorted_df(lane_fn(paths, base_cfg))

        sink = str(tmp_path_factory.mktemp(f"sink_{lane_fn.__name__}"))
        sink_cfg = RollupConfig(
            retention={}, num_partitions=8, cache_intermediates=False,
            assume_clustered=True, side_channel_shards=3, sink_dir=sink,
            **extra,
        )
        manifest = lane_fn(paths, sink_cfg).to_pandas()
        assert set(manifest.columns) == {"file", "rows"}
        got = _sorted_df(rd.read_parquet(sorted(glob.glob(f"{sink}/*.parquet"))))
        assert int(manifest["rows"].sum()) == len(got)
        assert len(got) == len(want)
        got = got[want.columns]
        for c in want.columns:
            av, bv = want[c].to_numpy(), got[c].to_numpy()
            if av.dtype.kind == "f":
                assert np.allclose(av, bv, rtol=0, atol=0, equal_nan=True), c
            else:
                assert (av == bv).all(), c


def test_both_lane_sink_inband_equals_separate(corpus, ray_session,
                                               tmp_path_factory):
    """Sink-mode both-lane fusion (one decode feeds both kernels, in-band
    side channel) must write sinks bit-equal to the two separate in-band
    sink lanes."""
    import glob

    import pandas as pd
    import ray.data as rd

    from getml_community_ray.pipelines.rollup import (
        rollup_both_clustered_fused,
        rollup_decomposable_clustered_fused,
        rollup_holistic_clustered_fused,
    )

    paths = sorted(glob.glob(f"{corpus}/*.parquet"))
    dirs = {k: str(tmp_path_factory.mktemp(f"both_ib_{k}"))
            for k in ("d1", "h1", "d2", "h2")}

    def mk(sink, **extra):
        return RollupConfig(
            retention={}, num_partitions=8, cache_intermediates=False,
            assume_clustered=True, sink_dir=sink, **extra,
        )

    rollup_decomposable_clustered_fused(paths, mk(dirs["d1"])).to_pandas()
    rollup_holistic_clustered_fused(
        paths, mk(dirs["h1"], aggs=HOL_AGGS)
    ).to_pandas()
    dd, hh = rollup_both_clustered_fused(
        paths, mk(dirs["d2"]), mk(dirs["h2"], aggs=HOL_AGGS)
    )
    md, mh = dd.to_pandas(), hh.to_pandas()
    assert set(md.columns) == {"file", "rows"}
    assert set(mh.columns) == {"file", "rows"}

    def read_sink(d):
        return _sorted_df(rd.read_parquet(sorted(glob.glob(f"{d}/*.parquet"))))

    for a, b, m in ((dirs["d1"], dirs["d2"], md), (dirs["h1"], dirs["h2"], mh)):
        da, db = read_sink(a), read_sink(b)
        assert int(m["rows"].sum()) == len(db)
        pd.testing.assert_frame_equal(da, db)
