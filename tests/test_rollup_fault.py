"""Exactly-once fused-lane output under worker crashes.

Every fused task's FIRST attempt is killed (os._exit) immediately AFTER its
side-channel put — boundary rows already pushed to the accumulator /
state object already registered — the worst point for duplicate emission.
Ray retries the task; the keyed put overwrites; the output must be
bit-equal to a crash-free run."""
import glob

import numpy as np
import pytest

from getml_community_ray.pipelines.rollup import (
    RollupConfig,
    rollup_decomposable_clustered_fused,
    rollup_holistic_clustered_fused,
)

HOL_AGGS = ["count", "sum", "median", "q90", "count_distinct", "first",
            "last", "mode"]


def _sorted_df(ds):
    df = ds.to_pandas()
    key = [c for c in ("tier", "source", "bucket_ts") if c in df.columns]
    return df.sort_values(key).reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    from getml_community_ray.sources.synth import generate_sequences

    d = str(tmp_path_factory.mktemp("fault_corpus"))
    generate_sequences(d, n_rows=40_000, n_shards=4, seed=19,
                       with_tokens=False)
    return d


def _assert_equal(a, b):
    assert len(a) == len(b)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, rtol=0, atol=0, equal_nan=True), c
        else:
            assert (av == bv).all(), c


@pytest.mark.parametrize("lane", ["decomp", "holistic"])
def test_fused_lane_exactly_once_under_crashes(
    ray_session, corpus, tmp_path_factory, lane
):
    paths = sorted(glob.glob(f"{corpus}/*.parquet"))
    inject = str(tmp_path_factory.mktemp(f"inject_{lane}"))
    if lane == "decomp":
        clean_cfg = RollupConfig(
            retention={}, num_partitions=8, cache_intermediates=False,
            assume_clustered=True,
        )
        crash_cfg = RollupConfig(
            retention={}, num_partitions=8, cache_intermediates=False,
            assume_clustered=True, fault_inject_dir=inject,
        )
        fn = rollup_decomposable_clustered_fused
    else:
        clean_cfg = RollupConfig(
            aggs=HOL_AGGS, retention={}, num_partitions=8,
            cache_intermediates=False, assume_clustered=True,
        )
        crash_cfg = RollupConfig(
            aggs=HOL_AGGS, retention={}, num_partitions=8,
            cache_intermediates=False, assume_clustered=True,
            fault_inject_dir=inject,
        )
        fn = rollup_holistic_clustered_fused
    clean = _sorted_df(fn(paths, clean_cfg))
    crashed = _sorted_df(fn(paths, crash_cfg))
    # every task item crashed exactly once
    assert len(glob.glob(f"{inject}/*")) == 4
    _assert_equal(clean, crashed)


@pytest.mark.parametrize("lane", ["decomp", "holistic"])
def test_inband_sink_exactly_once_under_crashes(
    ray_session, corpus, tmp_path_factory, lane
):
    """In-band side channel (sink mode): every task's first attempt is
    killed AFTER its sink file is written but before its return commits —
    the retry must overwrite the file (atomic rename) and replace the
    return blocks, so the sink contents are bit-equal to a crash-free
    in-band run."""
    import ray.data as rd

    paths = sorted(glob.glob(f"{corpus}/*.parquet"))
    inject = str(tmp_path_factory.mktemp(f"ib_inject_{lane}"))
    extra = {} if lane == "decomp" else {"aggs": HOL_AGGS}
    fn = (rollup_decomposable_clustered_fused if lane == "decomp"
          else rollup_holistic_clustered_fused)

    sinks = {}
    for tag, fault in (("clean", None), ("crash", inject)):
        sink = str(tmp_path_factory.mktemp(f"ib_sink_{lane}_{tag}"))
        cfg = RollupConfig(
            retention={}, num_partitions=8, cache_intermediates=False,
            assume_clustered=True, sink_dir=sink, inband_side_channel=True,
            fault_inject_dir=fault, **extra,
        )
        manifest = fn(paths, cfg).to_pandas()
        assert set(manifest.columns) == {"file", "rows"}
        df = _sorted_df(rd.read_parquet(sorted(glob.glob(f"{sink}/*.parquet"))))
        assert int(manifest["rows"].sum()) == len(df)
        sinks[tag] = df

    assert len(glob.glob(f"{inject}/*")) == 4  # every item crashed once
    _assert_equal(sinks["clean"], sinks["crash"])
