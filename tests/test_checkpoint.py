"""Checkpoint/resume fixtures (FIXTURES.md F6): interrupted runs resume,
partitions skip on matching lineage, outputs identical to uninterrupted."""

import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from getml_community_ray.pipelines.rollup import RollupConfig
from getml_community_ray.state.checkpoint import Manifest, checkpointed_rollup


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    from getml_community_ray.sources.synth import generate_sequences

    d = str(tmp_path_factory.mktemp("ckpt_corpus"))
    generate_sequences(d, n_rows=10_000, n_shards=4, seed=21)
    return d


def _read_all(out_dir: str) -> pd.DataFrame:
    frames = [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{out_dir}/part-*.parquet"))]
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values(["tier", "source", "bucket_ts"]).reset_index(drop=True)


def test_checkpoint_run_resume_identical(corpus_dir, tmp_path):
    cfg = RollupConfig(num_partitions=8)
    out1 = str(tmp_path / "run1")
    res1 = checkpointed_rollup(corpus_dir, out1, cfg)
    assert sorted(res1["computed"] + res1["skipped"]) == list(range(8))
    full = _read_all(out1)
    assert len(full) > 0

    # rerun: everything skips (lineage matches)
    res2 = checkpointed_rollup(corpus_dir, out1, cfg)
    assert res2["computed"] == []
    assert sorted(res2["skipped"]) == list(range(8))

    # simulate a crash: drop two partition files + their manifest entries
    m = Manifest(out1)
    victims = [p for p in res1["computed"][:2]]
    for p in victims:
        f = os.path.join(out1, m.records[p].file)
        if os.path.exists(f):
            os.remove(f)
    res3 = checkpointed_rollup(corpus_dir, out1, cfg)
    assert sorted(res3["computed"]) == sorted(victims)

    # resumed output == a fresh uninterrupted run
    out2 = str(tmp_path / "run2")
    checkpointed_rollup(corpus_dir, out2, cfg)
    pd.testing.assert_frame_equal(_read_all(out1), _read_all(out2))


def test_checkpoint_lineage_invalidates_on_config_change(corpus_dir, tmp_path):
    out = str(tmp_path / "run")
    cfg = RollupConfig(num_partitions=4)
    checkpointed_rollup(corpus_dir, out, cfg)

    cfg2 = RollupConfig(num_partitions=4, aggs=["count", "sum"])
    res = checkpointed_rollup(corpus_dir, out, cfg2)
    assert len(res["computed"]) == 4  # config changed -> all recomputed


def test_checkpoint_holistic_lane(corpus_dir, tmp_path):
    out = str(tmp_path / "holo")
    cfg = RollupConfig(num_partitions=4, aggs=["count", "median", "mode"])
    res = checkpointed_rollup(corpus_dir, out, cfg, lane="holistic")
    assert res["computed"]
    df = _read_all(out)
    assert {"tier", "source", "bucket_ts", "count", "median", "mode"} <= set(df.columns)
    # metrics recorded per partition
    m = Manifest(out)
    assert all(r.wall_time_s >= 0 for r in m.records.values())
    assert any(r.rows_in > 0 for r in m.records.values())


def test_checkpoint_input_change_invalidates(corpus_dir, tmp_path):
    out = str(tmp_path / "run")
    cfg = RollupConfig(num_partitions=4)
    checkpointed_rollup(corpus_dir, out, cfg)

    # new input dir (different content) -> different fingerprint -> recompute
    corpus2 = str(tmp_path / "corpus2")
    shutil.copytree(corpus_dir, corpus2)
    from getml_community_ray.sources.synth import generate_sequences

    for f in glob.glob(f"{corpus2}/shard-00000.parquet"):
        os.remove(f)
    res = checkpointed_rollup(corpus2, out, cfg)
    assert len(res["computed"]) == 4


def test_timerange_late_data_partial_recompute(ray_session, tmp_path):
    """Late-data path: appending a shard that touches one time range must
    recompute ONLY the overlapping partitions, and the result must equal a
    from-scratch run."""
    import glob
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from getml_community_ray.pipelines.rollup import RollupConfig
    from getml_community_ray.sources.synth import generate_shard
    from getml_community_ray.state.checkpoint import (
        checkpointed_rollup_timerange,
    )

    src_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    os.makedirs(src_dir)
    # base corpus: 4 shards
    for k in range(4):
        t = generate_shard(k, 4, 40_000, n_sources=5, seed=3, with_tokens=False)
        pq.write_table(t, f"{src_dir}/shard-{k:05d}.parquet")

    cfg = RollupConfig(retention={}, num_partitions=8, cache_intermediates=False)
    r1 = checkpointed_rollup_timerange(src_dir, out_dir, cfg)
    assert len(r1["computed"]) == 8 and not r1["skipped"]

    # idempotent rerun: everything skipped
    r2 = checkpointed_rollup_timerange(src_dir, out_dir, cfg)
    assert not r2["computed"] and len(r2["skipped"]) == 8

    # late shard: a NARROW time slice (one source's early ticks re-emitted
    # with new values) — write rows only within the global range
    late = generate_shard(0, 16, 40_000, n_sources=5, seed=99, with_tokens=False)
    pq.write_table(late, f"{src_dir}/shard-late.parquet")
    r3 = checkpointed_rollup_timerange(src_dir, out_dir, cfg)
    assert r3["computed"], "late shard must trigger recompute"
    assert r3["skipped"], "partitions outside the late range must be skipped"

    # equivalence with a from-scratch run on the full corpus
    fresh_dir = str(tmp_path / "fresh")
    r4 = checkpointed_rollup_timerange(src_dir, fresh_dir, cfg)
    a = (
        rd.read_parquet(sorted(glob.glob(f"{out_dir}/part-*.parquet")))
        .to_pandas().sort_values(["tier", "source", "bucket_ts"])
        .reset_index(drop=True)
    )
    b = (
        rd.read_parquet(sorted(glob.glob(f"{fresh_dir}/part-*.parquet")))
        .to_pandas().sort_values(["tier", "source", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            import numpy as np

            assert np.allclose(av, bv, equal_nan=True), c
        else:
            assert (av == bv).all(), c


def test_checkpointed_retention(ray_session, tmp_path):
    """TTL drop applies inside the checkpointed runner (long format)."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from getml_community_ray.pipelines.rollup import RollupConfig
    from getml_community_ray.sources.synth import generate_shard
    from getml_community_ray.state.checkpoint import checkpointed_rollup

    src_dir = str(tmp_path / "corpus")
    os.makedirs(src_dir)
    t = generate_shard(0, 1, 20_000, n_sources=3, seed=4, with_tokens=False)
    pq.write_table(t, f"{src_dir}/shard-00000.parquet")
    wm = int(np.asarray(t["event_ts"].cast("int64")).max())

    cfg = RollupConfig(
        retention={"1m": 600, "1h": None, "1d": None},
        watermark_us=wm,
        num_partitions=4,
        cache_intermediates=False,
    )
    out_dir = str(tmp_path / "out")
    checkpointed_rollup(src_dir, out_dir, cfg)
    df = rd.read_parquet(sorted(glob.glob(f"{out_dir}/part-*.parquet"))).to_pandas()
    m1 = df[df.tier == "1m"]
    end_us = m1.bucket_ts.astype("int64") + 60 * 1_000_000
    assert (end_us >= wm - 600 * 1_000_000).all()
    assert len(df[df.tier == "1h"]) > 0  # other tiers untrimmed


def test_timerange_append_extends_span(ray_session, tmp_path):
    """A late shard BEYOND the original time range must not shift existing
    partitions' ranges (absolute-anchored chunks): the union of kept and
    recomputed partition files must equal a from-scratch run."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from getml_community_ray.pipelines.rollup import RollupConfig
    from getml_community_ray.state.checkpoint import (
        checkpointed_rollup_timerange,
    )

    src_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    os.makedirs(src_dir)
    rng = np.random.default_rng(11)
    t0 = 1_600_000_000_000_000

    def shard(lo_day, hi_day, n, seed):
        r = np.random.default_rng(seed)
        ts = t0 + r.integers(
            lo_day * 86_400_000_000, hi_day * 86_400_000_000, size=n
        )
        ts.sort()
        return pa.table(
            {
                "source": pa.array(
                    np.repeat("s0", n)
                ),
                "event_ts": pa.array(ts).cast(pa.timestamp("us")),
                "n_tok": pa.array(
                    r.integers(0, 50, size=n).astype(np.float64)
                ),
            }
        )

    pq.write_table(shard(0, 10, 5000, 1), f"{src_dir}/shard-a.parquet")
    cfg = RollupConfig(retention={}, num_partitions=4,
                       cache_intermediates=False)
    r1 = checkpointed_rollup_timerange(src_dir, out_dir, cfg)
    assert r1["computed"]
    # append a shard EXTENDING the global span (days 10..30)
    pq.write_table(shard(10, 30, 5000, 2), f"{src_dir}/shard-b.parquet")
    r2 = checkpointed_rollup_timerange(src_dir, out_dir, cfg)
    assert r2["computed"]

    fresh = str(tmp_path / "fresh")
    checkpointed_rollup_timerange(src_dir, fresh, cfg)
    a = (
        rd.read_parquet(sorted(glob.glob(f"{out_dir}/part-*.parquet")))
        .to_pandas().sort_values(["tier", "source", "bucket_ts"])
        .reset_index(drop=True)
    )
    b = (
        rd.read_parquet(sorted(glob.glob(f"{fresh}/part-*.parquet")))
        .to_pandas().sort_values(["tier", "source", "bucket_ts"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
