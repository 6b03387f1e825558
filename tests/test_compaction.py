"""Retention-tier Parquet compaction (state/compaction.py): data equality,
idempotence, crash recovery, group planning."""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from getml_community_ray.state.compaction import (
    compact_dir,
    plan_groups,
    recover,
)


def _make_parts(d, n_files=12, rows=200, seed=0):
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n_files):
        df = pd.DataFrame(
            {
                "source": rng.choice(["a", "b", "c"], rows),
                "bucket_ts": rng.integers(0, 10_000, rows).astype(np.int64),
                "v": rng.standard_normal(rows),
            }
        )
        pq.write_table(pa.Table.from_pandas(df), f"{d}/part-{i:04d}.parquet")
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def _read_all(d) -> pd.DataFrame:
    tbls = [pq.read_table(p) for p in sorted(glob.glob(f"{d}/*.parquet"))]
    return pa.concat_tables(tbls).to_pandas()


def _sorted(df):
    return df.sort_values(["source", "bucket_ts", "v"]).reset_index(drop=True)


def test_compact_preserves_data(ray_session, tmp_path):
    d = str(tmp_path / "c1")
    want = _make_parts(d)
    summary = compact_dir(d, target_bytes=1 << 20)
    assert summary["files_after"] < summary["files_before"]
    got = _read_all(d)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))


def test_compact_idempotent(ray_session, tmp_path):
    d = str(tmp_path / "c2")
    want = _make_parts(d)
    compact_dir(d, target_bytes=1 << 20)
    files1 = sorted(glob.glob(f"{d}/*.parquet"))
    again = compact_dir(d, target_bytes=1 << 20)
    assert again["groups"] == 0
    assert sorted(glob.glob(f"{d}/*.parquet")) == files1
    pd.testing.assert_frame_equal(_sorted(_read_all(d)), _sorted(want))


def test_compact_sorted_output(tmp_path):
    d = str(tmp_path / "c3")
    want = _make_parts(d, n_files=4)
    compact_dir(
        d, target_bytes=1 << 30, sort_cols=["source", "bucket_ts"],
        parallel=False,
    )
    outs = glob.glob(f"{d}/compact-*.parquet")
    assert len(outs) == 1
    got = pq.read_table(outs[0]).to_pandas()
    key = list(zip(got["source"], got["bucket_ts"]))
    assert key == sorted(key)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))


def test_group_planning_respects_target(tmp_path):
    d = str(tmp_path / "c4")
    _make_parts(d, n_files=10)
    sizes = {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(f"{d}/*.parquet")
    }
    target = 3 * max(sizes.values())
    groups = plan_groups(d, target_bytes=target)
    for g in groups:
        assert sum(sizes[m] for m in g) <= target
        assert g == sorted(g)  # lexicographic adjacency preserved


def test_crash_recovery_finishes_deletes(tmp_path):
    """Simulate a crash between output rename and member deletes: output +
    tombstone + members all on disk. recover() must delete the members and
    the data must read back exactly once (no duplicates)."""
    d = str(tmp_path / "c5")
    want = _make_parts(d, n_files=6)
    # compact WITHOUT crash first, into one group, to get a real output
    from getml_community_ray.state.compaction import _compact_group

    members = sorted(os.path.basename(p) for p in glob.glob(f"{d}/*.parquet"))
    out_name, _rows = _compact_group(d, members, None, "snappy")
    # resurrect the "crash" state: members restored, tombstone present
    _make_parts(d + "_copy", n_files=6)  # same seed -> same bytes
    for m in members:
        shutil.copy(f"{d}_copy/{m}", f"{d}/{m}")
    gh = out_name[len("compact-"):-len(".parquet")]
    with open(f"{d}/.consumed-{gh}.json", "w") as f:
        json.dump({"output": out_name, "members": members}, f)

    n = recover(d)
    assert n == 1
    assert not glob.glob(f"{d}/.consumed-*.json")
    assert not any(os.path.exists(f"{d}/{m}") for m in members)
    pd.testing.assert_frame_equal(_sorted(_read_all(d)), _sorted(want))


def test_recovery_is_rerun_safe(tmp_path):
    d = str(tmp_path / "c6")
    _make_parts(d, n_files=4)
    assert recover(d) == 0
    # stale tombstone without output: dropped, nothing deleted
    with open(f"{d}/.consumed-deadbeef.json", "w") as f:
        json.dump({"output": "compact-deadbeef.parquet",
                   "members": ["part-0000.parquet"]}, f)
    assert recover(d) == 1
    assert os.path.exists(f"{d}/part-0000.parquet")


def test_single_file_groups_untouched(tmp_path):
    d = str(tmp_path / "c7")
    _make_parts(d, n_files=1)
    s = compact_dir(d, target_bytes=1 << 20, parallel=False)
    assert s["groups"] == 0
    assert s["files_before"] == s["files_after"] == 1
