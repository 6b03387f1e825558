"""Per-partition checkpointing with lineage IDs and stage metrics.

Substitutes the reference's fingerprint-addressed caches
(`/root/reference/src/engine/include/engine/dependency/*Tracker.hpp`,
`DataFrameTracker.cpp:18-120`) with a Parquet-native layout:

    out_dir/
      part-00000.parquet      one file per output hash partition (atomic:
      part-00001.parquet      written to .tmp then os.replace)
      ...
      _manifest.json          {partition -> {lineage_id, rows, wall_time_s,
                               rows_in, file}}

lineage_id = hash(input fingerprint, config fingerprint, partition id).
A restarted run recomputes ONLY partitions whose lineage is missing or
stale — and because partitions are filtered out BEFORE the shuffle, skipped
partitions cost neither shuffle bandwidth nor compute.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass


def fingerprint_paths(paths: list[str]) -> str:
    """Content fingerprint of input files: sorted (name, size). Cheap and
    stable for immutable shard files (ours are written atomically once)."""
    items = []
    for p in sorted(paths):
        st = os.stat(p)
        items.append((os.path.basename(p), st.st_size))
    return hashlib.sha256(json.dumps(items).encode()).hexdigest()[:16]


def fingerprint_config(obj) -> str:
    try:
        payload = json.dumps(asdict(obj), sort_keys=True, default=str)
    except TypeError:
        payload = json.dumps(str(obj))
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def lineage_id(input_fp: str, config_fp: str, partition: int) -> str:
    return hashlib.sha256(
        f"{input_fp}/{config_fp}/{partition}".encode()
    ).hexdigest()[:16]


@dataclass
class PartitionRecord:
    partition: int
    lineage_id: str
    rows_in: int
    rows_out: int
    wall_time_s: float
    file: str


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.json")
        self.records: dict[int, PartitionRecord] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                raw = json.load(f)
            for k, v in raw.get("partitions", {}).items():
                self.records[int(k)] = PartitionRecord(**v)

    def completed(self, input_fp: str, config_fp: str) -> set[int]:
        done = set()
        for part, rec in self.records.items():
            if rec.lineage_id == lineage_id(input_fp, config_fp, part):
                if not rec.file:  # empty partition (hash hole)
                    done.add(part)
                elif os.path.exists(os.path.join(self.out_dir, rec.file)):
                    done.add(part)
        return done

    def update(self, recs: list[PartitionRecord]):
        for r in recs:
            self.records[r.partition] = r
        tmp = self.path + ".tmp"
        os.makedirs(self.out_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(
                {"partitions": {str(k): asdict(v) for k, v in self.records.items()}},
                f,
                indent=1,
            )
        os.replace(tmp, self.path)


def checkpointed_rollup(
    input_dir: str,
    out_dir: str,
    cfg,
    *,
    lane: str = "decomposable",
) -> dict:
    """Resumable tiered rollup: each output hash partition is written as its
    own Parquet file; a rerun skips partitions with matching lineage BEFORE
    the shuffle. Returns {"computed": [...], "skipped": [...], "manifest": M}.
    """
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages import rollup as R

    paths = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    input_fp = fingerprint_paths(paths)
    config_fp = fingerprint_config(cfg) + f"/{lane}"
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    done = manifest.completed(input_fp, config_fp)
    pending = sorted(set(range(cfg.num_partitions)) - done)
    if not pending:
        return {"computed": [], "skipped": sorted(done), "manifest": manifest}

    ordered = sorted(cfg.tiers.items(), key=lambda kv: kv[1])
    finest_w = ordered[0][1]
    coarse_w = ordered[-1][1]
    pending_arr = np.array(pending, dtype=np.int64)

    ds = rd.read_parquet(paths, columns=[cfg.source_col, cfg.ts_col, cfg.value_col])

    if lane == "decomposable":
        need_fl = "first" in cfg.aggs or "last" in cfg.aggs
        staged = ds.map_batches(
            lambda b: R.partial_states(
                b,
                source_col=cfg.source_col,
                ts_col=cfg.ts_col,
                value_col=cfg.value_col,
                width_s=finest_w,
                first_last=need_fl,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            lambda b: R.add_partial_partition(
                b, cfg.num_partitions, finest_width_s=finest_w, coarse_width_s=coarse_w
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def compute(t: pa.Table) -> pa.Table:
            return R.merge_and_cascade(t, tiers=ordered, aggs=cfg.aggs)

    else:
        stage = R.HolisticRollup(
            source_col=cfg.source_col,
            ts_col=cfg.ts_col,
            value_col=cfg.value_col,
            tiers=dict(ordered),
            aggs=cfg.aggs,
        )
        staged = ds.map_batches(
            lambda b: R.assign_partition(
                b,
                source_col=cfg.source_col,
                ts_col=cfg.ts_col,
                coarse_width_s=coarse_w,
                num_partitions=cfg.num_partitions,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def compute(t: pa.Table) -> pa.Table:
            return stage(t)

    def keep_pending(b: pa.Table) -> pa.Table:
        part = np.asarray(b["_part"])
        return b.filter(pa.array(np.isin(part, pending_arr)))

    def run_partition(t: pa.Table) -> pa.Table:
        part = int(t["_part"][0].as_py())
        t0 = time.perf_counter()
        out = compute(t.drop_columns(["_part"]))
        fname = f"part-{part:05d}.parquet"
        fpath = os.path.join(out_dir, fname)
        pq.write_table(out, fpath + ".tmp", row_group_size=100_000)
        os.replace(fpath + ".tmp", fpath)
        return pa.table(
            {
                "partition": pa.array([part], type=pa.int64()),
                "lineage_id": pa.array(
                    [lineage_id(input_fp, config_fp, part)], type=pa.string()
                ),
                "rows_in": pa.array([len(t)], type=pa.int64()),
                "rows_out": pa.array([len(out)], type=pa.int64()),
                "wall_time_s": pa.array(
                    [round(time.perf_counter() - t0, 4)], type=pa.float64()
                ),
                "file": pa.array([fname], type=pa.string()),
            }
        )

    metrics = (
        staged.map_batches(keep_pending, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(run_partition, batch_format="pyarrow")
        .to_pandas()
    )
    recs = [
        PartitionRecord(
            partition=int(r.partition),
            lineage_id=r.lineage_id,
            rows_in=int(r.rows_in),
            rows_out=int(r.rows_out),
            wall_time_s=float(r.wall_time_s),
            file=r.file,
        )
        for r in metrics.itertuples()
    ]
    # hash holes: pending partitions that received no rows are complete too
    seen = {r.partition for r in recs}
    for part in pending:
        if part not in seen:
            recs.append(
                PartitionRecord(
                    partition=part,
                    lineage_id=lineage_id(input_fp, config_fp, part),
                    rows_in=0,
                    rows_out=0,
                    wall_time_s=0.0,
                    file="",
                )
            )
    manifest.update(recs)
    return {
        "computed": [r.partition for r in recs],
        "skipped": sorted(done),
        "manifest": manifest,
    }
