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
        self.grid: str | None = None
        if os.path.exists(self.path):
            with open(self.path) as f:
                raw = json.load(f)
            for k, v in raw.get("partitions", {}).items():
                self.records[int(k)] = PartitionRecord(**v)
            self.grid = raw.get("grid")

    def set_grid(self, grid: str) -> None:
        """Declare the partition-grid identity (chunk width + config) of
        the caller. If it differs from the manifest's stored grid, every
        on-disk partition file belongs to a DIFFERENT bucket->partition
        mapping — keeping them would silently mix two grids (stale ranges
        beside fresh ones), so records and part files are dropped and the
        run starts clean."""
        if self.grid == grid:
            return
        # Unconditional: a crash after part writes but before the manifest
        # flush leaves records empty on disk while stale old-grid part files
        # survive — gating on self.records would let a later different-grid
        # run silently mix two grids for glob('part-*.parquet') readers.
        import glob as _glob

        for f in _glob.glob(os.path.join(self.out_dir, "part-*.parquet")):
            os.remove(f)
        self.records = {}
        self.grid = grid

    def completed(self, input_fp: str, config_fp: str) -> set[int]:
        done = set()
        for part, rec in self.records.items():
            if rec.lineage_id == lineage_id(input_fp, config_fp, part):
                if not rec.file:  # empty partition (hash hole)
                    done.add(part)
                elif os.path.exists(os.path.join(self.out_dir, rec.file)):
                    done.add(part)
        return done

    # Minimum seconds between on-disk flushes during incremental commits.
    # The manifest file is O(partitions); rewriting it per metrics block
    # is O(P^2) bytes at high partition counts. A deferred record is
    # merely recomputed on resume (never wrong), so throttling flushes
    # costs at most `flush_interval_s` of work on a crash. Callers that
    # need durability NOW (end of job) pass force=True.
    flush_interval_s = 1.0

    def update(self, recs: list[PartitionRecord], *, force: bool = True):
        for r in recs:
            self.records[r.partition] = r
        now = time.monotonic()
        last = getattr(self, "_last_flush", 0.0)
        if not force and now - last < self.flush_interval_s:
            # deferred records stay in memory only; durability comes from
            # the caller's job-end update(force=True) — a crash before it
            # just recomputes the unflushed partitions on resume
            return
        self._flush(now)

    def _flush(self, now: float | None = None):
        tmp = self.path + ".tmp"
        os.makedirs(self.out_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(
                {
                    "grid": self.grid,
                    "partitions": {
                        str(k): asdict(v) for k, v in self.records.items()
                    },
                },
                f,
                indent=1,
            )
        os.replace(tmp, self.path)
        self._last_flush = time.monotonic() if now is None else now


def _maybe_crash_after_commit(n_committed: int) -> None:
    """Fault-injection hook for the kill-and-resume drill
    (tools/resume_e2e.py): when GRAFT_CRASH_AFTER_COMMITS=N is set, the
    driver hard-exits (SIGKILL-equivalent, no cleanup) once N partitions
    have been committed IN MEMORY — with the flush throttle the on-disk
    manifest may lag by up to one flush interval, so the drill reads the
    durable count back from _manifest.json rather than trusting N. A
    deterministic stand-in for a preempted driver with a partial manifest
    on disk."""
    limit = os.environ.get("GRAFT_CRASH_AFTER_COMMITS")
    if limit and n_committed >= int(limit):
        os._exit(137)


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
            batch_size=cfg.combine_batch_size,
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
            batch_size=cfg.combine_batch_size,
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
        from ..pipelines.rollup import apply_retention_long

        out = apply_retention_long(out, cfg)
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

    metrics_ds = (
        staged.map_batches(keep_pending, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(run_partition, batch_format="pyarrow")
    )
    # Stream the metrics and commit the manifest INCREMENTALLY: each
    # partition's data file is already on disk (atomic replace inside
    # run_partition) when its metrics row reaches the driver, so recording
    # it immediately means a driver killed mid-run resumes by skipping
    # every partition that completed — not by recomputing the whole job.
    recs: list[PartitionRecord] = []
    for mb in metrics_ds.iter_batches(batch_size=None, batch_format="pandas"):
        batch_recs = [
            PartitionRecord(
                partition=int(r.partition),
                lineage_id=r.lineage_id,
                rows_in=int(r.rows_in),
                rows_out=int(r.rows_out),
                wall_time_s=float(r.wall_time_s),
                file=r.file,
            )
            for r in mb.itertuples()
        ]
        if batch_recs:
            manifest.update(batch_recs, force=False)
            recs.extend(batch_recs)
            _maybe_crash_after_commit(len(recs))
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


# ---------------------------------------------------------------------------
# time-range partitioning: late data re-rolls only the affected partitions
# ---------------------------------------------------------------------------

def file_ts_ranges(paths: list[str], ts_col: str) -> dict[str, tuple[int, int]]:
    """(min_us, max_us) per file from Parquet row-group statistics — a
    metadata-only read, no data pages touched."""
    import pyarrow.parquet as pq

    out = {}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        ix = md.schema.to_arrow_schema().get_field_index(ts_col)
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ix).statistics
            if st is None or not st.has_min_max:
                mn = None
                break
            lo = st.min.value if hasattr(st.min, "value") else st.min
            hi = st.max.value if hasattr(st.max, "value") else st.max
            lo = int(lo.timestamp() * 1e6) if hasattr(lo, "timestamp") else int(lo)
            hi = int(hi.timestamp() * 1e6) if hasattr(hi, "timestamp") else int(hi)
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        if mn is None:
            # no stats: conservatively treat as overlapping everything
            mn, mx = -(2**62), 2**62
        out[p] = (mn, mx)
    return out


def checkpointed_rollup_timerange(
    input_dir: str,
    out_dir: str,
    cfg,
    *,
    lane: str = "decomposable",
) -> dict:
    """Like `checkpointed_rollup`, but partitions are CONTIGUOUS ranges of
    the coarsest-tier bucket, and each partition's lineage is derived from
    ONLY the input files whose (min_ts, max_ts) ranges overlap it. Late or
    appended shards therefore invalidate exactly the partitions whose time
    ranges they touch — the idempotent late-data path of the north rule.

    Trade-off vs hash partitioning: time-range partitions skew with data
    density over time (hash spreads evenly). Use this variant for
    incremental/append-mostly corpora, the hash variant for one-shot runs.
    """
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages import rollup as R

    US = 1_000_000
    paths = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    ranges = file_ts_ranges(paths, cfg.ts_col)
    config_fp = fingerprint_config(cfg) + f"/{lane}/timerange"

    ordered = sorted(cfg.tiers.items(), key=lambda kv: kv[1])
    finest_w = ordered[0][1]
    coarse_w = ordered[-1][1]
    coarse_us = coarse_w * US

    gmin = min(r[0] for r in ranges.values()) // coarse_us
    gmax = max(r[1] for r in ranges.values()) // coarse_us
    P = cfg.num_partitions
    span = int(gmax - gmin + 1)
    # ABSOLUTE-anchored power-of-two chunk width: partition id is a pure
    # function of the bucket number (bucket // w), never of the data's
    # extent. Appending late/out-of-range shards therefore cannot SHIFT
    # existing partitions' ranges — only the chunks a new shard actually
    # touches get a new per-partition fingerprint. When the data span
    # outgrows w * num_partitions, w doubles; the width is part of the
    # grid identity below, so a width change invalidates every partition
    # loudly (full reshard) instead of mixing two grids silently.
    w = 1
    while span > w * P:
        w *= 2

    def part_of_bucket(bucket):
        return bucket // w

    chunk_ids = sorted(
        {
            int(c)
            for (mn, mx) in ranges.values()
            for c in range(int(mn // coarse_us // w), int(mx // coarse_us // w) + 1)
        }
    )
    config_fp = config_fp + f"/w{w}"

    # per-partition input fingerprint: the files overlapping its bucket range
    part_fps: dict[int, str] = {}
    for part in chunk_ids:
        lo_us = part * w * coarse_us
        hi_us = (part + 1) * w * coarse_us - 1
        touching = [
            p for p, (mn, mx) in ranges.items() if mn <= hi_us and mx >= lo_us
        ]
        part_fps[part] = fingerprint_paths(touching)

    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    manifest.set_grid(config_fp)
    done = {
        part
        for part, rec in manifest.records.items()
        if part in part_fps
        and rec.lineage_id == lineage_id(part_fps[part], config_fp, part)
        and (not rec.file or os.path.exists(os.path.join(out_dir, rec.file)))
    }
    pending = sorted(set(chunk_ids) - done)
    if not pending:
        return {"computed": [], "skipped": sorted(done), "manifest": manifest}
    pending_arr = np.array(pending, dtype=np.int64)

    # prune the read to files overlapping some pending partition: a late
    # shard triggers a re-read of only the shards sharing its time range,
    # not a full corpus rescan
    pend_set = set(pending)
    paths_needed = [
        p
        for p, (mn, mx) in ranges.items()
        if any(
            int(pb) in pend_set
            for pb in np.unique(
                part_of_bucket(
                    np.arange(mn // coarse_us, mx // coarse_us + 1)
                )
            )
        )
    ]
    ds = rd.read_parquet(
        paths_needed, columns=[cfg.source_col, cfg.ts_col, cfg.value_col]
    )

    if lane == "decomposable":
        need_fl = "first" in cfg.aggs or "last" in cfg.aggs

        def stage_batches(b: pa.Table) -> pa.Table:
            p0 = R.partial_states(
                b,
                source_col=cfg.source_col,
                ts_col=cfg.ts_col,
                value_col=cfg.value_col,
                width_s=finest_w,
                first_last=need_fl,
            )
            bucket = np.asarray(p0["bucket"]) * finest_w // coarse_w
            return p0.append_column("_part", pa.array(part_of_bucket(bucket)))

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

        def stage_batches(b: pa.Table) -> pa.Table:
            ts_us = R.ts_to_us(b[cfg.ts_col].combine_chunks())
            bucket = ts_us // coarse_us
            return b.append_column("_part", pa.array(part_of_bucket(bucket)))

        def compute(t: pa.Table) -> pa.Table:
            return stage(t)

    def keep_pending(b: pa.Table) -> pa.Table:
        part = np.asarray(b["_part"])
        return b.filter(pa.array(np.isin(part, pending_arr)))

    def run_partition(t: pa.Table) -> pa.Table:
        part = int(t["_part"][0].as_py())
        t0 = time.perf_counter()
        out = compute(t.drop_columns(["_part"]))
        from ..pipelines.rollup import apply_retention_long

        out = apply_retention_long(out, cfg)
        fname = f"part-{part:05d}.parquet"
        fpath = os.path.join(out_dir, fname)
        pq.write_table(out, fpath + ".tmp", row_group_size=100_000)
        os.replace(fpath + ".tmp", fpath)
        return pa.table(
            {
                "partition": pa.array([part], type=pa.int64()),
                "lineage_id": pa.array(
                    [lineage_id(part_fps[part], config_fp, part)],
                    type=pa.string(),
                ),
                "rows_in": pa.array([len(t)], type=pa.int64()),
                "rows_out": pa.array([len(out)], type=pa.int64()),
                "wall_time_s": pa.array(
                    [round(time.perf_counter() - t0, 4)], type=pa.float64()
                ),
                "file": pa.array([fname], type=pa.string()),
            }
        )

    metrics_ds = (
        ds.map_batches(
            stage_batches, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=cfg.combine_batch_size,
        )
        .map_batches(keep_pending, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(run_partition, batch_format="pyarrow")
    )
    # incremental manifest commit (see checkpointed_rollup): a killed
    # driver resumes by skipping completed partitions
    recs: list[PartitionRecord] = []
    for mb in metrics_ds.iter_batches(batch_size=None, batch_format="pandas"):
        batch_recs = [
            PartitionRecord(
                partition=int(r.partition),
                lineage_id=r.lineage_id,
                rows_in=int(r.rows_in),
                rows_out=int(r.rows_out),
                wall_time_s=float(r.wall_time_s),
                file=r.file,
            )
            for r in mb.itertuples()
        ]
        if batch_recs:
            manifest.update(batch_recs, force=False)
            recs.extend(batch_recs)
            _maybe_crash_after_commit(len(recs))
    seen = {r.partition for r in recs}
    for part in pending:
        if part not in seen:
            recs.append(
                PartitionRecord(
                    partition=part,
                    lineage_id=lineage_id(part_fps[part], config_fp, part),
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
