"""Retention-tier Parquet compaction: merge many small `part-*.parquet`
files (the natural output of the fused rollup sink lane and of any
per-task `write_parquet`) into few target-sized files, idempotently and
crash-recoverably.

Why it exists: a continuous-aggregate engine that lands one file per
(task, key-range) produces millions of small files at 100 TB — death for
any downstream scan (footer-per-file metadata, no row-group pruning
leverage). TimescaleDB/Delta/Iceberg all pair retention with a
compaction job; the reference engine sidesteps the problem by holding
everything in memmaps under one process
(`src/engine/include/memmap/`, Pool.hpp) — on a cluster we compact
instead.

Design (fits the repo's sink contract, pipelines/rollup.py:_sink_write):
- driver lists files + sizes (metadata only, no data through the driver);
  greedy bin-packs LEXICOGRAPHICALLY CONSECUTIVE files into groups of
  ~target_bytes. Sink files are named by work-item key, so lexicographic
  order preserves key-range clustering in the merged files.
- each group merges in ONE Ray task: read members, concat, optional sort
  by sort_cols, write `compact-<grouphash>.parquet` via tmp + atomic
  rename, then write a `.consumed-<grouphash>.json` tombstone, then
  delete members, then drop the tombstone.
- idempotent: the group hash is over member names; a retry of the same
  group overwrites the same output. Crash recovery (`recover()`, also run
  at the start of every compact_dir): any tombstone whose output exists
  means the crash hit between rename and deletes -> finish the deletes;
  a tombstone without output cannot happen (tombstone is written after
  the rename) and is simply dropped.
- single-file groups are left untouched (no rewrite churn); a rerun over
  a compacted directory is a no-op.

At cluster scale the groups fan out as independent Ray tasks
(`num_cpus=1`), bounded-memory each (a group never exceeds
target_bytes * read_amplification).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os


def _group_hash(members: list[str]) -> str:
    h = hashlib.blake2b(digest_size=8)
    for m in members:
        h.update(os.path.basename(m).encode())
        h.update(b"\0")
    return h.hexdigest()


def recover(dir_path: str) -> int:
    """Finish interrupted compactions: for every tombstone whose output
    file exists, delete the listed consumed members. Returns the number of
    tombstones processed."""
    done = 0
    for tomb in glob.glob(os.path.join(dir_path, ".consumed-*.json")):
        try:
            with open(tomb) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            os.remove(tomb)
            continue
        out = os.path.join(dir_path, rec.get("output", ""))
        if rec.get("output") and os.path.exists(out):
            for m in rec.get("members", []):
                p = os.path.join(dir_path, m)
                if os.path.exists(p):
                    os.remove(p)
        os.remove(tomb)
        done += 1
    return done


def _compact_group(
    dir_path: str,
    members: list[str],
    sort_cols: list[str] | None,
    compression: str,
) -> tuple[str, int]:
    """Merge one group of files; runs inside a Ray task. Returns
    (output file name, rows)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    gh = _group_hash(members)
    out_name = f"compact-{gh}.parquet"
    out_path = os.path.join(dir_path, out_name)
    paths = [os.path.join(dir_path, m) for m in members]
    if os.path.exists(out_path) and not any(os.path.exists(p) for p in paths):
        # fully compacted by a prior run
        md = pq.read_metadata(out_path)
        return out_name, md.num_rows

    tbl = pa.concat_tables(
        [pq.read_table(p) for p in paths if os.path.exists(p)],
        promote_options="default",
    )
    if sort_cols:
        tbl = tbl.sort_by([(c, "ascending") for c in sort_cols])
    tmp = out_path + ".tmp"
    pq.write_table(tbl, tmp, compression=compression)
    os.replace(tmp, out_path)

    tomb = os.path.join(dir_path, f".consumed-{gh}.json")
    tomb_tmp = tomb + ".tmp"
    with open(tomb_tmp, "w") as f:
        json.dump({"output": out_name, "members": members}, f)
    os.replace(tomb_tmp, tomb)
    for p in paths:
        if os.path.exists(p):
            os.remove(p)
    os.remove(tomb)
    return out_name, len(tbl)


def plan_groups(
    dir_path: str,
    *,
    pattern: str = "*.parquet",
    target_bytes: int = 128 << 20,
) -> list[list[str]]:
    """Greedy size-packing of lexicographically consecutive files.
    Single-member groups are dropped (nothing to merge)."""
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(dir_path, pattern))
        if not os.path.basename(p).startswith((".", "compact-"))
    )
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for fname in files:
        sz = os.path.getsize(os.path.join(dir_path, fname))
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(fname)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return [g for g in groups if len(g) > 1]


def compact_dir(
    dir_path: str,
    *,
    pattern: str = "*.parquet",
    target_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
    compression: str = "snappy",
    parallel: bool = True,
) -> dict:
    """Compact a directory of small Parquet files in place. Returns a
    summary dict: groups merged, files before/after, rows moved."""
    recover(dir_path)
    groups = plan_groups(
        dir_path, pattern=pattern, target_bytes=target_bytes
    )
    n_before = len(glob.glob(os.path.join(dir_path, pattern)))
    results: list[tuple[str, int]] = []
    if groups:
        if parallel:
            import ray

            @ray.remote(num_cpus=1)
            def _task(members: list[str]) -> tuple[str, int]:
                return _compact_group(dir_path, members, sort_cols, compression)

            results = ray.get([_task.remote(g) for g in groups])
        else:
            results = [
                _compact_group(dir_path, g, sort_cols, compression)
                for g in groups
            ]
    n_after = len(glob.glob(os.path.join(dir_path, pattern)))
    return {
        "groups": len(groups),
        "files_before": n_before,
        "files_after": n_after,
        "rows_compacted": sum(r[1] for r in results),
        "outputs": [r[0] for r in results],
    }
