"""Tiered rollup pipeline: raw -> 1m -> 1h -> 1d continuous aggregates with
retention, expressed as Ray Data Dataset transforms.

Two lanes (see stages/rollup.py for the scale rationale):
- decomposable (count/sum/avg/min/max/first/last): per-batch combiner ->
  ONE small groupby over partial states for the finest tier -> coarser tiers
  cascade from the finer tier's STATES without touching raw rows again.
- holistic (quantiles, mode, distinct, moments, EWMA, trend, time-since):
  one hash partition by (source, coarsest bucket) -> all tiers computed
  vectorized per partition in a single pass.

Retention: per-tier TTL; buckets whose END falls before
(watermark - ttl) are dropped at materialization time — the cascaded tiers
are computed BEFORE retention trims the finer tier, so a 1d bucket is exact
even when its 1m constituents have expired.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.aggregations import DECOMPOSABLE
from ..stages import rollup as R

US = 1_000_000

DEFAULT_TIERS = {"1m": 60, "1h": 3600, "1d": 86400}


@dataclass
class RollupConfig:
    source_col: str = "source"
    ts_col: str = "event_ts"
    value_col: str = "n_tok"
    tiers: dict[str, int] = field(default_factory=lambda: dict(DEFAULT_TIERS))
    aggs: list[str] = field(
        default_factory=lambda: ["count", "sum", "avg", "min", "max", "first", "last"]
    )
    # hash-partition count for the holistic lane; at cluster scale set to
    # O(total_cores * 4). Each partition holds complete (source, coarse-
    # bucket) groups.
    num_partitions: int = 64
    # per-tier TTL in seconds (None = keep forever)
    retention: dict[str, int | None] = field(default_factory=dict)
    watermark_us: int | None = None
    # materialize the shared post-shuffle intermediate (merged partial states
    # / the all-tier holistic output). These are output-sized — orders of
    # magnitude smaller than the raw input — and every tier branch reads
    # them, so pinning them avoids re-running the wide shuffle per tier.
    cache_intermediates: bool = True
    # combiner batch size: at the finest tier each (source, bucket) group
    # holds only a few rows, so the combine ratio — and the number of blocks
    # entering the shuffle — is set by how many rows each partial_states
    # call sees. 64k rows/batch coalesces the reader's small blocks and cut
    # the lane's wall time ~4x vs the default batch size (measured sf0.1).
    combine_batch_size: int = 65536
    # clustered-layout vouching for the fused lanes. "auto": footer-stats
    # guard (file-level ts ranges pairwise disjoint) — SOUND but
    # CONSERVATIVE: a corpus whose files interleave sources (per-source
    # ranges disjoint, file-level ranges overlapping — this bench corpus's
    # layout) fails it and falls back to the sort-based lane. True: the
    # caller vouches for per-source non-overlap (e.g. it wrote the files);
    # the lanes then run clustered and VERIFY the claim exactly post-hoc
    # from the boundary rows (per-source first/last-bucket intervals per
    # file must be pairwise non-overlapping) — a wrong vouch fails loudly
    # instead of double-emitting. False: always the unclustered lane.
    assume_clustered: bool | str = "auto"
    # fused-lane task granularity: a file larger than this splits into
    # row-group spans (footer-only planning), so one 10 GB file cannot
    # become one 10 GB task; a span cut inside a source-run just makes
    # the cut bucket boundary on both sides (merged exactly downstream).
    # Default sized for CACHE RESIDENCE, not just memory safety: a span's
    # decode+sort working set is ~24 B/row, so 400k rows ~= 10 MB — small
    # enough that N concurrent tasks stay inside a shared L3 instead of
    # streaming DRAM (measured on the 32-core bench box at 240M rows:
    # 1.9M-row spans cost 1621 CPU-s at 16 workers vs 854 CPU-s with
    # 400k spans — the same work, 1.9x cheaper, and wall 106 s -> 55 s).
    max_task_rows: int = 400_000
    # cache-tile row count for the holistic clustered kernels: per-tier
    # passes run on slices cut where every tier's bucket changes, keeping
    # the working set in the worker's PRIVATE L2 instead of making ~40
    # full-span passes through the one shared L3/DRAM bus. Bit-identical
    # output (tiles cover groups whole); measured +30% at 32 concurrent
    # workers and 8->32 scaling efficiency 0.68 -> 0.79 on the bench box.
    tile_rows: int = 48_000
    # TEST-ONLY fault injection: when set to a directory path, every fused
    # task kills its worker (os._exit) on the FIRST attempt per work item,
    # immediately AFTER its side-channel boundary/state put — the worst
    # failure point for exactly-once. Ray retries the task; the keyed put
    # overwrites. tests/test_rollup_fault.py asserts bit-equal output.
    fault_inject_dir: str | None = None
    # Parquet SINK for the fused lanes: when set, every fused task writes
    # its finalized interior rollup rows to `sink_dir/part-<key>.parquet`
    # INSIDE the task (atomic rename; a task retry overwrites its own file,
    # so the layout is exactly-once and resumable) and the lane's Dataset
    # output becomes a tiny manifest (file, rows) instead of the product
    # rows. This keeps the rollup product — ~40% of input rows on the
    # bench shape — out of the object store entirely: on one box the
    # product's plasma round-trip (first-touch /dev/shm page faults on one
    # memory bus) was the measured 8->32 scaling residual (BASELINE.md),
    # and on a real cluster partitioned-Parquet output is the north rule's
    # resumable layout anyway. Boundary-merge rows are written to the same
    # dir by the merge step.
    sink_dir: str | None = None
    sink_compression: str = "snappy"
    # Side-channel actor sharding: boundary/state messages hash over this
    # many accumulator actors (keyed by work item), so the per-item actor
    # round trips don't funnel through ONE actor at high worker counts.
    side_channel_shards: int = 8
    # In-band side channel (sink mode only): boundary partials / holistic
    # states ride the fused task's RETURN blocks as a tagged union with
    # the manifest rows instead of actor messages. Measured on the bench
    # box (24 workers, 20M rows): each task spent 55-100 ms of wall
    # BLOCKED on the boundary ray.put + actor round trip — a flat,
    # CPU-count-insensitive tax that also seriates at high worker counts
    # (32 actor shards measured 2x the lane wall of 8). Exactly-once falls
    # out of Ray task-retry semantics: a retried task's output block
    # REPLACES the failed attempt's blocks, and sink writes are
    # atomic-rename idempotent, so no keyed-overwrite actor is needed.
    # Non-sink lanes keep the actor path: their output blocks are the
    # product itself, and tagging would force a filter pass over the full
    # product.
    inband_side_channel: bool = True


def _tier_widths_ok(tiers: dict[str, int]) -> list[tuple[str, int]]:
    ordered = sorted(tiers.items(), key=lambda kv: kv[1])
    for (_, a), (_, b) in zip(ordered, ordered[1:]):
        if b % a != 0:
            raise ValueError(f"tier widths must nest: {a}s does not divide {b}s")
    return ordered


def rollup_decomposable_long(ds, cfg: RollupConfig):
    """Fast lane, long format: one Dataset with a `tier` column.

    The only wide operation is a shuffle of pre-combined partial states of
    the FINEST tier; coarser tiers aggregate the finer tier's states (tiny).
    The merge itself is our vectorized segmented reduction, not Ray's generic
    sort-aggregate (which runs per-group Python and was ~6x slower).
    """
    ordered = _tier_widths_ok(cfg.tiers)
    finest_name, finest_w = ordered[0]
    coarse_w = ordered[-1][1]
    need_fl = "first" in cfg.aggs or "last" in cfg.aggs

    partials = ds.map_batches(
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
    )

    all_tiers = (
        partials.map_batches(
            lambda b: R.add_partial_partition(
                b, cfg.num_partitions, finest_width_s=finest_w, coarse_width_s=coarse_w
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_part")
        .map_groups(
            lambda t: R.merge_and_cascade(
                t.drop_columns(["_part"]), tiers=ordered, aggs=cfg.aggs
            ),
            batch_format="pyarrow",
        )
    )
    if cfg.cache_intermediates:
        all_tiers = all_tiers.materialize()
    return all_tiers


def _split_tiers(all_tiers, cfg: RollupConfig) -> dict[str, "object"]:
    out = {}
    for name in cfg.tiers:
        t = all_tiers.filter(expr=f"tier == '{name}'").drop_columns(["tier"])
        out[name] = _apply_retention(t, cfg, name)
    return out


def rollup_decomposable(ds, cfg: RollupConfig) -> dict[str, "object"]:
    """Fast lane. Returns {tier_name: Dataset} of finalized rollups."""
    return _split_tiers(rollup_decomposable_long(ds, cfg), cfg)


def rollup_holistic_long(ds, cfg: RollupConfig):
    """Full-vocabulary lane: one hash shuffle, all tiers per partition.
    Long format with a `tier` column."""
    ordered = _tier_widths_ok(cfg.tiers)
    coarse_w = ordered[-1][1]

    stage = R.HolisticRollup(
        source_col=cfg.source_col,
        ts_col=cfg.ts_col,
        value_col=cfg.value_col,
        tiers=dict(ordered),
        aggs=cfg.aggs,
    )

    parted = ds.select_columns(
        [cfg.source_col, cfg.ts_col] + (list(cfg.value_col) if isinstance(cfg.value_col, (list, tuple)) else [cfg.value_col])
    ).map_batches(
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
    all_tiers = parted.groupby("_part").map_groups(
        lambda t: stage(t.drop_columns(["_part"])), batch_format="pyarrow"
    )
    if cfg.cache_intermediates:
        all_tiers = all_tiers.materialize()
    return all_tiers


def rollup_holistic(ds, cfg: RollupConfig) -> dict[str, "object"]:
    """Full-vocabulary lane as {tier: Dataset}."""
    return _split_tiers(rollup_holistic_long(ds, cfg), cfg)


def _apply_retention(ds, cfg: RollupConfig, tier_name: str):
    ttl = cfg.retention.get(tier_name)
    if ttl is None or cfg.watermark_us is None:
        return ds
    width_us = cfg.tiers[tier_name] * US
    cutoff = cfg.watermark_us - ttl * US

    def keep(b: pa.Table) -> pa.Table:
        end_us = pc.add(b["bucket_ts"].cast(pa.int64()), width_us)
        return b.filter(pc.greater_equal(end_us, cutoff))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def rollup(ds, cfg: RollupConfig) -> dict[str, "object"]:
    """Route to the fast lane when every requested agg is decomposable."""
    if all(a in DECOMPOSABLE for a in cfg.aggs):
        return rollup_decomposable(ds, cfg)
    return rollup_holistic(ds, cfg)


# ---------------------------------------------------------------------------
# clustered lanes: event-time-local input -> shuffle only boundary groups
# ---------------------------------------------------------------------------
#
# Correctness contract: these lanes process ONE BLOCK PER BATCH
# (batch_size=None). A block is a contiguous row range of one input file,
# whatever order the streaming executor delivers it in — so every
# contiguous source-run inside a batch is a genuine time-contiguous slice,
# and a (source, bucket) group strictly inside a run cannot have rows in
# any other block. Bundled multi-block batches would break that invariant
# (two time-disjoint fragments of a source can look like one run), which
# is why combine_batch_size is deliberately NOT applied here; the combine
# ratio is governed by the reader's block size
# (DataContext.target_max_block_size / read parallelism) instead.
# Within-run ts-monotonicity AND same-source cross-run non-overlap are
# validated per batch; violations raise.
#
# CROSS-FILE PRECONDITION (not checkable from inside a batch): the input
# FILES' event-time ranges must be pairwise non-overlapping. A late or
# re-emitted shard covering time already present in another file would let
# two blocks each finalize the shared (source, bucket) as "interior" and
# silently double-emit it. Callers that know the file list should pass it
# as `source_paths=` — the lane then checks parquet row-group statistics
# (footers only, no data read: R.clustered_files_nonoverlapping) and falls
# back to the always-correct unclustered lane on overlap or missing stats.
# With that guard in place degradation is graceful: the less clustered the
# input, the more groups land at run edges and flow through the merge
# shuffle — worst case equals the unclustered lane, never a wrong result.


def _clustered_precondition_ok(source_paths, cfg: RollupConfig) -> bool:
    if source_paths is None:
        return True  # caller vouches for the layout (documented contract)
    return R.clustered_files_nonoverlapping(list(source_paths), ts_col=cfg.ts_col)


def rollup_decomposable_clustered_long(ds, cfg: RollupConfig,
                                       source_paths: list[str] | None = None):
    """Decomposable lane for event-time-clustered input (the layout of
    time-partitioned Parquet lakes and of sources/synth.py shards).

    Per block: partial states for every tier; states of groups strictly
    inside a source-run are FINAL (zero exchange), only run-edge buckets —
    a few rows per (block, source, tier) — enter the merge shuffle. The
    exchange volume drops from O(all partial rows) to O(blocks x tiers):
    measured at 60M rows this removes a ~30s CPU-count-insensitive shuffle
    entirely, making the lane scale like the pure map it now is."""
    if not _clustered_precondition_ok(source_paths, cfg):
        return rollup_decomposable_long(ds, cfg)
    ordered = _tier_widths_ok(cfg.tiers)
    need_fl = "first" in cfg.aggs or "last" in cfg.aggs
    cols = [cfg.source_col, cfg.ts_col] + (
        list(cfg.value_col)
        if isinstance(cfg.value_col, (list, tuple))
        else [cfg.value_col]
    )

    def parts_of(b: pa.Table) -> pa.Table:
        return R.tiered_partials_clustered(
            b,
            source_col=cfg.source_col,
            ts_col=cfg.ts_col,
            value_col=cfg.value_col,
            tiers=ordered,
            first_last=need_fl,
            tile_rows=cfg.tile_rows,
        )

    # Two per-block passes over the source, both fully streaming (block
    # formation is deterministic, so both passes classify every group
    # identically). Pass 1 finalizes interior groups IN-TASK and streams
    # final rows; pass 2 re-emits only the boundary partial states (a few
    # rows per block x tier). Materializing the shared partials instead
    # measured +15 s on a 60M-row corpus at 32 CPUs — the object-store
    # round trip of the near-input-sized partials costs more than the
    # second (cheap, sort-free) kernel pass.
    def interior_pass(b: pa.Table) -> pa.Table:
        p = parts_of(b)
        inner = p.filter(pc.invert(p["_boundary"].combine_chunks()))
        fin = R.finalize_tiered(inner, aggs=cfg.aggs)
        if fin is None:  # block with only boundary groups (tiny runs)
            fin = R.finalize_partials(
                R._EMPTY_PARTIALS, width_s=ordered[0][1], aggs=cfg.aggs
            )
            fin = fin.add_column(0, "tier", pa.array([], type=pa.string()))
        return fin

    def boundary_pass(b: pa.Table) -> pa.Table:
        p = parts_of(b)
        return p.filter(p["_boundary"].combine_chunks())

    interior = ds.select_columns(cols).map_batches(
        interior_pass, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,  # one block per batch — see contract above
    )

    # Boundary volume is O(blocks x tiers x 2) — tiny at any scale (188k
    # rows for a 200M-row corpus). A distributed merge here costs more in
    # fixed overhead than it parallelizes (repartition(1) over the large
    # filtered parent measured 200s at 200M rows; a lazy two-branch union
    # of the shared parent stalled the executor similarly), so gather the
    # boundary rows eagerly and merge once on the driver. If boundary rows
    # ever outgrow driver memory (millions of blocks), swap in the
    # unclustered lane's hash-partitioned merge.
    batches = list(
        ds.select_columns(cols)
        .map_batches(
            boundary_pass, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    if not batches:
        return interior
    import ray.data as rd

    merged = R.merge_tiered(pa.concat_tables(batches), aggs=cfg.aggs)
    return interior.union(rd.from_arrow(merged))


def _run_boundary_mask(src, ts_us, coarse_w):
    """Row-level mask: True where the row's coarse bucket is the first or
    last bucket of its contiguous source-run."""
    import numpy as np

    R._validate_clustered(src, ts_us)
    n = len(src)
    if n == 0:
        return np.zeros(0, dtype=bool)
    bucket = ts_us // (coarse_w * US)
    change = src[1:] != src[:-1]
    run_starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    run_ends = np.append(run_starts[1:], n)
    run_id = np.zeros(n, dtype=np.int64)
    run_id[run_starts[1:]] = 1
    np.cumsum(run_id, out=run_id)
    first_b = bucket[run_starts][run_id]
    last_b = bucket[run_ends - 1][run_id]
    return (bucket == first_b) | (bucket == last_b)


def rollup_holistic_clustered_long(ds, cfg: RollupConfig,
                                   max_boundary_fraction: float | None = None,
                                   source_paths: list[str] | None = None):
    """Holistic lane for event-time-clustered input.

    Two per-block passes over the column-pruned source (block formation is
    deterministic, so both passes classify every row identically):

    pass 1 (streaming): finalize every (tier, source, bucket) group that is
    strictly inside a source-run AT ITS OWN TIER, sort-free (see
    stages/rollup.py HolisticClustered). Per-tier edge classification means
    a 1m bucket interior to a run finalizes in-task even when its parent 1d
    bucket straddles the block edge.

    pass 2: re-read and emit mergeable partial states (value histograms +
    scalar states, kernels/holistic_states.py) for ONLY the per-tier
    run-edge groups, hash-partitioned on (source, tier, bucket); one
    map_groups merges fragments and finalizes exactly. The exchange volume
    is O(edge buckets x distinct values), not raw rows — on the 60M-row
    bench corpus 2.5x fewer rows than shipping edge-bucket rows, and the
    merge work is proportional to states, so the lane scales like the pure
    map it mostly is. Every aggregation in the vocabulary (quantiles, mode,
    count_distinct, EWMA, trend, time-since-extreme, ...) finalizes
    EXACTLY from the merged states; float results match the row kernel to
    summation-reorder precision (~1e-12), bit-exact for order statistics.

    The boundary branch is small and MATERIALIZED before the union (a lazy
    union of two multi-operator branches stalls Ray's streaming executor);
    the interior branch streams.

    `max_boundary_fraction` (opt-in): probe the coarse-tier edge fraction
    and fall back to the unclustered lane above the threshold — with the
    state-based exchange the clustered lane wins even at high fractions,
    so the probe is off by default."""
    if not _clustered_precondition_ok(source_paths, cfg):
        return rollup_holistic_long(ds, cfg)
    ordered = _tier_widths_ok(cfg.tiers)
    coarse_w = ordered[-1][1]

    if max_boundary_fraction is not None:
        import numpy as np

        def frac(b: pa.Table) -> pa.Table:
            src = np.asarray(b[cfg.source_col]).astype(str)
            ts_us = R.ts_to_us(b[cfg.ts_col].combine_chunks())
            m = _run_boundary_mask(src, ts_us, coarse_w)
            return pa.table(
                {"b": pa.array([int(m.sum())]), "n": pa.array([len(b)])}
            )

        agg = ds.select_columns([cfg.source_col, cfg.ts_col]).map_batches(
            frac, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).sum(["b", "n"])
        total = agg["sum(n)"] or 1
        if agg["sum(b)"] / total > max_boundary_fraction:
            return rollup_holistic_long(ds, cfg)

    hc = R.HolisticClustered(
        source_col=cfg.source_col,
        ts_col=cfg.ts_col,
        value_col=cfg.value_col,
        tiers=dict(ordered),
        aggs=cfg.aggs,
        num_partitions=cfg.num_partitions,
        tile_rows=cfg.tile_rows,
    )
    cols = [cfg.source_col, cfg.ts_col] + (
        list(cfg.value_col)
        if isinstance(cfg.value_col, (list, tuple))
        else [cfg.value_col]
    )

    interior = ds.select_columns(cols).map_batches(
        hc.interior, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    boundary = (
        ds.select_columns(cols)
        .map_batches(
            hc.states, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("_part")
        .map_groups(
            lambda t: hc.merge(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    ).materialize()
    return interior.union(boundary)


def apply_retention_long(tbl: pa.Table, cfg: RollupConfig) -> pa.Table:
    """Per-tier TTL filter for LONG-format rollup rows (tier column):
    drop buckets whose END falls before (watermark - ttl). Used by the
    checkpointed runners, which produce long-format partitions."""
    if cfg.watermark_us is None or not cfg.retention:
        return tbl
    import numpy as np

    tier = np.asarray(tbl["tier"]).astype(str)
    end_us = np.asarray(tbl["bucket_ts"].cast(pa.int64()))
    keep = np.ones(len(tbl), dtype=bool)
    for name, width in cfg.tiers.items():
        ttl = cfg.retention.get(name)
        if ttl is None:
            continue
        cutoff = cfg.watermark_us - ttl * US
        m = tier == name
        keep[m] = (end_us[m] + width * US) >= cutoff
    return tbl.filter(pa.array(keep))


def read_clustered_paths(paths: list[str], *, columns: list[str]):
    """Clustered-lane fast-path source: one whole file per task, decoded
    in-task with a plain single-threaded pq.read_table.

    Measured on the 60M-row bench corpus: Ray's generic parquet scanner
    spends ~10x the raw decode cost building/slicing its stream of small
    record batches and does not parallelize past ~8 CPUs; this path decodes
    at raw pyarrow speed and scales with cores. The downstream per-block
    kernel map fuses with the decode map (both task-pool operators), so
    decode -> partials runs as ONE task per file with zero intermediate
    object-store hop. Blocks are whole files — exactly the clustered lanes'
    "contiguous rows of one file" contract. At 100 TB the same shape holds:
    one task per file (or per row-group range for jumbo files), no
    all-to-all anywhere.
    """
    import ray.data as rd

    paths = sorted(paths)

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        tables = [
            pq.read_table(str(p), columns=columns, use_threads=False)
            for p in batch["item"]
        ]
        return pa.concat_tables(tables)

    return rd.from_items(paths, override_num_blocks=len(paths)).map_batches(
        decode, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# fused single-pass clustered lanes
# ---------------------------------------------------------------------------


def _shard_of(key: str, n: int) -> int:
    import zlib

    return zlib.crc32(key.encode()) % n


def _boundary_accumulators(n_shards: int = 1):
    """Per-lane actor POOL collecting boundary partial rows from fused
    tasks, sharded by work-item key hash so the per-item round trips don't
    serialize on one actor at high worker counts (each message is tiny but
    the round-trip latency funnels; measured in tools/bench_actor_shards).

    Keyed by (path, span), so a Ray task RETRY overwrites its own earlier
    push instead of double-counting — the collect step is exact under task
    re-execution. Volume is O(files x tiers x 2) tiny rows."""
    import ray

    @ray.remote(num_cpus=0)
    class BoundaryAccumulator:
        def __init__(self):
            self._parts: dict[str, pa.Table] = {}

        def put(self, key: str, tbl: pa.Table) -> None:
            self._parts[key] = tbl

        def collect_parts(self) -> dict[str, pa.Table]:
            return dict(self._parts)

        def collect_concat(self) -> "pa.Table | None":
            """One concatenated table per shard (key-sorted, `_path`
            column carrying the work-item key) instead of a dict of
            hundreds of tiny tables — shipping the dict cost ~3 s of
            driver wall at 640 work items (per-table pickle overhead),
            a flat CPU-count-insensitive tax on the lane."""
            if not self._parts:
                return None
            tbls = []
            for k in sorted(self._parts):
                t = self._parts[k]
                if t is None or len(t) == 0:
                    continue
                tbls.append(t.append_column(
                    "_path", pa.array([k] * len(t), type=pa.string())
                ))
            return pa.concat_tables(tbls) if tbls else None

    return [BoundaryAccumulator.remote() for _ in range(max(1, n_shards))]


def _collect_sharded(actors, method: str = "collect_parts") -> dict:
    import ray

    out: dict = {}
    for d in ray.get([getattr(a, method).remote() for a in actors]):
        out.update(d)
    return out


def _collect_boundary_concat(accs) -> "pa.Table | None":
    """Gather per-shard concatenated boundary tables and restore the
    canonical global order (stable sort by work-item key) so downstream
    float summation order — and therefore the merged output — is
    bit-identical to the old sorted-dict concat."""
    import numpy as np
    import ray

    tbls = [
        t for t in ray.get([a.collect_concat.remote() for a in accs])
        if t is not None and len(t)
    ]
    if not tbls:
        return None
    cat = pa.concat_tables(tbls).combine_chunks()
    keys = np.asarray(cat["_path"]).astype(str)
    return cat.take(pa.array(np.argsort(keys, kind="stable")))


_MANIFEST_FIELDS = [("file", pa.string()), ("rows", pa.int64())]


def _manifest_table(entries: list[tuple[str, int]]) -> pa.Table:
    return pa.table(
        {
            "file": pa.array([e[0] for e in entries], type=pa.string()),
            "rows": pa.array([e[1] for e in entries], type=pa.int64()),
        }
    )


def _sink_write(tbl: pa.Table, sink_dir: str, key: str,
                compression: str = "snappy") -> tuple[str, int]:
    """Write one partition of the rollup product inside the producing task:
    atomic tmp+rename keyed by the work item, so a task retry overwrites
    its own file (exactly-once layout, resumable — a rerun can skip files
    already present)."""
    import os
    import re
    import uuid

    import pyarrow.parquet as pq

    fname = "part-" + re.sub(r"[^A-Za-z0-9._-]+", "_", key) + ".parquet"
    tmp = os.path.join(sink_dir, f".{fname}.{uuid.uuid4().hex[:8]}.tmp")
    # Encode tuning (measured 1.6x less CPU per span, same bytes +-15%):
    # dictionary only for string key columns (the default dict ATTEMPT on
    # every float agg column builds a hash table per chunk then falls
    # back), column stats only for the pruning keys (checkpoint re-reads
    # and the watermark prune on source/tier/bucket_ts; per-agg stats are
    # dead weight), BYTE_STREAM_SPLIT for float64 agg columns (cheaper
    # than dict and compresses f64 better under snappy).
    names = tbl.column_names
    str_cols = [
        c for c in names if pa.types.is_string(tbl.schema.field(c).type)
        or pa.types.is_dictionary(tbl.schema.field(c).type)
    ]
    f64_cols = [
        c for c in names if tbl.schema.field(c).type == pa.float64()
    ]
    key_cols = [c for c in names if c in ("source", "tier", "bucket_ts")]
    pq.write_table(
        tbl, tmp, compression=compression,
        use_dictionary=str_cols or False,
        write_statistics=key_cols or True,
        use_byte_stream_split=f64_cols or False,
    )
    os.replace(tmp, os.path.join(sink_dir, fname))
    return fname, len(tbl)


def _clustered_ok(paths: list[str], cfg: RollupConfig) -> bool:
    if cfg.assume_clustered is True:
        return True
    if cfg.assume_clustered is False:
        return False
    return R.clustered_files_nonoverlapping(list(paths), ts_col=cfg.ts_col)


def _check_boundary_intervals(
    parts: "dict[str, pa.Table] | pa.Table | None",
    *,
    tier_col: str,
    bucket_col: str = "bucket",
    source_col: str = "source",
    width_col: str | None = None,
) -> None:
    """Exact post-hoc verification of the clustered-layout claim, from data
    the accumulator already holds (O(files x sources x tiers) tiny rows):
    at the finest tier, each file's per-source [first_bucket, last_bucket]
    hull must not overlap any other file's hull for the same source beyond
    a shared endpoint (a shared endpoint bucket is boundary in BOTH files,
    so it merges correctly). Any interior double-emission requires an
    overlap that this check detects — a wrong `assume_clustered=True`
    vouch fails loudly instead of silently duplicating rows.

    Accepts either a dict path -> boundary table or ONE concatenated table
    carrying a `_path` column (the fast lane: _collect_boundary_concat).
    Vectorized throughout — the former pandas iterrows pass cost ~0.7 s of
    flat driver wall at 640 work items."""
    import numpy as np

    if isinstance(parts, pa.Table):
        t = parts
    else:
        tbls = []
        for path in sorted(parts):
            p = parts[path]
            if p is None or len(p) == 0:
                continue
            tbls.append(p.append_column(
                "_path", pa.array([path] * len(p), type=pa.string())
            ))
        t = pa.concat_tables(tbls) if tbls else None
    if t is None or len(t) == 0:
        return
    key = width_col if width_col else tier_col
    kv = t[key].combine_chunks()
    t = t.filter(pc.equal(kv, pc.min(kv)))
    if len(t) == 0:
        return
    src_col = t[source_col].combine_chunks()
    if pa.types.is_dictionary(src_col.type):
        src_col = src_col.cast(pa.string())
    src = np.asarray(src_col).astype(str)
    b = np.asarray(t[bucket_col].combine_chunks(), dtype=np.int64)
    path_arr = np.asarray(t["_path"].combine_chunks()).astype(str)
    # per-(source, path) hull via one lexsort + run boundaries
    order = np.lexsort((b, path_arr, src))
    s_s, p_s, b_s = src[order], path_arr[order], b[order]
    new = np.ones(len(s_s), dtype=bool)
    new[1:] = (s_s[1:] != s_s[:-1]) | (p_s[1:] != p_s[:-1])
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(s_s))
    h_src, h_path = s_s[starts], p_s[starts]
    h_min, h_max = b_s[starts], b_s[ends - 1]
    # per-source overlap sweep: sort hulls by (source, min); each hull's
    # min must be >= the running max of earlier hulls of the same source
    o2 = np.lexsort((h_min, h_src))
    hs, hp, hmn, hmx = h_src[o2], h_path[o2], h_min[o2], h_max[o2]
    ns = np.ones(len(hs), dtype=bool)
    ns[1:] = hs[1:] != hs[:-1]
    st = np.flatnonzero(ns)
    for s0, s1 in zip(st, np.append(st[1:], len(hs))):
        if s1 - s0 < 2:
            continue
        runmax = np.maximum.accumulate(hmx[s0:s1])
        viol = np.flatnonzero(hmn[s0 + 1:s1] < runmax[:-1])
        if len(viol):
            j = s0 + 1 + int(viol[0])
            raise ValueError(
                "clustered-layout precondition violated: source "
                f"{hs[s0]!r} time ranges overlap between {hp[j - 1]} and "
                f"{hp[j]}; rerun with assume_clustered=False "
                "(unclustered lane) or fix the shard layout"
            )


def _maybe_crash(inject_dir: str | None, item_key: str) -> None:
    """Test-only: first attempt per work item dies (simulated worker
    crash) right after its side-channel put. No-op when inject_dir unset.
    A marker file (not process state) tracks attempts, so the retry —
    which may land on any worker — sees it and proceeds."""
    if not inject_dir:
        return
    import os

    marker = os.path.join(
        inject_dir, item_key.replace("/", "_").replace("#", "_")
    )
    if not os.path.exists(marker):
        with open(marker, "w"):
            pass
        os._exit(1)


def _fused_task_items(paths: list[str], max_rows: int):
    """One work item per (path, row-group span), spans sized <= max_rows
    from footer metadata only. Small files stay one task; a huge file
    splits into row-group ranges so no single task decodes more than
    ~max_rows — the boundary rule is per source-RUN within a task's
    table, so a span cut inside a run just turns that cut bucket into a
    boundary bucket on both sides (merged exactly downstream)."""
    import pyarrow.parquet as pq

    items = []
    for p in sorted(paths):
        md = pq.ParquetFile(p).metadata
        nrg = md.num_row_groups
        if nrg == 0 or md.num_rows == 0:
            continue
        lo, acc = 0, 0
        for g in range(nrg):
            acc += md.row_group(g).num_rows
            if acc >= max_rows:
                items.append({"path": p, "lo": lo, "hi": g + 1})
                lo, acc = g + 1, 0
        if lo < nrg:
            items.append({"path": p, "lo": lo, "hi": nrg})
    return items


def _fused_items_ds(items: list[dict]):
    import ray.data as rd

    return rd.from_items(items, override_num_blocks=max(1, len(items)))


def _read_span(
    path: str, lo: int, hi: int, columns: list[str],
    dict_cols: tuple[str, ...] = (),
) -> pa.Table:
    import pyarrow.parquet as pq

    # decode key columns straight to dictionary: the kernels work on codes,
    # so dense-string materialization is pure wasted bandwidth
    pf = pq.ParquetFile(path, read_dictionary=list(dict_cols))
    try:
        return pf.read_row_groups(
            list(range(lo, hi)), columns=columns, use_threads=False
        )
    finally:
        pf.close()


def rollup_decomposable_clustered_fused(paths: list[str], cfg: RollupConfig):
    """ONE-pass decomposable clustered lane over Parquet paths.

    The two-pass lane (rollup_decomposable_clustered_long) decodes and
    computes partial states TWICE — once to stream interior finals, once
    to re-derive the boundary rows. Here each task (one file) decodes
    once, computes partials once, pushes its few boundary rows to an
    accumulator actor (retry-idempotent, keyed by path) and returns the
    finalized interior rows. The interior output is materialized (it is
    the final rollup — the same blocks the consumer needs, so the pin is
    free) as the barrier guaranteeing every push arrived; the driver then
    merges the tiny boundary set. Halves per-lane kernel+decode work and
    removes the second task wave's straggler tail, which bites hardest at
    high CPU counts."""
    import ray
    import ray.data as rd

    if not _clustered_ok(paths, cfg):
        return rollup_decomposable_long(_read_cols(paths, cfg), cfg)
    ordered = _tier_widths_ok(cfg.tiers)
    need_fl = "first" in cfg.aggs or "last" in cfg.aggs
    cols = [cfg.source_col, cfg.ts_col] + (
        list(cfg.value_col)
        if isinstance(cfg.value_col, (list, tuple))
        else [cfg.value_col]
    )
    items = _fused_task_items(paths, cfg.max_task_rows)
    sink = cfg.sink_dir
    inband = bool(sink) and cfg.inband_side_channel
    if sink:
        import os

        os.makedirs(sink, exist_ok=True)

    if inband:
        # Sink mode without the accumulator actors: raw Ray tasks return
        # (manifest rows, boundary partials) as two DRIVER-OWNED objects —
        # no actor round trip, no Ray Data plan startup, exactly-once via
        # lineage retry + atomic-rename sink writes. Boundary volume is
        # O(run-edge buckets), the same tiny table the actor collect
        # pulled to the driver before.
        sink_comp = cfg.sink_compression
        fault_dir = cfg.fault_inject_dir
        source_col, ts_col, value_col = (
            cfg.source_col, cfg.ts_col, cfg.value_col
        )
        tile_rows, aggs = cfg.tile_rows, cfg.aggs

        @ray.remote(num_cpus=1, num_returns=2)
        def map_item(p: str, lo: int, hi: int):
            key = f"{p}#{lo}"
            t = _read_span(str(p), int(lo), int(hi), cols,
                           dict_cols=(source_col,))
            parts = R.tiered_partials_clustered(
                t, source_col=source_col, ts_col=ts_col,
                value_col=value_col, tiers=ordered, first_last=need_fl,
                tile_rows=tile_rows,
            )
            bmask = parts["_boundary"].combine_chunks()
            # one chunk: the filtered slice inherits the partials'
            # ~60-chunk layout — thousands of tiny buffers at the driver
            # concat otherwise (measured r3)
            pb = parts.filter(bmask).combine_chunks()
            pb = pb.append_column(
                "_path", pa.array([key] * len(pb), type=pa.string())
            )
            inner = parts.filter(pc.invert(bmask))
            fin = R.finalize_tiered(inner, aggs=aggs)
            mani = _manifest_table(
                [_sink_write(fin, sink, key, sink_comp)]
                if fin is not None else []
            )
            if fault_dir:
                # worst in-band failure point: sink file written, returns
                # not yet committed — lineage retry must overwrite the
                # file and replace both return objects
                _maybe_crash(fault_dir, key)
            return mani, pb

        refs = [
            map_item.remote(it["path"], int(it["lo"]), int(it["hi"]))
            for it in items
        ]
        manis = [m for m in ray.get([r[0] for r in refs]) if m.num_rows]
        bnds = [b for b in ray.get([r[1] for r in refs]) if b.num_rows]
        cat = pa.concat_tables(bnds) if bnds else None
        _check_boundary_intervals(cat, tier_col="tier", width_col="width_s")
        out_tbls = list(manis)
        if cat is not None and len(cat):
            merged = R.merge_tiered(cat.drop_columns(["_path"]), aggs=aggs)
            out_tbls.append(_manifest_table(
                [_sink_write(merged, sink, "boundary", sink_comp)]
            ))
        if not out_tbls:
            return rd.from_arrow(_manifest_table([]))
        return rd.from_arrow(pa.concat_tables(out_tbls))

    accs = _boundary_accumulators(cfg.side_channel_shards)

    def task(batch: pa.Table) -> pa.Table:
        outs = []
        manifest: list[tuple[str, int]] = []
        for p, lo, hi in zip(
            batch["path"].to_pylist(),
            batch["lo"].to_pylist(),
            batch["hi"].to_pylist(),
        ):
            key = f"{p}#{lo}"
            t = _read_span(str(p), int(lo), int(hi), cols,
                           dict_cols=(cfg.source_col,))
            parts = R.tiered_partials_clustered(
                t,
                source_col=cfg.source_col,
                ts_col=cfg.ts_col,
                value_col=cfg.value_col,
                tiers=ordered,
                first_last=need_fl,
                tile_rows=cfg.tile_rows,
            )
            bmask = parts["_boundary"].combine_chunks()
            # async put overlapped with the interior finalize; the get
            # before return still guarantees the boundary rows are durable
            # when the task is marked done (exactly-once under retry)
            acc = accs[_shard_of(key, len(accs))]
            # combine_chunks: the filtered boundary slice inherits the
            # partials' ~60-chunk layout; shipping ~9k tiny buffers cost
            # 0.4s PER SHARD at collect (measured) — one chunk fixes it
            fut = acc.put.remote(key, parts.filter(bmask).combine_chunks())
            if cfg.fault_inject_dir:
                ray.get(fut)
                _maybe_crash(cfg.fault_inject_dir, key)
            inner = parts.filter(pc.invert(bmask))
            fin = R.finalize_tiered(inner, aggs=cfg.aggs)
            ray.get(fut)
            if fin is not None:
                if sink:
                    manifest.append(
                        _sink_write(fin, sink, key, cfg.sink_compression)
                    )
                else:
                    outs.append(fin)
        if sink:
            return _manifest_table(manifest)
        if not outs:
            fin = R.finalize_partials(
                R._EMPTY_PARTIALS, width_s=ordered[0][1], aggs=cfg.aggs
            )
            return fin.add_column(0, "tier", pa.array([], type=pa.string()))
        return pa.concat_tables(outs)

    interior = _fused_items_ds(items).map_batches(
        task, batch_format="pyarrow", batch_size=None
    ).materialize()
    cat = _collect_boundary_concat(accs)
    for a in accs:
        ray.kill(a)
    _check_boundary_intervals(cat, tier_col="tier", width_col="width_s")
    if cat is None or len(cat) == 0:
        return interior
    merged = R.merge_tiered(cat.drop_columns(["_path"]), aggs=cfg.aggs)
    if sink:
        entry = _sink_write(merged, sink, "boundary", cfg.sink_compression)
        return interior.union(rd.from_arrow(_manifest_table([entry])))
    return interior.union(rd.from_arrow(merged))


def _ref_registry():
    """Per-lane actor that OWNS the per-file boundary-state objects and
    their layout summaries. Tasks `ray.put(states, _owner=registry)` so the
    objects outlive the producing worker, then register (path -> ref,
    hull); keyed by path, a task RETRY overwrites its own entry — exact
    under re-execution. Messages carry only a ref + a ~sources-sized hull
    table, so actor traffic is O(files), not O(state rows)."""
    import ray

    @ray.remote(num_cpus=0)
    class RefRegistry:
        def __init__(self):
            self._entries: dict[str, tuple] = {}

        def put(self, key: str, ref, hull: pa.Table) -> None:
            self._entries[key] = (ref, hull)

        def collect(self) -> tuple:
            """(key -> ref-payload dict, ONE concatenated hull table with
            a `_path` column) — hulls are bundled inside the actor because
            shipping hundreds of tiny per-file tables out of an actor cost
            ~3 s of flat driver wall at 640 work items."""
            ents = {k: v[0] for k, v in self._entries.items()}
            hulls = []
            for k in sorted(self._entries):
                h = self._entries[k][1]
                if h is None or len(h) == 0:
                    continue
                hulls.append(h.append_column(
                    "_path", pa.array([k] * len(h), type=pa.string())
                ))
            return ents, (pa.concat_tables(hulls) if hulls else None)

    return RefRegistry.remote()


def _source_ts_hulls(t: pa.Table, *, source_col: str, ts_col: str) -> pa.Table:
    """Exact per-source (min_ts, max_ts) of one file — the layout-check
    summary (O(sources) rows).

    Dictionary-code fast path: the fused lanes read `source` dictionary-
    encoded, and densifying it to python strings + ufunc.at cost ~1us/row
    (measured 1.9s per 1.9M-row task — 14%% of lane CPU); integer codes +
    argsort + reduceat is ~30x cheaper and bit-identical."""
    import numpy as np

    if len(t) == 0:
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "min_ts": pa.array([], type=pa.int64()),
                "max_ts": pa.array([], type=pa.int64()),
            }
        )
    ts = R.ts_to_us(t[ts_col].combine_chunks())
    col = t[source_col].combine_chunks()
    if pa.types.is_dictionary(col.type):
        key = col.indices
        vals = np.asarray(col.dictionary).astype(str)
    else:
        key = col
        vals = None
    g = (
        pa.table({"k": key, "ts": pa.array(ts)})
        # use_threads=False: runs inside a num_cpus=1 Ray task — Arrow's
        # own pool would oversubscribe the box at full task concurrency
        .group_by("k", use_threads=False)
        .aggregate([("ts", "min"), ("ts", "max")])
    )
    if vals is not None:
        uniq = vals[np.asarray(g["k"], dtype=np.int64)]
    else:
        uniq = np.asarray(g["k"]).astype(str)
    mn = np.asarray(g["ts_min"], dtype=np.int64)
    mx = np.asarray(g["ts_max"], dtype=np.int64)
    # group order is arrival order — sort by source for a canonical hull
    s_order = np.argsort(uniq, kind="stable")
    return pa.table(
        {
            "source": pa.array(uniq[s_order]),
            "min_ts": pa.array(mn[s_order]),
            "max_ts": pa.array(mx[s_order]),
        }
    )


def _check_ts_hulls(hull_tbl: "pa.Table | None") -> None:
    """Verify the vouched clustered layout exactly: per source, the
    per-file [min_ts, max_ts] intervals must be pairwise non-overlapping
    (shared endpoints allowed — the bucket containing a shared endpoint is
    the last bucket of one file and the first of the other, so it is
    boundary in BOTH and merges correctly at every tier). A wrong
    `assume_clustered=True` vouch fails loudly instead of double-emitting
    interior buckets.

    Takes ONE concatenated hull table with a `_path` column (bundled
    inside the registry actor — see RefRegistry.collect)."""
    import numpy as np

    if hull_tbl is None or len(hull_tbl) == 0:
        return
    t = hull_tbl.combine_chunks()
    src = np.asarray(t["source"]).astype(str)
    mn = np.asarray(t["min_ts"], dtype=np.int64)
    mx = np.asarray(t["max_ts"], dtype=np.int64)
    paths_arr = np.asarray(t["_path"]).astype(str)
    # one vectorized pass: lexsort by (source, min_ts); within a source run,
    # every interval's min_ts must be >= the running max of previous
    # intervals' max_ts (shared endpoints allowed — see docstring)
    order = np.lexsort((mn, src))
    src_s, mn_s, mx_s, p_s = (
        src[order], mn[order], mx[order], paths_arr[order]
    )
    new_src = np.empty(len(src_s), dtype=bool)
    new_src[0] = True
    new_src[1:] = src_s[1:] != src_s[:-1]
    # per-source contiguous runs after the lexsort; the loop is O(#sources)
    # Python iterations with the O(#files-per-source) work vectorized inside
    starts = np.flatnonzero(new_src)
    for s0, s1 in zip(starts, np.append(starts[1:], len(src_s))):
        if s1 - s0 == 1:
            continue
        runmax = np.maximum.accumulate(mx_s[s0:s1])
        viol = np.flatnonzero(mn_s[s0 + 1:s1] < runmax[:-1])
        if len(viol):
            j = s0 + 1 + int(viol[0])
            raise ValueError(
                "clustered-layout precondition violated: source "
                f"{src_s[s0]!r} time ranges overlap between "
                f"{p_s[j - 1]} and {p_s[j]}; rerun with "
                "assume_clustered=False (unclustered lane) or fix the "
                "shard layout"
            )


def _rollup_holistic_fused_inband(paths: list[str], cfg: RollupConfig,
                                  hc, cols: list[str]):
    """Sink-mode holistic fused lane WITHOUT the side-channel registry.

    The actor path exists to keep per-task state objects alive after the
    producing worker exits (`ray.put(_owner=registry)`), at the cost of a
    blocking put + actor round trip per task (~50 ms wall each, measured)
    plus registry spawn/collect phases that do not scale with CPU count.
    Raw Ray tasks make all of that free: a task's RETURN VALUES are owned
    by the driver, survive worker exit, and are retried through normal
    lineage — so each map task simply returns (manifest rows, hull,
    {shard offsets, shard-sorted states}) as three objects. The merge
    stage is byte-identical to the actor path: merge task s zero-copy
    slices [offs[s], offs[s+1]) of every states object. Interior rows are
    written to the Parquet sink inside the task (atomic rename,
    idempotent), exactly as in the actor path."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    items = _fused_task_items(paths, cfg.max_task_rows)
    n_merge = max(4, min(64, len(items) // 4 or 1))
    sink = cfg.sink_dir
    os.makedirs(sink, exist_ok=True)
    sink_comp = cfg.sink_compression
    fault_dir = cfg.fault_inject_dir
    source_col, ts_col = cfg.source_col, cfg.ts_col

    @ray.remote(num_cpus=1, num_returns=3)
    def map_item(p: str, lo: int, hi: int):
        key = f"{p}#{lo}"
        t = _read_span(str(p), int(lo), int(hi), cols,
                       dict_cols=(source_col,))
        st = hc.states(t)
        shard = (np.asarray(st["_part"]) % n_merge).astype(np.int64)
        order = np.argsort(shard, kind="stable")
        st_sorted = (
            st.drop_columns(["_part"]).take(pa.array(order)).combine_chunks()
        )
        offs = np.concatenate(
            [[0], np.cumsum(np.bincount(shard, minlength=n_merge))]
        ).tolist()
        hull = _source_ts_hulls(t, source_col=source_col, ts_col=ts_col)
        hull = hull.append_column(
            "_path", pa.array([key] * len(hull), type=pa.string())
        )
        fin = hc.interior(t)
        entry = _sink_write(fin, sink, key, sink_comp)
        if fault_dir:
            # worst in-band failure point: sink file written, returns not
            # yet committed — the lineage retry must rewrite the file
            # (atomic rename) and replace all three return objects
            _maybe_crash(fault_dir, key)
        return _manifest_table([entry]), hull, (offs, st_sorted)

    refs = [
        map_item.remote(it["path"], int(it["lo"]), int(it["hi"]))
        for it in items
    ]
    mani_refs = [r[0] for r in refs]
    hull_refs = [r[1] for r in refs]
    st_refs = [r[2] for r in refs]

    @ray.remote
    def merge_shard(s: int, *payloads):
        parts = [
            st.slice(offs[s], offs[s + 1] - offs[s]) for offs, st in payloads
        ]
        nonempty = [p for p in parts if len(p)]
        if not nonempty:
            return _manifest_table([])
        merged = hc.merge(pa.concat_tables(nonempty))
        return _manifest_table(
            [_sink_write(merged, sink, f"boundary-{s}", sink_comp)]
        )

    # submit merges first: they start the moment the last map task lands,
    # overlapping the driver's hull check below
    final_refs = [merge_shard.remote(s, *st_refs) for s in range(n_merge)]

    hulls = [h for h in ray.get(hull_refs) if h is not None and len(h)]
    _check_ts_hulls(pa.concat_tables(hulls) if hulls else None)
    manis = [m for m in ray.get(mani_refs) if m.num_rows]
    finals = ray.get(final_refs)
    out = pa.concat_tables(manis + [f for f in finals if f.num_rows])
    if out.num_rows == 0:
        out = _manifest_table([])
    return rd.from_arrow(out)


def rollup_holistic_clustered_fused(paths: list[str], cfg: RollupConfig):
    """ONE-pass holistic clustered lane over Parquet paths (see the
    decomposable twin above). Each task decodes its file once, streams
    finalized interior rows, `ray.put`s its edge-group mergeable states
    (kernels/holistic_states.py) ONCE — owner transferred to a registry
    actor so the object outlives the worker — and registers the ref plus
    an exact per-source ts hull. After the interior barrier the states
    refs become the input of a DIRECT sharded exchange: the task pre-split
    its states by `_part %% n_merge`, so merge task i fetches exactly the
    shard-i objects (each object moves once — push-style, no sort-shuffle
    machinery; measured 10.8s -> ~2s vs Ray Data's groupby on the same
    400MB of states). State volume is O(edge buckets x distinct values):
    too large to funnel through one actor or a driver merge (measured 5x
    lane slowdown), but small as a one-hop exchange."""
    import ray
    import ray.data as rd

    if not _clustered_ok(paths, cfg):
        return rollup_holistic_long(_read_cols(paths, cfg), cfg)
    ordered = _tier_widths_ok(cfg.tiers)
    hc = R.HolisticClustered(
        source_col=cfg.source_col,
        ts_col=cfg.ts_col,
        value_col=cfg.value_col,
        tiers=dict(ordered),
        aggs=cfg.aggs,
        num_partitions=cfg.num_partitions,
        tile_rows=cfg.tile_rows,
    )
    cols = [cfg.source_col, cfg.ts_col] + (
        list(cfg.value_col)
        if isinstance(cfg.value_col, (list, tuple))
        else [cfg.value_col]
    )
    if cfg.sink_dir and cfg.inband_side_channel:
        return _rollup_holistic_fused_inband(paths, cfg, hc, cols)

    regs = [_ref_registry() for _ in range(max(1, cfg.side_channel_shards))]
    # ray.put(_owner=...) from a worker requires the owner actor to be
    # fully started — force creation before any task runs
    import ray as _ray

    _ray.get([r.collect.remote() for r in regs])

    items = _fused_task_items(paths, cfg.max_task_rows)
    n_merge = max(4, min(64, len(items) // 4 or 1))
    sink = cfg.sink_dir
    if sink:
        import os

        os.makedirs(sink, exist_ok=True)

    def task(batch: pa.Table) -> pa.Table:
        import numpy as np

        outs = []
        manifest: list[tuple[str, int]] = []
        for p, lo, hi in zip(
            batch["path"].to_pylist(),
            batch["lo"].to_pylist(),
            batch["hi"].to_pylist(),
        ):
            key = f"{p}#{lo}"
            t = _read_span(str(p), int(lo), int(hi), cols,
                           dict_cols=(cfg.source_col,))
            # states first, put, THEN interior: _prep is cheap (~15% of the
            # task) so sharing it buys little, while holding both outputs
            # alive doubles peak worker memory — measurably slower with 32
            # workers on one memory bus (interleaved A/B at 60M rows)
            st = hc.states(t)
            hull = _source_ts_hulls(
                t, source_col=cfg.source_col, ts_col=cfg.ts_col
            )
            # ONE object per task: states sorted by merge shard + an
            # offsets vector. Per-shard ray.put (n_merge x more objects)
            # measured 2.5x the put cost under 32-worker contention, and
            # _owner transfer serializes on the registry — so batch it;
            # merge task s zero-copy-slices [offs[s], offs[s+1]).
            shard = (np.asarray(st["_part"]) % n_merge).astype(np.int64)
            order = np.argsort(shard, kind="stable")
            st_sorted = (
                st.drop_columns(["_part"]).take(pa.array(order)).combine_chunks()
            )
            offs = np.concatenate(
                [[0], np.cumsum(np.bincount(shard, minlength=n_merge))]
            ).tolist()
            reg = regs[_shard_of(key, len(regs))]
            ref = ray.put(st_sorted, _owner=reg)
            # async registry message overlapped with the interior pass;
            # the get before return keeps the ref durable-before-done
            fut = reg.put.remote(key, (ref, offs), hull)
            if cfg.fault_inject_dir:
                ray.get(fut)
                _maybe_crash(cfg.fault_inject_dir, key)
            fin = hc.interior(t)
            ray.get(fut)
            if sink:
                manifest.append(
                    _sink_write(fin, sink, key, cfg.sink_compression)
                )
            else:
                outs.append(fin)
        if sink:
            return _manifest_table(manifest)
        return pa.concat_tables(outs) if outs else hc.final_schema().empty_table()

    interior = _fused_items_ds(items).map_batches(
        task, batch_format="pyarrow", batch_size=None
    ).materialize()
    entries: dict = {}
    hull_tbls = []
    for ents, ht in ray.get([r.collect.remote() for r in regs]):
        entries.update(ents)
        if ht is not None and len(ht):
            hull_tbls.append(ht)
    _check_ts_hulls(pa.concat_tables(hull_tbls) if hull_tbls else None)
    if not entries:
        for r in regs:
            ray.kill(r)
        return interior

    @ray.remote
    def merge_shard(s, offsets, *tables):
        parts = [
            t.slice(off[s], off[s + 1] - off[s])
            for t, off in zip(tables, offsets)
        ]
        nonempty = [p for p in parts if len(p)]
        if not nonempty:
            merged = hc.final_schema().empty_table()
        else:
            merged = hc.merge(pa.concat_tables(nonempty))
        if sink:
            return _manifest_table(
                [_sink_write(merged, sink, f"boundary-{s}",
                             cfg.sink_compression)]
            )
        return merged

    sorted_entries = [v for _, v in sorted(entries.items())]
    refs = [r for r, _ in sorted_entries]
    offsets = [o for _, o in sorted_entries]
    final_refs = [
        merge_shard.remote(s, offsets, *refs) for s in range(n_merge)
    ]
    boundary = rd.from_arrow_refs(final_refs).materialize()
    for r in regs:
        ray.kill(r)
    return interior.union(boundary)


def _rollup_both_fused_inband(
    paths: list[str], cfg_d: RollupConfig, cfg_h: RollupConfig
):
    """Sink-mode both-lane fusion, in-band side channel: each raw Ray task
    decodes its span ONCE, runs both kernels, writes both lanes' interior
    rows to their Parquet sinks inside the task, and returns (decomp
    manifest, holistic manifest, decomp boundary partials, hull,
    (offs, shard-sorted holistic states)) as five driver-owned objects —
    the decode-once win of the both-lane WITHOUT the registry actors.
    Exactly-once: lineage retry + atomic-rename idempotent sink writes
    (same argument as the single in-band lanes, fault-suite tested there).
    Returns (decomposable_manifest_ds, holistic_manifest_ds), bit-equal to
    the two separate in-band lanes (tested)."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    ordered_d = _tier_widths_ok(cfg_d.tiers)
    need_fl = "first" in cfg_d.aggs or "last" in cfg_d.aggs
    hc = R.HolisticClustered(
        source_col=cfg_h.source_col,
        ts_col=cfg_h.ts_col,
        value_col=cfg_h.value_col,
        tiers=dict(_tier_widths_ok(cfg_h.tiers)),
        aggs=cfg_h.aggs,
        num_partitions=cfg_h.num_partitions,
        tile_rows=cfg_h.tile_rows,
    )
    vcols_h = (
        list(cfg_h.value_col)
        if isinstance(cfg_h.value_col, (list, tuple))
        else [cfg_h.value_col]
    )
    cols = [cfg_d.source_col, cfg_d.ts_col] + sorted(
        {cfg_d.value_col} | set(vcols_h)
    )
    items = _fused_task_items(
        paths, min(cfg_d.max_task_rows, cfg_h.max_task_rows)
    )
    n_merge = max(4, min(64, len(items) // 4 or 1))
    sink_d, sink_h = cfg_d.sink_dir, cfg_h.sink_dir
    os.makedirs(sink_d, exist_ok=True)
    os.makedirs(sink_h, exist_ok=True)
    comp_d, comp_h = cfg_d.sink_compression, cfg_h.sink_compression
    fault_dir = cfg_d.fault_inject_dir or cfg_h.fault_inject_dir
    source_col, ts_col = cfg_d.source_col, cfg_d.ts_col
    value_col_d, tile_d, aggs_d = (
        cfg_d.value_col, cfg_d.tile_rows, cfg_d.aggs
    )

    @ray.remote(num_cpus=1, num_returns=5)
    def map_item(p: str, lo: int, hi: int):
        key = f"{p}#{lo}"
        t = _read_span(str(p), int(lo), int(hi), cols,
                       dict_cols=(source_col,))
        # decomposable kernel
        parts = R.tiered_partials_clustered(
            t, source_col=source_col, ts_col=ts_col, value_col=value_col_d,
            tiers=ordered_d, first_last=need_fl, tile_rows=tile_d,
        )
        bmask = parts["_boundary"].combine_chunks()
        pb = parts.filter(bmask).combine_chunks()
        pb = pb.append_column(
            "_path", pa.array([key] * len(pb), type=pa.string())
        )
        fin_d = R.finalize_tiered(
            parts.filter(pc.invert(bmask)), aggs=aggs_d
        )
        mani_d = _manifest_table(
            [_sink_write(fin_d, sink_d, key, comp_d)]
            if fin_d is not None else []
        )
        # holistic kernel over the SAME decoded table
        st = hc.states(t)
        shard = (np.asarray(st["_part"]) % n_merge).astype(np.int64)
        order = np.argsort(shard, kind="stable")
        st_sorted = (
            st.drop_columns(["_part"]).take(pa.array(order)).combine_chunks()
        )
        offs = np.concatenate(
            [[0], np.cumsum(np.bincount(shard, minlength=n_merge))]
        ).tolist()
        hull = _source_ts_hulls(t, source_col=source_col, ts_col=ts_col)
        hull = hull.append_column(
            "_path", pa.array([key] * len(hull), type=pa.string())
        )
        fin_h = hc.interior(t)
        mani_h = _manifest_table([_sink_write(fin_h, sink_h, key, comp_h)])
        if fault_dir:
            _maybe_crash(fault_dir, key)
        return mani_d, mani_h, pb, hull, (offs, st_sorted)

    refs = [
        map_item.remote(it["path"], int(it["lo"]), int(it["hi"]))
        for it in items
    ]
    st_refs = [r[4] for r in refs]

    @ray.remote
    def merge_shard(s: int, *payloads):
        parts = [
            st.slice(offs[s], offs[s + 1] - offs[s]) for offs, st in payloads
        ]
        nonempty = [p for p in parts if len(p)]
        if not nonempty:
            return _manifest_table([])
        merged = hc.merge(pa.concat_tables(nonempty))
        return _manifest_table(
            [_sink_write(merged, sink_h, f"boundary-{s}", comp_h)]
        )

    final_refs = [merge_shard.remote(s, *st_refs) for s in range(n_merge)]

    bnds = [b for b in ray.get([r[2] for r in refs]) if b.num_rows]
    cat = pa.concat_tables(bnds) if bnds else None
    _check_boundary_intervals(cat, tier_col="tier", width_col="width_s")
    mani_d_tbls = [m for m in ray.get([r[0] for r in refs]) if m.num_rows]
    if cat is not None and len(cat):
        merged = R.merge_tiered(cat.drop_columns(["_path"]), aggs=aggs_d)
        mani_d_tbls.append(_manifest_table(
            [_sink_write(merged, sink_d, "boundary", comp_d)]
        ))
    hulls = [
        h for h in ray.get([r[3] for r in refs]) if h is not None and len(h)
    ]
    _check_ts_hulls(pa.concat_tables(hulls) if hulls else None)
    mani_h_tbls = [m for m in ray.get([r[1] for r in refs]) if m.num_rows]
    mani_h_tbls += [f for f in ray.get(final_refs) if f.num_rows]

    def _ds(tbls):
        return rd.from_arrow(
            pa.concat_tables(tbls) if tbls else _manifest_table([])
        )

    return _ds(mani_d_tbls), _ds(mani_h_tbls)


def rollup_both_clustered_fused(
    paths: list[str], cfg_d: RollupConfig, cfg_h: RollupConfig
):
    """BOTH headline lanes from ONE decode of the corpus.

    A deployment that materializes the decomposable tier cascade AND the
    holistic (full-vocabulary) cascade over the same corpus pays the
    dominant cost — Parquet decode of (source, ts, value) — twice when the
    lanes run as separate jobs. Here each task decodes its row-group span
    once and feeds both kernels. Both lanes' INTERIOR rows stream out as
    the map_batches output on a tagged union schema (`_lane` 0=decomp,
    1=holistic; missing agg columns null-padded — null buffers are free),
    split afterwards by two cheap filter+project passes over the pinned
    blocks. Side-channel traffic is ONE keyed actor message per work item
    (decomp boundary rows + holistic states ref + shard offsets + ts hull
    — the per-item actor round trips, not put bytes, were measured as the
    fused lanes' serialization tax) plus one owner-transfer ray.put of the
    shard-sorted holistic states. The union materialization is the barrier
    proving every side-channel message arrived; both boundary merges then
    run exactly as in the single lanes. Returns (decomposable_ds,
    holistic_ds) — bit-equal to running the two fused lanes separately
    (tested)."""
    import numpy as np
    import ray
    import ray.data as rd

    if not (_clustered_ok(paths, cfg_d) and _clustered_ok(paths, cfg_h)):
        return (
            rollup_decomposable_clustered_fused(paths, cfg_d),
            rollup_holistic_clustered_fused(paths, cfg_h),
        )
    if (cfg_d.source_col, cfg_d.ts_col) != (cfg_h.source_col, cfg_h.ts_col):
        raise ValueError("both-lane fusion requires shared source/ts columns")
    if isinstance(cfg_d.value_col, (list, tuple)):
        raise ValueError("both-lane fusion: decomposable lane is single-value")
    if cfg_d.sink_dir or cfg_h.sink_dir:
        if not (cfg_d.sink_dir and cfg_h.sink_dir):
            raise ValueError(
                "both-lane fusion with a sink needs sink_dir on BOTH "
                "configs (separate directories)"
            )
        if not (cfg_d.inband_side_channel and cfg_h.inband_side_channel):
            raise ValueError(
                "both-lane sink fusion is in-band only — set "
                "inband_side_channel=True on both configs or run the two "
                "fused sink lanes separately"
            )
        return _rollup_both_fused_inband(paths, cfg_d, cfg_h)
    ordered_d = _tier_widths_ok(cfg_d.tiers)
    need_fl = "first" in cfg_d.aggs or "last" in cfg_d.aggs
    hc = R.HolisticClustered(
        source_col=cfg_h.source_col,
        ts_col=cfg_h.ts_col,
        value_col=cfg_h.value_col,
        tiers=dict(_tier_widths_ok(cfg_h.tiers)),
        aggs=cfg_h.aggs,
        num_partitions=cfg_h.num_partitions,
        tile_rows=cfg_h.tile_rows,
    )
    vcols_h = (
        list(cfg_h.value_col)
        if isinstance(cfg_h.value_col, (list, tuple))
        else [cfg_h.value_col]
    )
    cols = [cfg_d.source_col, cfg_d.ts_col] + sorted(
        {cfg_d.value_col} | set(vcols_h)
    )
    # static output schemas of the two lanes + their tagged union
    d_names = ["tier", "source", "bucket_ts"] + [
        a for a in ("count", "sum", "avg", "min", "max", "first", "last")
        if a in cfg_d.aggs
    ]
    h_names = hc.final_schema().names
    key3 = ["tier", "source", "bucket_ts"]
    u_aggs = [c for c in h_names if c not in key3] + [
        c for c in d_names if c not in h_names
    ]
    u_names = key3 + u_aggs + ["_lane"]

    def _pad(t: pa.Table, lane: int) -> pa.Table:
        n = len(t)
        cols_u = {c: t[c] for c in key3}
        for c in u_aggs:
            cols_u[c] = (
                t[c] if c in t.column_names else pa.nulls(n, pa.float64())
            )
        cols_u["_lane"] = pa.array(np.full(n, lane, dtype=np.int8))
        return pa.table(cols_u)

    reg = _ref_registry()
    ray.get(reg.collect.remote())  # force actor start before worker puts
    items = _fused_task_items(paths, min(cfg_d.max_task_rows, cfg_h.max_task_rows))
    n_merge = max(4, min(64, len(items) // 4 or 1))

    def task(batch: pa.Table) -> pa.Table:
        outs = []
        for p, lo, hi in zip(
            batch["path"].to_pylist(),
            batch["lo"].to_pylist(),
            batch["hi"].to_pylist(),
        ):
            key = f"{p}#{lo}"
            t = _read_span(str(p), int(lo), int(hi), cols,
                           dict_cols=(cfg_d.source_col,))
            # holistic: one shared-prep pass
            inter_h, st = hc.interior_states(t)
            hull = _source_ts_hulls(
                t, source_col=cfg_h.source_col, ts_col=cfg_h.ts_col
            )
            shard = (np.asarray(st["_part"]) % n_merge).astype(np.int64)
            order = np.argsort(shard, kind="stable")
            st_sorted = (
                st.drop_columns(["_part"]).take(pa.array(order)).combine_chunks()
            )
            offs = np.concatenate(
                [[0], np.cumsum(np.bincount(shard, minlength=n_merge))]
            ).tolist()
            # decomposable: partials once
            parts = R.tiered_partials_clustered(
                t,
                source_col=cfg_d.source_col,
                ts_col=cfg_d.ts_col,
                value_col=cfg_d.value_col,
                tiers=ordered_d,
                first_last=need_fl,
                tile_rows=cfg_d.tile_rows,
            )
            bmask = parts["_boundary"].combine_chunks()
            sref = ray.put(st_sorted, _owner=reg)
            # ONE keyed side-channel message per item (retry overwrites),
            # async and overlapped with the finalize; the get before
            # return keeps it durable-before-done
            fut = reg.put.remote(
                key, (sref, offs, parts.filter(bmask).combine_chunks()), hull
            )
            if cfg_d.fault_inject_dir:
                ray.get(fut)
                _maybe_crash(cfg_d.fault_inject_dir, key)
            fin = R.finalize_tiered(parts.filter(pc.invert(bmask)), aggs=cfg_d.aggs)
            ray.get(fut)
            if fin is not None:
                outs.append(_pad(fin, 0))
            outs.append(_pad(inter_h, 1))
        if outs:
            return pa.concat_tables(outs)
        fin = R.finalize_partials(
            R._EMPTY_PARTIALS, width_s=ordered_d[0][1], aggs=cfg_d.aggs
        )
        return _pad(
            fin.add_column(0, "tier", pa.array([], type=pa.string())), 0
        )

    union = _fused_items_ds(items).map_batches(
        task, batch_format="pyarrow", batch_size=None
    ).materialize()

    entries, hull_cat = ray.get(reg.collect.remote())
    _check_ts_hulls(hull_cat)

    def _split(lane: int, names: list[str]):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["_lane"], lane)).select(names)
        return union.map_batches(f, batch_format="pyarrow")

    # decomposable boundary merge (as in the single lane)
    bparts = {k: b for k, (_, _, b) in entries.items()}
    _check_boundary_intervals(bparts, tier_col="tier", width_col="width_s")
    decomp = _split(0, d_names)
    if bparts:
        btbl = pa.concat_tables([bparts[k] for k in sorted(bparts)])
        if len(btbl):
            decomp = decomp.union(
                rd.from_arrow(R.merge_tiered(btbl, aggs=cfg_d.aggs))
            )

    # holistic sharded state merge (as in the single lane)
    holo = _split(1, h_names)
    if not entries:
        ray.kill(reg)
        return decomp, holo
    sorted_entries = [v for _, v in sorted(entries.items())]
    srefs = [r for r, _, _ in sorted_entries]
    offsets = [o for _, o, _ in sorted_entries]

    @ray.remote
    def merge_shard(s, offs, *tables):
        parts = [
            t.slice(off[s], off[s + 1] - off[s])
            for t, off in zip(tables, offs)
        ]
        nonempty = [p for p in parts if len(p)]
        if not nonempty:
            return hc.final_schema().empty_table()
        return hc.merge(pa.concat_tables(nonempty))

    final_refs = [merge_shard.remote(s, offsets, *srefs) for s in range(n_merge)]
    boundary_h = rd.from_arrow_refs(final_refs).materialize()
    ray.kill(reg)  # merge tasks done (materialized) — states now droppable
    return decomp, holo.union(boundary_h)


def _read_cols(paths: list[str], cfg: RollupConfig):
    import ray.data as rd

    cols = [cfg.source_col, cfg.ts_col] + (
        list(cfg.value_col)
        if isinstance(cfg.value_col, (list, tuple))
        else [cfg.value_col]
    )
    return rd.read_parquet(list(paths), columns=cols)


def rewrite_clustered(
    paths: list[str],
    out_dir: str,
    *,
    bucket_s: float,
    ts_col: str = "event_ts",
    source_col: str = "source",
    num_partitions_hint: int | None = None,
):
    """Rewrite ANY shard layout into the event-time-clustered lake layout
    the fused lanes' footer guard (`clustered_files_nonoverlapping`) can
    PROVE: one Parquet file per `bucket_s`-wide time bucket, rows sorted by
    (source, ts) inside, every column (tokens included) passed through
    byte-equal. After the rewrite `assume_clustered="auto"` takes the fused
    fast path with no vouch.

    One exchange (hash by bucket); each bucket task writes its own file —
    resumable/idempotent output: the file name is the bucket id, a retry
    or re-run overwrites the same file with the same bytes. Returns the
    manifest Dataset (path, bucket, rows, min_ts, max_ts)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.rollup import ts_to_us

    os.makedirs(out_dir, exist_ok=True)
    W_us = int(round(bucket_s * 1_000_000))
    if W_us <= 0:
        raise ValueError("bucket_s must be positive")

    def add_bucket(b: pa.Table) -> pa.Table:
        tus = ts_to_us(b[ts_col].combine_chunks())
        return b.append_column("_bucket", pa.array(tus // W_us))

    def write_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64()),
                    "rows": pa.array([], pa.int64()),
                    "min_ts": pa.array([], pa.int64()),
                    "max_ts": pa.array([], pa.int64()),
                }
            )
        bucket = int(t["_bucket"][0].as_py())
        t = t.drop_columns(["_bucket"])
        src = np.asarray(t[source_col]).astype(str)
        tus = ts_to_us(t[ts_col].combine_chunks())
        order = np.lexsort((tus, src))
        t = t.take(pa.array(order)).combine_chunks()
        path = os.path.join(out_dir, f"bucket-{bucket:012d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic: readers never see a partial file
        return pa.table(
            {
                "path": pa.array([path]),
                "bucket": pa.array([bucket], pa.int64()),
                "rows": pa.array([len(t)], pa.int64()),
                "min_ts": pa.array([int(tus.min())], pa.int64()),
                "max_ts": pa.array([int(tus.max())], pa.int64()),
            }
        )

    ds = rd.read_parquet(paths)
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
    )
