"""Rollup stages: bucket assignment, partial (combiner) aggregation for the
decomposable lane, and vectorized holistic per-partition aggregation.

Recasts the reference's FastProp per-entity window aggregation
(`/root/reference/src/engine/src/fastprop/FastProp.cpp`, Matchmaker/tsindex
window match) as continuous aggregates over (source, time-bucket) keys — the
lag-window conditions `(t-(i+1)·dt, t-i·dt]` of FastProp.cpp:1255-1290 are
exactly tumbling buckets.

Scale design (100 TB):
- the decomposable lane shrinks raw rows to per-(batch, source, bucket)
  partial states inside `map_batches` BEFORE any shuffle (combiner pattern);
  the groupby that merges partials moves partials, not raw rows. A salt
  column is unnecessary here because partials are already pre-combined per
  batch — a hot source contributes at most one partial row per (batch,
  bucket).
- the holistic lane (quantiles, mode, distinct, EWMA, trend, ...) must see
  raw values per bucket; rows are hash-partitioned by (source, coarsest
  bucket) so every finer bucket is complete within one partition, and all
  tiers are computed in a single pass over each partition — one wide shuffle
  total. The partition unit (source, 1 day) bounds memory regardless of how
  hot a source is.
- `tokens` (wide list<int32> payload) never enters any shuffle: rollups read
  only (source, ts, value) columns.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..kernels.aggregations import DECOMPOSABLE, grouped_aggregate

US = 1_000_000

# first/last composite-key encoding (decomposable lane): dt-in-bucket and an
# integer value packed into one int64 so built-in Min/Max aggregations merge
# argmin/argmax states. VALUE_BITS bounds the value range (n_tok <= 4096).
VALUE_BITS = 13
VALUE_MASK = (1 << VALUE_BITS) - 1


def ts_to_us(arr: pa.Array) -> np.ndarray:
    """timestamp (any unit) or int64-us column -> int64 microseconds.

    Zero-copy for timestamp[us]; other units are normalized first."""
    if pa.types.is_timestamp(arr.type):
        if arr.type.unit != "us":
            arr = arr.cast(pa.timestamp("us", tz=arr.type.tz))
        arr = arr.cast(pa.int64())
    return np.asarray(arr)


def crc_hash_sources(sources: np.ndarray) -> np.ndarray:
    """Stable (process-independent) per-row hash of a string key column.

    Vectorized via the unique trick: crc32 only once per distinct value.
    """
    uniq, inv = np.unique(sources, return_inverse=True)
    h = np.array([zlib.crc32(u.encode()) for u in uniq], dtype=np.int64)
    return h[inv]


def assign_partition(
    batch: pa.Table,
    *,
    source_col: str,
    ts_col: str,
    coarse_width_s: int,
    num_partitions: int,
) -> pa.Table:
    """Add `_part` = stable_hash(source, coarse_bucket) % num_partitions.

    Every (source, bucket) group of any tier whose width divides
    `coarse_width_s` is fully contained in one partition.
    """
    ts_us = ts_to_us(batch[ts_col].combine_chunks())
    bucket = ts_us // (coarse_width_s * US)
    h = crc_hash_sources(np.asarray(batch[source_col]).astype(str))
    part = ((h * 0x9E3779B1 + bucket * 0x85EBCA77) % num_partitions).astype(np.int64)
    return batch.append_column("_part", pa.array(part))


_EMPTY_PARTIALS = pa.table(
    {
        "source": pa.array([], type=pa.string()),
        "bucket": pa.array([], type=pa.int64()),
        "cnt": pa.array([], type=pa.float64()),
        "sum": pa.array([], type=pa.float64()),
        "min": pa.array([], type=pa.float64()),
        "max": pa.array([], type=pa.float64()),
        "first_key": pa.array([], type=pa.int64()),
        "last_key": pa.array([], type=pa.int64()),
    }
)


def partial_states(
    batch: pa.Table,
    *,
    source_col: str,
    ts_col: str,
    value_col: str,
    width_s: int,
    first_last: bool = True,
) -> pa.Table:
    """Per-batch combiner: one partial-state row per (source, bucket).

    State: cnt, sum, min, max, first_key, last_key — all mergeable with
    built-in Sum/Min/Max aggregations. first_key/last_key pack
    (dt-in-bucket, integer value) so Min(first_key) is argmin-by-(ts, value)
    and Max(last_key) is argmax-by-(ts, then min value); the engine's
    deterministic tie-break (reference iteration-order tie-break is not
    reproducible under parallel merge, so ties resolve to the SMALLEST value
    — documented divergence, deterministic at any parallelism).
    """
    ts_us = ts_to_us(batch[ts_col].combine_chunks())
    v = np.asarray(batch[value_col].combine_chunks(), dtype=np.float64)
    src = np.asarray(batch[source_col]).astype(str)
    if len(v) == 0:
        return _EMPTY_PARTIALS

    width_us = width_s * US
    bucket = ts_us // width_us

    # dense group ids for (source, bucket) within this batch
    uniq_src, src_ix = np.unique(src, return_inverse=True)
    span = int(bucket.max() - bucket.min() + 1)
    key = src_ix.astype(np.int64) * span + (bucket - bucket.min())
    uniq_key, first_ix, gid = np.unique(key, return_index=True, return_inverse=True)
    G = len(uniq_key)

    finite = np.isfinite(v)
    gid_f = gid[finite]
    v_f = v[finite]
    cnt = np.bincount(gid_f, minlength=G).astype(np.float64)
    s = np.bincount(gid_f, weights=v_f, minlength=G)

    # composite first/last keys over finite, integer-encodable values
    if first_last:
        if len(v_f) and (
            v_f.min() < 0 or v_f.max() > VALUE_MASK or not np.all(v_f == np.floor(v_f))
        ):
            raise ValueError(
                "decomposable first/last requires integer values in "
                f"[0, {VALUE_MASK}]; route this column through the holistic lane"
            )
        dt_in_bucket = ts_us[finite] - (bucket[finite] * width_us)
        vi = np.clip(v_f, 0, VALUE_MASK).astype(np.int64)
        fk = (dt_in_bucket << VALUE_BITS) | vi
        lk = (dt_in_bucket << VALUE_BITS) | (VALUE_MASK - vi)
    else:
        fk = np.zeros(len(v_f), dtype=np.int64)
        lk = np.zeros(len(v_f), dtype=np.int64)

    # one sort of the finite rows by group; min/max/first/last via reduceat
    order_f = np.argsort(gid_f, kind="stable")
    gsort = gid_f[order_f]
    starts = np.searchsorted(gsort, np.arange(G))
    mn = np.full(G, np.inf)
    mx = np.full(G, -np.inf)
    first_key = np.full(G, np.iinfo(np.int64).max, dtype=np.int64)
    last_key = np.full(G, np.iinfo(np.int64).min, dtype=np.int64)
    ne = cnt > 0
    if len(gsort) and ne.any():
        # reduceat over NON-empty segment starts only (strictly increasing,
        # < len): clamping empty starts would truncate a preceding segment
        # that ends at the array end
        idx = starts[ne]
        mn[ne] = np.minimum.reduceat(v_f[order_f], idx)
        mx[ne] = np.maximum.reduceat(v_f[order_f], idx)
        first_key[ne] = np.minimum.reduceat(fk[order_f], idx)
        last_key[ne] = np.maximum.reduceat(lk[order_f], idx)

    return pa.table(
        {
            "source": pa.array(src[first_ix], type=pa.string()),
            "bucket": pa.array(bucket[first_ix], type=pa.int64()),
            "cnt": pa.array(cnt),
            "sum": pa.array(s),
            "min": pa.array(mn),
            "max": pa.array(mx),
            "first_key": pa.array(first_key),
            "last_key": pa.array(last_key),
        }
    )


def merge_partial_rows(tbl: pa.Table) -> pa.Table:
    """Vectorized merge of partial-state rows sharing (source, bucket).

    One call per hash partition; replaces Ray's generic sort-aggregate
    (per-group Python) with bincount/reduceat over dense group ids — the
    same segmented-kernel trick the holistic lane uses.
    """
    n = len(tbl)
    if n == 0:
        return _EMPTY_PARTIALS
    src = np.asarray(tbl["source"]).astype(str)
    bucket = np.asarray(tbl["bucket"])
    uniq_src, src_ix = np.unique(src, return_inverse=True)
    bmin = bucket.min()
    span = int(bucket.max() - bmin + 1)
    key = src_ix.astype(np.int64) * span + (bucket - bmin)
    uniq_key, first_ix, gid = np.unique(key, return_index=True, return_inverse=True)
    G = len(uniq_key)

    cnt = np.bincount(gid, weights=np.asarray(tbl["cnt"]), minlength=G)
    s = np.bincount(gid, weights=np.asarray(tbl["sum"]), minlength=G)

    order = np.argsort(gid, kind="stable")
    gsort = gid[order]
    starts = np.searchsorted(gsort, np.arange(G))
    idx = np.minimum(starts, n - 1)
    mn = np.minimum.reduceat(np.asarray(tbl["min"])[order], idx)
    mx = np.maximum.reduceat(np.asarray(tbl["max"])[order], idx)
    fk = np.minimum.reduceat(np.asarray(tbl["first_key"])[order], idx)
    lk = np.maximum.reduceat(np.asarray(tbl["last_key"])[order], idx)

    return pa.table(
        {
            "source": pa.array(src[first_ix], type=pa.string()),
            "bucket": pa.array(bucket[first_ix], type=pa.int64()),
            "cnt": pa.array(cnt),
            "sum": pa.array(s),
            "min": pa.array(mn),
            "max": pa.array(mx),
            "first_key": pa.array(fk),
            "last_key": pa.array(lk),
        }
    )


def add_partial_partition(
    batch: pa.Table,
    num_partitions: int,
    finest_width_s: int = 1,
    coarse_width_s: int = 1,
) -> pa.Table:
    """_part = stable_hash(source, coarse_bucket) % P for partial-state rows.

    Partitioning by the COARSEST tier's bucket co-locates every finer bucket
    of a (source, coarse-window) pair, so one shuffle serves all tiers."""
    h = crc_hash_sources(np.asarray(batch["source"]).astype(str))
    bucket = np.asarray(batch["bucket"]) * finest_width_s // coarse_width_s
    part = ((h * 0x9E3779B1 + bucket * 0x85EBCA77) % num_partitions).astype(
        np.int64
    )
    return batch.append_column("_part", pa.array(part))


def merge_and_cascade(
    tbl: pa.Table,
    *,
    tiers: list[tuple[str, int]],
    aggs: list[str] | None = None,
) -> pa.Table:
    """One hash partition of finest-tier partial states -> finalized rollup
    rows for EVERY tier (long format, `tier` column).

    Merges the finest tier, then cascades states upward locally — no further
    shuffle. `tiers` is [(name, width_s), ...] sorted ascending; tier 0 is
    the finest (the one `partial_states` bucketed by)."""
    finest_name, finest_w = tiers[0]
    merged = merge_partial_rows(tbl)
    out = []
    state, state_w = merged, finest_w
    for name, w in tiers:
        if w != state_w:
            state = merge_partial_rows(
                cascade_partials(state, from_width_s=state_w, to_width_s=w)
            )
            state_w = w
        fin = finalize_partials(state, width_s=w, aggs=aggs)
        fin = fin.add_column(
            0, "tier", pa.array([name] * len(fin), type=pa.string())
        )
        out.append(fin)
    return pa.concat_tables(out)


def finalize_partials(
    tbl: pa.Table,
    *,
    width_s: int,
    out_ts_col: str = "bucket_ts",
    aggs: list[str] | None = None,
) -> pa.Table:
    """Merged partial states -> output columns for one tier."""
    cnt = np.asarray(tbl["cnt"], dtype=np.float64)
    s = np.asarray(tbl["sum"], dtype=np.float64)
    mn = np.asarray(tbl["min"], dtype=np.float64).copy()
    mx = np.asarray(tbl["max"], dtype=np.float64).copy()
    empty = cnt == 0
    mn[empty | np.isinf(mn)] = np.nan
    mx[empty | np.isinf(mx)] = np.nan
    with np.errstate(invalid="ignore", divide="ignore"):
        avg = s / cnt
    avg[empty] = np.nan
    fk = np.asarray(tbl["first_key"])
    lk = np.asarray(tbl["last_key"])
    first = (fk & VALUE_MASK).astype(np.float64)
    last = (VALUE_MASK - (lk & VALUE_MASK)).astype(np.float64)
    first[empty] = np.nan
    last[empty] = np.nan
    bucket = np.asarray(tbl["bucket"])
    cols = {
        "source": tbl["source"],
        out_ts_col: pa.array(bucket * width_s * US).cast(pa.timestamp("us")),
        "count": pa.array(cnt),
        "sum": pa.array(s),
        "avg": pa.array(avg),
        "min": pa.array(mn),
        "max": pa.array(mx),
        "first": pa.array(first),
        "last": pa.array(last),
    }
    if aggs is not None:
        keep = ["source", out_ts_col] + [a for a in cols if a in aggs]
        cols = {k: v for k, v in cols.items() if k in keep}
    return pa.table(cols)


def cascade_partials(tbl: pa.Table, *, from_width_s: int, to_width_s: int) -> pa.Table:
    """Re-key partial states from a finer to a coarser bucket width.

    Exact for the decomposable state (count/sum/min/max/first/last): buckets
    nest (to_width a multiple of from_width), so re-encoding first/last keys
    relative to the coarser bucket preserves the argmin/argmax semantics.
    Returns per-row states keyed by the coarser bucket; merge with the same
    Sum/Min/Max aggregation used for the finest tier.
    """
    assert to_width_s % from_width_s == 0
    bucket_f = np.asarray(tbl["bucket"])
    ratio = to_width_s // from_width_s
    bucket_c = bucket_f // ratio  # floor-divides exactly: epochs align at 0
    # shift of the fine bucket start inside the coarse bucket, in us
    shift_us = (bucket_f - bucket_c * ratio) * from_width_s * US

    fk = np.asarray(tbl["first_key"])
    lk = np.asarray(tbl["last_key"])
    cnt = np.asarray(tbl["cnt"], dtype=np.float64)
    ne = cnt > 0
    new_fk = np.full(len(fk), np.iinfo(np.int64).max, dtype=np.int64)
    new_lk = np.full(len(lk), np.iinfo(np.int64).min, dtype=np.int64)
    new_fk[ne] = fk[ne] + (shift_us[ne] << VALUE_BITS)
    new_lk[ne] = lk[ne] + (shift_us[ne] << VALUE_BITS)

    return pa.table(
        {
            "source": tbl["source"],
            "bucket": pa.array(bucket_c, type=pa.int64()),
            "cnt": tbl["cnt"],
            "sum": tbl["sum"],
            "min": tbl["min"],
            "max": tbl["max"],
            "first_key": pa.array(new_fk),
            "last_key": pa.array(new_lk),
        }
    )


class HolisticRollup:
    """Per-partition vectorized computation of ALL tiers and aggregations.

    Called once per hash partition (complete (source, coarse-bucket) groups).
    Sorts the partition by (source, bucket, ts, value) once, then runs the
    grouped kernels for each tier. Ties on ts resolve by smallest value —
    the engine's deterministic ordering (see partial_states docstring).

    Replaces the reference's per-population-row Matchmaker/tsindex loop
    (FastProp.cpp:1152-1180, tsindex/InMemoryIndex.hpp:36-47) with
    sort + segmented kernels.
    """

    def __init__(
        self,
        *,
        source_col: str,
        ts_col: str,
        value_col: str,
        tiers: dict[str, int],
        aggs: list[str],
    ):
        self.source_col = source_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.tiers = tiers
        self.aggs = aggs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts_us = ts_to_us(batch[self.ts_col].combine_chunks())
        # value_col may be one column or a list — multi-metric rollups share
        # one grouping/sort pass; agg columns are prefixed `<col>__<agg>`
        # when multiple.
        vcols = (
            self.value_col
            if isinstance(self.value_col, (list, tuple))
            else [self.value_col]
        )
        multi = len(vcols) > 1
        vs = {
            c: np.asarray(batch[c].combine_chunks(), dtype=np.float64)
            for c in vcols
        }
        src = np.asarray(batch[self.source_col]).astype(str)

        uniq_src, src_ix = np.unique(src, return_inverse=True)
        out_tables = []
        for tier_name, width_s in self.tiers.items():
            width_us = width_s * US
            bucket = ts_us // width_us
            bmin = bucket.min() if len(bucket) else 0
            span = (bucket.max() - bmin + 1) if len(bucket) else 1
            key = src_ix.astype(np.int64) * span + (bucket - bmin)
            uniq_key, gid = np.unique(key, return_inverse=True)
            G = len(uniq_key)

            tie = vs[vcols[0]]
            order = np.lexsort((tie, ts_us, gid))
            g_s, t_s = gid[order], ts_us[order] / US

            g_src = (uniq_key // span).astype(np.int64)
            g_bucket = uniq_key % span + bmin
            t_out = ((g_bucket + 1) * width_us) / US  # bucket END drives dt

            cols: dict[str, pa.Array] = {
                "tier": pa.array([tier_name] * G, type=pa.string()),
                "source": pa.array(uniq_src[g_src], type=pa.string()),
                "bucket_ts": pa.array(g_bucket * width_us).cast(pa.timestamp("us")),
            }
            for c in vcols:
                res = grouped_aggregate(
                    self.aggs, g_s, vs[c][order], G, t_s, t_out
                )
                for a in self.aggs:
                    cols[f"{c}__{a}" if multi else a] = pa.array(res[a])
            out_tables.append(pa.table(cols))

        out = pa.concat_tables(out_tables)
        return out


def holistic_supported(aggs: list[str]) -> bool:
    return True


def decomposable_only(aggs: list[str]) -> bool:
    return all(a in DECOMPOSABLE for a in aggs)


# ---------------------------------------------------------------------------
# clustered (event-time-local) lane: shuffle ONLY boundary buckets
# ---------------------------------------------------------------------------

def clustered_files_nonoverlapping(paths: list[str], *, ts_col: str) -> bool:
    """Cheap footer-only precondition check for the clustered lanes: the
    per-file (source-agnostic) event-time ranges must be pairwise
    non-overlapping (touching endpoints allowed). A late/re-emitted shard
    whose range overlaps an existing file's range can make two blocks each
    classify a shared (source, bucket) as interior and double-emit it —
    this guard detects that from parquet row-group statistics alone (no
    data read) so callers can fall back to the unclustered lane.

    Returns False (i.e. "not safe") when any file lacks ts statistics."""
    import pyarrow.parquet as pq

    ranges = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        try:
            ci = md.schema.to_arrow_schema().get_field_index(ts_col)
        except Exception:
            return False
        if ci < 0:
            return False
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return False
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        if mn is None:
            continue  # empty file: no rows, cannot overlap
        ranges.append((mn, mx))
    ranges.sort()
    return all(a[1] <= b[0] for a, b in zip(ranges, ranges[1:]))


def _validate_clustered(src: np.ndarray, ts_us: np.ndarray) -> None:
    """Raise unless the batch is event-time clustered: rows grouped into
    contiguous per-source runs, ts non-decreasing within each run, and a
    source's successive runs (a batch may span shard/file boundaries)
    time-ordered — i.e. each source's rows in the batch cover ONE contiguous
    time range. This is the layout of source-blocked, time-partitioned
    Parquet; arbitrary interleavings fail loudly here instead of silently
    double-counting in the boundary-only merge."""
    if len(src) < 2:
        return
    change = src[1:] != src[:-1]
    viol = (ts_us[1:] < ts_us[:-1]) & ~change
    if viol.any():
        raise ValueError(
            "clustered rollup requires ts-monotonic rows within each source "
            "run; use the unclustered lane for unsorted input"
        )
    # cross-run check: when one source appears in several runs of the SAME
    # batch, their time ranges must not overlap — otherwise both fragments
    # can classify a shared bucket as interior and double-emit it. Runs per
    # batch are few (O(sources)), so this is cheap.
    run_starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    run_ends = np.append(run_starts[1:], len(src))
    run_src = src[run_starts]
    if len(run_src) != len(np.unique(run_src)):
        first_ts, last_ts = ts_us[run_starts], ts_us[run_ends - 1]
        order = np.argsort(run_src, kind="stable")
        same = run_src[order][1:] == run_src[order][:-1]
        overlap = first_ts[order][1:] < last_ts[order][:-1]
        if (same & overlap).any():
            raise ValueError(
                "clustered rollup: a source's runs within one batch overlap "
                "in time; use the unclustered lane for this layout"
            )


def tiered_partials_clustered(
    batch: pa.Table,
    *,
    source_col: str,
    ts_col: str,
    value_col: str,
    tiers: list[tuple[str, int]],
    first_last: bool = True,
    tile_rows: int = 48_000,
) -> pa.Table:
    """Per-tier partial states with a `_boundary` flag.

    Exploits the ingest layout of time-series Parquet (rows clustered by
    (source, event-time) — true of this corpus's shard layout and of any
    time-partitioned lake): a (source, bucket) group strictly inside ONE
    contiguous source-run of this batch cannot receive rows from any other
    batch, so its partial state is FINAL and never needs the shuffle. Only
    the first/last bucket of each run (per tier) may straddle a batch,
    block or shard edge — those few rows are the entire exchange. The rule
    is applied PER RUN, so it stays correct even when the streaming
    executor delivers blocks out of logical order (preserve_order=False):
    any bucket fragment at a run edge is boundary by construction.
    Within-run monotonicity is CHECKED (_validate_clustered) — unsorted
    input fails loudly instead of silently double-counting."""
    # dictionary codes, never dense strings: astype(str) on ~500k rows was
    # 40% of this kernel's CPU (and the memory traffic that caps 32-worker
    # scaling); run/group logic only needs equality, which codes preserve
    enc = batch[source_col].combine_chunks()
    if not pa.types.is_dictionary(enc.type):
        enc = enc.dictionary_encode()
    codes_all = np.asarray(enc.indices).astype(np.int64)
    src_vals = enc.dictionary
    ts_all = ts_to_us(batch[ts_col].combine_chunks())
    _validate_clustered(codes_all, ts_all)

    n = len(codes_all)
    if n == 0:
        run_change = np.zeros(0, dtype=bool)
        run_starts = np.zeros(0, dtype=np.int64)
    else:
        run_change = codes_all[1:] != codes_all[:-1]
        run_starts = np.concatenate([[0], np.flatnonzero(run_change) + 1])
    run_ends = (
        np.append(run_starts[1:], n) if n else np.zeros(0, dtype=np.int64)
    )

    v = np.asarray(batch[value_col].combine_chunks(), dtype=np.float64)
    # sorted fast path: within a validated run, ts is non-decreasing, so
    # (source, bucket) groups are CONTIGUOUS — per-group aggregates are pure
    # reduceat over the input order, NO unique/argsort. This is both ~4x
    # faster and cache-friendly (sequential access only), which is what lets
    # 32 concurrent tasks scale on a shared L3. Falls back to the generic
    # sort-based combiner when values are non-finite or not int-encodable.
    fast_ok = n > 0 and bool(
        np.isfinite(v).all()
        and (not first_last or (v.min() >= 0 and v.max() <= VALUE_MASK
                                and np.all(v == np.floor(v))))
    )

    out = []
    if fast_ok:
        # tile bounds: cut where the run changes or EVERY tier's bucket
        # changes, so no group of any tier straddles a tile; per-tile
        # kernels then produce exactly the untiled groups in the same
        # order while the working set stays in the worker's private L2
        # (same rationale + measured win as HolisticClustered._tile_bounds)
        if n <= tile_rows + tile_rows // 2:
            bounds = np.array([0, n], dtype=np.int64)
        else:
            tier_and = None
            for _, w in tiers:
                wus = w * US
                bc = (ts_all[1:] // wus) != (ts_all[:-1] // wus)
                tier_and = bc if tier_and is None else (tier_and & bc)
            allchg = run_change | tier_and
            cut_ok = np.flatnonzero(allchg) + 1
            targets = np.arange(tile_rows, n, tile_rows, dtype=np.int64)
            ix = np.searchsorted(cut_ok, targets)
            cuts = cut_ok[ix[ix < len(cut_ok)]]
            bounds = np.unique(np.concatenate([[0], cuts, [n]])).astype(
                np.int64
            )
        per_tier: list[list[pa.Table]] = [[] for _ in tiers]
        for a, b in zip(bounds[:-1], bounds[1:]):
            first_is_start = a == 0 or codes_all[a - 1] != codes_all[a]
            last_is_end = b == n or codes_all[b] != codes_all[b - 1]
            ts_t = ts_all[a:b]
            v_t = v[a:b]
            codes_t = codes_all[a:b]
            nt = b - a
            rc_t = np.empty(nt, dtype=bool)
            rc_t[0] = True
            np.not_equal(codes_t[1:], codes_t[:-1], out=rc_t[1:])
            rs_t = np.flatnonzero(rc_t)
            re_t = np.append(rs_t[1:], nt)
            for ti, (name, w) in enumerate(tiers):
                w_us = w * US
                bucket = ts_t // w_us
                change = np.empty(nt, dtype=bool)
                change[0] = True
                change[1:] = rc_t[1:] | (bucket[1:] != bucket[:-1])
                starts = np.flatnonzero(change)
                G = len(starts)
                cnt = np.diff(np.append(starts, nt)).astype(np.float64)
                s = np.add.reduceat(v_t, starts)
                mn = np.minimum.reduceat(v_t, starts)
                mx = np.maximum.reduceat(v_t, starts)
                if first_last:
                    dt_in_bucket = ts_t - bucket * w_us
                    vi = v_t.astype(np.int64)
                    fkv = (dt_in_bucket << VALUE_BITS) | vi
                    lkv = (dt_in_bucket << VALUE_BITS) | (VALUE_MASK - vi)
                    first_key = np.minimum.reduceat(fkv, starts)
                    last_key = np.maximum.reduceat(lkv, starts)
                else:
                    first_key = np.zeros(G, dtype=np.int64)
                    last_key = np.zeros(G, dtype=np.int64)
                gid_of_row = np.cumsum(change) - 1
                boundary = np.zeros(G, dtype=bool)
                bfirst = gid_of_row[rs_t]
                blast = gid_of_row[re_t - 1]
                if not first_is_start:
                    bfirst = bfirst[1:]
                if not last_is_end:
                    blast = blast[:-1]
                boundary[bfirst] = True
                boundary[blast] = True
                p = pa.table(
                    {
                        "source": src_vals.take(
                            pa.array(codes_t[starts])
                        ).cast(pa.string()),
                        "bucket": pa.array(bucket[starts]),
                        "cnt": pa.array(cnt),
                        "sum": pa.array(s),
                        "min": pa.array(mn),
                        "max": pa.array(mx),
                        "first_key": pa.array(first_key),
                        "last_key": pa.array(last_key),
                    }
                )
                p = p.append_column(
                    "tier", pa.array([name] * len(p), type=pa.string())
                )
                p = p.append_column(
                    "width_s", pa.array(np.full(len(p), w, dtype=np.int64))
                )
                p = p.append_column("_boundary", pa.array(boundary))
                per_tier[ti].append(p)
        out = [t for tier_tables in per_tier for t in tier_tables]
        return pa.concat_tables(out)

    # fallback (non-finite / non-int-encodable values): generic sort-based
    # combiner per tier, untiled — rare path, correctness over speed
    for name, w in tiers:
        w_us = w * US
        if True:
            p = partial_states(
                batch, source_col=source_col, ts_col=ts_col,
                value_col=value_col, width_s=w, first_last=first_last,
            )
            psrc = np.asarray(p["source"]).astype(str)
            pbucket = np.asarray(p["bucket"])
            if len(p):
                uniq = np.unique(psrc)
                bmin = int(pbucket.min())
                span = int(pbucket.max()) - bmin + 1
                run_src = np.asarray(
                    src_vals.take(pa.array(codes_all[run_starts]))
                ).astype(str)
                run_src_ix = np.searchsorted(uniq, run_src)
                first_b = ts_all[run_starts] // w_us - bmin
                last_b = ts_all[run_ends - 1] // w_us - bmin
                edge_keys = np.concatenate(
                    [run_src_ix * span + first_b, run_src_ix * span + last_b]
                )
                pinv = np.searchsorted(uniq, psrc)
                pkeys = pinv * span + (pbucket - bmin)
                boundary = np.isin(pkeys, edge_keys)
            else:
                boundary = np.zeros(0, dtype=bool)
        p = p.append_column("tier", pa.array([name] * len(p), type=pa.string()))
        p = p.append_column("width_s", pa.array(np.full(len(p), w, dtype=np.int64)))
        p = p.append_column("_boundary", pa.array(boundary))
        out.append(p)
    return pa.concat_tables(out)


def finalize_tiered(tbl: pa.Table, *, aggs: list[str] | None = None) -> pa.Table:
    """Long-format mixed-tier partial states -> finalized rollup rows."""
    widths = np.asarray(tbl["width_s"])
    out = []
    for w in np.unique(widths):
        sl = tbl.filter(pa.array(widths == w))
        tier_name = sl["tier"][0].as_py()
        fin = finalize_partials(
            sl.drop_columns(["tier", "width_s", "_boundary"]),
            width_s=int(w),
            aggs=aggs,
        )
        fin = fin.add_column(
            0, "tier", pa.array([tier_name] * len(fin), type=pa.string())
        )
        out.append(fin)
    if not out:
        return None
    return pa.concat_tables(out)


def merge_tiered(tbl: pa.Table, *, aggs: list[str] | None = None) -> pa.Table:
    """Merge boundary partials of one hash partition (mixed tiers), then
    finalize. Volume is O(runs x tiers) — a few rows per input batch."""
    widths = np.asarray(tbl["width_s"])
    out = []
    for w in np.unique(widths):
        sl = tbl.filter(pa.array(widths == w))
        tier_name = sl["tier"][0].as_py()
        merged = merge_partial_rows(
            sl.drop_columns(["tier", "width_s", "_boundary"])
        )
        fin = finalize_partials(merged, width_s=int(w), aggs=aggs)
        fin = fin.add_column(
            0, "tier", pa.array([tier_name] * len(fin), type=pa.string())
        )
        out.append(fin)
    return pa.concat_tables(out)


# ---------------------------------------------------------------------------
# holistic clustered lane: sort-free interior + mergeable-state boundary
# ---------------------------------------------------------------------------

from ..kernels import holistic_states as HS  # noqa: E402


class HolisticClustered:
    """Two-pass holistic rollup for event-time-clustered blocks.

    Interior pass: within a block, rows are contiguous per-source runs with
    non-decreasing ts, so for EVERY tier the (source, bucket) groups are
    contiguous row segments — group ids come from change-point cumsums and
    the only sort is ONE lexsort by (tie-value, ts, run) that canonicalizes
    equal-ts tie order for all tiers at once (buckets nest within runs).
    No np.unique, no per-tier lexsort, no Python-string conversions
    (sources stay dictionary codes): measured ~1.7x the throughput of the
    sort-based stage on the 60M-row bench corpus.

    Per-tier edge classification: a tier-t group can straddle a block only
    if it is the first or last t-bucket of a source-run (file time ranges
    are pairwise non-overlapping — checked by clustered_files_nonoverlapping
    or vouched by the caller). Everything else finalizes in-task. The
    states pass re-reads the block and emits mergeable partial states
    (kernels/holistic_states.py: value histograms + scalar argmin/argmax /
    sum / centered-regression states) for ONLY those per-tier edge groups
    — the exchange carries O(distinct values per edge bucket), not raw
    rows (2.5x fewer rows on this corpus; far more on low-cardinality
    values), and every aggregation in the vocabulary finalizes exactly
    from the merged states.
    """

    def __init__(
        self,
        *,
        source_col: str,
        ts_col: str,
        value_col,
        tiers: dict[str, int],
        aggs: list[str],
        num_partitions: int = 64,
        tile_rows: int = 48_000,
    ):
        self.source_col = source_col
        self.ts_col = ts_col
        self.vcols = (
            list(value_col)
            if isinstance(value_col, (list, tuple))
            else [value_col]
        )
        self.ordered = sorted(tiers.items(), key=lambda kv: kv[1])
        self.aggs = aggs
        self.num_partitions = num_partitions
        self.tile_rows = tile_rows

    # -- schemas ----------------------------------------------------------
    def final_schema(self) -> pa.Schema:
        multi = len(self.vcols) > 1
        fields = [
            ("tier", pa.string()),
            ("source", pa.string()),
            ("bucket_ts", pa.timestamp("us")),
        ]
        for c in self.vcols:
            for a in self.aggs:
                fields.append((f"{c}__{a}" if multi else a, pa.float64()))
        return pa.schema(fields)

    def states_schema(self) -> pa.Schema:
        return pa.schema(
            [
                ("tier", pa.int8()),
                ("source", pa.string()),
                ("bucket", pa.int64()),
                ("kind", pa.int16()),
                ("a", pa.float64()),
                ("b", pa.float64()),
                ("c", pa.float64()),
                ("d", pa.float64()),
                ("e", pa.float64()),
                ("_part", pa.int64()),
            ]
        )

    # -- shared prep ------------------------------------------------------
    def _prep(self, batch: pa.Table):
        enc = batch[self.source_col].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        ts_us = ts_to_us(batch[self.ts_col].combine_chunks())
        n = len(codes)
        if n == 0:
            return None
        change = codes[1:] != codes[:-1]
        if ((ts_us[1:] < ts_us[:-1]) & ~change).any():
            raise ValueError(
                "clustered rollup requires ts-monotonic rows within each "
                "source run; use the unclustered lane for unsorted input"
            )
        run_starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        run_ends = np.append(run_starts[1:], n)
        run_code = codes[run_starts]
        if len(run_code) != len(np.unique(run_code)):
            first_ts, last_ts = ts_us[run_starts], ts_us[run_ends - 1]
            o = np.lexsort((first_ts, run_code))
            same = run_code[o][1:] == run_code[o][:-1]
            if (same & (first_ts[o][1:] < last_ts[o][:-1])).any():
                raise ValueError(
                    "a source appears in multiple runs of one batch with "
                    "overlapping time ranges; use the unclustered lane"
                )
        run_id = np.zeros(n, dtype=np.int64)
        run_id[run_starts[1:]] = 1
        np.cumsum(run_id, out=run_id)
        vs = {
            c: np.asarray(batch[c].combine_chunks(), dtype=np.float64)
            for c in self.vcols
        }
        order = np.lexsort((vs[self.vcols[0]], ts_us, run_id))
        return (
            np.asarray(enc.dictionary),
            codes[order],
            ts_us[order],
            run_id[order],
            {c: v[order] for c, v in vs.items()},
        )

    def _tier_edges(
        self,
        run_s: np.ndarray,
        bkt: np.ndarray,
        first_is_start: bool = True,
        last_is_end: bool = True,
    ):
        """Row mask: bucket is the first or last bucket of its run.

        When operating on a cache-sized TILE of a span, the tile's first
        (last) run piece may be the continuation of a run that started in
        an earlier tile (continues into a later one); its first (last)
        bucket is then NOT a run edge. `first_is_start` / `last_is_end`
        carry that global knowledge so tile-local classification stays
        EXACT — tiles cut only where every tier's bucket changes, so a
        bucket never straddles tiles and the union of tile masks equals
        the untiled mask bit-for-bit."""
        n = len(run_s)
        rc = np.empty(n, dtype=bool)
        rc[0] = True
        np.not_equal(run_s[1:], run_s[:-1], out=rc[1:])
        rs = np.flatnonzero(rc)
        re_ = np.append(rs[1:], n)
        rix = np.cumsum(rc) - 1
        first_b = bkt[rs][rix]
        last_b = bkt[re_ - 1][rix]
        mf = bkt == first_b
        ml = bkt == last_b
        if not first_is_start:
            mf &= rix != 0
        if not last_is_end:
            ml &= rix != len(rs) - 1
        return mf | ml

    def _tile_bounds(self, run_s: np.ndarray, ts_s: np.ndarray) -> np.ndarray:
        """Row offsets cutting the span into ~tile_rows tiles, snapped to
        positions where the run OR every tier's bucket changes — so no
        group of any tier straddles a tile and per-tile kernels produce
        exactly the untiled groups. Keeping the per-tier working set in
        the worker's private L2 (instead of ~40 full-span passes through
        the one shared L3/DRAM bus) is what lets 32 concurrent tasks
        scale on this class of box (measured +30%% at 32 workers, 8->32
        efficiency 0.74 -> 0.81 on the bench corpus)."""
        n = len(run_s)
        if n <= self.tile_rows + self.tile_rows // 2:
            return np.array([0, n], dtype=np.int64)
        allchg = np.empty(n - 1, dtype=bool)
        np.not_equal(run_s[1:], run_s[:-1], out=allchg)
        tier_and = None
        for _, w in self.ordered:
            wus = w * US
            bc = (ts_s[1:] // wus) != (ts_s[:-1] // wus)
            tier_and = bc if tier_and is None else (tier_and & bc)
        allchg |= tier_and
        cut_ok = np.flatnonzero(allchg) + 1
        targets = np.arange(self.tile_rows, n, self.tile_rows, dtype=np.int64)
        ix = np.searchsorted(cut_ok, targets)
        cuts = cut_ok[ix[ix < len(cut_ok)]]
        return np.unique(np.concatenate([[0], cuts, [n]])).astype(np.int64)

    # -- pass 1: finalize interior groups in-task -------------------------
    def interior(self, batch: pa.Table) -> pa.Table:
        return self._interior_from_prep(self._prep(batch))

    def interior_states(self, batch: pa.Table) -> tuple[pa.Table, pa.Table]:
        """Both passes from ONE shared prep (the lexsort in _prep dominates;
        calling interior() and states() separately runs it twice)."""
        prep = self._prep(batch)
        return self._interior_from_prep(prep), self._states_from_prep(prep)

    def _interior_from_prep(self, prep) -> pa.Table:
        if prep is None:
            return self.final_schema().empty_table()
        dictionary, codes_s, ts_s, run_s, vs_s = prep
        multi = len(self.vcols) > 1
        bounds = self._tile_bounds(run_s, ts_s)
        n = len(run_s)
        src_arr = pa.array(dictionary)
        # tier-major, tile-minor assembly: identical rows in identical
        # order to the untiled kernel (tiles cover groups whole, in row
        # order), just computed on L2-resident slices
        per_tier: list[list[pa.Table]] = [[] for _ in self.ordered]
        for a, b in zip(bounds[:-1], bounds[1:]):
            rt = run_s[a:b]
            tt = ts_s[a:b]
            t_sec = tt / US
            first_is_start = a == 0 or run_s[a - 1] != run_s[a]
            last_is_end = b == n or run_s[b] != run_s[b - 1]
            for ti, (name, w) in enumerate(self.ordered):
                wus = w * US
                bkt = tt // wus
                keep = ~self._tier_edges(rt, bkt, first_is_start, last_is_end)
                rk, bk, ck = rt[keep], bkt[keep], codes_s[a:b][keep]
                nk = len(rk)
                if nk == 0:
                    continue
                ch = np.empty(nk, dtype=bool)
                ch[0] = True
                np.logical_or(rk[1:] != rk[:-1], bk[1:] != bk[:-1], out=ch[1:])
                gid = np.cumsum(ch) - 1
                gstart = np.flatnonzero(ch)
                G = len(gstart)
                g_bucket = bk[gstart]
                t_out = ((g_bucket + 1) * wus) / US
                cols: dict[str, pa.Array] = {
                    "tier": pa.array([name] * G, type=pa.string()),
                    "source": pa.compute.take(
                        src_arr, pa.array(ck[gstart])
                    ).cast(pa.string()),
                    "bucket_ts": pa.array(g_bucket * wus).cast(
                        pa.timestamp("us")
                    ),
                }
                tk = t_sec[keep]
                for c in self.vcols:
                    res = grouped_aggregate(
                        self.aggs, gid, vs_s[c][a:b][keep], G, tk, t_out
                    )
                    for ag in self.aggs:
                        cols[f"{c}__{ag}" if multi else ag] = pa.array(res[ag])
                per_tier[ti].append(pa.table(cols))
        out = [t for tier_tables in per_tier for t in tier_tables]
        if not out:
            return self.final_schema().empty_table()
        return pa.concat_tables(out)

    # -- pass 2: mergeable states for per-tier edge groups ----------------
    def states(self, batch: pa.Table) -> pa.Table:
        return self._states_from_prep(self._prep(batch))

    def _states_from_prep(self, prep) -> pa.Table:
        if prep is None:
            return self.states_schema().empty_table()
        dictionary, codes_s, ts_s, run_s, vs_s = prep
        crc = crc_hash_sources(np.asarray(dictionary).astype(str))
        rows = {k: [] for k in ("tier", "src", "bucket", "kind")}
        blocks = []
        bounds = self._tile_bounds(run_s, ts_s)
        n = len(run_s)
        for a, b in zip(bounds[:-1], bounds[1:]):
            rt = run_s[a:b]
            tt = ts_s[a:b]
            t_sec = tt / US
            first_is_start = a == 0 or run_s[a - 1] != run_s[a]
            last_is_end = b == n or run_s[b] != run_s[b - 1]
            for ti, (name, w) in enumerate(self.ordered):
                wus = w * US
                bkt = tt // wus
                edge = self._tier_edges(rt, bkt, first_is_start, last_is_end)
                rk, bk, ck = rt[edge], bkt[edge], codes_s[a:b][edge]
                nk = len(rk)
                if nk == 0:
                    continue
                ch = np.empty(nk, dtype=bool)
                ch[0] = True
                np.logical_or(rk[1:] != rk[:-1], bk[1:] != bk[:-1], out=ch[1:])
                gid = np.cumsum(ch) - 1
                gstart = np.flatnonzero(ch)
                G = len(gstart)
                g_bucket = bk[gstart]
                g_code = ck[gstart]
                t_out = ((g_bucket + 1) * wus) / US
                tk = t_sec[edge]
                for ci, c in enumerate(self.vcols):
                    kind, gi, abcde = HS.fragment_states(
                        self.aggs, gid, vs_s[c][a:b][edge], tk, t_out, G, ci
                    )
                    rows["tier"].append(np.full(len(kind), ti, dtype=np.int8))
                    rows["src"].append(g_code[gi])
                    rows["bucket"].append(g_bucket[gi])
                    rows["kind"].append(kind)
                    blocks.append(abcde)
        if not blocks:
            return self.states_schema().empty_table()
        tier = np.concatenate(rows["tier"])
        src = np.concatenate(rows["src"])
        bucket = np.concatenate(rows["bucket"])
        kind = np.concatenate(rows["kind"])
        abcde = np.concatenate(blocks, axis=1)
        part = (
            crc[src] * 0x9E3779B1
            + bucket * 0x85EBCA77
            + tier.astype(np.int64) * 0xC2B2AE35
        ) % self.num_partitions
        return pa.table(
            {
                "tier": pa.array(tier, type=pa.int8()),
                "source": pa.compute.take(
                    pa.array(dictionary), pa.array(src)
                ).cast(pa.string()),
                "bucket": pa.array(bucket),
                "kind": pa.array(kind, type=pa.int16()),
                "a": pa.array(abcde[0]),
                "b": pa.array(abcde[1]),
                "c": pa.array(abcde[2]),
                "d": pa.array(abcde[3]),
                "e": pa.array(abcde[4]),
                "_part": pa.array(part.astype(np.int64)),
            }
        )

    # -- merge + finalize (runs inside groupby("_part").map_groups) -------
    def merge(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return self.final_schema().empty_table()
        enc = t["source"].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        dictionary = pa.array(enc.dictionary)
        tier = np.asarray(t["tier"].combine_chunks()).astype(np.int64)
        bucket = np.asarray(t["bucket"].combine_chunks())
        kind = np.asarray(t["kind"].combine_chunks())
        abcde = np.stack(
            [np.asarray(t[x].combine_chunks()) for x in "abcde"]
        )
        widths_us = np.array([w * US for _, w in self.ordered], dtype=np.int64)
        g_tier, g_src, g_bucket, results = HS.merge_and_finalize(
            self.aggs, tier, codes, bucket, kind, abcde, widths_us,
            n_cols=len(self.vcols),
        )
        names = np.array([n for n, _ in self.ordered])
        multi = len(self.vcols) > 1
        cols: dict[str, pa.Array] = {
            "tier": pa.array(names[g_tier], type=pa.string()),
            "source": pa.compute.take(dictionary, pa.array(g_src)).cast(
                pa.string()
            ),
            "bucket_ts": pa.array(g_bucket * widths_us[g_tier]).cast(
                pa.timestamp("us")
            ),
        }
        for ci, c in enumerate(self.vcols):
            for a in self.aggs:
                cols[f"{c}__{a}" if multi else a] = pa.array(results[ci][a])
        return pa.table(cols)


# --------------------------------------------------------------------------
# Calendar tiers (month / ISO-week buckets)
# --------------------------------------------------------------------------

_DAY_US = 86400 * US


def calendar_bucket_us(ts_us: np.ndarray, unit: str) -> np.ndarray:
    """Bucket-start microseconds for calendar units that fixed-width tiers
    cannot express: 'week' (Monday 00:00, ISO / DuckDB date_trunc('week')
    convention) and 'month' (first of month). Vectorized integer/datetime64
    arithmetic, no Python datetime loop."""
    if unit == "week":
        days = ts_us // _DAY_US
        # 1970-01-01 was a Thursday: shift so Monday == 0
        dow = (days + 3) % 7
        return (days - dow) * _DAY_US
    if unit == "month":
        m = ts_us.astype("datetime64[us]").astype("datetime64[M]")
        return m.astype("datetime64[us]").astype(np.int64)
    raise ValueError(f"unsupported calendar unit: {unit}")


def calendar_rollup(
    ds,
    *,
    source_col: str,
    ts_col: str,
    value_col: str,
    unit: str,
):
    """Calendar-bucketed rollup tier (count/sum/min/max of integer values
    per (source, calendar bucket)) — the calendar counterpart of the
    fixed-width tier cascade, for month/week retention tiers where bucket
    width varies (28-31 days).  Same decomposable-combiner shape as
    partial_states: each batch collapses to one partial row per
    (source, bucket) BEFORE the one small groupby merge, so the exchange
    is O(sources x buckets), never O(rows)."""
    from ray.data.aggregate import Max, Min, Sum

    from .blocks import norm_empty_blocks

    def part(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "bucket_us": pa.array([], type=pa.int64()),
                "count": pa.array([], type=pa.int64()),
                "sum": pa.array([], type=pa.int64()),
                "min": pa.array([], type=pa.int64()),
                "max": pa.array([], type=pa.int64()),
            }
        )
        if len(b) == 0:
            return empty
        ts_us = ts_to_us(b[ts_col].combine_chunks())
        v = np.asarray(b[value_col], dtype=np.int64)
        src = np.asarray(b[source_col]).astype(str)
        bucket = calendar_bucket_us(ts_us, unit)
        uniq_src, six = np.unique(src, return_inverse=True)
        ub, bix = np.unique(bucket, return_inverse=True)
        key = six.astype(np.int64) * len(ub) + bix
        uk, first_ix, gid = np.unique(key, return_index=True,
                                      return_inverse=True)
        G = len(uk)
        cnt = np.bincount(gid, minlength=G)
        s = np.zeros(G, dtype=np.int64)
        np.add.at(s, gid, v)
        order = np.argsort(gid, kind="stable")
        starts = np.searchsorted(gid[order], np.arange(G))
        mn = np.minimum.reduceat(v[order], starts)
        mx = np.maximum.reduceat(v[order], starts)
        return pa.table(
            {
                "source": pa.array(src[first_ix], type=pa.string()),
                "bucket_us": pa.array(bucket[first_ix]),
                "count": pa.array(cnt.astype(np.int64)),
                "sum": pa.array(s),
                "min": pa.array(mn),
                "max": pa.array(mx),
            }
        )

    agg = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=65536)
        .groupby(["source", "bucket_us"])
        .aggregate(
            Sum("count", alias_name="count"),
            Sum("sum", alias_name="sum"),
            Min("min", alias_name="min"),
            Max("max", alias_name="max"),
        )
    )
    agg = norm_empty_blocks(
        agg,
        [("source", pa.string()), ("bucket_us", pa.int64()),
         ("count", pa.int64()), ("sum", pa.int64()),
         ("min", pa.int64()), ("max", pa.int64())],
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": b["bucket_us"].cast(pa.timestamp("us")),
                "count": b["count"],
                "sum": b["sum"],
                "min": b["min"],
                "max": b["max"],
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
