"""Distributed range join: points joined to every interval that contains
them (key equality + start_ts <= t <= end_ts, closed bounds) — the range
join the brief names beside as-of joins and windowed aggregates; Ray Data
has no native operator for it.

Plan shape:
- ONE exchange: both sides hash-partitioned by (key, time bucket). Buckets
  are `bucket_s` wide (default: the longest interval, computed in the same
  pass that plans the join); each interval is REPLICATED to every bucket it
  overlaps, each point lands in exactly one bucket — so every matching
  (point, interval) pair co-locates exactly once and needs no dedup.
  Exchange volume = points + intervals x (len/bucket + 2).
- per partition: one lexsort per side on a packed (key-group, time) int64;
  per-point candidate range = [segment start of its key,
  searchsorted(interval starts, t)] and a vectorized repeat/cumsum pair
  expansion, filtered by end >= t. No per-row Python.
- cost note: a point's candidate count is the number of same-key intervals
  STARTING in its bucket at or before t (plus replicated overlappers) —
  bounded when interval length is O(bucket_s); `max_interval_s` makes the
  bound explicit and a violation raises instead of silently replicating an
  interval across the whole timeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rollup import crc_hash_sources, ts_to_us

US = 1_000_000


def _key_hash(key: np.ndarray) -> np.ndarray:
    if key.dtype.kind in "iu":
        return key.astype(np.int64)
    return crc_hash_sources(key.astype(str))


class _RangeKernel:
    def __init__(self, *, on, point_id_cols, interval_cols):
        self.on = on
        self.point_id_cols = point_id_cols
        self.interval_cols = interval_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        side = np.asarray(t["_side"])
        is_p = side == 0
        is_i = ~is_p
        key = np.asarray(t[self.on])
        ts = np.asarray(t["_ts"], dtype=np.int64)       # point t / ivl start
        te = np.asarray(t["_te"], dtype=np.int64)       # interval end

        uniq, gid = np.unique(key, return_inverse=True)
        p_ix = np.flatnonzero(is_p)
        i_ix = np.flatnonzero(is_i)

        def _empty():
            cols = {}
            for c in self.point_id_cols + [self.on]:
                cols[c] = t[c].combine_chunks().take(pa.array([], pa.int64()))
            cols["_ts"] = pa.array(np.empty(0, dtype=np.int64))
            for c in self.interval_cols:
                cols[c] = t[c].combine_chunks().take(pa.array([], pa.int64()))
            return pa.table(cols)

        if len(p_ix) == 0 or len(i_ix) == 0:
            return _empty()

        t0 = int(ts.min())
        rel = ts - t0
        span = int(max(rel.max(), (te[is_i] - t0).max())) + 2
        if len(uniq) * span >= np.iinfo(np.int64).max:
            raise ValueError(
                "range_join packed key would overflow int64 — raise "
                "num_partitions or shrink bucket_s"
            )
        comp = gid.astype(np.int64) * span + rel

        comp_i = comp[i_ix]
        order_i = np.argsort(comp_i, kind="stable")
        i_sorted = i_ix[order_i]
        comp_is = comp_i[order_i]

        # per-point candidate range within its key segment
        seg_lo = np.searchsorted(comp_is, gid[p_ix].astype(np.int64) * span)
        hi = np.searchsorted(comp_is, comp[p_ix], side="right")
        counts = hi - seg_lo
        total = int(counts.sum())
        if total == 0:
            return _empty()
        ptok = np.repeat(np.arange(len(p_ix)), counts)
        offs = np.repeat(np.cumsum(counts) - counts, counts)
        cand = i_sorted[np.repeat(seg_lo, counts) + (np.arange(total) - offs)]
        keep = te[cand] >= ts[p_ix][ptok]
        ptok, cand = ptok[keep], cand[keep]

        p_rows = pa.array(p_ix[ptok])
        i_rows = pa.array(cand)
        cols = {}
        for c in self.point_id_cols + [self.on]:
            cols[c] = t[c].combine_chunks().take(p_rows)
        cols["_ts"] = pa.array(ts[p_ix][ptok])
        for c in self.interval_cols:
            cols[c] = t[c].combine_chunks().take(i_rows)
        return pa.table(cols)


def range_join(
    point_ds,
    interval_ds,
    *,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    point_id_cols: list[str],
    interval_cols: list[str],
    max_interval_s: float,
    bucket_s: float | None = None,
    num_partitions: int | None = None,
):
    """Inner range join; one output row per (point, containing interval).
    Returns point_id_cols + on + _ts (us) + interval_cols. Intervals
    longer than `max_interval_s` raise (replication-bound contract)."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(point_ds)
    W_us = int(round((bucket_s if bucket_s is not None else max_interval_s) * US))
    if W_us <= 0:
        raise ValueError("bucket_s must be positive")
    max_us = int(round(max_interval_s * US))
    P = num_partitions

    clash = set(point_id_cols) & set(interval_cols)
    if clash:
        raise ValueError(f"point and interval column names clash: {sorted(clash)}")

    def tag_points(b: pa.Table) -> pa.Table:
        k = np.asarray(b[on])
        tus = ts_to_us(b[point_ts].combine_chunks())
        cols = {c: b[c] for c in point_id_cols}
        cols[on] = b[on]
        cols["_ts"] = pa.array(tus)
        cols["_te"] = pa.array(np.full(len(b), -1, dtype=np.int64))
        for c in interval_cols:
            cols[c] = pa.nulls(len(b), b2_types[c])
        cols["_side"] = pa.array(np.zeros(len(b), dtype=np.int8))
        part = _key_hash(k) * 0x9E3779B1 % P
        cols["_part"] = pa.array((part + P * (tus // W_us)).astype(np.int64))
        return pa.table(cols)

    def tag_intervals(b: pa.Table, id_types: dict) -> pa.Table:
        k = np.asarray(b[on])
        s_us = ts_to_us(b[start_ts].combine_chunks())
        e_us = ts_to_us(b[end_ts].combine_chunks())
        if len(b) and int((e_us - s_us).max()) > max_us:
            raise ValueError(
                "interval longer than max_interval_s: "
                f"{(e_us - s_us).max() / US:.1f}s > {max_us / US:.1f}s"
            )
        nrep = (e_us // W_us) - (s_us // W_us) + 1
        total = int(nrep.sum())
        tok = np.repeat(np.arange(len(b)), nrep)
        offs = np.repeat(np.cumsum(nrep) - nrep, nrep)
        bucket = (s_us // W_us)[tok] + (np.arange(total) - offs)
        rows = pa.array(tok)
        cols = {c: pa.nulls(total, id_types[c]) for c in point_id_cols}
        cols[on] = b[on].combine_chunks().take(rows)
        cols["_ts"] = pa.array(s_us[tok])
        cols["_te"] = pa.array(e_us[tok])
        for c in interval_cols:
            cols[c] = b[c].combine_chunks().take(rows)
        cols["_side"] = pa.array(np.ones(total, dtype=np.int8))
        part = _key_hash(np.asarray(cols[on])) * 0x9E3779B1 % P
        cols["_part"] = pa.array((part + P * bucket).astype(np.int64))
        return pa.table(cols)

    # interval value types for the point side's null lanes (and vice versa)
    try:
        _is = interval_ds.schema()
        _ipa = getattr(_is, "base_schema", _is)
        b2_types = {c: _ipa.field(c).type for c in interval_cols}
    except Exception:
        b2_types = {c: pa.float64() for c in interval_cols}
    try:
        _ps = point_ds.schema()
        _ppa = getattr(_ps, "base_schema", _ps)
        id_types = {c: _ppa.field(c).type for c in point_id_cols}
    except Exception:
        id_types = {c: pa.int64() for c in point_id_cols}

    kernel = _RangeKernel(
        on=on, point_id_cols=point_id_cols, interval_cols=interval_cols
    )
    pcols = list(dict.fromkeys(point_id_cols + [on, point_ts]))
    icols = list(dict.fromkeys([on, start_ts, end_ts] + interval_cols))
    ptag = point_ds.select_columns(pcols).map_batches(
        tag_points, batch_format="pyarrow", zero_copy_batch=True
    )
    itag = interval_ds.select_columns(icols).map_batches(
        lambda b: tag_intervals(b, id_types),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        ptag.union(itag)
        .groupby("_part")
        .map_groups(
            lambda t: kernel(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def interval_overlap_join(
    left_ds,
    right_ds,
    *,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    left_cols: list[str],
    right_cols: list[str],
    max_interval_s: float,
    bucket_s: float | None = None,
    num_partitions: int | None = None,
):
    """Interval-INTERVAL overlap join (half-open): one output row per
    (left, right) pair with equal key and l.start < r.end AND r.start <
    l.end — the third member of the temporal-join family beside the as-of
    join (point-to-latest) and the range join (point-in-interval).

    Same (key, time-bucket) partitioning as `range_join`, but BOTH sides
    replicate to every bucket their interval overlaps; a matching pair is
    emitted only in the CANONICAL bucket containing max(l.start, r.start)
    — which lies inside both intervals whenever they overlap — so each
    pair materializes exactly once with no dedup pass. Exchange volume =
    (|L| + |R|) x (len/bucket + 2); intervals longer than
    `max_interval_s` raise (replication-bound contract, as in
    range_join)."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(left_ds)
    W_us = int(round((bucket_s if bucket_s is not None else max_interval_s) * US))
    if W_us <= 0:
        raise ValueError("bucket_s must be positive")
    max_us = int(round(max_interval_s * US))
    P = num_partitions

    clash = set(left_cols) & set(right_cols)
    if clash:
        raise ValueError(f"left and right column names clash: {sorted(clash)}")

    def _types(ds, cols, default):
        try:
            sch = ds.schema()
            base = getattr(sch, "base_schema", sch)
            return {c: base.field(c).type for c in cols}
        except Exception:
            return {c: default for c in cols}

    l_types = _types(left_ds, left_cols, pa.int64())
    r_types = _types(right_ds, right_cols, pa.float64())

    def tag(b: pa.Table, *, side: int, start: str, end: str,
            own: list[str], other: list[str], other_types: dict) -> pa.Table:
        s_us = ts_to_us(b[start].combine_chunks())
        e_us = ts_to_us(b[end].combine_chunks())
        if len(b) and int((e_us - s_us).max()) > max_us:
            raise ValueError(
                "interval longer than max_interval_s: "
                f"{(e_us - s_us).max() / US:.1f}s > {max_us / US:.1f}s"
            )
        # half-open [s, e): the last bucket is the one containing e-1
        last = np.maximum(e_us - 1, s_us)
        nrep = (last // W_us) - (s_us // W_us) + 1
        total = int(nrep.sum())
        tok = np.repeat(np.arange(len(b)), nrep)
        offs = np.repeat(np.cumsum(nrep) - nrep, nrep)
        bucket = (s_us // W_us)[tok] + (np.arange(total) - offs)
        rows = pa.array(tok)
        cols = {}
        for c in own:
            cols[c] = b[c].combine_chunks().take(rows)
        for c in other:
            cols[c] = pa.nulls(total, other_types[c])
        cols[on] = b[on].combine_chunks().take(rows)
        cols["_s"] = pa.array(s_us[tok])
        cols["_e"] = pa.array(e_us[tok])
        cols["_bk"] = pa.array(bucket.astype(np.int64))
        cols["_side"] = pa.array(np.full(total, side, dtype=np.int8))
        part = _key_hash(np.asarray(cols[on])) * 0x9E3779B1 % P
        cols["_part"] = pa.array((part + P * bucket).astype(np.int64))
        return pa.table(cols)

    def kernel(t: pa.Table) -> pa.Table:
        side = np.asarray(t["_side"])
        is_l = side == 0
        l_ix = np.flatnonzero(is_l)
        r_ix = np.flatnonzero(~is_l)

        def _empty():
            cols = {}
            e = pa.array([], pa.int64())
            for c in left_cols + [on] + right_cols:
                cols[c] = t[c].combine_chunks().take(e)
            return cols and pa.table(cols)

        if len(l_ix) == 0 or len(r_ix) == 0:
            return _empty()
        key = np.asarray(t[on])
        s = np.asarray(t["_s"], dtype=np.int64)
        e = np.asarray(t["_e"], dtype=np.int64)
        bk = np.asarray(t["_bk"], dtype=np.int64)
        uniq, gid = np.unique(key, return_inverse=True)
        t0 = int(s.min())
        span = int(max((e - t0).max(), 1)) + 2
        if len(uniq) * span >= np.iinfo(np.int64).max:
            raise ValueError(
                "interval_overlap_join packed key would overflow int64 — "
                "raise num_partitions or shrink bucket_s"
            )
        comp_r = gid[r_ix].astype(np.int64) * span + (s[r_ix] - t0)
        order_r = np.argsort(comp_r, kind="stable")
        r_sorted = r_ix[order_r]
        comp_rs = comp_r[order_r]
        gl = gid[l_ix].astype(np.int64)
        # candidates: same key, r.start < l.end (half-open)
        seg_lo = np.searchsorted(comp_rs, gl * span)
        hi = np.searchsorted(comp_rs, gl * span + (e[l_ix] - t0), side="left")
        counts = hi - seg_lo
        total = int(counts.sum())
        if total == 0:
            return _empty()
        ltok = np.repeat(np.arange(len(l_ix)), counts)
        offs = np.repeat(np.cumsum(counts) - counts, counts)
        cand = r_sorted[np.repeat(seg_lo, counts) + (np.arange(total) - offs)]
        la = l_ix[ltok]
        # overlap: l.start < r.end; exactly-once: this bucket is the one
        # containing max(l.start, r.start)
        keep = (s[la] < e[cand]) & (
            np.maximum(s[la], s[cand]) // W_us == bk[la]
        )
        la, cand = la[keep], cand[keep]
        cols = {}
        for c in left_cols:
            cols[c] = t[c].combine_chunks().take(pa.array(la))
        cols[on] = t[on].combine_chunks().take(pa.array(la))
        for c in right_cols:
            cols[c] = t[c].combine_chunks().take(pa.array(cand))
        return pa.table(cols)

    lcols = list(dict.fromkeys(left_cols + [on, left_start, left_end]))
    rcols = list(dict.fromkeys(right_cols + [on, right_start, right_end]))
    ltag = left_ds.select_columns(lcols).map_batches(
        lambda b: tag(b, side=0, start=left_start, end=left_end,
                      own=left_cols, other=right_cols, other_types=r_types),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    rtag = right_ds.select_columns(rcols).map_batches(
        lambda b: tag(b, side=1, start=right_start, end=right_end,
                      own=right_cols, other=left_cols, other_types=l_types),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return (
        ltag.union(rtag)
        .groupby("_part")
        .map_groups(
            lambda t: kernel(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
