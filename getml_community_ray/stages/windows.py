"""Point-in-time window features — the FastProp/TimeSeries self-join bridge.

Reference semantics (cites into /root/reference):
- a peripheral row at time `pts` matches a population row at time `t` iff
      pts + horizon <= t  AND  t < pts + horizon + memory
  i.e. pts in (t - horizon - memory, t - horizon]
  (`helpers/Matchmaker.hpp:92-137`; horizon/memory ts rewrites
  `make_placeholder.cpp:82-100,235-250`).
- lag-window conditions partition that window into tumbling lag buckets
  `t - (i+1)*delta < pts <= t - i*delta` (`FastProp.cpp:1255-1290`,
  `ConditionParser.cpp:68-88`).
- the reference recomputes the window per population row via a sorted
  (join_key, ts) index (`tsindex/InMemoryIndex.hpp:36-47`); here each hash
  partition is sorted once by (key, ts) and every row's window bounds come
  from two vectorized searchsorted calls over a packed (group, ts) key —
  O(n log n) per partition, no per-row Python.

`sql_frame_mode=True` switches the window to the inclusive [t - memory, t]
frame of SQL `RANGE BETWEEN m PRECEDING AND CURRENT ROW` (peers with equal
ts included) so results are DuckDB-window-oracle comparable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rollup import crc_hash_sources, ts_to_us

US = 1_000_000


class WindowFeatures:
    """Per-partition vectorized window aggregation (count/sum/avg).

    Input batch: one hash partition by key; complete key groups required.
    Output: input key/ts/id columns + one float64 column per agg, named
    `w_<agg>`.
    """

    def __init__(
        self,
        *,
        key_col: str,
        ts_col: str,
        value_col: str,
        id_cols: list[str],
        horizon_s: float = 0.0,
        memory_s: float = 600.0,
        aggs: tuple[str, ...] = ("count", "sum", "avg"),
        sql_frame_mode: bool = False,
    ):
        self.key_col = key_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.id_cols = id_cols
        self.horizon_us = int(horizon_s * US)
        self.memory_us = int(memory_s * US)
        self.aggs = aggs
        self.sql_frame_mode = sql_frame_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts_us = ts_to_us(batch[self.ts_col].combine_chunks())
        v = np.asarray(batch[self.value_col].combine_chunks(), dtype=np.float64)
        key = np.asarray(batch[self.key_col])
        n = len(v)
        if n == 0:
            return self._empty(batch)

        uniq, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((ts_us, gid))
        g_s, t_s, v_s = gid[order], ts_us[order], v[order]

        # pack (gid, ts) into one int64 for global searchsorted
        t0 = t_s.min()
        rel = t_s - t0
        span = int(rel.max()) + self.memory_us + self.horizon_us + 2
        comp = g_s * span + rel

        if self.sql_frame_mode:
            lo_t = rel - self.memory_us          # inclusive lower
            hi_t = rel + 1                       # inclusive upper (ts <= t)
        else:
            lo_t = rel - self.horizon_us - self.memory_us + 1  # exclusive lower
            hi_t = rel - self.horizon_us + 1                   # inclusive upper
        lo = np.searchsorted(comp, g_s * span + np.maximum(lo_t, 0), side="left")
        hi = np.searchsorted(comp, g_s * span + np.maximum(hi_t, 0), side="left")
        # windows never cross group boundaries: lo_t/hi_t clipped at >= 0 and
        # span exceeds max rel + memory, so packed bounds stay inside group g.

        cnt = (hi - lo).astype(np.float64)
        csum = np.concatenate([[0.0], np.cumsum(v_s)])
        s = csum[hi] - csum[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            a = s / cnt
        a[cnt == 0] = np.nan

        out_cols: dict[str, pa.Array] = {}
        for c in self.id_cols:
            out_cols[c] = batch[c].combine_chunks().take(pa.array(order))
        out_cols[self.key_col] = pa.array(uniq[g_s])
        out_cols[self.ts_col] = batch[self.ts_col].combine_chunks().take(pa.array(order))
        named = {"count": cnt, "sum": s, "avg": a}
        for agg in self.aggs:
            out_cols[f"w_{agg}"] = pa.array(named[agg])
        return pa.table(out_cols)

    def _empty(self, batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in self.id_cols}
        cols[self.key_col] = batch[self.key_col]
        cols[self.ts_col] = batch[self.ts_col]
        for agg in self.aggs:
            cols[f"w_{agg}"] = pa.array([], type=pa.float64())
        return pa.table(cols)


def window_features(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_cols: list[str],
    horizon_s: float = 0.0,
    memory_s: float = 600.0,
    aggs: tuple[str, ...] = ("count", "sum", "avg"),
    sql_frame_mode: bool = False,
    num_partitions: int | None = None,
):
    """Hash-partition by key, then vectorized per-partition window sweep."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    stage = WindowFeatures(
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        id_cols=id_cols,
        horizon_s=horizon_s,
        memory_s=memory_s,
        aggs=aggs,
        sql_frame_mode=sql_frame_mode,
    )

    def add_part(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col])
        if k.dtype.kind in "iu":
            h = k.astype(np.int64)
        else:
            h = crc_hash_sources(k.astype(str))
        part = (h * 0x9E3779B1 % num_partitions).astype(np.int64)
        return b.append_column("_part", pa.array(part))

    cols = list(dict.fromkeys(id_cols + [key_col, ts_col, value_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: stage(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )


def sessionize(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_cols: list[str],
    gap_s: float = 1800.0,
    num_partitions: int | None = None,
):
    """Sessionization: per key, a new session starts when the gap to the
    previous event exceeds `gap_s`. Output adds `session_ix` (0-based per
    key) and `session_event_ix` (0-based within session).

    Hash-partition by key, one vectorized pass per partition (sort by
    (key, ts), gap > threshold -> cumsum) — the standard training-data
    sessionize, absent from the reference (its windows are horizon/memory
    per prediction row) but required corpus surface."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    gap_us = int(gap_s * US)

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        ts_us = ts_to_us(batch[ts_col].combine_chunks())
        uniq, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((ts_us, gid))
        g_s, t_s = gid[order], ts_us[order]
        n = len(g_s)
        new_sess = np.ones(n, dtype=np.int64)
        if n > 1:
            same = g_s[1:] == g_s[:-1]
            close = (t_s[1:] - t_s[:-1]) <= gap_us
            new_sess[1:] = (~(same & close)).astype(np.int64)
        sess_global = np.cumsum(new_sess) - 1
        # per-key session index: subtract the key's first session id
        first_per_key = np.zeros(len(uniq), dtype=np.int64)
        kstart = np.searchsorted(g_s, np.arange(len(uniq)))
        first_per_key = sess_global[np.minimum(kstart, n - 1)]
        session_ix = sess_global - first_per_key[g_s]
        # index within session
        sess_start_pos = np.where(new_sess == 1)[0]
        start_of = sess_start_pos[sess_global]
        session_event_ix = np.arange(n) - start_of

        cols = {}
        for c in id_cols:
            cols[c] = batch[c].combine_chunks().take(pa.array(order))
        cols[key_col] = pa.array(uniq[g_s])
        cols[ts_col] = batch[ts_col].combine_chunks().take(pa.array(order))
        cols["session_ix"] = pa.array(session_ix)
        cols["session_event_ix"] = pa.array(session_event_ix)
        return pa.table(cols)

    def add_part(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col])
        if k.dtype.kind in "iu":
            h = k.astype(np.int64)
        else:
            h = crc_hash_sources(k.astype(str))
        return b.append_column(
            "_part", pa.array((h * 0x9E3779B1 % num_partitions).astype(np.int64))
        )

    cols = list(dict.fromkeys(id_cols + [key_col, ts_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: part_fn(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )


def rolling_rows(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_cols: list[str],
    window_rows: int,
    aggs: tuple[str, ...] = ("count", "sum", "avg", "min", "max"),
    num_partitions: int | None = None,
):
    """Row-count rolling window per key — SQL's
    `ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT ROW` over
    (PARTITION BY key ORDER BY ts, id). Partial windows at each key's head
    use the available rows, exactly like SQL.

    One hash exchange by key; per partition a single lexsort, then
    prefix-sum (count/sum/avg) and reduceat (min/max) kernels — per-task
    cost O(rows) + O(rows x window) for min/max, bounded by the partition.
    Output: id_cols + key + ts + `r_<agg>` float64 columns."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    order_id = id_cols[0] if id_cols else None

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        ts_us = ts_to_us(batch[ts_col].combine_chunks())
        v = np.asarray(
            batch[value_col].combine_chunks(), dtype=np.float64
        )
        uniq, gid = np.unique(key, return_inverse=True)
        if order_id is not None:
            oid = np.asarray(batch[order_id])
            order = np.lexsort((oid, ts_us, gid))
        else:
            order = np.lexsort((ts_us, gid))
        g_s, v_s = gid[order], v[order]
        n = len(g_s)
        seg_start_pos = np.zeros(n, dtype=np.int64)
        if n:
            new_seg = np.ones(n, dtype=bool)
            new_seg[1:] = g_s[1:] != g_s[:-1]
            starts_ix = np.flatnonzero(new_seg)
            seg_start_pos = starts_ix[np.cumsum(new_seg) - 1]
        i = np.arange(n)
        w_start = np.maximum(i - window_rows + 1, seg_start_pos)
        cnt = (i - w_start + 1).astype(np.float64)

        out = {}
        for c in id_cols:
            out[c] = batch[c].combine_chunks().take(pa.array(order))
        out[key_col] = pa.array(uniq[g_s])
        out[ts_col] = batch[ts_col].combine_chunks().take(pa.array(order))
        need = set(aggs)
        if need & {"sum", "avg"}:
            csum = np.concatenate(([0.0], np.cumsum(v_s)))
            wsum = csum[i + 1] - csum[w_start]
        if "count" in need:
            out["r_count"] = pa.array(cnt)
        if "sum" in need:
            out["r_sum"] = pa.array(wsum)
        if "avg" in need:
            out["r_avg"] = pa.array(wsum / cnt)
        if need & {"min", "max"} and n:
            # variable-length windows via interleaved reduceat pairs
            # (w_start, i): reduces [w_start, i) — reduceat indices must be
            # < n, so the current row is folded in afterwards; a (i, i)
            # pair returns v_s[i] by reduceat's >=-rule, folding is a no-op
            bounds = np.empty(2 * n, dtype=np.int64)
            bounds[0::2] = w_start
            bounds[1::2] = i
            if "min" in need:
                out["r_min"] = pa.array(
                    np.minimum(np.minimum.reduceat(v_s, bounds)[0::2], v_s)
                )
            if "max" in need:
                out["r_max"] = pa.array(
                    np.maximum(np.maximum.reduceat(v_s, bounds)[0::2], v_s)
                )
        elif need & {"min", "max"}:
            if "min" in need:
                out["r_min"] = pa.array(np.empty(0, dtype=np.float64))
            if "max" in need:
                out["r_max"] = pa.array(np.empty(0, dtype=np.float64))
        return pa.table(out)

    def add_part(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col])
        if k.dtype.kind in "iu":
            h = k.astype(np.int64)
        else:
            h = crc_hash_sources(k.astype(str))
        return b.append_column(
            "_part", pa.array((h * 0x9E3779B1 % num_partitions).astype(np.int64))
        )

    cols = list(dict.fromkeys(id_cols + [key_col, ts_col, value_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: part_fn(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )


def hopping_window(
    ds,
    *,
    ts_col: str,
    key_col: str,
    value_col: str,
    width_s: int,
    slide_s: int,
):
    """Hopping (sliding) tumbling-grid window aggregate: for every window
    start `w` (a multiple of slide_s) and key, aggregate rows with
    w <= ts < w + width_s. Emits (key, window_start_us, n, sum, min, max)
    with the value pre-converted to exact integers by the caller.

    width_s must be a multiple of slide_s (r = width/slide overlapping
    windows per row). Scale shape: the per-batch combiner expands each row
    to its r windows and IMMEDIATELY shrinks to per-(batch, key, window)
    partial states via one packed-key np.unique — the shuffle carries
    partials (O(keys x windows) per batch), never the r-times-expanded
    rows. The merge is ONE small groupby of mergeable states (sum/min/max
    of integers: order-insensitive, bit-exact at any parallelism)."""
    from ray.data.aggregate import Max, Min, Sum

    if width_s % slide_s != 0:
        raise ValueError("width_s must be a multiple of slide_s")
    r = width_s // slide_s
    s_us = slide_s * US

    def partial(b: pa.Table) -> pa.Table:
        ts = ts_to_us(b[ts_col].combine_chunks())
        v = np.asarray(b[value_col].combine_chunks()).astype(np.int64)
        k = np.asarray(b[key_col])
        empty = pa.table(
            {
                "key": pa.array([], type=pa.string()),
                "window_start_us": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "sum": pa.array([], type=pa.int64()),
                "min": pa.array([], type=pa.int64()),
                "max": pa.array([], type=pa.int64()),
            }
        )
        n = len(ts)
        if n == 0:
            return empty
        uniq_k, kid = np.unique(k.astype(str), return_inverse=True)
        # row i belongs to windows ((ts//S) - j) * S for j in 0..r-1
        base = ts // s_us
        wj = np.repeat(base, r) - np.tile(
            np.arange(r, dtype=np.int64), n
        )
        kid_r = np.repeat(kid.astype(np.int64), r)
        v_r = np.repeat(v, r)
        # pack (kid, window index) into one sortable key; window indexes
        # are shifted to >= 0 within the batch
        wmin = wj.min()
        span = wj.max() - wmin + 1
        packed = kid_r * span + (wj - wmin)
        order = np.argsort(packed, kind="stable")
        ps = packed[order]
        vs = v_r[order]
        starts = np.flatnonzero(
            np.concatenate([[True], ps[1:] != ps[:-1]])
        )
        cnt = np.diff(np.append(starts, len(ps)))
        return pa.table(
            {
                "key": pa.array(uniq_k[(ps[starts] // span)]),
                "window_start_us": pa.array(
                    (ps[starts] % span + wmin) * s_us
                ),
                "n": pa.array(cnt.astype(np.int64)),
                "sum": pa.array(np.add.reduceat(vs, starts)),
                "min": pa.array(np.minimum.reduceat(vs, starts)),
                "max": pa.array(np.maximum.reduceat(vs, starts)),
            }
        )

    return (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .groupby(["key", "window_start_us"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum", alias_name="sum"),
            Min("min", alias_name="min"),
            Max("max", alias_name="max"),
        )
    )


def counter_increase(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_cols: list[str],
    num_partitions: int | None = None,
):
    """PromQL-style counter delta with reset handling: per key in ts
    order, `delta` = value - lag(value) (null for the key's first row)
    and `increase` = delta when delta >= 0 else value (a drop means the
    counter reset, so the post-reset reading IS the increase).

    One hash exchange by key, one vectorized lexsort + shifted-compare
    pass per partition — same shape as sessionize. Ties on ts break by
    input order within the partition (sorted stably), matching a SQL
    window with the same tie order when (key, ts) is unique."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        ts_us = ts_to_us(batch[ts_col].combine_chunks())
        v = np.asarray(batch[value_col], dtype=np.int64)
        uniq, gid = np.unique(key, return_inverse=True)
        # equal-ts tie-break by the first id column (deterministic and
        # SQL-window-matchable: ORDER BY ts, <id>)
        tie = np.asarray(batch[id_cols[0]])
        if tie.dtype.kind not in "iu":
            tie = crc_hash_sources(tie.astype(str))
        order = np.lexsort((tie, ts_us, gid))
        g_s, v_s = gid[order], v[order]
        n = len(g_s)
        delta = np.zeros(n, dtype=np.int64)
        is_first = np.ones(n, dtype=bool)
        if n > 1:
            same = g_s[1:] == g_s[:-1]
            delta[1:] = v_s[1:] - v_s[:-1]
            is_first[1:] = ~same
        increase = np.where(delta >= 0, delta, v_s)
        cols = {c: batch[c].take(pa.array(order)) for c in id_cols}
        cols["delta"] = pa.array(
            np.where(is_first, 0, delta), mask=is_first
        )
        cols["increase"] = pa.array(
            np.where(is_first, 0, increase), mask=is_first
        )
        return pa.table(cols)

    def add_part(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col])
        if k.dtype.kind in "iu":
            h = k.astype(np.int64)
        else:
            h = crc_hash_sources(k.astype(str))
        return b.append_column(
            "_part",
            pa.array((h * 0x9E3779B1 % num_partitions).astype(np.int64)),
        )

    cols = list(dict.fromkeys(id_cols + [key_col, ts_col, value_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: part_fn(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def hopping_distinct(
    ds,
    *,
    ts_col: str,
    key_col: str,
    member_col: str,
    width_s: int,
    slide_s: int,
    num_partitions: int = 16,
):
    """Exact DISTINCT-count over hopping windows: for every window start
    w (multiple of slide_s) and key, the number of distinct `member_col`
    values among rows with w <= ts < w + width_s — the sliding
    unique-visitors primitive the plain hopping_window (sum/min/max)
    cannot express.

    Exactness at scale WITHOUT a distinct-over-count shuffle of raw rows:
    (1) the per-batch combiner expands each row to its r windows and
    immediately collapses to DISTINCT (key, window, member) triples;
    (2) triples hash-partition BY TRIPLE, so every copy of one triple
    lands in one partition — a per-partition distinct + per-(key, window)
    partial count is globally correct; (3) one tiny final groupby sums
    the disjoint partials. Exchange volume is O(distinct triples), the
    information-theoretic minimum for exact sliding distinct."""
    from ray.data.aggregate import Sum

    from ..kernels.hashing import splitmix64

    if width_s % slide_s != 0:
        raise ValueError("width_s must be a multiple of slide_s")
    r = width_s // slide_s
    s_us = slide_s * US

    empty = pa.table(
        {
            "key": pa.array([], type=pa.string()),
            "window_start_us": pa.array([], type=pa.int64()),
            "member": pa.array([], type=pa.int64()),
        }
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = ts_to_us(b[ts_col].combine_chunks())
        m = np.asarray(b[member_col], dtype=np.int64)
        k = np.asarray(b[key_col]).astype(str)
        n = len(ts)
        if n == 0:
            return empty
        uniq_k, kid = np.unique(k, return_inverse=True)
        base = ts // s_us
        wj = np.repeat(base, r) - np.tile(np.arange(r, dtype=np.int64), n)
        kid_r = np.repeat(kid.astype(np.int64), r)
        m_r = np.repeat(m, r)
        order = np.lexsort((m_r, wj, kid_r))
        ks, ws, ms = kid_r[order], wj[order], m_r[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1]) | (ms[1:] != ms[:-1])
        return pa.table(
            {
                "key": pa.array(uniq_k[ks[new]]),
                "window_start_us": pa.array(ws[new] * s_us),
                "member": pa.array(ms[new]),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("_part", pa.array([], type=pa.int64()))
        from .rollup import crc_hash_sources

        h = crc_hash_sources(np.asarray(b["key"]).astype(str))
        x = (
            h.astype(np.int64)
            + np.asarray(b["window_start_us"], dtype=np.int64) * 31
            + np.asarray(b["member"], dtype=np.int64) * 131
        )
        hp = splitmix64(x.view(np.uint64))
        return b.append_column(
            "_part",
            pa.array((hp % np.uint64(num_partitions)).astype(np.int64)),
        )

    def count_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "key": pa.array([], type=pa.string()),
                    "window_start_us": pa.array([], type=pa.int64()),
                    "n_distinct": pa.array([], type=pa.int64()),
                }
            )
        k = np.asarray(t["key"]).astype(str)
        w = np.asarray(t["window_start_us"], dtype=np.int64)
        m = np.asarray(t["member"], dtype=np.int64)
        uk, kid = np.unique(k, return_inverse=True)
        order = np.lexsort((m, w, kid))
        ks, ws, ms = kid[order], w[order], m[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1]) | (ms[1:] != ms[:-1])
        kd, wd = ks[new], ws[new]
        gnew = np.ones(len(kd), dtype=bool)
        gnew[1:] = (kd[1:] != kd[:-1]) | (wd[1:] != wd[:-1])
        gstarts = np.flatnonzero(gnew)
        cnt = np.diff(np.append(gstarts, len(kd))).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(uk[kd[gstarts]]),
                "window_start_us": pa.array(wd[gstarts]),
                "n_distinct": pa.array(cnt),
            }
        )

    return (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: count_part(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
        .groupby(["key", "window_start_us"])
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
    )
