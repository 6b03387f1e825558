"""Per-key ordered analytics: SQL-window-function family (cumulative sum,
row_number, rank, lag/delta), latest-row-per-key compaction, and merged
interval coverage.

Reference parity: the getML engine exposes these through column views +
aggregations over a sorted (join_key, ts) index
(`src/engine/include/containers/ColumnView.hpp`,
`tsindex/InMemoryIndex.hpp:36-47`); a CDC-style "newest row wins"
compaction is the degenerate FastProp `last` over an unbounded memory
window (`FastProp.cpp`, AGGREGATIONS `last`). Here each operator is one
hash exchange by key plus a vectorized per-partition kernel — no per-row
Python, no driver materialization.

Scale notes (100 TB):
- exactly ONE all-to-all exchange per operator, keyed by hash(key) — the
  same partitioning the rest of the repo uses, so pipelines composing
  these stages can reuse a single exchange.
- `latest_by_key` runs a per-batch combiner BEFORE the exchange: each
  input batch collapses to <= distinct-keys-in-batch rows, so the shuffle
  moves candidate rows, not the table.
- per-partition kernels are O(n log n) lexsort + O(n) numpy/pandas
  passes; memory bounded by the partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rollup import crc_hash_sources, ts_to_us


def _part_column(key: np.ndarray, num_partitions: int) -> pa.Array:
    if key.dtype.kind in "iu":
        h = key.astype(np.int64)
    else:
        h = crc_hash_sources(key.astype(str))
    return pa.array((h * 0x9E3779B1 % num_partitions).astype(np.int64))


def _hash_exchange(ds, key_col: str, num_partitions: int, part_fn):
    """One hash exchange by key_col, then part_fn per complete partition."""

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", _part_column(np.asarray(b[key_col]), num_partitions)
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: part_fn(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )


def keyed_window_funcs(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int | None = None,
):
    """SQL window functions over (PARTITION BY key ORDER BY ts, id):

    - `cum_<value>`  : SUM(value) OVER (... ORDER BY ts, id)   [int64 in =
                        exact int64 running sum out]
    - `row_number`   : ROW_NUMBER() OVER (... ORDER BY ts, id)
    - `rank`         : RANK() OVER (... ORDER BY ts)  — ties on ts share a
                        rank, next rank skips (SQL RANK semantics)
    - `lag_<value>`  : LAG(value) OVER (... ORDER BY ts, id), NULL at the
                        key head
    - `delta_<value>`: value - lag, NULL at the key head

    value_col must be an integer column (cents etc.) so the running sum is
    exact on both the engine and the DuckDB oracle side.
    """
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        ts_us = ts_to_us(batch[ts_col].combine_chunks())
        oid = np.asarray(batch[id_col])
        v = np.asarray(batch[value_col].combine_chunks(), dtype=np.int64)
        uniq, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((oid, ts_us, gid))
        g_s, t_s, v_s = gid[order], ts_us[order], v[order]
        n = len(g_s)
        i = np.arange(n, dtype=np.int64)

        new_seg = np.ones(n, dtype=bool)
        if n:
            new_seg[1:] = g_s[1:] != g_s[:-1]
        # position of each row's segment start
        seg_start = np.maximum.accumulate(np.where(new_seg, i, 0))

        # exact segmented int64 running sum: global cumsum minus the prefix
        # up to the segment start (integer arithmetic — no float rounding)
        csum = np.cumsum(v_s, dtype=np.int64)
        base = np.where(seg_start > 0, csum[seg_start - 1], 0)
        cum = csum - base

        row_number = i - seg_start + 1

        # RANK over ts only: first position of each (key, ts) run
        new_ts = new_seg.copy()
        if n:
            new_ts[1:] |= t_s[1:] != t_s[:-1]
        first_ts_pos = np.maximum.accumulate(np.where(new_ts, i, 0))
        rank = first_ts_pos - seg_start + 1

        lag = np.empty(n, dtype=np.int64)
        if n:
            lag[1:] = v_s[:-1]
            lag[0] = 0
        head = new_seg  # NULL mask
        lag_arr = pa.array(lag, mask=head)
        delta_arr = pa.array(v_s - lag, mask=head)

        ord_pa = pa.array(order)
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().take(ord_pa),
                key_col: pa.array(uniq[g_s]),
                ts_col: batch[ts_col].combine_chunks().take(ord_pa),
                value_col: pa.array(v_s),
                f"cum_{value_col}": pa.array(cum),
                "row_number": pa.array(row_number),
                "rank": pa.array(rank),
                f"lag_{value_col}": lag_arr,
                f"delta_{value_col}": delta_arr,
            }
        )

    cols = list(dict.fromkeys([id_col, key_col, ts_col, value_col]))
    return _hash_exchange(
        ds.select_columns(cols), key_col, num_partitions, part_fn
    )


def latest_by_key(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    num_partitions: int | None = None,
):
    """Latest-row-per-key compaction (CDC "newest wins"): the row with the
    lexicographically greatest (ts, id) per key — SQL
    `QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC, id DESC) = 1`.

    Per-batch combiner collapses each input batch to one candidate row per
    distinct key BEFORE the hash exchange, so the shuffle volume is
    O(distinct keys per batch), not O(rows) — the pattern that keeps a
    100 TB changelog compaction from moving the whole table.
    """
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def keep_latest(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        key = np.asarray(batch[key_col])
        ts_us = ts_to_us(batch[ts_col].combine_chunks())
        oid = np.asarray(batch[id_col])
        _, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((oid, ts_us, gid))
        g_s = gid[order]
        last = np.ones(len(g_s), dtype=bool)
        last[:-1] = g_s[1:] != g_s[:-1]
        return batch.take(pa.array(order[last]))

    def add_part(b: pa.Table) -> pa.Table:
        b = keep_latest(b)  # combiner: <= distinct keys rows leave the batch
        return b.append_column(
            "_part", _part_column(np.asarray(b[key_col]), num_partitions)
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: keep_latest(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def interval_coverage(
    ds,
    *,
    key_col: str,
    start_us_col: str,
    end_us_col: str,
    num_partitions: int | None = None,
):
    """Union length of (possibly overlapping) [start, end) intervals per
    key, in the integer unit of the input columns (exact int64 arithmetic).

    Returns (key, covered, n_intervals) — `covered` is the measure of the
    union of the key's intervals (a classic sweep: sort by start, clip each
    interval at the running max of prior ends, sum positive remainders).
    Zero/negative-length intervals contribute 0 but count in n_intervals.
    """
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        s = np.asarray(batch[start_us_col].combine_chunks(), dtype=np.int64)
        e = np.asarray(batch[end_us_col].combine_chunks(), dtype=np.int64)
        uniq, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((e, s, gid))
        g_s, s_s, e_s = gid[order], s[order], e[order]
        n = len(g_s)

        # running max of ends per segment (pandas cummax: C-speed, resets
        # per group — the vectorized accumulate trick can't reset exactly)
        import pandas as pd

        runmax = (
            pd.Series(e_s).groupby(pd.Series(g_s)).cummax().to_numpy()
        )
        pmax = np.empty(n, dtype=np.int64)
        if n:
            pmax[1:] = runmax[:-1]
            pmax[0] = s_s[0]
        new_seg = np.ones(n, dtype=bool)
        if n:
            new_seg[1:] = g_s[1:] != g_s[:-1]
        pmax[new_seg] = s_s[new_seg]  # no prior interval: clip at own start

        contrib = np.maximum(e_s - np.maximum(s_s, pmax), 0)
        covered = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(covered, g_s, contrib)
        counts = np.bincount(g_s, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(uniq),
                "covered": pa.array(covered),
                "n_intervals": pa.array(counts),
            }
        )

    cols = list(dict.fromkeys([key_col, start_us_col, end_us_col]))
    return _hash_exchange(
        ds.select_columns(cols), key_col, num_partitions, part_fn
    )


def time_weighted_avg(
    ds,
    *,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int | None = None,
):
    """Time-weighted average per key (TimescaleDB `time_weight('Linear')`
    analog): trapezoid integral of the value curve divided by the key's
    time span.

    Inputs are integer microseconds (ts_us_col) and integer value units
    (value_col, e.g. cents) so the 2x-area accumulator
    `sum((v_i + v_{i-1}) * (t_i - t_{i-1}))` is EXACT int64 on both the
    engine and the DuckDB oracle side; the only float op is the final
    division, done identically. Ordering is (ts, id) — deterministic under
    ts ties. Keys with < 2 events or zero span are dropped (no measure).

    int64-range contract: per-key sum of (v_i+v_{i-1})*dt_us must stay
    below 2^63 (cents x day-scale spans x millions of rows is ~1e17 per
    term; callers with bigger products should rescale the value unit —
    same contract as the repo-wide cents pattern).

    Returns (key, area2, span_us, twa) where twa = area2 / 2 / span_us."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        t = np.asarray(batch[ts_us_col].combine_chunks(), dtype=np.int64)
        v = np.asarray(batch[value_col].combine_chunks(), dtype=np.int64)
        oid = np.asarray(batch[id_col])
        uniq, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((oid, t, gid))
        g_s, t_s, v_s = gid[order], t[order], v[order]
        n = len(g_s)
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array(uniq),
                    "area2": pa.array(np.empty(0, dtype=np.int64)),
                    "span_us": pa.array(np.empty(0, dtype=np.int64)),
                    "twa": pa.array(np.empty(0, dtype=np.float64)),
                }
            )
        same = np.zeros(n, dtype=bool)
        same[1:] = g_s[1:] == g_s[:-1]
        dt = np.zeros(n, dtype=np.int64)
        dt[1:] = t_s[1:] - t_s[:-1]
        term = np.zeros(n, dtype=np.int64)
        term[1:] = (v_s[1:] + v_s[:-1]) * dt[1:]
        term[~same] = 0
        area2 = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(area2, g_s, term)
        tmin = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        tmax = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(tmin, g_s, t_s)
        np.maximum.at(tmax, g_s, t_s)
        span = tmax - tmin
        keep = span > 0
        twa = np.zeros(len(uniq), dtype=np.float64)
        twa[keep] = area2[keep].astype(np.float64) / 2.0 / span[keep]
        return pa.table(
            {
                key_col: pa.array(uniq[keep]),
                "area2": pa.array(area2[keep]),
                "span_us": pa.array(span[keep]),
                "twa": pa.array(twa[keep]),
            }
        )

    cols = list(dict.fromkeys([key_col, ts_us_col, value_col, id_col]))
    return _hash_exchange(
        ds.select_columns(cols), key_col, num_partitions, part_fn
    )


def lttb_downsample(
    ds,
    *,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    n_out: int,
    num_partitions: int | None = None,
):
    """Largest-Triangle-Three-Buckets downsampling per key (Steinarsson
    2013) — the standard lossy series downsampler for dashboards: keeps
    the first and last point of each key and, per fixed-width bucket, the
    point forming the largest triangle with the previously selected point
    and the next bucket's centroid.

    Sequential by construction (each bucket's choice depends on the prior
    selection), so the kernel loops over the n_out-2 buckets per key with
    vectorized area computation inside each bucket — O(n) per key total,
    fine for n_out in the hundreds/thousands. Distribution is the usual
    one hash exchange by key; a key's full series must fit a partition
    (same contract as every per-key kernel in this module).

    Deterministic: ties on triangle area pick the earliest point; input
    order is canonicalized by (ts, value). Keys with <= n_out points pass
    through unchanged. Returns (key, ts_us, value) selected rows."""
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def one_key(t: np.ndarray, v: np.ndarray) -> np.ndarray:
        n = len(t)
        if n <= n_out:
            return np.arange(n, dtype=np.int64)
        sel = np.empty(n_out, dtype=np.int64)
        sel[0] = 0
        # n_out - 2 interior buckets over points [1, n-1)
        edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        a = 0
        for i in range(n_out - 2):
            lo, hi = edges[i], edges[i + 1]
            nlo, nhi = edges[i + 1], (edges[i + 2] if i + 2 < len(edges)
                                      else n)
            # next bucket's centroid (the last "bucket" is the final point)
            if nhi > nlo:
                cx = t[nlo:nhi].mean()
                cy = v[nlo:nhi].mean()
            else:
                cx, cy = float(t[n - 1]), float(v[n - 1])
            ax, ay = float(t[a]), float(v[a])
            # 2x triangle area, vectorized over the bucket
            area = np.abs(
                (ax - cx) * (v[lo:hi] - ay) - (ax - t[lo:hi]) * (cy - ay)
            )
            a = lo + int(np.argmax(area))  # argmax: first max = earliest
            sel[i + 1] = a
        sel[n_out - 1] = n - 1
        return sel

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        t = np.asarray(batch[ts_us_col].combine_chunks(), dtype=np.int64)
        v = np.asarray(batch[value_col].combine_chunks(), dtype=np.float64)
        uniq, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((v, t, gid))
        g_s, t_s, v_s = gid[order], t[order], v[order]
        new_seg = np.ones(len(g_s), dtype=bool)
        if len(g_s):
            new_seg[1:] = g_s[1:] != g_s[:-1]
        starts = np.flatnonzero(new_seg)
        ends = np.append(starts[1:], len(g_s))
        keep = []
        for s, e in zip(starts, ends):
            keep.append(s + one_key(t_s[s:e], v_s[s:e]))
        ix = np.concatenate(keep) if keep else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                key_col: pa.array(uniq[g_s[ix]]),
                ts_us_col: pa.array(t_s[ix]),
                value_col: pa.array(v_s[ix]),
            }
        )

    cols = list(dict.fromkeys([key_col, ts_us_col, value_col]))
    return _hash_exchange(
        ds.select_columns(cols), key_col, num_partitions, part_fn
    )


def melt(
    ds,
    *,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
):
    """Wide -> long unpivot (pandas melt / SQL UNPIVOT): one output row per
    (input row, value column). Stateless per-batch transform — no shuffle,
    no state; output order within a batch is column-major (all rows for
    value_cols[0], then [1], ...) which is irrelevant to the unordered
    Dataset contract."""

    def f(b: pa.Table) -> pa.Table:
        n = len(b)
        parts = []
        for c in value_cols:
            cols = {ic: b[ic] for ic in id_cols}
            cols[var_name] = pa.array([c] * n, type=pa.string())
            cols[value_name] = b[c].cast(pa.float64())
            parts.append(pa.table(cols))
        if not parts:
            return pa.table({ic: b[ic] for ic in id_cols})
        return pa.concat_tables(parts)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def cusum_changepoint(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int | None = None,
):
    """Offline CUSUM changepoint per key (Page 1954 cumulative-sum test in
    its offline "maximum deviation of the cumulative sum from the grand
    trend line" form, the estimator behind ruptures' / TimescaleDB-style
    drift detection): for each key, rows ordered by (ts, id), with
    prefix_i = SUM(v[1..i]), total = SUM(v), n = COUNT(*),

        stat_i = | n * prefix_i - i * total |      (exact integers)

    the changepoint is argmax_i stat_i (ties -> earliest (ts, id)). The
    statistic is the all-integer cross-multiplied form of
    |prefix_i - i * total/n| so the engine and the DuckDB oracle compare
    bit-identical int64s — no float thresholds.

    Output per key: n_rows, cusum_stat (int64 max stat), cp_i (1-based
    position of the argmax), cp_ts (its timestamp).

    Scale: ONE hash exchange by key; per-partition kernel is a lexsort +
    O(n) segmented numpy passes. Overflow guard: max |stat| <=
    n * (max|prefix| + |total|); when that bound exceeds int64 the kernel
    redoes the partition in exact Python-int (object dtype) arithmetic —
    correctness is never silently lost at 10^12-row keys.

    Reference parity: getML has no changepoint op; this extends the
    engine's keyed ordered-analytics family (ColumnView + ts-sorted index,
    `src/engine/include/containers/ColumnView.hpp`) the same way
    keyed_window_funcs does.
    """
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        ts_us = ts_to_us(batch[ts_col].combine_chunks())
        oid = np.asarray(batch[id_col])
        v = np.asarray(batch[value_col].combine_chunks(), dtype=np.int64)
        uniq, gid = np.unique(key, return_inverse=True)
        n_all = len(gid)
        if n_all == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=batch.schema.field(key_col).type),
                    "n_rows": pa.array([], type=pa.int64()),
                    "cusum_stat": pa.array([], type=pa.int64()),
                    "cp_i": pa.array([], type=pa.int64()),
                    "cp_ts": pa.array([], type=batch.schema.field(ts_col).type),
                }
            )
        order = np.lexsort((oid, ts_us, gid))
        g_s, v_s = gid[order], v[order]
        i_all = np.arange(n_all, dtype=np.int64)

        new_seg = np.ones(n_all, dtype=bool)
        new_seg[1:] = g_s[1:] != g_s[:-1]
        seg_start = np.maximum.accumulate(np.where(new_seg, i_all, 0))
        seg_id = np.cumsum(new_seg) - 1
        n_per = np.bincount(seg_id)  # rows per key, in segment order
        n_row = n_per[seg_id]  # n broadcast to rows
        i_in = i_all - seg_start + 1  # 1-based position within key

        csum = np.cumsum(v_s, dtype=np.int64)
        base = np.where(seg_start > 0, csum[seg_start - 1], 0)
        prefix = csum - base
        seg_end = seg_start + n_per[seg_id] - 1
        total = prefix[seg_end]  # per-row broadcast of the key total

        # overflow guard on the cross-multiplied statistic
        bound = int(n_per.max(initial=0)) * (
            int(np.abs(prefix).max(initial=0)) + int(np.abs(total).max(initial=0))
        )
        if bound < (1 << 62):
            stat = np.abs(n_row * prefix - i_in * total)
        else:  # exact big-int fallback (rare; documented above)
            stat_obj = np.abs(
                n_row.astype(object) * prefix.astype(object)
                - i_in.astype(object) * total.astype(object)
            )
            # argmax below only compares within a key; object ints compare
            # exactly. Keep object dtype through the argmax, then clamp the
            # reported stat to int64 max (the caller sees saturation, not a
            # wrong winner).
            stat = stat_obj

        # per-segment argmax, first occurrence (rows are (ts, id)-sorted)
        if stat.dtype == object:
            # exact big-int lane: plain per-segment scan (rare fallback)
            winners = np.array(
                [
                    seg_off_s + max(
                        range(int(n_k)),
                        key=lambda j: (stat[seg_off_s + j], -j),
                    )
                    for seg_off_s, n_k in zip(
                        np.concatenate(([0], np.cumsum(n_per)))[:-1], n_per
                    )
                ],
                dtype=np.int64,
            )
            m = (1 << 63) - 1
            stat_w = np.array(
                [min(int(s), m) for s in stat[winners]], dtype=np.int64
            )
        else:
            df_sort = np.lexsort((i_in, -stat, seg_id))
            winners = df_sort[
                np.searchsorted(seg_id[df_sort], np.arange(len(n_per)))
            ]
            stat_w = stat[winners]
        ts_sorted = batch[ts_col].combine_chunks().take(pa.array(order))
        return pa.table(
            {
                key_col: pa.array(uniq),
                "n_rows": pa.array(n_per.astype(np.int64)),
                "cusum_stat": pa.array(stat_w.astype(np.int64)),
                "cp_i": pa.array(i_in[winners]),
                "cp_ts": ts_sorted.take(pa.array(winners)),
            }
        )

    cols = list(dict.fromkeys([id_col, key_col, ts_col, value_col]))
    return _hash_exchange(
        ds.select_columns(cols), key_col, num_partitions, part_fn
    )


def mad_anomaly_counts(
    ds,
    *,
    key_col: str,
    value_col: str,
    k_num: int = 3,
    k_den: int = 2,
    num_partitions: int | None = None,
):
    """Median-absolute-deviation outlier counting per key (the robust
    z-score rule |x - median| > k * MAD, k = k_num/k_den, default 1.5),
    carried out entirely in exact integer arithmetic so the engine and the
    DuckDB oracle agree bit-for-bit:

        med2  = 2 * median(v)            (int64: sum of the two middle
                                          values for even n, 2*middle odd)
        dev   = |2*v - med2|             (per row, int64)
        mad22 = 2 * median(dev)          (int64, same rule)
        anomaly(x)  <=>  2*k_den*dev > k_num*mad22

    Output per key: n_rows, med2, mad22, n_anomalies. (Callers wanting the
    float median/MAD divide by 2 — the op never does, to stay exact.)

    Scale: ONE hash exchange; per-partition kernel is two lexsorts
    (values, then deviations) + O(n) segmented gathers. Median is holistic
    — it cannot pre-aggregate below key granularity — but only the
    (key, value) pairs move, and partitions bound memory.
    """
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def seg_median2(sorted_vals: np.ndarray, seg_off: np.ndarray) -> np.ndarray:
        """2*median per segment of a segment-sorted value array.
        seg_off: segment start offsets plus a trailing sentinel len."""
        n = np.diff(seg_off)
        lo = seg_off[:-1] + (n - 1) // 2
        hi = seg_off[:-1] + n // 2
        return sorted_vals[lo] + sorted_vals[hi]

    def part_fn(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch[key_col])
        v = np.asarray(batch[value_col].combine_chunks(), dtype=np.int64)
        uniq, gid = np.unique(key, return_inverse=True)
        if len(gid) == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=batch.schema.field(key_col).type),
                    "n_rows": pa.array([], type=pa.int64()),
                    "med2": pa.array([], type=pa.int64()),
                    "mad22": pa.array([], type=pa.int64()),
                    "n_anomalies": pa.array([], type=pa.int64()),
                }
            )
        order = np.lexsort((v, gid))
        g_s, v_s = gid[order], v[order]
        n_per = np.bincount(g_s)
        seg_off = np.concatenate(([0], np.cumsum(n_per)))
        med2 = seg_median2(v_s, seg_off)

        dev = np.abs(2 * v - med2[gid])
        order2 = np.lexsort((dev, gid))
        d_s = dev[order2]
        mad22 = seg_median2(d_s, seg_off)

        n_anom = np.bincount(
            gid[2 * k_den * dev > k_num * mad22[gid]], minlength=len(uniq)
        )
        return pa.table(
            {
                key_col: pa.array(uniq),
                "n_rows": pa.array(n_per.astype(np.int64)),
                "med2": pa.array(med2.astype(np.int64)),
                "mad22": pa.array(mad22.astype(np.int64)),
                "n_anomalies": pa.array(n_anom.astype(np.int64)),
            }
        )

    return _hash_exchange(
        ds.select_columns([key_col, value_col]), key_col, num_partitions,
        part_fn,
    )


def ohlc_bars(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    bucket_s: int,
    num_partitions: int | None = None,
):
    """OHLC candlestick downsampling per (key, time bucket): the classic
    financial/monitoring rollup (open = value at the earliest (ts, id) in
    the bucket, close = at the latest, high/low = max/min, plus n_rows and
    an exact integer sum). value_col must be integer (cents) so every
    output is integer-exact against the SQL twin.

    Scale: OHLC is DECOMPOSABLE — each input batch collapses to at most
    (keys x buckets in batch) partial rows carrying (open ts/id/value,
    close ts/id/value, hi, lo, n, s) BEFORE the exchange, so the shuffle
    moves bar partials, not ticks; one hash exchange by key; per-partition
    merge is two lexsorts + reduceat over the few partials per bar.

    Reference parity: getML expresses this as four FastProp features
    (first/last/max/min over a time window, FastProp.cpp AGGREGATIONS);
    here it is one fused bar operator.
    """
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    wid = int(bucket_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        key = np.asarray(b[key_col])
        ts = ts_to_us(b[ts_col].combine_chunks())
        oid = np.asarray(b[id_col])
        v = np.asarray(b[value_col].combine_chunks(), dtype=np.int64)
        if len(key) == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=b.schema.field(key_col).type),
                    "bucket_us": pa.array([], type=pa.int64()),
                    "o_ts": pa.array([], type=pa.int64()),
                    "o_id": pa.array([], type=b.schema.field(id_col).type),
                    "o_v": pa.array([], type=pa.int64()),
                    "c_ts": pa.array([], type=pa.int64()),
                    "c_id": pa.array([], type=b.schema.field(id_col).type),
                    "c_v": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                    "lo": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.int64()),
                }
            )
        bucket = ts // wid * wid
        order = np.lexsort((oid, ts, bucket, key))
        k_s, b_s, t_s, i_s, v_s = (
            key[order], bucket[order], ts[order], oid[order], v[order]
        )
        new = np.ones(len(k_s), dtype=bool)
        new[1:] = (k_s[1:] != k_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k_s)) - 1
        return pa.table(
            {
                key_col: pa.array(k_s[starts]),
                "bucket_us": pa.array(b_s[starts]),
                "o_ts": pa.array(t_s[starts]),
                "o_id": pa.array(i_s[starts]),
                "o_v": pa.array(v_s[starts]),
                "c_ts": pa.array(t_s[ends]),
                "c_id": pa.array(i_s[ends]),
                "c_v": pa.array(v_s[ends]),
                "hi": pa.array(np.maximum.reduceat(v_s, starts)),
                "lo": pa.array(np.minimum.reduceat(v_s, starts)),
                "n": pa.array(np.append(starts[1:], len(k_s)) - starts),
                "s": pa.array(np.add.reduceat(v_s, starts)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        bucket = np.asarray(t["bucket_us"], dtype=np.int64)
        if len(key) == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=t.schema.field(key_col).type),
                    "bucket_us": pa.array([], type=pa.int64()),
                    "open_v": pa.array([], type=pa.int64()),
                    "high_v": pa.array([], type=pa.int64()),
                    "low_v": pa.array([], type=pa.int64()),
                    "close_v": pa.array([], type=pa.int64()),
                    "n_rows": pa.array([], type=pa.int64()),
                    "sum_v": pa.array([], type=pa.int64()),
                }
            )
        o_ts = np.asarray(t["o_ts"], dtype=np.int64)
        o_id = np.asarray(t["o_id"])
        o_v = np.asarray(t["o_v"], dtype=np.int64)
        c_ts = np.asarray(t["c_ts"], dtype=np.int64)
        c_id = np.asarray(t["c_id"])
        c_v = np.asarray(t["c_v"], dtype=np.int64)
        hi = np.asarray(t["hi"], dtype=np.int64)
        lo = np.asarray(t["lo"], dtype=np.int64)
        n = np.asarray(t["n"], dtype=np.int64)
        s = np.asarray(t["s"], dtype=np.int64)
        # open: first partial by (o_ts, o_id) within each (key, bucket)
        ord_o = np.lexsort((o_id, o_ts, bucket, key))
        k_o, b_o = key[ord_o], bucket[ord_o]
        new = np.ones(len(k_o), dtype=bool)
        new[1:] = (k_o[1:] != k_o[:-1]) | (b_o[1:] != b_o[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k_o))
        # close: last partial by (c_ts, c_id) within each segment — second
        # lexsort with the segment id as the major key (segment order and
        # sizes match the open ordering, so `ends` indexes both)
        seg_id = np.cumsum(new) - 1
        ord_c = np.lexsort((c_id[ord_o], c_ts[ord_o], seg_id))
        last_in_seg = ord_c[ends - 1]
        return pa.table(
            {
                key_col: pa.array(k_o[starts]),
                "bucket_us": pa.array(b_o[starts]),
                "open_v": pa.array(o_v[ord_o][starts]),
                "high_v": pa.array(
                    np.maximum.reduceat(hi[ord_o], starts)
                ),
                "low_v": pa.array(np.minimum.reduceat(lo[ord_o], starts)),
                "close_v": pa.array(c_v[ord_o][last_in_seg]),
                "n_rows": pa.array(np.add.reduceat(n[ord_o], starts)),
                "sum_v": pa.array(np.add.reduceat(s[ord_o], starts)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return _hash_exchange(partials, key_col, num_partitions, merge)


def acf_keyed(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    lags: tuple = (1, 2, 3),
    num_partitions: int | None = None,
):
    """Per-key autocorrelation raw sums at the given row lags, over rows
    ordered by (ts, id): for each (key, lag L) with pairs
    (a, b) = (v[i], v[i+L]) inside the key,

        n_pairs, sa = SUM(a), sb = SUM(b), saa = SUM(a*a),
        sbb = SUM(b*b), sab = SUM(a*b)

    — the five exact integer moments from which Pearson r_L is one
    division. Integer outputs keep the engine and the DuckDB LAG-window
    twin bit-identical (no float accumulation order to disagree on);
    value_col must be integer (cents).

    Scale: one hash exchange by key; per-partition kernel is a lexsort
    plus, per lag, ONE shifted-mask pass with integer scatter-adds
    (np.add.at on int64 — no float64 bincount weights). Overflow: |v|
    <= V implies |sab| <= n * V^2; callers with V^2 * n near 2^63 should
    pre-scale — the kernel raises on detected overflow rather than wrap.

    Reference parity: getML has no ACF op; this extends the keyed
    ordered-analytics family the same way cusum_changepoint does.
    """
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    lags = tuple(int(x) for x in lags)

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        ts = ts_to_us(t[ts_col].combine_chunks())
        oid = np.asarray(t[id_col])
        v = np.asarray(t[value_col].combine_chunks(), dtype=np.int64)
        out_key, out_lag, out_n = [], [], []
        out_sa, out_sb, out_saa, out_sbb, out_sab = [], [], [], [], []
        if len(key):
            order = np.lexsort((oid, ts, key))
            k_s, v_s = key[order], v[order]
            new = np.ones(len(k_s), dtype=bool)
            new[1:] = k_s[1:] != k_s[:-1]
            seg = np.cumsum(new) - 1
            uniq = k_s[new]
            nseg = len(uniq)
            for L in lags:
                if len(v_s) <= L:
                    continue
                a, b = v_s[:-L], v_s[L:]
                m = seg[:-L] == seg[L:]
                sidx = seg[:-L][m]
                a, b = a[m], b[m]
                acc = np.zeros((6, nseg), dtype=np.int64)
                np.add.at(acc[0], sidx, 1)
                np.add.at(acc[1], sidx, a)
                np.add.at(acc[2], sidx, b)
                # overflow guard: products and their totals re-done in
                # python ints would be O(n) slow — instead bound-check:
                # max |v| within the partition caps every |sum| at
                # n * vmax^2, which must fit int64
                vmax = int(np.abs(v_s).max()) if len(v_s) else 0
                if vmax and vmax * vmax > (2**62) // max(len(v_s), 1):
                    raise OverflowError(
                        "acf_keyed: |value|^2 * n may exceed int64 — "
                        "pre-scale value_col"
                    )
                aa, bb, ab = a * a, b * b, a * b
                np.add.at(acc[3], sidx, aa)
                np.add.at(acc[4], sidx, bb)
                np.add.at(acc[5], sidx, ab)
                keep = acc[0] > 0
                ki = np.flatnonzero(keep)
                out_key.append(uniq[ki])
                out_lag.append(np.full(len(ki), L, dtype=np.int64))
                out_n.append(acc[0][ki])
                out_sa.append(acc[1][ki])
                out_sb.append(acc[2][ki])
                out_saa.append(acc[3][ki])
                out_sbb.append(acc[4][ki])
                out_sab.append(acc[5][ki])
        if not out_key:
            return pa.table(
                {
                    key_col: pa.array([], type=t.schema.field(key_col).type),
                    "lag": pa.array([], type=pa.int64()),
                    "n_pairs": pa.array([], type=pa.int64()),
                    "sa": pa.array([], type=pa.int64()),
                    "sb": pa.array([], type=pa.int64()),
                    "saa": pa.array([], type=pa.int64()),
                    "sbb": pa.array([], type=pa.int64()),
                    "sab": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                key_col: pa.array(np.concatenate(out_key)),
                "lag": pa.array(np.concatenate(out_lag)),
                "n_pairs": pa.array(np.concatenate(out_n)),
                "sa": pa.array(np.concatenate(out_sa)),
                "sb": pa.array(np.concatenate(out_sb)),
                "saa": pa.array(np.concatenate(out_saa)),
                "sbb": pa.array(np.concatenate(out_sbb)),
                "sab": pa.array(np.concatenate(out_sab)),
            }
        )

    return _hash_exchange(ds, key_col, num_partitions, part_fn)


def gap_detect(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    threshold_s: float,
    num_partitions: int | None = None,
):
    """Per-key silence/gap detection: over rows ordered by (ts, id),
    consecutive-row deltas d = ts[i+1] - ts[i] with d > threshold are
    gaps. Output per key: n_rows, n_gaps, max_gap_us, total_gap_us (sum
    of the gap deltas) — all exact int64 microseconds.

    The monitoring-side dual of gap-FILL (stages/gapfill.py): gapfill
    repairs a known grid, gap_detect FINDS the holes on an irregular
    stream. One hash exchange; O(n log n) lexsort + O(n) passes."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    thr_us = int(round(float(threshold_s) * 1_000_000))

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        ts = ts_to_us(t[ts_col].combine_chunks())
        oid = np.asarray(t[id_col])
        if len(key) == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=t.schema.field(key_col).type),
                    "n_rows": pa.array([], type=pa.int64()),
                    "n_gaps": pa.array([], type=pa.int64()),
                    "max_gap_us": pa.array([], type=pa.int64()),
                    "total_gap_us": pa.array([], type=pa.int64()),
                }
            )
        order = np.lexsort((oid, ts, key))
        k_s, t_s = key[order], ts[order]
        new = np.ones(len(k_s), dtype=bool)
        new[1:] = k_s[1:] != k_s[:-1]
        seg = np.cumsum(new) - 1
        uniq = k_s[new]
        nseg = len(uniq)
        n_rows = np.bincount(seg, minlength=nseg).astype(np.int64)
        d = t_s[1:] - t_s[:-1]
        same = seg[1:] == seg[:-1]
        gap = same & (d > thr_us)
        sidx = seg[:-1][gap]
        gd = d[gap]
        n_gaps = np.zeros(nseg, dtype=np.int64)
        np.add.at(n_gaps, sidx, 1)
        total = np.zeros(nseg, dtype=np.int64)
        np.add.at(total, sidx, gd)
        mx = np.zeros(nseg, dtype=np.int64)
        np.maximum.at(mx, sidx, gd)
        return pa.table(
            {
                key_col: pa.array(uniq),
                "n_rows": pa.array(n_rows),
                "n_gaps": pa.array(n_gaps),
                "max_gap_us": pa.array(mx),
                "total_gap_us": pa.array(total),
            }
        )

    return _hash_exchange(ds, key_col, num_partitions, part_fn)


def funnel_depth(
    ds,
    *,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list,
    window_s: float | None = None,
    num_partitions: int | None = None,
):
    """Greedy sequential funnel per key: match step 1 at its earliest
    occurrence, then each following step at its earliest occurrence
    STRICTLY AFTER the previous match (and, when window_s is set, within
    window_s of the previous match). Output per key: depth (0..len(steps))
    plus the matched timestamps t1..tk (int64 us, NULL where unmatched) —
    the standard product-analytics funnel definition (Amplitude/GA
    "ordered funnel with per-step window").

    Scale: one hash exchange by key; per step ONE vectorized masked
    segmented-min pass (np.minimum.at) — O(k * n) total, no sort needed.

    Reference parity: getML composes this as k chained FastProp
    `min` features with lag conditions (Matchmaker.hpp lag windows);
    here it is one operator.
    """
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    w_us = None if window_s is None else int(round(float(window_s) * 1e6))
    steps = list(steps)
    SENT = np.int64(2**62)

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        ts = ts_to_us(t[ts_col].combine_chunks())
        typ = np.asarray(t[type_col]).astype(str)
        uniq, gid = (np.unique(key, return_inverse=True)
                     if len(key) else (key[:0], np.zeros(0, dtype=np.int64)))
        nseg = len(uniq)
        t_match = []
        prev = np.full(nseg, -SENT, dtype=np.int64)  # "after start of time"
        for si, s in enumerate(steps):
            cur = np.full(nseg, SENT, dtype=np.int64)
            m = typ == s
            if si > 0 or w_us is not None:
                pv = prev[gid]
                cond = m & (ts > pv) if si > 0 else m
                if si > 0 and w_us is not None:
                    # window measured from the previous matched step
                    cond &= ts <= pv + w_us
            else:
                cond = m
            np.minimum.at(cur, gid[cond], ts[cond])
            t_match.append(cur)
            prev = cur  # unmatched segs carry SENT -> nothing matches after
        depth = np.zeros(nseg, dtype=np.int64)
        for cur in t_match:
            depth += (cur < SENT).astype(np.int64)
        cols = {key_col: pa.array(uniq), "depth": pa.array(depth)}
        for si, cur in enumerate(t_match):
            cols[f"t{si + 1}"] = pa.array(cur, mask=cur >= SENT)
        return pa.table(cols)

    return _hash_exchange(ds, key_col, num_partitions, part_fn)


def cohort_retention(
    ds,
    *,
    key_col: str,
    ts_col: str,
    bucket_s: int = 604_800,
    num_partitions: int | None = None,
):
    """Cohort retention matrix: each key's cohort is the time bucket of its
    FIRST event; for every (cohort_bucket, offset) the number of distinct
    keys with at least one event `offset` buckets after their cohort
    bucket. Output (cohort_us, offset, n_keys) — the classic weekly
    retention triangle (bucket_s defaults to one week).

    Scale: one hash exchange by key (all rows of a key land together),
    per-partition kernel derives first-bucket + distinct (key, bucket)
    pairs via lexsort, emits per-partition partial counts — O(distinct
    pairs) rows — merged by ONE tiny integer groupby."""
    from ray.data.aggregate import Sum

    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    wid = int(bucket_s) * 1_000_000

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        ts = ts_to_us(t[ts_col].combine_chunks())
        if len(key) == 0:
            return pa.table(
                {
                    "cohort_us": pa.array([], type=pa.int64()),
                    "offset": pa.array([], type=pa.int64()),
                    "n_keys": pa.array([], type=pa.int64()),
                }
            )
        bucket = ts // wid * wid
        order = np.lexsort((bucket, key))
        k_s, b_s = key[order], bucket[order]
        new_seg = np.ones(len(k_s), dtype=bool)
        new_seg[1:] = k_s[1:] != k_s[:-1]
        seg = np.cumsum(new_seg) - 1
        first_b = b_s[new_seg][seg]  # cohort bucket broadcast to rows
        # distinct (key, bucket): first row of each (key, bucket) run
        new_pair = new_seg.copy()
        new_pair[1:] |= b_s[1:] != b_s[:-1]
        coh = first_b[new_pair]
        off = (b_s[new_pair] - coh) // wid
        # partial counts per (cohort, offset) — pack via the factorized
        # cohort INDEX (a raw us timestamp * 100k would overflow int64)
        cu, ci = np.unique(coh, return_inverse=True)
        pk = ci.astype(np.int64) * 100_000 + off
        u, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "cohort_us": pa.array(cu[u // 100_000]),
                "offset": pa.array(u % 100_000),
                "n_keys": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = _hash_exchange(ds, key_col, num_partitions, part_fn)
    return (
        parts.groupby(["cohort_us", "offset"])
        .aggregate(Sum("n_keys", alias_name="n_keys"))
    )


def threshold_episodes(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    threshold: float,
    num_partitions: int | None = None,
):
    """Per-key threshold-exceedance episodes (gaps-and-islands; the
    alert-firing-period primitive of monitoring engines): over rows
    ordered by (ts, id), a maximal run of CONSECUTIVE rows with
    value > threshold is one episode. Output one row per episode:

      key, episode_ix (0-based per key in time order),
      start_us / end_us (epoch microseconds of first/last row),
      n_events, v_max (exact max of the run — no float summation).

    One hash exchange by key; per partition a single lexsort + O(n)
    run-length pass (run starts where `above` begins or the key
    changes). Episode boundaries depend only on rows of one key, so
    hash partitioning is exact — the documented partitioning assumption."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    thr = float(threshold)

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        ts = ts_to_us(t[ts_col].combine_chunks())
        oid = np.asarray(t[id_col])
        val = np.asarray(t[value_col], dtype=np.float64)
        kt = t.schema.field(key_col).type
        if len(key) == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=kt),
                    "episode_ix": pa.array([], type=pa.int64()),
                    "start_us": pa.array([], type=pa.int64()),
                    "end_us": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "v_max": pa.array([], type=pa.float64()),
                }
            )
        order = np.lexsort((oid, ts, key))
        k_s, t_s, v_s = key[order], ts[order], val[order]
        ab = v_s > thr
        if not ab.any():
            return pa.table(
                {
                    key_col: pa.array([], type=kt),
                    "episode_ix": pa.array([], type=pa.int64()),
                    "start_us": pa.array([], type=pa.int64()),
                    "end_us": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "v_max": pa.array([], type=pa.float64()),
                }
            )
        new_key = np.ones(len(k_s), dtype=bool)
        new_key[1:] = k_s[1:] != k_s[:-1]
        prev_ab = np.concatenate(([False], ab[:-1]))
        start = ab & (new_key | ~prev_ab)
        pos = np.flatnonzero(ab)          # ascending; runs contiguous
        s_in_pos = np.flatnonzero(start[pos])  # run starts within pos
        n_runs = len(s_in_pos)
        run_end = np.append(s_in_pos[1:], len(pos)) - 1
        start_us = t_s[pos[s_in_pos]]
        end_us = t_s[pos[run_end]]
        n_events = (run_end - s_in_pos + 1).astype(np.int64)
        v_max = np.maximum.reduceat(v_s[pos], s_in_pos)
        run_keys = k_s[pos[s_in_pos]]
        new_rk = np.ones(n_runs, dtype=bool)
        new_rk[1:] = run_keys[1:] != run_keys[:-1]
        first_of_key = np.maximum.accumulate(
            np.where(new_rk, np.arange(n_runs, dtype=np.int64), 0)
        )
        episode_ix = np.arange(n_runs, dtype=np.int64) - first_of_key
        return pa.table(
            {
                key_col: pa.array(run_keys),
                "episode_ix": pa.array(episode_ix),
                "start_us": pa.array(start_us.astype(np.int64)),
                "end_us": pa.array(end_us.astype(np.int64)),
                "n_events": pa.array(n_events),
                "v_max": pa.array(v_max),
            }
        )

    return _hash_exchange(ds, key_col, num_partitions, part_fn)


def xcorr_counts(
    ds,
    *,
    ts_col: str,
    type_col: str,
    type_x: str,
    type_y: str,
    bucket_s: int,
    lags: tuple = (0, 1, 2, 3),
):
    """Cross-correlation raw moments between two event-count series: the
    per-bucket counts of `type_x` and `type_y` on the dense bucket grid
    [global min, global max] (missing buckets = 0), paired at each lag k
    as (x[t], y[t + k·bucket]). Output one row per lag with the exact
    int64 moments (n, sx, sy, sxx, syy, sxy) — Pearson r at lag k is a
    single closed-form expression over them, so exactness never hangs on
    float summation order (the same pattern as acf_keyed).

    Scale shape: a per-batch integer combiner collapses each block to
    O(buckets-in-batch) partial counts BEFORE the one small groupby; the
    lag sweep then runs over the assembled O(n_buckets) series in a
    single task — by construction the series is tiny (one row per time
    bucket, not per event). The documented assumption: the bucketed
    series fits one task (true until the time span itself is ~10^9
    buckets)."""
    wid = int(bucket_s) * 1_000_000
    lags = tuple(int(x) for x in lags)

    def combiner(b: pa.Table) -> pa.Table:
        typ = np.asarray(b[type_col]).astype(str)
        sel_x, sel_y = typ == type_x, typ == type_y
        keep = sel_x | sel_y
        if not keep.any():
            return pa.table(
                {"b": pa.array([], type=pa.int64()),
                 "xc": pa.array([], type=pa.int64()),
                 "yc": pa.array([], type=pa.int64())}
            )
        ts = ts_to_us(b[ts_col].combine_chunks())[keep]
        is_y = sel_y[keep]
        bkt = (ts // wid) * wid
        ub, inv = np.unique(bkt, return_inverse=True)
        xc = np.zeros(len(ub), dtype=np.int64)
        yc = np.zeros(len(ub), dtype=np.int64)
        np.add.at(xc, inv[~is_y], 1)
        np.add.at(yc, inv[is_y], 1)
        return pa.table(
            {"b": pa.array(ub), "xc": pa.array(xc), "yc": pa.array(yc)}
        )

    counts = (
        ds.map_batches(combiner, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .sum(["xc", "yc"])
    )

    def finalize(t: pa.Table) -> pa.Table:
        b = np.asarray(t["b"], dtype=np.int64)
        xc = np.asarray(t["sum(xc)"], dtype=np.int64)
        yc = np.asarray(t["sum(yc)"], dtype=np.int64)
        if len(b) == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"lag": z, "n": z, "sx": z, "sy": z,
                             "sxx": z, "syy": z, "sxy": z})
        lo, hi = b.min(), b.max()
        n_b = int((hi - lo) // wid) + 1
        x = np.zeros(n_b, dtype=np.int64)
        y = np.zeros(n_b, dtype=np.int64)
        ix = ((b - lo) // wid).astype(np.int64)
        x[ix], y[ix] = xc, yc
        rows = {"lag": [], "n": [], "sx": [], "sy": [],
                "sxx": [], "syy": [], "sxy": []}
        for k in lags:
            if k >= n_b:
                continue
            a = x[: n_b - k] if k else x
            c = y[k:] if k else y
            rows["lag"].append(k)
            rows["n"].append(n_b - k)
            rows["sx"].append(int(a.sum()))
            rows["sy"].append(int(c.sum()))
            rows["sxx"].append(int(np.dot(a, a)))
            rows["syy"].append(int(np.dot(c, c)))
            rows["sxy"].append(int(np.dot(a, c)))
        return pa.table({k: pa.array(v, type=pa.int64())
                         for k, v in rows.items()})

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def sax_words(
    ds,
    *,
    key_col: str,
    ts_col: str,
    cents_col: str,
    word_s: int,
    paa: int,
    breakpoints_cents: tuple,
    num_partitions: int | None = None,
):
    """SAX symbolization (Lin et al. 2003), time-bucketed and
    integer-exact: each `word_s` window per key splits into `paa` equal
    time segments; a segment's symbol is how many breakpoints its MEAN
    value (in cents) exceeds — decided by the exact integer
    cross-multiplication  sum_cents > bp_cents * n  (no float division
    ever happens), with empty segments assigned the sentinel symbol
    a = len(breakpoints)+1. The window's word packs its symbols base
    (a+1):  word = Σ sym_seg · (a+1)^seg.

    Output one row per (key, window): key, window_us, word, n_events.

    Scale shape: a per-batch combiner collapses blocks to
    O(distinct (key, window, segment)) integer partials BEFORE the one
    hash exchange by key; the per-partition finalize is two lexsort
    run-length passes. Value payload never shuffles."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    word_us = int(word_s) * 1_000_000
    seg_us = word_us // int(paa)
    if word_us % int(paa):
        raise ValueError("word_s * 1e6 must divide evenly by paa")
    bps = tuple(int(x) for x in breakpoints_cents)
    a = len(bps) + 1          # symbols 0..len(bps); sentinel = a
    base = a + 1
    pw = (base ** np.arange(int(paa), dtype=np.int64)).astype(np.int64)
    sentinel_total = int(a) * int(pw.sum())

    def combiner(b: pa.Table) -> pa.Table:
        key = np.asarray(b[key_col])
        ts = ts_to_us(b[ts_col].combine_chunks())
        c = np.asarray(b[cents_col], dtype=np.int64)
        win = (ts // word_us) * word_us
        seg = (ts % word_us) // seg_us
        uk, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((seg, win, gid))
        g_s, w_s, s_s, c_s = gid[order], win[order], seg[order], c[order]
        new = np.ones(len(g_s), dtype=bool)
        new[1:] = (
            (g_s[1:] != g_s[:-1]) | (w_s[1:] != w_s[:-1])
            | (s_s[1:] != s_s[:-1])
        )
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(g_s))).astype(np.int64)
        s = np.add.reduceat(c_s, starts)
        return pa.table(
            {
                key_col: pa.array(uk[g_s[starts]]),
                "_win": pa.array(w_s[starts]),
                "_seg": pa.array(s_s[starts]),
                "_s": pa.array(s),
                "_n": pa.array(n),
            }
        )

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        kt = t.schema.field(key_col).type
        if len(key) == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=kt),
                    "window_us": pa.array([], type=pa.int64()),
                    "word": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                }
            )
        win = np.asarray(t["_win"], dtype=np.int64)
        seg = np.asarray(t["_seg"], dtype=np.int64)
        s = np.asarray(t["_s"], dtype=np.int64)
        n = np.asarray(t["_n"], dtype=np.int64)
        uk, gid = np.unique(key, return_inverse=True)
        order = np.lexsort((seg, win, gid))
        g_s, w_s, sg_s = gid[order], win[order], seg[order]
        s_s, n_s = s[order], n[order]
        new = np.ones(len(g_s), dtype=bool)
        new[1:] = (
            (g_s[1:] != g_s[:-1]) | (w_s[1:] != w_s[:-1])
            | (sg_s[1:] != sg_s[:-1])
        )
        starts = np.flatnonzero(new)
        s_tot = np.add.reduceat(s_s, starts)
        n_tot = np.add.reduceat(n_s, starts)
        seg_of = sg_s[starts]
        # symbol per present segment: #breakpoints exceeded by the mean
        sym = np.zeros(len(starts), dtype=np.int64)
        for bp in bps:
            sym += (s_tot > bp * n_tot).astype(np.int64)
        # fold into per-(key, window) words
        gw_new = np.ones(len(starts), dtype=bool)
        gk, wk = g_s[starts], w_s[starts]
        gw_new[1:] = (gk[1:] != gk[:-1]) | (wk[1:] != wk[:-1])
        gw_starts = np.flatnonzero(gw_new)
        # word = sentinel_total + Σ_present (sym - a)·base^seg
        contrib = (sym - a) * pw[seg_of]
        word = sentinel_total + np.add.reduceat(contrib, gw_starts)
        n_events = np.add.reduceat(n_tot, gw_starts)
        return pa.table(
            {
                key_col: pa.array(uk[gk[gw_starts]]),
                "window_us": pa.array(wk[gw_starts]),
                "word": pa.array(word.astype(np.int64)),
                "n_events": pa.array(n_events.astype(np.int64)),
            }
        )

    pre = ds.map_batches(
        combiner, batch_format="pyarrow", zero_copy_batch=True
    )
    return _hash_exchange(pre, key_col, num_partitions, part_fn)


_POW2 = (2 ** np.arange(0, 63, dtype=np.int64)).astype(np.int64)


def interarrival_hist(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    num_partitions: int | None = None,
):
    """Log2-bucketed inter-arrival-time histogram: per key, consecutive
    deltas (ordered by ts, id) in microseconds are bucketed by their
    BIT LENGTH (bucket = #bits of delta; delta 0 → bucket 0) — the
    latency-histogram convention of HDR-style monitoring, integer-exact
    by construction (bucket via searchsorted over the power-of-two
    table, never a float log2). Output: (bucket, n_deltas) corpus-wide.

    One hash exchange by key for the per-key ordering, then an O(64)
    integer histogram merge — exchange carries per-partition buckets
    only."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        if len(key) == 0:
            return pa.table(
                {"bucket": pa.array([], type=pa.int64()),
                 "n_deltas": pa.array([], type=pa.int64())}
            )
        ts = ts_to_us(t[ts_col].combine_chunks())
        oid = np.asarray(t[id_col])
        order = np.lexsort((oid, ts, key))
        k_s, t_s = key[order], ts[order]
        same = k_s[1:] == k_s[:-1]
        d = (t_s[1:] - t_s[:-1])[same]
        if len(d) == 0:
            return pa.table(
                {"bucket": pa.array([], type=pa.int64()),
                 "n_deltas": pa.array([], type=pa.int64())}
            )
        bkt = np.searchsorted(_POW2, d, side="right").astype(np.int64)
        bkt[d == 0] = 0
        acc = np.bincount(bkt, minlength=1)
        nz = np.flatnonzero(acc)
        return pa.table(
            {"bucket": pa.array(nz.astype(np.int64)),
             "n_deltas": pa.array(acc[nz].astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    return (
        _hash_exchange(ds, key_col, num_partitions, part_fn)
        .groupby("bucket")
        .aggregate(Sum("n_deltas", alias_name="n_deltas"))
    )


def transition_counts(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    num_partitions: int | None = None,
):
    """First-order Markov transition counts: per key, consecutive rows
    (ordered by ts, id) contribute one (from_state, to_state) pair;
    output corpus-wide (from_state, to_state, n) — the user-journey
    transition matrix. One hash exchange by key; per partition a lexsort
    + factorized pair bincount; the final merge exchanges
    O(states²) integer rows per partition."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        st = t[state_col].combine_chunks()
        styp = t.schema.field(state_col).type
        if len(key) == 0:
            return pa.table(
                {"from_state": pa.array([], type=styp),
                 "to_state": pa.array([], type=styp),
                 "n": pa.array([], type=pa.int64())}
            )
        ts = ts_to_us(t[ts_col].combine_chunks())
        oid = np.asarray(t[id_col])
        s = np.asarray(st)
        order = np.lexsort((oid, ts, key))
        k_s, s_s = key[order], s[order]
        same = k_s[1:] == k_s[:-1]
        frm, to = s_s[:-1][same], s_s[1:][same]
        if len(frm) == 0:
            return pa.table(
                {"from_state": pa.array([], type=styp),
                 "to_state": pa.array([], type=styp),
                 "n": pa.array([], type=pa.int64())}
            )
        us, code = np.unique(np.concatenate([frm, to]), return_inverse=True)
        cf, ct = code[: len(frm)], code[len(frm):]
        pair = cf * len(us) + ct
        up, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "from_state": pa.array(us[up // len(us)]).cast(styp),
                "to_state": pa.array(us[up % len(us)]).cast(styp),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        _hash_exchange(ds, key_col, num_partitions, part_fn)
        .groupby(["from_state", "to_state"])
        .aggregate(Sum("n", alias_name="n"))
    )


def seasonal_baseline_anomalies(
    ds,
    *,
    type_col: str,
    ts_col: str,
    cents_col: str,
    bucket_s: int = 3600,
    period: int = 168,
    threshold_cents: int = 3000,
):
    """Seasonal-profile anomaly counts: the baseline is each
    (type, phase)'s exact integer mean over the whole corpus, where
    phase = (epoch // bucket) % period (hour-of-week for 3600/168); an
    event is anomalous iff its deviation from the baseline mean exceeds
    the threshold — decided by the exact integer cross-multiplication

        |value_cents · n − sum_cents| > n · threshold_cents

    (n, sum are the phase's totals; no float division ever happens).
    Output one row per (type, phase): n, sum_cents, n_anomalous.

    Two streaming passes: (1) per-batch combiner → O(types × period)
    integer profile, merged in one tiny groupby and broadcast via
    ray.put; (2) per-batch anomaly counting against the broadcast
    profile → the same tiny groupby shape. The raw table never
    shuffles."""
    import ray
    from ray.data.aggregate import Sum

    wid = int(bucket_s) * 1_000_000
    per = int(period)
    thr = int(threshold_cents)

    def profile_partial(b: pa.Table) -> pa.Table:
        typ = np.asarray(b[type_col]).astype(str)
        ts = ts_to_us(b[ts_col].combine_chunks())
        c = np.asarray(b[cents_col], dtype=np.int64)
        ph = (ts // wid) % per
        ut, tid = np.unique(typ, return_inverse=True)
        key = tid * per + ph
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        n = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, c)
        np.add.at(n, inv, 1)
        return pa.table(
            {
                type_col: pa.array(ut[uk // per]),
                "phase": pa.array((uk % per).astype(np.int64)),
                "sum_cents": pa.array(s),
                "n": pa.array(n),
            }
        )

    profile = (
        ds.map_batches(profile_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby([type_col, "phase"])
        .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                   Sum("n", alias_name="n"))
        .to_pandas()
    )
    lut = {
        (t, int(p)): (int(s), int(n))
        for t, p, s, n in zip(profile[type_col], profile["phase"],
                              profile["sum_cents"], profile["n"])
    }
    lut_ref = ray.put(lut)

    def count_anoms(b: pa.Table) -> pa.Table:
        # broadcast profile: ray.get on a local plasma ref — O(1) after
        # the first touch per node, no actor pool needed (a pinned actor
        # pool can starve the upstream read on small test clusters)
        lut_ = ray.get(lut_ref)
        typ = np.asarray(b[type_col]).astype(str)
        ts = ts_to_us(b[ts_col].combine_chunks())
        c = np.asarray(b[cents_col], dtype=np.int64)
        ph = (ts // wid) % per
        ut, tid = np.unique(typ, return_inverse=True)
        key = tid * per + ph
        uk, inv = np.unique(key, return_inverse=True)
        s_arr = np.zeros(len(uk), dtype=np.int64)
        n_arr = np.zeros(len(uk), dtype=np.int64)
        for i, k in enumerate(uk):
            s_arr[i], n_arr[i] = lut_[(ut[k // per], int(k % per))]
        dev = np.abs(c * n_arr[inv] - s_arr[inv])
        an = dev > n_arr[inv] * thr
        n_an = np.zeros(len(uk), dtype=np.int64)
        np.add.at(n_an, inv[an], 1)
        return pa.table(
            {
                type_col: pa.array(ut[uk // per]),
                "phase": pa.array((uk % per).astype(np.int64)),
                "n_anomalous": pa.array(n_an),
            }
        )

    anoms = (
        ds.map_batches(count_anoms, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby([type_col, "phase"])
        .aggregate(Sum("n_anomalous", alias_name="n_anomalous"))
        .to_pandas()
    )
    out = profile.merge(anoms, on=[type_col, "phase"], how="left")
    out["n_anomalous"] = out["n_anomalous"].fillna(0).astype(np.int64)
    out = out.sort_values([type_col, "phase"]).reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(out[[type_col, "phase", "n", "sum_cents",
                               "n_anomalous"]])


def irate_last_two(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    width_s: int,
    num_partitions: int | None = None,
):
    """PromQL-irate analog: per (key, bucket) the instantaneous delta
    between the LAST TWO samples (ordered by ts, id) — dv and dt as exact
    int64 ingredients (rate = dv/dt left to the caller, as PromQL leaves
    unit scaling). Buckets with a single sample are omitted (irate needs
    two points).

    DECOMPOSABLE: the per-batch combiner collapses each (key, bucket) to
    its last <= 2 samples BEFORE the one hash exchange — merging two
    last-two partials is again a last-two selection, so the exchange
    carries <= 2 rows per (key, bucket) per batch, never the raw stream."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    width_us = width_s * 1_000_000

    def last_two(t: pa.Table, *, final: bool) -> pa.Table:
        key = np.asarray(t[key_col])
        if len(key) == 0:
            if final:
                return pa.table(
                    {
                        key_col: pa.array([], type=t.schema.field(key_col).type),
                        "bucket_ts": pa.array([], type=pa.timestamp("us")),
                        "dv": pa.array([], type=pa.int64()),
                        "dt_us": pa.array([], type=pa.int64()),
                    }
                )
            # project the empty block to the same 4-column combined schema
            # the non-empty branch emits — heterogeneous block schemas in
            # the hash exchange can fail Ray's block concat
            return pa.table(
                {
                    key_col: pa.array([], type=t.schema.field(key_col).type),
                    ts_col: pa.array([], type=pa.timestamp("us")),
                    id_col: pa.array([], type=t.schema.field(id_col).type),
                    value_col: pa.array([], type=pa.int64()),
                }
            )
        ts = ts_to_us(t[ts_col].combine_chunks())
        oid = np.asarray(t[id_col])
        v = np.asarray(t[value_col], dtype=np.int64)
        bucket = ts // width_us
        order = np.lexsort((oid, ts, bucket, key))
        k_s, b_s = key[order], bucket[order]
        ts_s, id_s, v_s = ts[order], oid[order], v[order]
        new = np.ones(len(k_s), dtype=bool)
        new[1:] = (k_s[1:] != k_s[:-1]) | (b_s[1:] != b_s[:-1])
        gid = np.cumsum(new) - 1
        last_ix = np.concatenate([np.flatnonzero(new)[1:] - 1,
                                  [len(k_s) - 1]])
        if not final:
            # keep the last two positions of each group
            keep = np.zeros(len(k_s), dtype=bool)
            keep[last_ix] = True
            prev_ix = last_ix - 1
            valid = prev_ix >= 0
            valid[valid] &= gid[prev_ix[valid]] == gid[last_ix[valid]]
            keep[prev_ix[valid]] = True
            sel = np.flatnonzero(keep)
            cols = {
                key_col: pa.array(k_s[sel]).cast(
                    t.schema.field(key_col).type
                ),
                ts_col: pa.array(ts_s[sel]).cast(pa.timestamp("us")),
                id_col: pa.array(id_s[sel]).cast(
                    t.schema.field(id_col).type
                ),
                value_col: pa.array(v_s[sel]),
            }
            return pa.table(cols)
        # final: emit (key, bucket, dv, dt) for groups of size >= 2
        prev_ix = last_ix - 1
        has_prev = prev_ix >= 0
        has_prev[has_prev] &= gid[prev_ix[has_prev]] == gid[last_ix[has_prev]]
        li = last_ix[has_prev]
        pi = li - 1
        return pa.table(
            {
                key_col: pa.array(k_s[li]).cast(t.schema.field(key_col).type),
                "bucket_ts": pa.array(b_s[li] * width_us).cast(
                    pa.timestamp("us")
                ),
                "dv": pa.array(v_s[li] - v_s[pi]),
                "dt_us": pa.array(ts_s[li] - ts_s[pi]),
            }
        )

    combined = ds.map_batches(
        lambda b: last_two(b, final=False),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=65536,
    )
    return _hash_exchange(
        combined, key_col, num_partitions,
        lambda t: last_two(t, final=True),
    )


def keyed_delta(
    ds,
    *,
    key_col: str,
    order_col: str,
    value_col: str,
    num_partitions: int | None = None,
):
    """Consecutive delta of an int64 value per key, ordered by `order_col`
    (unique within key — e.g. a rollup bucket): (key, order, value, delta)
    with delta NULL on each key's first row. The composition primitive for
    derivative-over-tier queries (rollup -> delta), one hash exchange."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    def part_fn(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col])
        kt = t.schema.field(key_col).type
        ot = t.schema.field(order_col).type
        if len(key) == 0:
            # mirror the non-empty branch's tz-stripped timestamp('us')
            # order column so empty blocks share the partition schema
            o_ty = pa.timestamp("us") if pa.types.is_timestamp(ot) else ot
            return pa.table(
                {
                    key_col: pa.array([], type=kt),
                    order_col: pa.array([], type=o_ty),
                    value_col: pa.array([], type=pa.int64()),
                    "delta": pa.array([], type=pa.int64()),
                }
            )
        o = ts_to_us(t[order_col].combine_chunks()) if pa.types.is_timestamp(
            ot
        ) else np.asarray(t[order_col], dtype=np.int64)
        v = np.asarray(t[value_col], dtype=np.int64)
        order = np.lexsort((o, key))
        k_s, o_s, v_s = key[order], o[order], v[order]
        same = np.zeros(len(k_s), dtype=bool)
        same[1:] = k_s[1:] == k_s[:-1]
        d = np.zeros(len(v_s), dtype=np.int64)
        d[1:] = v_s[1:] - v_s[:-1]
        return pa.table(
            {
                key_col: pa.array(k_s).cast(kt),
                order_col: pa.array(
                    o_s
                ).cast(ot) if not pa.types.is_timestamp(ot) else pa.array(
                    o_s
                ).cast(pa.timestamp("us")),
                value_col: pa.array(v_s),
                "delta": pa.array(
                    np.where(same, d, 0), mask=~same
                ),
            }
        )

    return _hash_exchange(ds, key_col, num_partitions, part_fn)
