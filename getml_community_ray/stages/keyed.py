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
