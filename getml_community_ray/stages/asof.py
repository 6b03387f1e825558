"""Distributed as-of join (point-in-time lookup join).

For every left row, attach the right row with the greatest right_ts such
that right_ts <= left_ts (backward as-of; optional tolerance bound
left_ts - right_ts <= tolerance_s), matching on an equality key. The same
semantics as DuckDB/pandas `ASOF JOIN` and the reference's point-in-time
match with horizon=0, memory=inf, LAST aggregation
(`helpers/Matchmaker.hpp:92-137` with the FIRST/LAST kernel of
`fastprop/algorithm/Aggregator.cpp`), exposed as a first-class relational
operator.

Plan shape (scale notes):
- both sides are tagged (side bit) and exchanged ONCE by hash(key) —
  the only shuffle; partitions hold complete key groups.
- per partition: one lexsort of the right side by (key-group, ts), then a
  single vectorized searchsorted of every left row into a packed
  (group, ts) int64 key — O(n log n) per partition, no per-row Python.
- ties on right_ts within a key are resolved deterministically by keeping
  the LAST row in (stable) input order among equal timestamps; callers
  needing a stronger contract should pre-aggregate the right side.
- a hot key is bounded the same way fastprop bounds it: callers can
  pre-split with (key, time-bucket) partitioning upstream; tolerance-less
  as-of needs the last right row before each bucket replicated, which is
  what `FastPropSpec.time_bucket_s` implements for the general windowed
  case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rollup import crc_hash_sources, ts_to_us

US = 1_000_000


def _hash_part(key: np.ndarray, num_partitions: int) -> np.ndarray:
    if key.dtype.kind in "iu":
        h = key.astype(np.int64)
    else:
        h = crc_hash_sources(key.astype(str))
    return (h * 0x9E3779B1 % num_partitions).astype(np.int64)


class _AsofKernel:
    """Per-partition vectorized as-of match. Input: one hash partition
    holding both tagged sides; output: left id/key/ts columns + one float64
    column per right value col (null where no match)."""

    def __init__(self, *, on, id_cols, value_cols, tolerance_us, suffix):
        self.on = on
        self.id_cols = id_cols
        self.value_cols = value_cols
        self.tolerance_us = tolerance_us
        self.suffix = suffix

    def __call__(self, t: pa.Table) -> pa.Table:
        side = np.asarray(t["_side"])
        is_l = side == 0
        is_r = ~is_l
        key = np.asarray(t[self.on])
        ts = np.asarray(t["_ts"], dtype=np.int64)

        uniq, gid = np.unique(key, return_inverse=True)
        n_l = int(is_l.sum())

        out_cols: dict[str, pa.Array] = {}
        lsel = np.flatnonzero(is_l)
        for c in self.id_cols:
            out_cols[c] = t[c].combine_chunks().take(pa.array(lsel))
        out_cols[self.on] = t[self.on].combine_chunks().take(pa.array(lsel))
        out_cols["_ts"] = pa.array(ts[is_l])

        if n_l == 0 or not is_r.any():
            for c in self.value_cols:
                out_cols[f"{c}{self.suffix}"] = pa.nulls(n_l, pa.float64())
            return pa.table(out_cols)

        # pack (group, rel_ts) into one monotone int64 per group run
        t0 = int(ts.min())
        rel = ts - t0
        span = int(rel.max()) + 2
        if len(uniq) * span >= np.iinfo(np.int64).max:
            raise ValueError(
                "asof_join packed key would overflow int64: "
                f"{len(uniq)} groups x {span} us span in one partition — "
                "raise num_partitions or pre-split by time range"
            )
        comp = gid.astype(np.int64) * span + rel

        gid_r = gid[is_r]
        rel_r = rel[is_r]
        comp_r = comp[is_r]
        # stable sort: equal (group, ts) keep input order, so the LAST
        # among equal right timestamps wins deterministically
        order_r = np.argsort(comp_r, kind="stable")
        comp_rs = comp_r[order_r]

        comp_l = comp[is_l]
        ix = np.searchsorted(comp_rs, comp_l, side="right") - 1
        safe = np.maximum(ix, 0)
        matched_r = order_r[safe]
        valid = (ix >= 0) & (gid_r[matched_r] == gid[is_l])
        if self.tolerance_us is not None:
            valid &= (rel[is_l] - rel_r[matched_r]) <= self.tolerance_us

        r_rows = np.flatnonzero(is_r)[matched_r]
        take_ix = np.where(valid, r_rows, -1)
        take = pa.array(
            np.where(take_ix >= 0, take_ix, 0), type=pa.int64()
        )
        vmask = pa.array(~valid)
        for c in self.value_cols:
            col = t[c].combine_chunks().cast(pa.float64()).take(take)
            if (~valid).any():
                col = pa.Array.from_pandas(
                    col.to_numpy(zero_copy_only=False),
                    mask=np.asarray(vmask),
                    type=pa.float64(),
                )
            out_cols[f"{c}{self.suffix}"] = col
        return pa.table(out_cols)


def asof_join(
    left_ds,
    right_ds,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    id_cols: list[str],
    tolerance_s: float | None = None,
    suffix: str = "_asof",
    num_partitions: int | None = None,
    time_bucket_s: float | None = None,
):
    """Backward as-of join: for each left row the latest right row with
    right_ts <= left_ts on the same key. Returns id_cols + on + _ts (us
    int64 of left_ts) + `<value_col><suffix>` float64 columns.

    `time_bucket_s` bounds hot keys the same way FastPropSpec.time_bucket_s
    does: partitions become (key-hash, time bucket), and right rows within
    `tolerance_s` of a bucket's end are replicated into the next bucket —
    exact because a match can reach at most `tolerance_s` back. Requires
    tolerance_s (an unbounded-lookback as-of would need a last-row carry
    chain across every earlier bucket) and time_bucket_s >= tolerance_s."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(left_ds)
    tol_us = None if tolerance_s is None else int(round(tolerance_s * US))
    W_us = 0
    if time_bucket_s is not None:
        if tol_us is None:
            raise ValueError(
                "time_bucket_s requires tolerance_s: unbounded-lookback "
                "as-of cannot be time-split exactly (use key-only "
                "partitioning or set a tolerance)"
            )
        W_us = int(round(time_bucket_s * US))
        if W_us < tol_us:
            raise ValueError(
                f"time_bucket_s ({time_bucket_s}) must be >= tolerance_s "
                f"({tolerance_s}): one-bucket replication only covers "
                "lookbacks no wider than the bucket"
            )
    P = num_partitions

    def _parts(key: np.ndarray, tus: np.ndarray) -> np.ndarray:
        part = _hash_part(key, P)
        if W_us:
            part = part + P * (tus // W_us)
        return part

    # null-type placeholders on each side must carry the OTHER side's
    # types; ints/strings pass through from the left batch itself
    def tag_left(b: pa.Table) -> pa.Table:
        key = np.asarray(b[on])
        tus = ts_to_us(b[left_ts].combine_chunks())
        cols = {c: b[c] for c in id_cols}
        cols[on] = b[on]
        cols["_ts"] = pa.array(tus)
        for c in value_cols:
            cols[c] = pa.nulls(len(b), pa.float64())
        cols["_side"] = pa.array(np.zeros(len(b), dtype=np.int8))
        cols["_part"] = pa.array(_parts(key, tus))
        return pa.table(cols)

    def tag_right(b: pa.Table, id_types: dict) -> pa.Table:
        key = np.asarray(b[on])
        tus = ts_to_us(b[right_ts].combine_chunks())
        cols = {c: pa.nulls(len(b), id_types[c]) for c in id_cols}
        cols[on] = b[on]
        cols["_ts"] = pa.array(tus)
        for c in value_cols:
            cols[c] = b[c].cast(pa.float64())
        cols["_side"] = pa.array(np.ones(len(b), dtype=np.int8))
        full = pa.table(cols)
        part = _hash_part(key, P)
        if not W_us:
            return full.append_column("_part", pa.array(part))
        bucket = tus // W_us
        orig = full.append_column("_part", pa.array(part + P * bucket))
        # rows within tolerance of the bucket end also serve the NEXT
        # bucket's left rows
        rep_ix = np.flatnonzero(tus - bucket * W_us > W_us - tol_us)
        if len(rep_ix) == 0:
            return orig
        rep = full.take(pa.array(rep_ix)).append_column(
            "_part", pa.array((part + P * (bucket + 1))[rep_ix])
        )
        return pa.concat_tables([orig, rep])

    kernel = _AsofKernel(
        on=on,
        id_cols=id_cols,
        value_cols=value_cols,
        tolerance_us=tol_us,
        suffix=suffix,
    )

    lcols = list(dict.fromkeys(id_cols + [on, left_ts]))
    rcols = list(dict.fromkeys([on, right_ts] + value_cols))
    if left_ds is right_ds:
        # self-join: ONE read, one operator emits both tagged copies (a
        # lazy two-branch union over the same dataset stalls the streaming
        # executor at scale — see pipelines/fastprop.py tag_both)
        all_cols = list(dict.fromkeys(lcols + rcols))

        def tag_both(b: pa.Table) -> pa.Table:
            a = tag_left(b)
            id_types = {c: a.schema.field(c).type for c in id_cols}
            c_ = tag_right(b, id_types).select(a.column_names)
            if c_.schema != a.schema:
                c_ = c_.cast(a.schema)
            return pa.concat_tables([a, c_])

        tagged = left_ds.select_columns(all_cols).map_batches(
            tag_both, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        try:
            ls = left_ds.schema()
            lpa = getattr(ls, "base_schema", ls)
            id_types = {c: lpa.field(c).type for c in id_cols}
        except Exception:
            id_types = {c: pa.int64() for c in id_cols}
        ltag = left_ds.select_columns(lcols).map_batches(
            tag_left, batch_format="pyarrow", zero_copy_batch=True
        )
        rtag = right_ds.select_columns(rcols).map_batches(
            lambda b: tag_right(b, id_types),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        tagged = ltag.union(rtag)
    return (
        tagged.groupby("_part")
        .map_groups(
            lambda t: kernel(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
