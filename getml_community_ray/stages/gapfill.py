"""Gap-fill: reconstruct each source's regular time grid and fill missing
ticks by forward-fill and linear interpolation.

Mirrors the reference's Imputation preprocessor contract (fit a small state,
transform adds value + was-null dummy columns —
`/root/reference/src/engine/src/engine/Imputation.cpp:18-75,160-175`) adapted
from column-mean imputation to per-source time grids.

Grid model (matches sources/synth.py): ticks at `t0 + k*period` with jitter
< 0.5% of the period and ~2% dropped ticks. The period is INFERRED per
source as the median of consecutive deltas (robust to isolated gaps); each
observation snaps to its nearest tick.

Scale notes: rows are hash-partitioned by source, one vectorized pass per
partition; per-partition memory is one source-slice of (ts, value) scalars.
For multi-year sources, partition by (source, time-range) and carry the last
observation across range boundaries (the actor-pool streaming variant);
here the per-source history fits a partition.

Output schema (FIXTURES.md F3):
    source:string, grid_ts:timestamp[us], <value>_ff:float64,
    <value>_lin:float64, was_filled:bool
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rollup import crc_hash_sources, ts_to_us

US = 1_000_000


def infer_period_us(ts_us: np.ndarray) -> int:
    """Sparse-robust period estimator.

    The median of consecutive deltas fails when >50% of grid ticks are
    unobserved (the median delta is then a *multiple* of the true period and
    the grid comes out too coarse). Instead, anchor on the smallest positive
    delta m (any two adjacent observed ticks yield exactly one period, up to
    <0.5% jitter), snap every delta to its implied multiple k = round(d/m),
    and take the median of the per-delta base estimates d/k — this averages
    the jitter back out while being immune to arbitrarily sparse gaps.
    Rounded to whole seconds when >= 1s (grid periods are integral seconds
    in this corpus)."""
    if len(ts_us) < 2:
        return 0
    d = np.diff(ts_us).astype(np.float64)
    d = d[d > 0]
    if len(d) == 0:
        return 0
    m = float(d.min())
    k = np.maximum(np.rint(d / m), 1.0)
    est = float(np.median(d / k))
    if est >= US:
        return int(round(est / US)) * US
    return int(round(est))


def gapfill_group(
    ts_us: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One source, sorted by ts -> (grid_ts_us, ff, lin, was_filled)."""
    period = infer_period_us(ts_us)
    if period <= 0:
        return ts_us, v.copy(), v.copy(), np.zeros(len(ts_us), dtype=bool)

    t0 = int(ts_us[0])
    k = np.rint((ts_us - t0) / period).astype(np.int64)
    # collapse duplicate snaps (keep first) — jitter cannot produce them with
    # <0.5% jitter, but arbitrary data can
    keep = np.ones(len(k), dtype=bool)
    keep[1:] = k[1:] != k[:-1]
    k, ts_k, v_k = k[keep], ts_us[keep], v[keep]

    grid_k = np.arange(k[0], k[-1] + 1, dtype=np.int64)
    grid_ts = t0 + grid_k * period
    observed = np.zeros(len(grid_k), dtype=bool)
    pos = k - k[0]
    observed[pos] = True

    vals = np.full(len(grid_k), np.nan)
    vals[pos] = v_k

    # forward-fill: index of the most recent observed tick at or before i
    idx = np.where(observed, np.arange(len(grid_k)), 0)
    np.maximum.accumulate(idx, out=idx)
    ff = vals[idx]

    # linear interpolation between surrounding observations (np.interp uses
    # the true observed ts, matching the reference's definition of "between")
    lin = np.interp(grid_ts, ts_k, v_k)
    # observed ticks keep their exact value in both columns
    ff[pos] = v_k
    lin[pos] = v_k
    return grid_ts, ff, lin, ~observed


class GapFiller:
    """Callable stage: one hash partition (complete source groups) in,
    gap-filled grid rows out. Usable both as a `map_groups` function and as
    an actor-pool `map_batches` class when upstream guarantees per-source
    batch ordering."""

    def __init__(self, *, source_col: str, ts_col: str, value_col: str):
        self.source_col = source_col
        self.ts_col = ts_col
        self.value_col = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = np.asarray(batch[self.source_col]).astype(str)
        ts_us = ts_to_us(batch[self.ts_col].combine_chunks())
        v = np.asarray(batch[self.value_col].combine_chunks(), dtype=np.float64)
        if len(src) == 0:
            return self._empty()

        order = np.lexsort((ts_us, src))
        src, ts_us, v = src[order], ts_us[order], v[order]
        uniq, starts = np.unique(src, return_index=True)
        bounds = np.append(starts, len(src))

        out_src, out_ts, out_ff, out_lin, out_fill = [], [], [], [], []
        for i, name in enumerate(uniq):
            s, e = bounds[i], bounds[i + 1]
            gts, ff, lin, filled = gapfill_group(ts_us[s:e], v[s:e])
            out_src.append(np.full(len(gts), name))
            out_ts.append(gts)
            out_ff.append(ff)
            out_lin.append(lin)
            out_fill.append(filled)

        vc = self.value_col
        return pa.table(
            {
                "source": pa.array(np.concatenate(out_src), type=pa.string()),
                "grid_ts": pa.array(np.concatenate(out_ts)).cast(pa.timestamp("us")),
                f"{vc}_ff": pa.array(np.concatenate(out_ff)),
                f"{vc}_lin": pa.array(np.concatenate(out_lin)),
                "was_filled": pa.array(np.concatenate(out_fill)),
            }
        )

    def _empty(self) -> pa.Table:
        vc = self.value_col
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "grid_ts": pa.array([], type=pa.timestamp("us")),
                f"{vc}_ff": pa.array([], type=pa.float64()),
                f"{vc}_lin": pa.array([], type=pa.float64()),
                "was_filled": pa.array([], type=pa.bool_()),
            }
        )


def gapfill(
    ds,
    *,
    source_col: str = "source",
    ts_col: str = "event_ts",
    value_col: str = "n_tok",
    num_partitions: int | None = None,
):
    """Hash-partition by source -> vectorized per-partition gap-fill."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    stage = GapFiller(source_col=source_col, ts_col=ts_col, value_col=value_col)

    def add_part(b: pa.Table) -> pa.Table:
        h = crc_hash_sources(np.asarray(b[source_col]).astype(str))
        return b.append_column(
            "_part", pa.array((h * 0x9E3779B1 % num_partitions).astype(np.int64))
        )

    return (
        ds.select_columns([source_col, ts_col, value_col])
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: stage(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )
