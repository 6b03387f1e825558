"""Continuous-aggregate tier router: answer an arbitrary [a, b) time-range
aggregate from the COARSEST rollup tiers that cover it, reading raw events
only for the sub-finest-tier ragged edges.

This is the query-time half of the rollup engine (the write-time half is
pipelines/rollup.py): TimescaleDB-style real-time continuous-aggregate
semantics. A T-long range over tiers (1m, 1h, 1d) touches

    O(T / 86400) 1d rows  +  <= 2*24 1h rows  +  <= 2*60 1m rows
    +  < 2 minutes of raw events (predicate-pushdown pruned at the read)

instead of O(T) raw rows — at 100 TB this is the difference between a
dashboard query and a full scan. All merges are over decomposable states
(count/sum additive, min/max lattice), so the routed answer is bit-exact
vs computing directly over raw.

Reference analog: getML materializes FastProp window aggregates once and
reuses them across feature evaluations (src/engine/src/fastprop/
FastProp.cpp subfeature caching); here the materialized object is the
tier cascade and the reuse is range-query answering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000


def tier_cover(
    a_us: int, b_us: int, widths_us: list[int]
) -> list[tuple[int, int, int]]:
    """Partition [a_us, b_us) into aligned per-tier spans plus raw edges.

    `widths_us` ascending (finest first). Returns (tier_index, lo, hi)
    with tier_index = -1 for raw edges; spans with tier_index = i have
    lo/hi multiples of widths_us[i]. The spans tile [a, b) exactly:
    pairwise disjoint, union = [a, b) (property-tested in
    tests/test_router.py). Greedy coarsest-interior recursion — at most
    2 * sum(w[i+1] / w[i]) + 2 spans total, O(#tiers) work."""
    spans: list[tuple[int, int, int]] = []

    def cover(lo: int, hi: int, i: int) -> None:
        if lo >= hi:
            return
        if i < 0:
            spans.append((-1, lo, hi))
            return
        w = widths_us[i]
        ilo = -(-lo // w) * w
        ihi = (hi // w) * w
        if ilo >= ihi:
            cover(lo, hi, i - 1)
            return
        cover(lo, ilo, i - 1)
        spans.append((i, ilo, ihi))
        cover(ihi, hi, i - 1)

    cover(int(a_us), int(b_us), len(widths_us) - 1)
    return spans


def _interval_mask(ts_us: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Membership of each ts in the union of half-open intervals whose
    flattened sorted bounds are `bounds` ([lo0, hi0, lo1, hi1, ...]):
    inside <=> searchsorted index is odd. One vectorized pass."""
    return (np.searchsorted(bounds, ts_us, side="right") % 2) == 1


def _tier_partials(ds, bounds: np.ndarray, source_col: str):
    """Select finalized tier rows whose bucket lies in the span union and
    project them to mergeable partial states (n, s, mn, mx)."""

    def sel(b: pa.Table) -> pa.Table:
        ts = np.asarray(b["bucket_ts"].cast(pa.int64()))
        keep = _interval_mask(ts, bounds)
        t = b.filter(pa.array(keep))
        return pa.table(
            {
                "source": t[source_col],
                "n": t["count"].cast(pa.float64()),
                "s": t["sum"].cast(pa.float64()),
                "mn": t["min"].cast(pa.float64()),
                "mx": t["max"].cast(pa.float64()),
            }
        )

    return ds.map_batches(sel, batch_format="pyarrow", zero_copy_batch=True)


def _raw_partials(ds, bounds: np.ndarray, *, source_col: str, ts_col: str,
                  value_col: str):
    """Per-batch combiner over the raw-edge rows: one (source, n, s, mn, mx)
    partial per source per batch. The raw dataset should already be
    predicate-pushdown pruned to the edge ranges; the mask here is the
    exact sub-row filter."""

    def part(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.float64()),
                "s": pa.array([], type=pa.float64()),
                "mn": pa.array([], type=pa.float64()),
                "mx": pa.array([], type=pa.float64()),
            }
        )
        if len(b) == 0:
            return empty
        ts = np.asarray(b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()))
        keep = _interval_mask(ts, bounds)
        if not keep.any():
            return empty
        src = np.asarray(b[source_col])[keep].astype(str)
        v = np.asarray(b[value_col], dtype=np.float64)[keep]
        uniq, gid = np.unique(src, return_inverse=True)
        n = np.bincount(gid, minlength=len(uniq)).astype(np.float64)
        s = np.bincount(gid, weights=v, minlength=len(uniq))
        order = np.argsort(gid, kind="stable")
        starts = np.searchsorted(gid[order], np.arange(len(uniq)))
        mn = np.minimum.reduceat(v[order], starts)
        mx = np.maximum.reduceat(v[order], starts)
        return pa.table(
            {
                "source": pa.array(uniq, type=pa.string()),
                "n": pa.array(n),
                "s": pa.array(s),
                "mn": pa.array(mn),
                "mx": pa.array(mx),
            }
        )

    return ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)


def route_range_aggregate(
    tiers: dict[str, "object"],
    tier_widths_s: dict[str, int],
    raw_read_fn,
    *,
    a_us: int,
    b_us: int,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "cents",
):
    """Answer SELECT source, count, sum, min, max over [a_us, b_us).

    `tiers` maps tier name -> finalized rollup Dataset (long columns
    source/bucket_ts/count/sum/min/max); `raw_read_fn(lo_us, hi_us)`
    returns a Dataset of raw rows covering [lo, hi) — the caller wires
    predicate pushdown (parquet row-group pruning) into it, so the raw
    scan is bounded by the edge width, not the range width.

    Returns a Dataset (source, n_events, sum_cents, min_cents, max_cents)
    with exact int64 values (counts/sums of integer cents stay < 2^53 in
    the float64 partial states by the same argument the rollup lanes use).
    """
    ordered = sorted(tier_widths_s.items(), key=lambda kv: kv[1])
    widths_us = [w * US for _, w in ordered]
    spans = tier_cover(a_us, b_us, widths_us)

    per_tier: dict[int, list[tuple[int, int]]] = {}
    for i, lo, hi in spans:
        per_tier.setdefault(i, []).append((lo, hi))

    parts = []
    for i, ranges in per_tier.items():
        bounds = np.asarray(sorted(ranges)).reshape(-1)
        if i < 0:
            # ONE read per contiguous raw edge (<= 2 sub-finest-width
            # spans) — a single read spanning min..max would cover the
            # whole query range and defeat the tier routing
            for lo, hi in sorted(ranges):
                parts.append(
                    _raw_partials(
                        raw_read_fn(int(lo), int(hi)),
                        np.asarray([lo, hi], dtype=np.int64),
                        source_col=source_col, ts_col=ts_col,
                        value_col=value_col,
                    )
                )
        else:
            name = ordered[i][0]
            parts.append(_tier_partials(tiers[name], bounds, source_col="source"))

    from ray.data.aggregate import Max, Min, Sum

    from ..stages.blocks import norm_empty_blocks

    if not parts:
        # Degenerate range (a_us >= b_us): tier_cover is empty — return an
        # empty result with the final schema instead of raising.
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "n_events": pa.array([], type=pa.int64()),
                    "sum_cents": pa.array([], type=pa.int64()),
                    "min_cents": pa.array([], type=pa.int64()),
                    "max_cents": pa.array([], type=pa.int64()),
                }
            )
        )

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    agg = merged.groupby("source").aggregate(
        Sum("n", alias_name="n"),
        Sum("s", alias_name="s"),
        Min("mn", alias_name="mn"),
        Max("mx", alias_name="mx"),
    )
    agg = norm_empty_blocks(
        agg,
        pa.schema(
            [
                ("source", pa.string()),
                ("n", pa.float64()),
                ("s", pa.float64()),
                ("mn", pa.float64()),
                ("mx", pa.float64()),
            ]
        ),
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_events": pc.cast(pc.round(b["n"]), pa.int64()),
                "sum_cents": pc.cast(pc.round(b["s"]), pa.int64()),
                "min_cents": pc.cast(pc.round(b["mn"]), pa.int64()),
                "max_cents": pc.cast(pc.round(b["mx"]), pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
