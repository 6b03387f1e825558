"""FastProp-style propositionalization: population x peripheral
point-in-time window aggregation — the reference engine's core capability
re-expressed Ray-Data-first.

Reference semantics (cites into /root/reference):
- match rule: a peripheral row at time `pts` with the same join key as a
  population row at time `t` matches iff
      t - horizon - memory < pts <= t - horizon
  (`helpers/Matchmaker.hpp:92-137`; horizon/memory rewrites
  `make_placeholder.cpp:82-100,235-250`).
- lag-window conditions split that window into tumbling buckets
  `t - h - (i+1)*delta < pts <= t - h - i*delta` (`FastProp.cpp:1255-1290`,
  `ConditionParser.cpp:68-88`).
- a feature = (aggregation, value column, window) evaluated per population
  row (`fastprop/containers/AbstractFeature.hpp`); the full aggregation
  vocabulary is `helpers/enums/Aggregation.hpp:16-26` — served here by
  `kernels.aggregations.grouped_aggregate` (exact-math kernels).
- EWMA / TREND / TIME SINCE use dt = t_population - t_peripheral
  (`fastprop/algorithm/Aggregator.hpp:373-427`) — here `t_out` is the
  population row's timestamp, exactly the reference pair extraction.
- NaN/Inf feature outputs become 0.0 in the reference's feature matrix
  (`FastProp.cpp:100`) — opt-in via `nan_to_zero=True` (off by default so
  SQL oracles can distinguish empty windows as NULL/NaN).

Execution plan (Ray-Data-first, scale notes):
- both tables are hash-partitioned by join key (only key/ts/value/id
  columns are shuffled — never wide payloads), tagged with `_side`,
  unioned, and grouped by `_part`: ONE all-to-all exchange total.
- within a partition everything is vectorized numpy: a packed
  (group, ts) composite key + two `searchsorted` calls give every
  population row's window bounds (the tsindex analog,
  `tsindex/InMemoryIndex.hpp:36-47`), windows are expanded with the
  repeat/cumsum gather trick, and `grouped_aggregate` computes every
  aggregation for every population row at once.
- expansion cost is sum(window sizes) — the same work the reference does
  per row (`FastProp.cpp:1152-1180` make_matches), but batched. For
  bounded-memory scale, split partitions by (key, time-range) with
  `memory` overlap replication; window sizes are bounded by memory/tick.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..stages.rollup import crc_hash_sources, ts_to_us

US = 1_000_000


@dataclass
class FastPropSpec:
    """One windowed-aggregation feature set over a peripheral table."""

    key_col: str
    pop_ts_col: str
    peri_ts_col: str
    value_cols: list[str]
    aggs: list[str]
    id_cols: list[str] = field(default_factory=list)
    horizon_s: float = 0.0
    memory_s: float = 0.0
    lag_delta_s: float = 0.0  # > 0 enables lag buckets
    n_lags: int = 0  # number of tumbling lag buckets (with lag_delta_s)
    nan_to_zero: bool = False  # FastProp.cpp:100 feature-matrix semantics
    num_partitions: int = 32
    # per-row peripheral expiry (reference upper_time_stamp,
    # Matchmaker.hpp:92-137): a peripheral row additionally matches only if
    # its upper ts is null/NaN or upper + horizon > population ts.
    upper_ts_col: str | None = None
    # > 0 enables the bounded-memory (key, time-range) split: partitions
    # become (hash(key) % num_partitions, floor(ts / time_bucket_s)) and
    # peripheral rows within `max_lower_s` of a bucket's end are REPLICATED
    # into the next bucket, so a hot key with long memory is bounded by one
    # time range's rows instead of the whole key. Must be >= max_lower_s.
    # Size BOTH knobs to the data: total task count = num_partitions x
    # (ts span / time_bucket_s); a narrow bucket over a long span floods
    # the scheduler with micro-groups (measured: 256 x 28.8k buckets
    # stalls the driver on block metadata). Aim for O(100) buckets.
    time_bucket_s: float = 0.0

    def max_lower_s(self) -> float:
        """Largest window lower offset — the replication overlap width."""
        return max(low for _, low, _ in self.windows())

    def windows(self) -> list[tuple[str, float, float]]:
        """(suffix, lower_offset_s, upper_offset_s): pts in
        (t - lower, t - upper]."""
        if self.lag_delta_s > 0 and self.n_lags > 0:
            return [
                (
                    f"__lag{i}",
                    self.horizon_s + (i + 1) * self.lag_delta_s,
                    self.horizon_s + i * self.lag_delta_s,
                )
                for i in range(self.n_lags)
            ]
        return [("", self.horizon_s + self.memory_s, self.horizon_s)]


def _hash_part(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    if keys.dtype.kind in "iu":
        h = keys.astype(np.int64)
    else:
        h = crc_hash_sources(keys.astype(str))
    return (h * 0x9E3779B1 % num_partitions).astype(np.int64)


class _PartitionKernel:
    """Vectorized per-partition FastProp sweep (complete key groups).

    `self_join=True` (the TimeSeries mode) takes ONE tagged copy of the
    table as both sides — half the shuffle volume and one read instead of
    two."""

    def __init__(self, spec: FastPropSpec, self_join: bool = False):
        self.spec = spec
        self.self_join = self_join

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..kernels.aggregations import grouped_aggregate

        spec = self.spec
        if self.self_join:
            pop = peri = t
        else:
            side = np.asarray(t["_side"])
            pop = t.filter(pa.array(side == 0))
            peri = t.filter(pa.array(side == 1))
        n_pop = len(pop)
        if n_pop == 0:
            return self._empty(t.schema)

        pop_key = np.asarray(pop[spec.key_col])
        peri_key = np.asarray(peri[spec.key_col])
        pop_ts = ts_to_us(pop["_ts"].combine_chunks())
        peri_ts = ts_to_us(peri["_ts"].combine_chunks())

        # dense joint group ids over both sides
        uniq, inv = np.unique(np.concatenate([pop_key, peri_key]), return_inverse=True)
        pop_g, peri_g = inv[:n_pop], inv[n_pop:]

        # deterministic order: population by (key, ts) stable; peripheral by
        # (key, ts, first value col) so equal-ts ties resolve to the smallest
        # value (reference iteration-order tie-break made deterministic).
        pop_order = np.lexsort((pop_ts, pop_g))
        pop_g, pop_ts = pop_g[pop_order], pop_ts[pop_order]
        vals = {
            c: np.asarray(peri[c].combine_chunks(), dtype=np.float64)
            for c in spec.value_cols
        }
        tie = vals[spec.value_cols[0]] if spec.value_cols else np.zeros(len(peri))
        peri_order = np.lexsort((tie, peri_ts, peri_g))
        peri_g, peri_ts = peri_g[peri_order], peri_ts[peri_order]
        vals = {c: v[peri_order] for c, v in vals.items()}
        upper_us = None
        if spec.upper_ts_col is not None:
            upper_us = np.asarray(
                peri["_upper"].combine_chunks(), dtype=np.float64
            )[peri_order]

        # packed (group, time-RANK) composite for global searchsorted.
        # Packing raw microsecond offsets overflows int64 when
        # groups x time-span approaches 2^63 (~30k keys over a 10-year
        # span); ranks are bounded by the partition's distinct-timestamp
        # count, so groups x (ranks+1) < n^2 < 2^63 for any feasible
        # partition. Rank monotonicity preserves the window semantics:
        # rel >= q  <=>  rank(rel) >= searchsorted(R, q, 'left').
        t0 = int(min(peri_ts.min(), pop_ts.min())) if len(peri_ts) else int(pop_ts.min())
        rel_peri = peri_ts - t0
        rel_pop = pop_ts - t0
        time_ranks = np.unique(rel_peri)
        spanr = len(time_ranks) + 1
        comp = peri_g * spanr + np.searchsorted(time_ranks, rel_peri)

        out_cols: dict[str, pa.Array] = {}
        for c in spec.id_cols:
            out_cols[c] = pop[c].combine_chunks().take(pa.array(pop_order))
        out_cols[spec.key_col] = pa.array(uniq[pop_g])
        out_cols[spec.pop_ts_col] = (
            pop["_ts"].combine_chunks().take(pa.array(pop_order))
        )

        t_out_sec = pop_ts / 1e6
        # prefix-sum fast lane: count/sum/avg need only cumulative sums over
        # the sorted peripheral — O(n) memory regardless of window size (the
        # expansion lane costs sum(window sizes), which a hot key with long
        # memory can blow up). Other aggs fall back to expansion.
        PREFIX = {"count", "sum", "avg"}
        if upper_us is None:
            prefix_aggs = [a for a in spec.aggs if a in PREFIX]
            expand_aggs = [a for a in spec.aggs if a not in PREFIX]
        else:
            # a per-row upper bound punches holes in the contiguous window,
            # so prefix sums no longer apply: everything expands + filters
            prefix_aggs, expand_aggs = [], list(spec.aggs)
        if prefix_aggs:
            # per-column prefixes (NaN patterns can differ per column)
            pcsum = {
                c: np.concatenate(
                    [[0.0], np.cumsum(np.where(np.isfinite(vals[c]), vals[c], 0.0))]
                )
                for c in spec.value_cols
            }
            pccnt = {
                c: np.concatenate(
                    [[0], np.cumsum(np.isfinite(vals[c]).astype(np.int64))]
                )
                for c in spec.value_cols
            }

        for suffix, low_s, up_s in spec.windows():
            lo_t = rel_pop - int(low_s * US) + 1  # exclusive lower
            hi_t = rel_pop - int(up_s * US) + 1  # inclusive upper
            lo_r = np.searchsorted(time_ranks, lo_t, side="left")
            hi_r = np.searchsorted(time_ranks, hi_t, side="left")
            lo = np.searchsorted(comp, pop_g * spanr + lo_r, side="left")
            hi = np.searchsorted(comp, pop_g * spanr + hi_r, side="left")
            if prefix_aggs:
                for c in spec.value_cols:
                    wcnt = (pccnt[c][hi] - pccnt[c][lo]).astype(np.float64)
                    wsum = pcsum[c][hi] - pcsum[c][lo]
                    with np.errstate(invalid="ignore", divide="ignore"):
                        wavg = wsum / wcnt
                    wavg = np.where(wcnt == 0, np.nan, wavg)
                    named = {"count": wcnt, "sum": wsum, "avg": wavg}
                    for agg in prefix_aggs:
                        arr = named[agg]
                        if spec.nan_to_zero:
                            arr = np.where(np.isfinite(arr), arr, 0.0)
                        out_cols[f"{c}__{agg}{suffix}"] = pa.array(arr)
            if expand_aggs:
                cnt = hi - lo
                total = int(cnt.sum())
                # repeat/cumsum gather: expanded peripheral indices per window
                eg = np.repeat(np.arange(n_pop), cnt)
                cum = np.concatenate([[0], np.cumsum(cnt)])
                idx = np.arange(total) - np.repeat(cum[:-1], cnt) + np.repeat(lo, cnt)
                if upper_us is not None:
                    # Matchmaker.hpp:92-137: match iff upper is null/NaN or
                    # upper (+horizon, make_placeholder.cpp:235-250) > pop ts
                    u = upper_us[idx]
                    keep = ~np.isfinite(u) | (
                        u + spec.horizon_s * US > pop_ts[eg]
                    )
                    idx, eg = idx[keep], eg[keep]
                ets = peri_ts[idx] / 1e6
                for c in spec.value_cols:
                    res = grouped_aggregate(
                        expand_aggs, eg, vals[c][idx], n_pop, ts=ets,
                        t_out=t_out_sec,
                    )
                    for agg, arr in res.items():
                        if spec.nan_to_zero:
                            arr = np.where(np.isfinite(arr), arr, 0.0)
                        out_cols[f"{c}__{agg}{suffix}"] = pa.array(arr)
        # restore the spec's column order (prefix/expand lanes interleave)
        ordered_cols = {
            k: out_cols[k]
            for k in list(
                dict.fromkeys(spec.id_cols + [spec.key_col, spec.pop_ts_col])
            )
        }
        for suffix, _, _ in spec.windows():
            for c in spec.value_cols:
                for agg in spec.aggs:
                    name = f"{c}__{agg}{suffix}"
                    ordered_cols[name] = out_cols[name]
        return pa.table(ordered_cols)

    def _empty(self, schema: pa.Schema) -> pa.Table:
        """Empty output block with types derived from the partition's input
        schema — a partition holding only peripheral rows must still union
        cleanly with non-empty blocks (string keys, non-us timestamps)."""
        spec = self.spec
        cols: dict[str, pa.Array] = {}
        for c in spec.id_cols:
            cols[c] = pa.array([], type=schema.field(c).type)
        cols[spec.key_col] = pa.array([], type=schema.field(spec.key_col).type)
        cols[spec.pop_ts_col] = pa.array([], type=schema.field("_ts").type)
        for suffix, _, _ in spec.windows():
            for c in spec.value_cols:
                for agg in spec.aggs:
                    cols[f"{c}__{agg}{suffix}"] = pa.array([], type=pa.float64())
        return pa.table(cols)


def fastprop_features(population_ds, peripheral_ds, spec: FastPropSpec):
    """Point-in-time windowed aggregation of `peripheral_ds` onto
    `population_ds` (two-table FastProp). Returns a Dataset with one row per
    population row: id_cols + key + ts + one float64 column per
    (value_col, agg, lag)."""

    clash = set(spec.id_cols) & set(spec.value_cols)
    if clash:
        raise ValueError(
            f"id_cols and value_cols overlap ({sorted(clash)}): the "
            "peripheral value lane would null out the population column — "
            "alias one of them"
        )

    W_us = int(round(spec.time_bucket_s * US)) if spec.time_bucket_s > 0 else 0
    low_us_max = int(round(spec.max_lower_s() * US))
    if W_us and W_us < low_us_max:
        raise ValueError(
            f"time_bucket_s ({spec.time_bucket_s}) must be >= the largest "
            f"window lower offset ({spec.max_lower_s()}): one-bucket overlap "
            "replication only covers windows no wider than the bucket"
        )

    def _parts(k: np.ndarray, ts_col) -> np.ndarray:
        """Partition ids; with the time split, (hash % P, time bucket) is
        encoded exactly as hash + P * bucket — distinct buckets can never
        collide, so a partition holds complete (key, bucket) groups."""
        part = _hash_part(k, spec.num_partitions)
        if W_us:
            tus = ts_to_us(ts_col.combine_chunks())
            part = part + spec.num_partitions * (tus // W_us)
        return part

    def tag_pop(b: pa.Table) -> pa.Table:
        k = np.asarray(b[spec.key_col])
        cols = {c: b[c] for c in spec.id_cols}
        cols[spec.key_col] = b[spec.key_col]
        cols["_ts"] = b[spec.pop_ts_col]
        for c in spec.value_cols:
            cols[c] = pa.nulls(len(b), pa.float64())
        if spec.upper_ts_col is not None:
            cols["_upper"] = pa.nulls(len(b), pa.float64())
        cols["_side"] = pa.array(np.zeros(len(b), dtype=np.int8))
        cols["_part"] = pa.array(_parts(k, b[spec.pop_ts_col]))
        return pa.table(cols)

    # id-column null lanes on the peripheral side must carry the population
    # side's exact types or the union fails schema merge (e.g. string ids)
    try:
        _pop_schema = population_ds.schema()
        _pop_pa = getattr(_pop_schema, "base_schema", _pop_schema)
        id_types = {c: _pop_pa.field(c).type for c in spec.id_cols}
    except Exception:  # schema unavailable pre-execution: keep legacy default
        id_types = {c: pa.int64() for c in spec.id_cols}

    def tag_peri(b: pa.Table) -> pa.Table:
        k = np.asarray(b[spec.key_col])
        cols = {}
        for c in spec.id_cols:
            cols[c] = pa.nulls(len(b), id_types[c])
        cols[spec.key_col] = b[spec.key_col]
        cols["_ts"] = b[spec.peri_ts_col]
        for c in spec.value_cols:
            cols[c] = b[c].cast(pa.float64())
        if spec.upper_ts_col is not None:
            u = b[spec.upper_ts_col]
            if pa.types.is_timestamp(u.type):
                uv = ts_to_us(u.combine_chunks()).astype(np.float64)
            else:
                # reference Float time stamps are seconds since epoch
                uv = np.asarray(u.combine_chunks(), dtype=np.float64) * US
            cols["_upper"] = pa.array(uv)
        cols["_side"] = pa.array(np.ones(len(b), dtype=np.int8))
        full = pa.table(cols)
        part = _hash_part(k, spec.num_partitions)
        if not W_us:
            return full.append_column("_part", pa.array(part))
        tus = ts_to_us(b[spec.peri_ts_col].combine_chunks())
        bucket = tus // W_us
        orig = full.append_column(
            "_part", pa.array(part + spec.num_partitions * bucket)
        )
        # rows within max_lower_s of the bucket's end also serve the NEXT
        # bucket's population windows: replicate exactly those (exchange
        # overhead is overlap_fraction, not 2x)
        rep_ix = np.flatnonzero(tus - bucket * W_us > W_us - low_us_max)
        if len(rep_ix) == 0:
            return orig
        rep = full.take(pa.array(rep_ix)).append_column(
            "_part",
            pa.array((part + spec.num_partitions * (bucket + 1))[rep_ix]),
        )
        return pa.concat_tables([orig, rep])

    pop_cols = list(dict.fromkeys(spec.id_cols + [spec.key_col, spec.pop_ts_col]))
    peri_cols = list(
        dict.fromkeys(
            [spec.key_col, spec.peri_ts_col]
            + spec.value_cols
            + ([spec.upper_ts_col] if spec.upper_ts_col else [])
        )
    )
    kernel = _PartitionKernel(spec)
    if population_ds is peripheral_ds:
        # Self-join: ONE read, one operator emitting both tagged copies.
        # A two-branch union over the same large dataset stalls the
        # streaming executor (UnionOperator parked producing no output —
        # same pathology as the rollup lanes' lazy two-branch union, see
        # README scale lessons; reproduced at 200M rows).
        all_cols = list(dict.fromkeys(pop_cols + peri_cols))

        def tag_both(b: pa.Table) -> pa.Table:
            a = tag_pop(b)
            c = tag_peri(b).select(a.column_names)
            if c.schema != a.schema:
                # the batch carries the true id-col types (self-join); the
                # build-time id_types guess can be stale (schema() fallback)
                c = c.cast(a.schema)
            return pa.concat_tables([a, c])

        tagged = population_ds.select_columns(all_cols).map_batches(
            tag_both, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        pop = population_ds.select_columns(pop_cols).map_batches(
            tag_pop, batch_format="pyarrow", zero_copy_batch=True
        )
        peri = peripheral_ds.select_columns(peri_cols).map_batches(
            tag_peri, batch_format="pyarrow", zero_copy_batch=True
        )
        tagged = pop.union(peri)
    return (
        tagged
        .groupby("_part")
        .map_groups(
            lambda g: kernel(g.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )


def time_series_features(ds, spec: FastPropSpec):
    """Self-join FastProp (the reference's TimeSeries sugar,
    `getml/data/time_series.py:26-186`): every row is both a prediction
    point and a peripheral event. One tagged pass — half the shuffle
    volume and a single read vs the generic two-table union."""
    if (
        spec.pop_ts_col != spec.peri_ts_col
        or spec.upper_ts_col is not None
        or spec.time_bucket_s > 0
    ):
        # the single-copy fast path can't mark replicas / upper lanes; the
        # generic union path handles them
        return fastprop_features(ds, ds, spec)

    def tag(b: pa.Table) -> pa.Table:
        k = np.asarray(b[spec.key_col])
        cols = {c: b[c] for c in spec.id_cols}
        cols[spec.key_col] = b[spec.key_col]
        cols["_ts"] = b[spec.pop_ts_col]
        for c in spec.value_cols:
            cols[c] = b[c].cast(pa.float64())
        cols["_part"] = pa.array(_hash_part(k, spec.num_partitions))
        return pa.table(cols)

    need = list(
        dict.fromkeys(
            spec.id_cols + [spec.key_col, spec.pop_ts_col] + spec.value_cols
        )
    )
    kernel = _PartitionKernel(spec, self_join=True)
    return (
        ds.select_columns(need)
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda g: kernel(g.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )
