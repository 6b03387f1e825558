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


def _tier_widths_ok(tiers: dict[str, int]) -> list[tuple[str, int]]:
    ordered = sorted(tiers.items(), key=lambda kv: kv[1])
    for (_, a), (_, b) in zip(ordered, ordered[1:]):
        if b % a != 0:
            raise ValueError(f"tier widths must nest: {a}s does not divide {b}s")
    return ordered


def rollup_decomposable(ds, cfg: RollupConfig) -> dict[str, "object"]:
    """Fast lane. Returns {tier_name: Dataset} of finalized rollups.

    The only wide operation is a groupby over pre-combined partial states of
    the FINEST tier; coarser tiers aggregate the finer tier's states (tiny).
    """
    from ray.data.aggregate import Max, Min, Sum

    ordered = _tier_widths_ok(cfg.tiers)
    finest_name, finest_w = ordered[0]

    partials = ds.map_batches(
        lambda b: R.partial_states(
            b,
            source_col=cfg.source_col,
            ts_col=cfg.ts_col,
            value_col=cfg.value_col,
            width_s=finest_w,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def merge(d):
        return d.groupby(["source", "bucket"]).aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("sum", alias_name="sum"),
            Min("min", alias_name="min"),
            Max("max", alias_name="max"),
            Min("first_key", alias_name="first_key"),
            Max("last_key", alias_name="last_key"),
        )

    merged = {finest_name: merge(partials)}
    prev_name, prev_w = finest_name, finest_w
    for name, w in ordered[1:]:
        cascaded = merged[prev_name].map_batches(
            lambda b, fw=prev_w, tw=w: R.cascade_partials(
                b, from_width_s=fw, to_width_s=tw
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        merged[name] = merge(cascaded)
        prev_name, prev_w = name, w

    out = {}
    for name, w in ordered:
        t = merged[name].map_batches(
            lambda b, ww=w: R.finalize_partials(b, width_s=ww),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out[name] = _apply_retention(t, cfg, name)
    return out


def rollup_holistic(ds, cfg: RollupConfig) -> dict[str, "object"]:
    """Full-vocabulary lane: one hash shuffle, all tiers per partition."""
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
        [cfg.source_col, cfg.ts_col, cfg.value_col]
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
    )
    all_tiers = parted.groupby("_part").map_groups(
        lambda t: stage(t.drop_columns(["_part"])), batch_format="pyarrow"
    )
    out = {}
    for name, _ in ordered:
        t = all_tiers.filter(expr=f"tier == '{name}'").drop_columns(["tier"])
        out[name] = _apply_retention(t, cfg, name)
    return out


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
