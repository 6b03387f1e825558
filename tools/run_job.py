"""Resumable tiered-rollup job — the `ray job submit` entry point.

    ray job submit -- python tools/run_job.py \
        --input /data/corpus --output /data/rollups --lane decomposable

Each output hash partition is one Parquet file; `_manifest.json` records
per-partition lineage IDs and stage metrics. A rerun (after a crash or with
new input shards) recomputes only partitions whose lineage is missing or
stale — skipped partitions are filtered out BEFORE the shuffle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="directory of parquet shards")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lane",
                    choices=["decomposable", "holistic", "fused-decomp",
                             "fused-holistic", "fused-both"],
                    default="decomposable",
                    help="decomposable/holistic: checkpointed shuffle lanes "
                         "with per-partition lineage resume. fused-*: the "
                         "clustered single-pass lanes with the in-band side "
                         "channel writing straight to the output sink "
                         "(atomic per-span files; a rerun overwrites "
                         "idempotently) — requires event-time-clustered "
                         "input (footer guard, or --assume-clustered)")
    ap.add_argument("--assume-clustered", action="store_true",
                    help="vouch per-source ts non-overlap for fused lanes "
                         "(verified exactly post-hoc; wrong vouch fails "
                         "loudly)")
    ap.add_argument("--timerange", action="store_true",
                    help="time-range partitions: late shards re-roll only "
                         "the partitions they overlap")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--tiers", default="1m:60,1h:3600,1d:86400")
    ap.add_argument("--aggs", default="")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--ts-col", default="event_ts")
    ap.add_argument("--value-col", default="n_tok")
    ap.add_argument("--retention", default="",
                    help="per-tier TTL seconds, e.g. 1m:86400,1h:604800 "
                         "(requires --watermark)")
    ap.add_argument("--watermark", type=int, default=0,
                    help="watermark as epoch MICROseconds; buckets ending "
                         "before watermark - ttl are dropped per tier")
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="only for standalone runs; ray job submit sets this")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR", **kw)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from ray.data.context import ShuffleStrategy

    rd.DataContext.get_current().shuffle_strategy = (
        ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    )

    from getml_community_ray.pipelines.rollup import RollupConfig
    from getml_community_ray.state.checkpoint import (
        checkpointed_rollup,
        checkpointed_rollup_timerange,
    )

    tiers = {}
    for part in args.tiers.split(","):
        name, w = part.split(":")
        tiers[name] = int(w)
    cfg_kwargs = dict(
        source_col=args.source_col,
        ts_col=args.ts_col,
        value_col=args.value_col,
        tiers=tiers,
        num_partitions=args.partitions,
        cache_intermediates=False,
    )
    if args.aggs:
        cfg_kwargs["aggs"] = args.aggs.split(",")
    if args.retention:
        ret = {}
        for part in args.retention.split(","):
            name, ttl = part.split(":")
            ret[name] = int(ttl)
        cfg_kwargs["retention"] = ret
        cfg_kwargs["watermark_us"] = args.watermark or None
    cfg = RollupConfig(**cfg_kwargs)

    if args.lane.startswith("fused-"):
        import glob

        import pyarrow as pa

        from getml_community_ray.pipelines.rollup import (
            rollup_both_clustered_fused,
            rollup_decomposable_clustered_fused,
            rollup_holistic_clustered_fused,
        )

        if args.timerange:
            ap.error("--timerange is the checkpointed lanes' resume mode; "
                     "fused-* lanes resume via their idempotent per-span "
                     "sink files")
        paths = sorted(glob.glob(os.path.join(args.input, "*.parquet")))

        def _mk(sink, **extra):
            kw = dict(cfg_kwargs, sink_dir=sink, **extra)
            if args.assume_clustered:
                kw["assume_clustered"] = True
            return RollupConfig(**kw)

        def _rows(ds):
            import ray as _ray

            return sum(
                int(pa.compute.sum(t["rows"]).as_py() or 0)
                for t in _ray.get(ds.to_arrow_refs()) if t.num_rows
            )

        t0 = time.perf_counter()
        if args.lane == "fused-decomp":
            rows_out = _rows(
                rollup_decomposable_clustered_fused(paths, _mk(args.output))
            )
        elif args.lane == "fused-holistic":
            rows_out = _rows(
                rollup_holistic_clustered_fused(paths, _mk(args.output))
            )
        else:
            d, h = rollup_both_clustered_fused(
                paths,
                _mk(os.path.join(args.output, "decomp")),
                _mk(os.path.join(args.output, "holistic")),
            )
            rows_out = _rows(d) + _rows(h)
        print(json.dumps({
            "lane": args.lane,
            "rows_out": rows_out,
            "wall_s": round(time.perf_counter() - t0, 2),
            "sink": args.output,
        }))
        ray.shutdown()
        return

    t0 = time.perf_counter()
    runner = checkpointed_rollup_timerange if args.timerange else checkpointed_rollup
    res = runner(args.input, args.output, cfg, lane=args.lane)
    wall = time.perf_counter() - t0
    m = res["manifest"]
    rows_out = sum(r.rows_out for r in m.records.values())
    print(
        json.dumps(
            {
                "lane": args.lane,
                "computed": len(res["computed"]),
                "skipped": len(res["skipped"]),
                "rows_out": rows_out,
                "wall_s": round(wall, 2),
                "manifest": m.path,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
