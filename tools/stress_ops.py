"""Scale stress for the as-of join: 60M left rows x ~3.75M right rows on
the Zipf-skewed bench corpus (hot source holds a large share of all rows),
(key, time-bucket) split bounding per-task memory.

Usage: python tools/stress_ops.py [n_rows]   (default 60M; corpus reused
from bench.py's generator, created if absent)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    import ray
    import ray.data as rd

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from getml_community_ray.sources.synth import generate_sequences
    from getml_community_ray.stages.asof import asof_join

    corpus = f"/tmp/graft_seq_bench_{n_rows}_0"
    generate_sequences(corpus, n_rows=n_rows, n_shards=max(8, n_rows // 500_000),
                       seed=42, with_tokens=False)

    def read():
        return rd.read_parquet(corpus, columns=["source", "event_ts", "n_tok"])

    def every_16th(b: pa.Table) -> pa.Table:
        return b.take(pa.array(np.arange(0, len(b), 16)))

    t0 = time.perf_counter()
    left = read()
    right = read().map_batches(every_16th, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = asof_join(
        left, right, on="source", left_ts="event_ts", right_ts="event_ts",
        value_cols=["n_tok"], id_cols=[], tolerance_s=3600.0,
        time_bucket_s=6 * 3600.0, num_partitions=64,
    )

    def summarize(b: pa.Table) -> pa.Table:
        v = np.asarray(b["n_tok_asof"].combine_chunks().to_numpy(
            zero_copy_only=False), dtype=np.float64)
        return pa.table(
            {
                "n": pa.array([len(b)], pa.int64()),
                "matched": pa.array([int(np.isfinite(v).sum())], pa.int64()),
                "vsum": pa.array([float(np.nansum(v))]),
            }
        )

    agg = out.map_batches(summarize, batch_format="pyarrow").to_pandas().sum()
    sec = time.perf_counter() - t0
    print(json.dumps({
        "metric": "asof_join stress (Zipf-hot key, (key, 6h-bucket) split)",
        "n_left": int(agg.n), "matched": int(agg.matched),
        "vsum": round(float(agg.vsum), 1),
        "wall_s": round(sec, 1),
        "rows_per_sec": round(agg.n / sec, 0),
        "num_cpus": ncpu,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
