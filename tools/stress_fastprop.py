"""Hot-key FastProp stress (VERDICT round-1 item 10 done-criterion).

Generates a deterministic events corpus with a pathological hot key
(~60% of all rows on key 1), then runs the point-in-time window lane
twice — unsplit vs (key, time-range) split (`FastPropSpec.time_bucket_s`,
overlap-replicated) — and checks the outputs are identical via row count
+ per-feature checksums. Run:

    python tools/stress_fastprop.py [n_rows]     # default 40M

Prints one JSON line: wall times for both lanes, equality verdict, rows.
The split lane is the bounded-memory path: no single task ever holds the
whole hot key, so the job survives at any corpus scale; the unsplit lane
holds the hot key's full partition in one task (fine on this box, fatal
at 100x).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
N_SHARDS = 64
OUT = f"/tmp/graft_fastprop_stress_{N_ROWS}"
# constant event density (~0.12 events/s on the hot key) regardless of
# scale, so the per-row window stays ~420 events and wall time scales
# linearly with rows rather than quadratically
DAYS = 30.0 * N_ROWS / 500_000
AGGS = os.environ.get("GRAFT_STRESS_AGGS", "count,sum,avg,min,max").split(",")
SKIP_UNSPLIT = os.environ.get("GRAFT_STRESS_SKIP_UNSPLIT") == "1"


def _gen():
    import numpy as np
    import ray

    os.makedirs(OUT, exist_ok=True)

    @ray.remote(num_cpus=1)
    def write(shard: int) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = f"{OUT}/shard-{shard:05d}.parquet"
        if os.path.exists(path):
            return
        lo = shard * N_ROWS // N_SHARDS
        hi = (shard + 1) * N_ROWS // N_SHARDS
        n = hi - lo
        rng = np.random.default_rng(777 + shard)
        # ~60% of rows on key 1, rest zipf-ish over 10k keys
        hot = rng.random(n) < 0.6
        key = rng.integers(2, 10_000, size=n, dtype=np.int64)
        key[hot] = 1
        ts_us = rng.integers(
            0, int(DAYS * 86400 * 1e6), size=n, dtype=np.int64
        )
        tbl = pa.table(
            {
                "eid": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "key": pa.array(key),
                "ts": pa.array(ts_us).cast(pa.timestamp("us")),
                "val": pa.array(rng.random(n)),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=200_000)
        os.replace(tmp, path)

    ray.get([write.remote(k) for k in range(N_SHARDS)])


def _run(split: bool) -> dict:
    import numpy as np
    import ray.data as rd

    from getml_community_ray.pipelines.fastprop import (
        FastPropSpec,
        time_series_features,
    )

    # bucket width: ~120 buckets across the span, never below the window.
    # total groups = num_partitions x n_buckets; a tiny bucket at a long
    # span (e.g. 7200 s over 2400 days = 28.8k buckets x 256 partitions)
    # floods the scheduler with millions of micro-groups — size BOTH knobs
    # to the data, the product is what a task holds
    bucket_s = max(2 * 3600.0, DAYS * 86400.0 / 120.0)
    spec = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=["val"], aggs=list(AGGS),
        id_cols=["eid"], horizon_s=60.0, memory_s=3600.0,
        num_partitions=256,
        time_bucket_s=bucket_s if split else 0.0,
    )
    ds = rd.read_parquet(OUT)
    t0 = time.monotonic()
    rows = 0
    sums = None
    cols = None
    for b in time_series_features(ds, spec).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        rows += len(b)
        if cols is None:
            cols = [c for c in b.column_names if c.startswith("val__")]
        part = np.array(
            [np.nansum(np.asarray(b[c], dtype=np.float64)) for c in cols]
        )
        sums = part if sums is None else sums + part
    return {
        "wall_s": round(time.monotonic() - t0, 1),
        "rows": rows,
        "checksums": {c: round(float(s), 3) for c, s in zip(cols, sums)},
    }


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    _gen()
    split = _run(split=True)
    out = {
        "metric": "fastprop hot-key stress (60% of rows on one key)",
        "n_rows": N_ROWS,
        "aggs": AGGS,
        "split_lane": split,
    }
    if SKIP_UNSPLIT:
        # at large N the unsplit lane holds the whole hot key in one task
        # by construction — the failure mode the split exists to remove;
        # equality vs unsplit is proven at 500k (same code path)
        out["unsplit_lane"] = "skipped (single-task hot key; see 500k run)"
    else:
        unsplit = _run(split=False)
        out["unsplit_lane"] = unsplit
        out["results_equal"] = split["rows"] == unsplit["rows"] and all(
            abs(split["checksums"][c] - unsplit["checksums"][c])
            <= 1e-6 * max(1.0, abs(unsplit["checksums"][c]))
            for c in split["checksums"]
        )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
