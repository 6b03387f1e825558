"""Per-stage profile of any registry query: runs it, streams the result,
and prints Ray Data's operator-level stats (wall, CPU, rows, block sizes)
so a lane's time budget is visible per stage — the `ds.stats()` feedback
loop for deciding where to optimize.

Usage:
    python tools/profile_query.py <query_name> [sf0.1] [--cpus 32]

Prints the raw ds.stats() text plus a one-line summary (wall, rows out).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    cpus = 32
    if "--cpus" in args:
        i = args.index("--cpus")
        cpus = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf = args[1] if len(args) > 1 else "sf0.1"
    sf_dir = f"/root/testdata/{sf}"

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from ray.data.context import ShuffleStrategy

    rd.DataContext.get_current().shuffle_strategy = (
        ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    )

    from getml_community_ray.pipelines.queries import QUERIES

    if name not in QUERIES:
        print(f"unknown query {name!r}; known: {sorted(QUERIES)[:10]}...")
        return 2

    t0 = time.perf_counter()
    res = QUERIES[name](sf_dir)
    rows = 0
    stats = ""
    if hasattr(res, "iter_batches"):
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            rows += len(b)
        stats = res.stats()
    else:
        rows = len(res)
    wall = time.perf_counter() - t0
    if stats:
        print(stats)
    print(f"\n=== {name} @ {sf}: wall={wall:.3f}s rows={rows} cpus={cpus}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
