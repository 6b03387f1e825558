"""Recompute the lttb_events pinned-golden fingerprints for both driver
scale factors; paste the printed tuples into queries_keyed._LTTB_PINS.

Run: python tools/pin_lttb.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq

    from getml_community_ray.pipelines.queries_keyed import q_lttb_events

    for sf in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf}"
        n_events = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        r = q_lttb_events(sf_dir)
        print(f"{n_events}: ({r.n_sel[0]!r}, {r.checksum_lo[0]!r}, "
              f"{r.checksum_hi[0]!r}),")
    ray.shutdown()


if __name__ == "__main__":
    main()
