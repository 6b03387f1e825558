"""Driver-contract queries for the keyed ordered-analytics stages
(stages/keyed.py): SQL window functions per key, latest-by-key compaction,
merged-interval coverage. All three are oracle-exact against DuckDB window
functions on the events table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q_window_funcs_events(sf_dir: str):
    """Per-user SQL window functions over the events stream, ordered by
    (ts, event_id): exact int64 running sum of cents, row_number, RANK
    (ties on ts), LAG and delta."""
    from ..stages.keyed import keyed_window_funcs

    ds = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]
    )

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    return keyed_window_funcs(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        key_col="user_id",
        ts_col="ts",
        value_col="cents",
        id_col="event_id",
        num_partitions=8,
    )


SQL_WINDOW_FUNCS = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts, cents,
       SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS cum_cents,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS row_number,
       RANK() OVER (PARTITION BY user_id ORDER BY ts) AS rank,
       LAG(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS lag_cents,
       cents - LAG(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS delta_cents
FROM e
ORDER BY user_id, ts, event_id
"""


def q_latest_by_key_events(sf_dir: str):
    """CDC-style compaction: the newest event row per user (greatest
    (ts, event_id)); per-batch combiner, one candidate exchange."""
    from ..stages.keyed import latest_by_key

    ds = _read(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    return latest_by_key(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        num_partitions=8,
    )


SQL_LATEST_BY_KEY = """
SELECT event_id, user_id, ts, event_type, value
FROM events
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


def q_interval_coverage_events(sf_dir: str):
    """Merged-interval coverage per user: each event spans
    [ts, ts + max(value, 0) seconds); total union length in microseconds,
    exact int64 sweep (sort by start, clip at running max of ends)."""
    from ..stages.keyed import interval_coverage

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def to_iv(b: pa.Table) -> pa.Table:
        s = pc.cast(b["ts"], pa.int64())
        dur = pc.cast(
            pc.round(
                pc.multiply(pc.max_element_wise(b["value"], 0.0), 1e6),
                ndigits=0,
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": b["user_id"],
                "s_us": s,
                "e_us": pc.add(s, dur),
            }
        )

    return interval_coverage(
        ds.map_batches(to_iv, batch_format="pyarrow"),
        key_col="user_id",
        start_us_col="s_us",
        end_us_col="e_us",
        num_partitions=8,
    )


SQL_INTERVAL_COVERAGE = """
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts)
           + CAST(ROUND(GREATEST(value, 0) * 1000000.0, 0) AS BIGINT) AS e
  FROM events
), w AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS pmax
  FROM iv
)
SELECT user_id,
       SUM(GREATEST(e - GREATEST(s, COALESCE(pmax, s)), 0)) AS covered,
       COUNT(*) AS n_intervals
FROM w
GROUP BY user_id
ORDER BY user_id
"""


KEYED_QUERIES = {
    "window_funcs_events": q_window_funcs_events,
    "latest_by_key_events": q_latest_by_key_events,
    "interval_coverage_events": q_interval_coverage_events,
}

KEYED_ORACLE_SQL = {
    "window_funcs_events": SQL_WINDOW_FUNCS,
    "latest_by_key_events": SQL_LATEST_BY_KEY,
    "interval_coverage_events": SQL_INTERVAL_COVERAGE,
}
