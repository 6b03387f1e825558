"""Driver-contract queries for the keyed ordered-analytics stages
(stages/keyed.py): SQL window functions per key, latest-by-key compaction,
merged-interval coverage, time-weighted average, pivot/melt reshapes and
LTTB downsampling — oracle-checked against DuckDB on the events/lineitem
tables (LTTB: pinned-golden, the algorithm is not SQL-expressible)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.partitioning import auto_partitions


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
    )


SQL_WINDOW_FUNCS = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts, cents,
       CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS cum_cents,
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
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pmax, s)), 0)) AS BIGINT)
           AS covered,
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


def q_time_weighted_avg_events(sf_dir: str):
    """Time-weighted average of cents per user (TimescaleDB time_weight
    'Linear' analog): exact int64 trapezoid accumulator, one division."""
    from ..stages.keyed import time_weighted_avg

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "t_us": pc.cast(b["ts"], pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    return time_weighted_avg(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id", ts_us_col="t_us", value_col="cents",
        id_col="event_id",
    )


SQL_TIME_WEIGHTED_AVG = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS v
  FROM events
), w AS (
  SELECT user_id, t, v,
         LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt,
         LAG(v) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pv
  FROM e
)
SELECT user_id,
       CAST(SUM(CASE WHEN pt IS NULL THEN 0
                     ELSE (v + pv) * (t - pt) END) AS BIGINT) AS area2,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS span_us,
       CAST(CAST(SUM(CASE WHEN pt IS NULL THEN 0
                          ELSE (v + pv) * (t - pt) END) AS DOUBLE)
            / 2.0 / (MAX(t) - MIN(t)) AS DOUBLE) AS twa
FROM w
GROUP BY user_id
HAVING MAX(t) > MIN(t)
ORDER BY user_id
"""

KEYED_QUERIES["time_weighted_avg_events"] = q_time_weighted_avg_events
KEYED_ORACLE_SQL["time_weighted_avg_events"] = SQL_TIME_WEIGHTED_AVG


def q_pivot_events(sf_dir: str):
    """Long->wide pivot: per-user count columns for a fixed category list
    (c_click/c_view/c_purchase + c_other); bincount combiner + native sum
    merge, O(keys x categories) exchange."""
    from ..stages.groupby import pivot_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_counts(
        ds, key_col="user_id", cat_col="event_type",
        categories=["click", "view", "purchase"],
    )


SQL_PIVOT = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS c_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS c_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS c_purchase,
       CAST(SUM(CASE WHEN event_type NOT IN ('click', 'view', 'purchase')
                     THEN 1 ELSE 0 END) AS BIGINT) AS c_other
FROM events
GROUP BY user_id
ORDER BY user_id
"""

KEYED_QUERIES["pivot_events"] = q_pivot_events
KEYED_ORACLE_SQL["pivot_events"] = SQL_PIVOT


def q_melt_lineitem(sf_dir: str):
    """Wide->long unpivot of three lineitem measures (pandas melt / SQL
    UNPIVOT twin); stateless, shuffle-free."""
    from ..stages.keyed import melt

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                 "l_tax"],
    )
    return melt(
        ds,
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_discount", "l_tax"],
        var_name="measure", value_name="val",
    )


SQL_MELT = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
       CAST(l_quantity AS DOUBLE) AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', CAST(l_discount AS DOUBLE)
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', CAST(l_tax AS DOUBLE)
FROM lineitem
"""

KEYED_QUERIES["melt_lineitem"] = q_melt_lineitem
KEYED_ORACLE_SQL["melt_lineitem"] = SQL_MELT


def q_lttb_events(sf_dir: str):
    """LTTB downsampling of each user's cents series to 20 points.
    Selection is inherently sequential (not SQL-expressible), so the
    oracle is a PINNED GOLDEN in the gbm_lineitem_price style: the
    selection is deterministic end to end, the query returns an
    order-independent fingerprint (row count + xor of splitmix64 over the
    packed selected rows), and the SQL twin pins the expected fingerprint
    per scale factor (selected by the events row count). The per-point
    algorithm itself is verified against an independent reference
    implementation in tests/test_keyed.py."""
    import pandas as pd

    from ..kernels.hashing import splitmix64
    from ..stages.keyed import lttb_downsample

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "t_us": pc.cast(b["ts"], pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    sel = lttb_downsample(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id", ts_us_col="t_us", value_col="cents", n_out=20,
    ).to_pandas()
    packed = (
        sel["user_id"].to_numpy(np.int64) * np.int64(1_000_003)
        + sel["t_us"].to_numpy(np.int64)
        + sel["cents"].to_numpy(np.int64)
    )
    h = splitmix64(packed.view(np.uint64))
    checksum = int(np.bitwise_xor.reduce(h)) if len(h) else 0
    return pd.DataFrame(
        {
            "n_sel": [float(len(sel))],
            "checksum_lo": [float(checksum & 0xFFFFFFFF)],
            "checksum_hi": [float(checksum >> 32)],
        }
    )


# Pinned-golden (see q_lttb_events docstring): recomputed-and-verified
# across fresh sessions at both driver scale factors; events row count
# selects the pin; an unpinned sf yields NULLs -> loud mismatch.
SQL_LTTB_GOLDEN = """
WITH n AS (SELECT count(*) AS c FROM events)
SELECT
  CASE c WHEN 1000 THEN {n1}  WHEN 10000 THEN {n2}  END AS n_sel,
  CASE c WHEN 1000 THEN {l1}  WHEN 10000 THEN {l2}  END AS checksum_lo,
  CASE c WHEN 1000 THEN {h1}  WHEN 10000 THEN {h2}  END AS checksum_hi
FROM n
"""

KEYED_QUERIES["lttb_events"] = q_lttb_events
# goldens filled by tools/pin_lttb.py (see below); placeholder NULLs until
# pinned would fail loudly, so the entry is added only when pinned values
# exist in _LTTB_PINS.
_LTTB_PINS = {
    # sf events-rowcount -> (n_sel, checksum_lo, checksum_hi)
    1000: (300.0, 665473647.0, 2377386109.0),
    10000: (3000.0, 217679978.0, 2770337654.0),
}
KEYED_ORACLE_SQL["lttb_events"] = SQL_LTTB_GOLDEN.format(
    n1=_LTTB_PINS[1000][0], l1=_LTTB_PINS[1000][1], h1=_LTTB_PINS[1000][2],
    n2=_LTTB_PINS[10000][0], l2=_LTTB_PINS[10000][1], h2=_LTTB_PINS[10000][2],
)


def q_cusum_changepoint_events(sf_dir: str):
    """Offline CUSUM changepoint per user over the cents stream: the
    all-integer cross-multiplied statistic |n*prefix_i - i*total| with the
    argmax row (ties earliest (ts, event_id)) — exact int64 on both sides."""
    from ..stages.keyed import cusum_changepoint

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
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

    return cusum_changepoint(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", value_col="cents",
        id_col="event_id",
    )


SQL_CUSUM = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS pre,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS i,
         CAST(SUM(cents) OVER (PARTITION BY user_id) AS BIGINT) AS tot,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM e
)
SELECT user_id, n AS n_rows,
       CAST(ABS(n * pre - i * tot) AS BIGINT) AS cusum_stat,
       i AS cp_i, ts AS cp_ts
FROM w
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id
    ORDER BY CAST(ABS(n * pre - i * tot) AS BIGINT) DESC, ts, event_id) = 1
ORDER BY user_id
"""

KEYED_QUERIES["cusum_changepoint_events"] = q_cusum_changepoint_events
KEYED_ORACLE_SQL["cusum_changepoint_events"] = SQL_CUSUM


def q_mad_anomaly_events(sf_dir: str):
    """Robust per-user outlier counting: |x - median| > 1.5 * MAD carried
    out in exact doubled-integer arithmetic (med2 = 2*median,
    mad22 = 2*median(|2x - med2|), anomaly <=> 4*dev > 3*mad22)."""
    from ..stages.keyed import mad_anomaly_counts

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    return mad_anomaly_counts(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id", value_col="cents", k_num=3, k_den=2,
    )


SQL_MAD = """
WITH e AS (
  SELECT user_id, CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
  FROM events
), m AS (
  SELECT user_id, COUNT(*) AS n_rows,
         CAST(2 * MEDIAN(cents) AS BIGINT) AS med2
  FROM e GROUP BY user_id
), d AS (
  SELECT e.user_id, ABS(2 * e.cents - m.med2) AS dev, m.med2, m.n_rows
  FROM e JOIN m USING (user_id)
), md AS (
  SELECT user_id, CAST(2 * MEDIAN(dev) AS BIGINT) AS mad22
  FROM d GROUP BY user_id
)
SELECT d.user_id, MIN(d.n_rows) AS n_rows, MIN(d.med2) AS med2,
       MIN(md.mad22) AS mad22,
       CAST(SUM(CASE WHEN 4 * d.dev > 3 * md.mad22 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_anomalies
FROM d JOIN md USING (user_id)
GROUP BY d.user_id
ORDER BY d.user_id
"""

KEYED_QUERIES["mad_anomaly_events"] = q_mad_anomaly_events
KEYED_ORACLE_SQL["mad_anomaly_events"] = SQL_MAD


def _cents_prep(b: pa.Table) -> pa.Table:
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


def q_ohlc_daily_events(sf_dir: str):
    """Daily OHLC candlestick bars per user over the cents stream —
    decomposable batch-combiner partials (open/close carry their (ts, id)
    argmin/argmax witness), one hash exchange, integer-exact vs the
    FIRST_VALUE-window SQL twin (stages/keyed.ohlc_bars)."""
    from ..stages.keyed import ohlc_bars

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return ohlc_bars(
        ds.map_batches(_cents_prep, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", value_col="cents",
        id_col="event_id", bucket_s=86400,
    )


SQL_OHLC = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT user_id,
         (tus // 86400000000) * 86400000000 AS bucket_us,
         cents,
         FIRST_VALUE(cents) OVER (
             PARTITION BY user_id, (tus // 86400000000) * 86400000000
             ORDER BY tus, event_id) AS open_v,
         FIRST_VALUE(cents) OVER (
             PARTITION BY user_id, (tus // 86400000000) * 86400000000
             ORDER BY tus DESC, event_id DESC) AS close_v
  FROM e
)
SELECT user_id, bucket_us, MIN(open_v) AS open_v, MAX(cents) AS high_v,
       MIN(cents) AS low_v, MIN(close_v) AS close_v,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_v
FROM w
GROUP BY 1, 2
ORDER BY 1, 2
"""

KEYED_QUERIES["ohlc_daily_events"] = q_ohlc_daily_events
KEYED_ORACLE_SQL["ohlc_daily_events"] = SQL_OHLC


def q_acf_events(sf_dir: str):
    """Per-user autocorrelation raw moments at row lags 1..3 — one hash
    exchange, shifted-mask integer scatter-adds; the five exact integer
    sums per (user, lag) match the LAG-window SQL twin bit-for-bit
    (stages/keyed.acf_keyed)."""
    from ..stages.keyed import acf_keyed

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return acf_keyed(
        ds.map_batches(_cents_prep, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", value_col="cents",
        id_col="event_id", lags=(1, 2, 3),
    )


def _sql_acf_lag(lag: int) -> str:
    return f"""
    SELECT user_id, {lag} AS lag, cents AS b,
           LAG(cents, {lag}) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS a
    FROM e"""


SQL_ACF = f"""
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
  FROM events
), l AS (
  SELECT * FROM ({_sql_acf_lag(1)})
  UNION ALL SELECT * FROM ({_sql_acf_lag(2)})
  UNION ALL SELECT * FROM ({_sql_acf_lag(3)})
)
SELECT user_id, CAST(lag AS BIGINT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(a) AS BIGINT) AS sa,
       CAST(SUM(b) AS BIGINT) AS sb,
       CAST(SUM(a * a) AS BIGINT) AS saa,
       CAST(SUM(b * b) AS BIGINT) AS sbb,
       CAST(SUM(a * b) AS BIGINT) AS sab
FROM l
WHERE a IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""

KEYED_QUERIES["acf_events"] = q_acf_events
KEYED_ORACLE_SQL["acf_events"] = SQL_ACF


def q_gap_detect_events(sf_dir: str):
    """Per-user silence detection: gaps (consecutive-row ts deltas > 1h)
    counted + max + total silent microseconds, exact int64 — the
    monitoring dual of gapfill (stages/keyed.gap_detect)."""
    from ..stages.keyed import gap_detect

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return gap_detect(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        threshold_s=3600,
    )


SQL_GAP = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events
), d AS (
  SELECT user_id,
         tus - LAG(tus) OVER (
             PARTITION BY user_id ORDER BY tus, event_id) AS delta
  FROM e
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CASE WHEN delta > 3600000000 THEN 1 END), 0)
            AS BIGINT) AS n_gaps,
       CAST(COALESCE(MAX(CASE WHEN delta > 3600000000 THEN delta END), 0)
            AS BIGINT) AS max_gap_us,
       CAST(COALESCE(SUM(CASE WHEN delta > 3600000000 THEN delta END), 0)
            AS BIGINT) AS total_gap_us
FROM d
GROUP BY 1
ORDER BY 1
"""

KEYED_QUERIES["gap_detect_events"] = q_gap_detect_events
KEYED_ORACLE_SQL["gap_detect_events"] = SQL_GAP


def q_funnel_events(sf_dir: str):
    """Ordered funnel view->click->purchase per user with a 3-day
    per-step window: greedy earliest matching, one hash exchange, one
    vectorized masked segmented-min pass per step
    (stages/keyed.funnel_depth)."""
    from ..stages.keyed import funnel_depth

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel_depth(
        ds, key_col="user_id", ts_col="ts", type_col="event_type",
        steps=["view", "click", "purchase"], window_s=3 * 86400,
    )


_FUNNEL_W = 3 * 86400 * 1_000_000

SQL_FUNNEL = f"""
WITH u1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY 1
), u2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN u1 ON e.user_id = u1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > u1.t1
        AND epoch_us(e.ts) <= u1.t1 + {_FUNNEL_W}
  GROUP BY 1
), u3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN u2 ON e.user_id = u2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > u2.t2
        AND epoch_us(e.ts) <= u2.t2 + {_FUNNEL_W}
  GROUP BY 1
), allu AS (SELECT DISTINCT user_id FROM events)
SELECT a.user_id,
       CAST(CASE WHEN t1 IS NULL THEN 0 ELSE 1 END
            + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
            + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS depth,
       t1, t2, t3
FROM allu a
LEFT JOIN u1 USING (user_id)
LEFT JOIN u2 USING (user_id)
LEFT JOIN u3 USING (user_id)
ORDER BY 1
"""

KEYED_QUERIES["funnel_events"] = q_funnel_events
KEYED_ORACLE_SQL["funnel_events"] = SQL_FUNNEL


def q_cohort_retention_events(sf_dir: str):
    """Weekly cohort-retention triangle over events: cohort = week bucket
    of a user's first event; n_keys = distinct users active at each
    (cohort, week offset). One exchange + O(distinct pairs) partials +
    one tiny integer groupby (stages/keyed.cohort_retention)."""
    from ..stages.keyed import cohort_retention

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return cohort_retention(
        ds, key_col="user_id", ts_col="ts", bucket_s=604_800,
    )


SQL_COHORT = """
WITH f AS (
  SELECT user_id,
         MIN(epoch_us(ts) // 604800000000 * 604800000000) AS coh
  FROM events GROUP BY 1
), a AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 604800000000 * 604800000000 AS b
  FROM events
)
SELECT f.coh AS cohort_us,
       CAST((a.b - f.coh) // 604800000000 AS BIGINT) AS "offset",
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""

KEYED_QUERIES["cohort_retention_events"] = q_cohort_retention_events
KEYED_ORACLE_SQL["cohort_retention_events"] = SQL_COHORT


def q_threshold_episodes_events(sf_dir: str):
    """Per-user threshold-exceedance episodes (gaps-and-islands; the
    alert-firing-period primitive): maximal runs of consecutive events
    with value > 60 in (ts, event_id) order, one output row per episode
    with exact int64 bounds/counts and the run's exact max
    (stages/keyed.threshold_episodes)."""
    from ..stages.keyed import threshold_episodes

    ds = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]
    )
    return threshold_episodes(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="value", threshold=60.0,
    )


SQL_EPISODES = """
WITH f AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id, value,
         (value > 60.0) AS above,
         ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY tus, event_id) AS rn,
         ROW_NUMBER() OVER (
             PARTITION BY user_id, (value > 60.0)
             ORDER BY tus, event_id) AS rn2
  FROM events
),
g AS (SELECT * FROM f WHERE above),
e AS (
  SELECT user_id,
         MIN(tus) AS start_us, MAX(tus) AS end_us,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(value) AS v_max
  FROM g GROUP BY user_id, rn - rn2
)
SELECT user_id,
       ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY start_us) - 1 AS episode_ix,
       start_us, end_us, n_events, v_max
FROM e
ORDER BY 1, 2
"""

KEYED_QUERIES["threshold_episodes_events"] = q_threshold_episodes_events
KEYED_ORACLE_SQL["threshold_episodes_events"] = SQL_EPISODES


def q_xcorr_events(sf_dir: str):
    """Cross-correlation of the hourly click vs purchase count series at
    lags 0-3: exact int64 raw moments (n, sx, sy, sxx, syy, sxy) on the
    dense hour grid, zeros filled (stages/keyed.xcorr_counts). Pearson r
    per lag is one closed-form expression over the row."""
    from ..stages.keyed import xcorr_counts

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    return xcorr_counts(
        ds, ts_col="ts", type_col="event_type", type_x="click",
        type_y="purchase", bucket_s=3600, lags=(0, 1, 2, 3),
    )


SQL_XCORR = """
WITH c AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS b, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
),
bounds AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM c),
grid AS (
  SELECT unnest(generate_series(lo, hi, 3600000000)) AS b FROM bounds
),
s AS (
  SELECT g.b,
         COALESCE(MAX(CASE WHEN c.event_type = 'click' THEN c.c END), 0) AS x,
         COALESCE(MAX(CASE WHEN c.event_type = 'purchase' THEN c.c END), 0) AS y
  FROM grid g LEFT JOIN c ON c.b = g.b GROUP BY g.b
)
SELECT CAST(l.lag AS BIGINT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(a.x) AS BIGINT) AS sx,
       CAST(SUM(b2.y) AS BIGINT) AS sy,
       CAST(SUM(a.x * a.x) AS BIGINT) AS sxx,
       CAST(SUM(b2.y * b2.y) AS BIGINT) AS syy,
       CAST(SUM(a.x * b2.y) AS BIGINT) AS sxy
FROM (VALUES (0), (1), (2), (3)) l(lag)
JOIN s a ON TRUE
JOIN s b2 ON b2.b = a.b + l.lag * 3600000000
GROUP BY 1 ORDER BY 1
"""

KEYED_QUERIES["xcorr_events"] = q_xcorr_events
KEYED_ORACLE_SQL["xcorr_events"] = SQL_XCORR


def q_sax_events(sf_dir: str):
    """SAX symbolization of each user's daily value profile
    (stages/keyed.sax_words): 4 six-hour PAA segments per day, symbol =
    breakpoints (25/50/75) exceeded by the segment's exact integer mean
    comparison (sum_cents > bp·n), empty segment = sentinel; the day's
    word packs symbols base-5. Integer-exact end to end."""
    from ..stages.keyed import sax_words

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    return sax_words(
        ds.map_batches(cents, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", cents_col="cents",
        word_s=86400, paa=4, breakpoints_cents=(2500, 5000, 7500),
    )


SQL_SAX = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS c
  FROM events
),
segs AS (
  SELECT user_id, (tus // 86400000000) * 86400000000 AS win,
         (tus % 86400000000) // 21600000000 AS seg,
         CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2, 3
),
wins AS (SELECT DISTINCT user_id, win FROM segs),
grid AS (
  SELECT user_id, win, gs.seg
  FROM wins, LATERAL (SELECT unnest(generate_series(0, 3)) AS seg) gs
),
sym AS (
  SELECT g.user_id, g.win, g.seg,
         CASE WHEN s.n IS NULL THEN 4
              ELSE (CASE WHEN s.s > 2500 * s.n THEN 1 ELSE 0 END
                  + CASE WHEN s.s > 5000 * s.n THEN 1 ELSE 0 END
                  + CASE WHEN s.s > 7500 * s.n THEN 1 ELSE 0 END)
         END AS sym,
         COALESCE(s.n, 0) AS n
  FROM grid g LEFT JOIN segs s
    ON s.user_id = g.user_id AND s.win = g.win AND s.seg = g.seg
)
SELECT user_id, win AS window_us,
       CAST(SUM(sym * CAST(POWER(5, seg) AS BIGINT)) AS BIGINT) AS word,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM sym GROUP BY 1, 2 ORDER BY 1, 2
"""

KEYED_QUERIES["sax_events"] = q_sax_events
KEYED_ORACLE_SQL["sax_events"] = SQL_SAX


def q_interarrival_hist_events(sf_dir: str):
    """HDR-style inter-arrival latency histogram: per-user consecutive
    deltas bucketed by bit length (searchsorted over the power-of-two
    table — no float log2), merged corpus-wide
    (stages/keyed.interarrival_hist)."""
    from ..stages.keyed import interarrival_hist

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return interarrival_hist(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
    )


SQL_IAH = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events
), d AS (
  SELECT tus - LAG(tus) OVER (
             PARTITION BY user_id ORDER BY tus, event_id) AS delta
  FROM e
)
SELECT CAST(CASE WHEN delta = 0 THEN 0 ELSE LENGTH(BIN(delta)) END
            AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_deltas
FROM d WHERE delta IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

KEYED_QUERIES["interarrival_hist_events"] = q_interarrival_hist_events
KEYED_ORACLE_SQL["interarrival_hist_events"] = SQL_IAH


def q_transition_counts_events(sf_dir: str):
    """User-journey Markov transition matrix: per-user consecutive
    event_type pairs counted corpus-wide
    (stages/keyed.transition_counts)."""
    from ..stages.keyed import transition_counts

    ds = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return transition_counts(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        state_col="event_type",
    )


SQL_TRANSITIONS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events
), p AS (
  SELECT user_id, event_type AS to_state,
         LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY tus, event_id) AS from_state
  FROM e
)
SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
FROM p WHERE from_state IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

KEYED_QUERIES["transition_counts_events"] = q_transition_counts_events
KEYED_ORACLE_SQL["transition_counts_events"] = SQL_TRANSITIONS


def q_seasonal_baseline_events(sf_dir: str):
    """Seasonal hour-of-week baseline + anomaly counts per
    (event_type, phase): anomalous ⇔ |value·n − sum| > n·30.00, the
    exact integer cross-multiplied deviation test against the phase's
    corpus mean (stages/keyed.seasonal_baseline_anomalies). Two
    streaming passes; the profile broadcasts, the raw table never
    shuffles."""
    from ..stages.keyed import seasonal_baseline_anomalies

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "ts": b["ts"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    return seasonal_baseline_anomalies(
        ds.map_batches(cents, batch_format="pyarrow"),
        type_col="event_type", ts_col="ts", cents_col="cents",
        bucket_s=3600, period=168, threshold_cents=3000,
    )


SQL_SEASONAL_BASE = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 168 AS phase,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS c
  FROM events
),
p AS (
  SELECT event_type, phase, CAST(SUM(c) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
)
SELECT e.event_type, CAST(e.phase AS BIGINT) AS phase, p.n,
       p.s AS sum_cents,
       CAST(COALESCE(SUM(
           CASE WHEN ABS(e.c * p.n - p.s) > p.n * 3000 THEN 1 END), 0)
           AS BIGINT) AS n_anomalous
FROM e JOIN p USING (event_type, phase)
GROUP BY 1, 2, 3, 4 ORDER BY 1, 2
"""

KEYED_QUERIES["seasonal_baseline_events"] = q_seasonal_baseline_events
KEYED_ORACLE_SQL["seasonal_baseline_events"] = SQL_SEASONAL_BASE


def q_irate_events(sf_dir: str):
    """PromQL-irate analog per (user, hour): exact int64 delta of the last
    two samples' cents and their microsecond spacing; per-batch combiner
    collapses to <= 2 rows per group before the one exchange
    (stages/keyed.irate_last_two)."""
    from ..stages.keyed import irate_last_two

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

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

    return irate_last_two(
        ds.map_batches(to_cents, batch_format="pyarrow",
                       zero_copy_batch=True),
        key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="cents", width_s=3600,
    )


SQL_IRATE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents,
         date_trunc('hour', ts) AS bucket_ts
  FROM events
), r AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id, bucket_ts
      ORDER BY ts DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id, bucket_ts,
       MAX(CASE WHEN rn = 1 THEN cents END)
         - MAX(CASE WHEN rn = 2 THEN cents END) AS dv,
       epoch_us(MAX(CASE WHEN rn = 1 THEN ts END))
         - epoch_us(MAX(CASE WHEN rn = 2 THEN ts END)) AS dt_us
FROM r WHERE rn <= 2
GROUP BY 1, 2 HAVING count(*) = 2
"""

KEYED_QUERIES["irate_events"] = q_irate_events
KEYED_ORACLE_SQL["irate_events"] = SQL_IRATE


def q_tier_delta_events(sf_dir: str):
    """Stage COMPOSITION over the tier cascade: 1h decomposable rollup of
    cents per event_type, then the per-source consecutive-bucket delta of
    the hourly sum (stages/keyed.keyed_delta) — the derivative-over-tier
    query every monitoring stack runs against its continuous aggregates."""
    from ..stages.keyed import keyed_delta
    from .queries import _events_rollup_base
    from .rollup import RollupConfig, rollup_decomposable

    cfg = RollupConfig(
        source_col="event_type",
        ts_col="ts",
        value_col="cents",
        tiers={"1h": 3600},
        aggs=["count", "sum"],
        num_partitions=auto_partitions(),
    )
    t1h = rollup_decomposable(_events_rollup_base(sf_dir), cfg)["1h"]

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": b["bucket_ts"],
                "sum_cents": pc.cast(pc.round(b["sum"]), pa.int64()),
            }
        )

    return keyed_delta(
        t1h.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        key_col="source", order_col="bucket_ts", value_col="sum_cents",
    )


SQL_TIER_DELTA = """
WITH h AS (
  SELECT event_type AS source,
         date_trunc('hour', ts) AS bucket_ts,
         CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS BIGINT)
             AS sum_cents
  FROM events GROUP BY 1, 2
)
SELECT source, bucket_ts, sum_cents,
       sum_cents - LAG(sum_cents) OVER (
           PARTITION BY source ORDER BY bucket_ts) AS delta
FROM h
"""

KEYED_QUERIES["tier_delta_events"] = q_tier_delta_events
KEYED_ORACLE_SQL["tier_delta_events"] = SQL_TIER_DELTA


def q_align_series_events(sf_dir: str):
    """Align two event-count series on a common hourly grid with a FULL
    OUTER hash join (buckets where only one series fired survive with a
    zero on the other side) — the series-alignment primitive behind every
    multi-metric dashboard; exchange is O(distinct buckets) after the
    per-batch count combiners."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..stages.blocks import norm_empty_blocks
    from ..stages.joins import hash_join
    from ..stages.rollup import ts_to_us

    W = 3600 * 1_000_000

    def hourly(etype: str, out: str):
        ds = _read(sf_dir, "events", columns=["ts", "event_type"])

        def part(b: pa.Table) -> pa.Table:
            sel = pc.equal(b["event_type"], etype)
            ts = ts_to_us(b["ts"].combine_chunks())[np.asarray(sel)]
            if len(ts) == 0:
                return pa.table(
                    {"bucket_us": pa.array([], type=pa.int64()),
                     out: pa.array([], type=pa.int64())}
                )
            bkt = (ts // W) * W
            u, c = np.unique(bkt, return_counts=True)
            return pa.table(
                {"bucket_us": pa.array(u), out: pa.array(c.astype(np.int64))}
            )

        agg = (
            ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=65536)
            .groupby("bucket_us")
            .aggregate(Sum(out, alias_name=out))
        )
        return norm_empty_blocks(
            agg, [("bucket_us", pa.int64()), (out, pa.int64())]
        )

    joined = hash_join(
        hourly("click", "n_click"), hourly("error", "n_error"),
        on="bucket_us", how="full_outer",
    )

    def fin(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return pa.table(
                {"bucket_ts": pa.array([], type=pa.timestamp("us")),
                 "n_click": pa.array([], type=pa.int64()),
                 "n_error": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "bucket_ts": b["bucket_us"].cast(pa.timestamp("us")),
                "n_click": pc.coalesce(b["n_click"], pa.scalar(0, pa.int64())),
                "n_error": pc.coalesce(b["n_error"], pa.scalar(0, pa.int64())),
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow",
                              zero_copy_batch=True)


SQL_ALIGN_SERIES = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'click' GROUP BY 1
), e AS (
  SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT COALESCE(c.b, e.b) AS bucket_ts,
       COALESCE(c.n, 0) AS n_click,
       COALESCE(e.n, 0) AS n_error
FROM c FULL OUTER JOIN e ON c.b = e.b
"""

KEYED_QUERIES["align_series_events"] = q_align_series_events
KEYED_ORACLE_SQL["align_series_events"] = SQL_ALIGN_SERIES


def q_grouping_sets_events(sf_dir: str):
    """SQL GROUPING SETS ((type, day), (type), (day), ()) in ONE input
    pass: finest-level combiner + packed exchange, coarser levels folded
    from the finest (stages/groupby.grouping_sets_counts) — the OLAP
    subtotal/cube query without re-scanning per level."""
    import numpy as np

    from ..stages.groupby import grouping_sets_counts
    from ..stages.rollup import ts_to_us

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ts": b["ts"],
                "event_type": b["event_type"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    DAY = 86400 * 1_000_000

    def day_us(b: pa.Table):
        return (ts_to_us(b["ts"].combine_chunks()) // DAY) * DAY

    out = grouping_sets_counts(
        ds.map_batches(to_cents, batch_format="pyarrow",
                       zero_copy_batch=True),
        dim_a="event_type", dim_b_us=day_us, value_col="cents",
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["a"],
                "bucket_ts": b["b_us"].cast(pa.timestamp("us")),
                "n": b["n"],
                "sum_cents": b["s"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_GROUPING_SETS = """
SELECT event_type AS source,
       date_trunc('day', ts) AS bucket_ts,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM events
GROUP BY GROUPING SETS ((1, 2), (1), (2), ())
"""

KEYED_QUERIES["grouping_sets_events"] = q_grouping_sets_events
KEYED_ORACLE_SQL["grouping_sets_events"] = SQL_GROUPING_SETS


def q_grouped_quantiles_events(sf_dir: str):
    """Per-event-type exact p50/p95 of cents WITHOUT per-key sorts:
    keyed multi-pass histogram refinement — one streaming scan per pass,
    O(keys x quantiles) driver state (stages/quantiles.
    grouped_exact_quantiles)."""
    from ..stages.quantiles import grouped_exact_quantiles

    def make_ds():
        ds = _read(sf_dir, "events", columns=["event_type", "value"])
        return ds.map_batches(
            lambda b: pa.table(
                {
                    "event_type": b["event_type"],
                    "cents": pc.cast(
                        pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    out = grouped_exact_quantiles(
        make_ds, key_col="event_type", value_col="cents", q_pcts=[50, 95]
    )
    return out.rename_columns(["source", "q_pct", "value"])


SQL_GROUPED_QUANTILES = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
), n AS (
  SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1
), r AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn
  FROM v
)
SELECT r.event_type AS source, CAST(qs.q_pct AS BIGINT) AS q_pct,
       r.c AS value
FROM (VALUES (50), (95)) qs(q_pct)
JOIN n ON TRUE
JOIN r ON r.event_type = n.event_type
      AND r.rn = GREATEST(1, CAST(CEIL(qs.q_pct * n.n / 100.0) AS BIGINT))
ORDER BY 1, 2
"""

KEYED_QUERIES["grouped_quantiles_events"] = q_grouped_quantiles_events
KEYED_ORACLE_SQL["grouped_quantiles_events"] = SQL_GROUPED_QUANTILES


def q_enrich_asof_tier_events(sf_dir: str):
    """Feature-store read path: enrich each event with the stats of the
    LAST COMPLETED 1h rollup bucket of its type (bucket end <= event ts,
    within a 6h lookback) — an as-of join of the raw stream against the
    continuous aggregate (stages/asof.asof_join over the tier output).
    Counts events per (type, matched bucket) to keep the output
    aggregate-sized for the oracle."""
    import numpy as np

    from ray.data.aggregate import Count

    from ..stages.asof import asof_join
    from ..stages.blocks import norm_empty_blocks
    from .queries import _events_rollup_base
    from .rollup import RollupConfig, rollup_decomposable

    cfg = RollupConfig(
        source_col="event_type",
        ts_col="ts",
        value_col="cents",
        tiers={"1h": 3600},
        aggs=["count", "sum"],
        num_partitions=auto_partitions(),
    )
    t1h = rollup_decomposable(_events_rollup_base(sf_dir), cfg)["1h"]

    def tier_prep(b: pa.Table) -> pa.Table:
        # a bucket is COMPLETE at bucket_ts + 1h: that's its as-of time
        end_us = pc.add(b["bucket_ts"].cast(pa.int64()),
                        3600 * 1_000_000)
        return pa.table(
            {
                "event_type": b["source"],
                "avail_ts": end_us.cast(pa.timestamp("us")),
                "hour_n": b["count"].cast(pa.float64()),
            }
        )

    right = t1h.map_batches(tier_prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    left = _read(sf_dir, "events", columns=["event_id", "event_type", "ts"])
    joined = asof_join(
        left, right,
        on="event_type", left_ts="ts", right_ts="avail_ts",
        value_cols=["hour_n"], id_cols=["event_id"],
        tolerance_s=6 * 3600.0,
    )

    def to_groups(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or len(b) == 0:
            return pa.table(
                {"event_type": pa.array([], type=pa.string()),
                 "hour_n": pa.array([], type=pa.float64()),
                 "n_events": pa.array([], type=pa.int64())}
            )
        et = np.asarray(b["event_type"]).astype(str)
        hn = np.asarray(b["hour_n_asof"], dtype=np.float64)
        hn = np.where(np.isnan(hn), -1.0, hn)
        ue, ei = np.unique(et, return_inverse=True)
        uh, hi = np.unique(hn, return_inverse=True)
        key = ei.astype(np.int64) * len(uh) + hi
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"event_type": pa.array(ue[uk // len(uh)], type=pa.string()),
             "hour_n": pa.array(uh[uk % len(uh)]),
             "n_events": pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(to_groups, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby(["event_type", "hour_n"])
        .aggregate(Sum("n_events", alias_name="n_events"))
    )
    return norm_empty_blocks(
        agg,
        [("event_type", pa.string()), ("hour_n", pa.float64()),
         ("n_events", pa.int64())],
    )


SQL_ENRICH_ASOF_TIER = """
WITH h AS (
  SELECT event_type,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS avail_ts,
         CAST(count(*) AS DOUBLE) AS hour_n
  FROM events GROUP BY 1, 2
), j AS (
  SELECT e.event_type,
         COALESCE(
           (SELECT hour_n FROM h
            WHERE h.event_type = e.event_type
              AND h.avail_ts <= e.ts
              AND epoch_us(e.ts) - epoch_us(h.avail_ts) <= CAST(21600000000 AS BIGINT)
            ORDER BY h.avail_ts DESC LIMIT 1),
           -1.0) AS hour_n
  FROM events e
)
SELECT event_type, hour_n, CAST(count(*) AS BIGINT) AS n_events
FROM j GROUP BY 1, 2
"""

KEYED_QUERIES["enrich_asof_tier_events"] = q_enrich_asof_tier_events
KEYED_ORACLE_SQL["enrich_asof_tier_events"] = SQL_ENRICH_ASOF_TIER


def q_shuffle_events(sf_dir: str):
    """Deterministic global shuffle (stages/packing.deterministic_shuffle):
    the training-output permutation as a pure function of row identity —
    reproducible at any parallelism, shard-recomputable, no global sort
    (top-bit sharding + per-shard lexsort)."""
    from ..stages.packing import deterministic_shuffle

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])
    return deterministic_shuffle(
        ds, id_col="event_id", seed=7, num_shards=64
    )


def _sql_shuffle_events() -> str:
    from ..stages.packing import deterministic_shuffle_sql

    return deterministic_shuffle_sql(
        "events", id_col="event_id", seed=7,
        select_cols=["event_id", "event_type"],
    )


KEYED_QUERIES["shuffle_events"] = q_shuffle_events
KEYED_ORACLE_SQL["shuffle_events"] = _sql_shuffle_events()


def q_ecdf_events(sf_dir: str):
    """Exact ECDF / percent-rank annotation of the events value column
    (stages/quantiles.exact_ecdf): O(distinct-cents) histogram exchange +
    broadcast prefix LUT, stateless gather — rows never shuffle."""
    from ..stages.quantiles import exact_ecdf

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    return exact_ecdf(
        ds.map_batches(to_cents, batch_format="pyarrow",
                       zero_copy_batch=True),
        value_col="cents", keep_cols=["event_id"],
    )


SQL_ECDF = """
WITH e AS (
  SELECT event_id, CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, cents,
       CAST(rank() OVER (ORDER BY cents) - 1 AS BIGINT) AS n_less,
       CAST(rank() OVER (ORDER BY cents) - 1 AS DOUBLE)
           / (count(*) OVER () - 1) AS pct_rank
FROM e
"""

KEYED_QUERIES["ecdf_events"] = q_ecdf_events
KEYED_ORACLE_SQL["ecdf_events"] = SQL_ECDF


def q_stratified_sample_events(sf_dir: str):
    """Stratified subsample with EXACT per-stratum quotas
    (stages/packing.stratified_sample): each event_type keeps exactly
    floor(n * 1/5) rows, the smallest-splitmix64(event_id) ones —
    composition-preserving train-split sampling, deterministic at any
    parallelism."""
    from ..stages.packing import stratified_sample

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])
    return stratified_sample(
        ds, key_col="event_type", id_col="event_id", num=1, den=5
    )


def _sql_stratified_events() -> str:
    from ..stages.packing import stratified_sample_sql

    return stratified_sample_sql(
        "events", key_col="event_type", id_col="event_id", num=1, den=5,
        select_cols=["event_id", "event_type"],
    )


KEYED_QUERIES["stratified_sample_events"] = q_stratified_sample_events
KEYED_ORACLE_SQL["stratified_sample_events"] = _sql_stratified_events()


def q_checksum_events(sf_dir: str):
    """Order-invariant dataset checksum (stages/integrity.dataset_checksum):
    chained splitmix64 per row over (event_id, user_id, cents), summed mod
    2^64 — the copy-verification digest that is identical under any block
    order, partitioning or parallelism. One streaming pass, two int64
    limb sums per batch exchanged."""
    from ..stages.integrity import dataset_checksum

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    return dataset_checksum(
        ds.map_batches(to_cents, batch_format="pyarrow",
                       zero_copy_batch=True),
        int_cols=["event_id", "user_id", "cents"],
    )


def _sql_checksum_events() -> str:
    from ..stages.integrity import dataset_checksum_sql

    return dataset_checksum_sql(
        "(SELECT event_id, user_id, "
        "CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents FROM events)",
        int_cols=["event_id", "user_id", "cents"],
    )


KEYED_QUERIES["checksum_events"] = q_checksum_events
KEYED_ORACLE_SQL["checksum_events"] = _sql_checksum_events()


def q_weighted_quantiles_events(sf_dir: str):
    """Exact weighted quantiles (stages/quantiles.weighted_exact_quantiles):
    p50/p90/p99 of cents weighted by a deterministic integer weight —
    multi-pass histogram refinement summing WEIGHTS per bucket, no sort,
    all-integer rank arithmetic shared with the SQL twin."""
    from ..stages.quantiles import weighted_exact_quantiles

    def make_ds():
        ds = _read(sf_dir, "events", columns=["event_id", "value"])

        def prep(b: pa.Table) -> pa.Table:
            eid = np.asarray(b["event_id"], dtype=np.int64)
            return pa.table(
                {
                    "cents": pc.cast(
                        pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                        pa.int64(),
                    ),
                    "wt": pa.array(eid % 7 + 1),
                }
            )

        return ds.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True)

    return weighted_exact_quantiles(
        make_ds, value_col="cents", weight_col="wt", q_pcts=[50, 90, 99]
    )


SQL_WEIGHTED_QUANTILES = """
WITH w AS (
  SELECT CAST(ROUND(value * 100.0, 0) AS BIGINT) AS v,
         event_id % 7 + 1 AS wt
  FROM events),
tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS W FROM w),
cum AS (
  SELECT v, SUM(wv) OVER (ORDER BY v) AS cw
  FROM (SELECT v, SUM(wt) AS wv FROM w GROUP BY v)),
qs AS (SELECT * FROM (VALUES (50), (90), (99)) AS t(q))
SELECT CAST(qs.q AS BIGINT) AS q_pct,
       (SELECT MIN(v) FROM cum, tot
        WHERE cw >= GREATEST(1, (qs.q * tot.W + 99) // 100)) AS value
FROM qs
"""

KEYED_QUERIES["weighted_quantiles_events"] = q_weighted_quantiles_events
KEYED_ORACLE_SQL["weighted_quantiles_events"] = SQL_WEIGHTED_QUANTILES
