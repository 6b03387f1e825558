"""Driver-contract queries for the FastProp propositionalization pipeline
(point-in-time window aggregation, `pipelines/fastprop.py`) with DuckDB
oracles spelling the reference match rule
`t - horizon - memory < pts <= t - horizon` as join predicates.

Exactness: counts/sums/mins/maxes go through integer cents; EWMA/TREND and
stddev are rounded 6 dp fixed-point on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.partitioning import auto_partitions


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _r6(x) -> pa.Array:
    v = np.asarray(x, dtype=np.float64)
    return pa.array(np.rint(v * 1e6) / 1e6)


def _events_cents(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    return ds.map_batches(
        lambda b: b.append_column(
            "cents", pc.round(pc.multiply(b["value"], 100.0), ndigits=0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_fastprop_self_events(sf_dir: str):
    """Self-join FastProp (TimeSeries mode): per event, the same user's
    events in (t - 60s - 2d, t - 60s] — count/sum/avg/min/max/median."""
    from .fastprop import FastPropSpec, time_series_features

    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["cents"],
        aggs=["count", "sum", "avg", "min", "max", "median"],
        id_cols=["event_id"],
        horizon_s=60.0,
        memory_s=2 * 86400.0,
        num_partitions=16,
    )
    out = time_series_features(_events_cents(sf_dir), spec)

    def fin(b: pa.Table) -> pa.Table:
        c = lambda n: np.asarray(b[f"cents__{n}"], dtype=np.float64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "f_count": pa.array(c("count")),
                "f_sum": pa.array(c("sum") / 100.0),
                "f_avg": pa.array(c("avg") / 100.0),
                "f_min": pa.array(c("min") / 100.0),
                "f_max": pa.array(c("max") / 100.0),
                "f_median": pa.array(c("median") / 100.0),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_SELF = """
SELECT p.event_id, p.user_id,
       CAST(count(e.ts) AS DOUBLE) AS f_count,
       COALESCE(CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE), 0.0)
           / 100.0 AS f_sum,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE)
           / CAST(count(e.ts) AS DOUBLE) / 100.0 AS f_avg,
       CAST(MIN(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS f_min,
       CAST(MAX(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS f_max,
       quantile_cont(CAST(round(e.value * 100) AS BIGINT), 0.5) / 100.0 AS f_median
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >  p.ts - INTERVAL '172860 seconds'
 AND e.ts <= p.ts - INTERVAL '60 seconds'
GROUP BY p.event_id, p.user_id
"""


def q_fastprop_daily_users(sf_dir: str):
    """Two-table FastProp: population = per (user, day-end) prediction grid;
    peripheral = events; 7-day memory."""
    from .fastprop import FastPropSpec, fastprop_features

    peri = _events_cents(sf_dir)

    def to_grid(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"], unit="day")
        pts = pc.add(day.cast(pa.int64()), 86400 * 1_000_000).cast(
            pa.timestamp("us")
        )
        return pa.table({"user_id": b["user_id"], "pts": pts})

    pop = (
        _read(sf_dir, "events", columns=["ts", "user_id"])
        .map_batches(to_grid, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "pts"])
        .count()
        .drop_columns(["count()"])
    )

    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="pts",
        peri_ts_col="ts",
        value_cols=["cents"],
        aggs=["count", "sum", "max", "stddev"],
        horizon_s=0.0,
        memory_s=7 * 86400.0,
        num_partitions=auto_partitions(),
    )
    out = fastprop_features(pop, peri, spec)

    def fin(b: pa.Table) -> pa.Table:
        c = lambda n: np.asarray(b[f"cents__{n}"], dtype=np.float64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "pts": b["pts"],
                "f_count": pa.array(c("count")),
                "f_sum": pa.array(c("sum") / 100.0),
                "f_max": pa.array(c("max") / 100.0),
                "f_stddev": _r6(c("stddev") / 100.0),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_DAILY = """
WITH pop AS (
  SELECT DISTINCT user_id,
         date_trunc('day', ts) + INTERVAL 1 DAY AS pts
  FROM events)
SELECT p.user_id, p.pts,
       CAST(count(e.ts) AS DOUBLE) AS f_count,
       COALESCE(CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE), 0.0)
           / 100.0 AS f_sum,
       CAST(MAX(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS f_max,
       CAST(round(stddev_pop(CAST(round(e.value * 100) AS BIGINT) / 100.0) * 1e6)
            AS BIGINT) / 1000000.0 AS f_stddev
FROM pop p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >  p.pts - INTERVAL 7 DAY
 AND e.ts <= p.pts
GROUP BY p.user_id, p.pts
"""


def q_fastprop_lag_buckets(sf_dir: str):
    """Lag-window conditions (FastProp.cpp:1255-1290): two tumbling 1-day
    lag buckets per event."""
    from .fastprop import FastPropSpec, time_series_features

    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["cents"],
        aggs=["count", "sum"],
        id_cols=["event_id"],
        lag_delta_s=86400.0,
        n_lags=2,
        num_partitions=auto_partitions(),
    )
    out = time_series_features(_events_cents(sf_dir), spec)

    def fin(b: pa.Table) -> pa.Table:
        cols = {"event_id": b["event_id"]}
        for i in (0, 1):
            cols[f"cnt_lag{i}"] = pa.array(
                np.asarray(b[f"cents__count__lag{i}"], dtype=np.float64)
            )
            cols[f"sum_lag{i}"] = pa.array(
                np.asarray(b[f"cents__sum__lag{i}"], dtype=np.float64) / 100.0
            )
        return pa.table(cols)

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_LAGS = """
SELECT p.event_id,
       CAST(count(e.ts) FILTER (e.ts > p.ts - INTERVAL 1 DAY) AS DOUBLE)
           AS cnt_lag0,
       COALESCE(CAST(SUM(CAST(round(e.value * 100) AS BIGINT))
                 FILTER (e.ts > p.ts - INTERVAL 1 DAY) AS DOUBLE), 0.0) / 100.0
           AS sum_lag0,
       CAST(count(e.ts) FILTER (e.ts <= p.ts - INTERVAL 1 DAY) AS DOUBLE)
           AS cnt_lag1,
       COALESCE(CAST(SUM(CAST(round(e.value * 100) AS BIGINT))
                 FILTER (e.ts <= p.ts - INTERVAL 1 DAY) AS DOUBLE), 0.0) / 100.0
           AS sum_lag1
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >  p.ts - INTERVAL 2 DAY
 AND e.ts <= p.ts
GROUP BY p.event_id
"""


def q_fastprop_ewma_trend(sf_dir: str):
    """EWMA(1h) + TREND over a (t-6h, t] window — dt = t_pop - t_peri pair
    extraction (Aggregator.hpp:373-427); 6 dp fixed-point both sides.
    Window always contains the row itself (horizon 0), so no empty-window
    NULL-vs-NaN divergence."""
    from .fastprop import FastPropSpec, time_series_features

    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["value"],
        aggs=["ewma_1h", "trend"],
        id_cols=["event_id"],
        horizon_s=0.0,
        memory_s=6 * 3600.0,
        num_partitions=auto_partitions(),
    )
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = time_series_features(ds, spec)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "f_ewma_1h": _r6(b["value__ewma_1h"]),
                "f_trend": _r6(b["value__trend"]),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_EWMA_TREND = """
WITH m AS (
  SELECT p.event_id,
         epoch_us(p.ts) / 1000000.0 - epoch_us(e.ts) / 1000000.0 AS dt,
         e.value AS v
  FROM events p
  JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >  p.ts - INTERVAL 6 HOUR
   AND e.ts <= p.ts)
SELECT event_id,
       CAST(round(SUM(v * exp(ln(0.5) * dt / 3600.0))
                  / SUM(exp(ln(0.5) * dt / 3600.0)) * 1e6) AS BIGINT)
           / 1000000.0 AS f_ewma_1h,
       CAST(round((CASE WHEN var_pop(dt) = 0 THEN avg(v)
                        ELSE regr_intercept(v, dt) END) * 1e6) AS BIGINT)
           / 1000000.0 AS f_trend
FROM m GROUP BY event_id
"""


FASTPROP_QUERIES = {
    "fastprop_self_events": q_fastprop_self_events,
    "fastprop_daily_users": q_fastprop_daily_users,
    "fastprop_lag_buckets": q_fastprop_lag_buckets,
    "fastprop_ewma_trend": q_fastprop_ewma_trend,
}

FASTPROP_ORACLE_SQL = {
    "fastprop_self_events": SQL_FASTPROP_SELF,
    "fastprop_daily_users": SQL_FASTPROP_DAILY,
    "fastprop_lag_buckets": SQL_FASTPROP_LAGS,
    "fastprop_ewma_trend": SQL_FASTPROP_EWMA_TREND,
}


def q_rollup_1h_shape(sf_dir: str):
    """Shape/order statistics lane: skew, kurtosis (non-excess),
    variation coefficient (= var/mean), num_max/num_min, deterministic
    tie-broken mode, count_distinct_over_count, count above/below mean —
    cents-exact where integral, 6 dp fixed-point for the moments."""
    from .rollup import RollupConfig, rollup_holistic

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    ds = ds.map_batches(
        lambda b: pa.table(
            {
                "ts": b["ts"],
                "event_type": b["event_type"],
                "cents": pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cfg = RollupConfig(
        source_col="event_type",
        ts_col="ts",
        value_col="cents",
        tiers={"1h": 3600},
        aggs=[
            "skew", "kurtosis", "variation_coefficient", "num_max", "num_min",
            "mode", "count_distinct_over_count", "count_above_mean",
            "count_below_mean",
        ],
        num_partitions=auto_partitions(),
    )
    out = rollup_holistic(ds, cfg)["1h"]

    def fin(b: pa.Table) -> pa.Table:
        g = lambda n: np.asarray(b[n], dtype=np.float64)
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": b["bucket_ts"],
                "skew": _r6(g("skew")),
                "kurtosis": _r6(g("kurtosis")),
                "vc": _r6(g("variation_coefficient") / 100.0),
                "num_max": pa.array(g("num_max")),
                "num_min": pa.array(g("num_min")),
                "mode": pa.array(g("mode") / 100.0),
                "cdoc": _r6(g("count_distinct_over_count")),
                "n_above_mean": pa.array(g("count_above_mean")),
                "n_below_mean": pa.array(g("count_below_mean")),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_ROLLUP_1H_SHAPE = """
WITH base AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_ts,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
stats AS (
  SELECT source, bucket_ts,
         avg(c) AS mu, stddev_pop(c) AS sigma, var_pop(c) AS v,
         CAST(count(*) AS DOUBLE) AS n, min(c) AS mn, max(c) AS mx,
         CAST(count(DISTINCT c) AS DOUBLE) AS nd
  FROM base GROUP BY 1, 2),
modes AS (
  SELECT source, bucket_ts, c,
         row_number() OVER (PARTITION BY source, bucket_ts
                            ORDER BY count(*) DESC, c ASC) AS rn
  FROM base GROUP BY source, bucket_ts, c)
SELECT s.source, s.bucket_ts,
       CASE WHEN s.mn = s.mx THEN 0.0
            ELSE CAST(round(SUM(pow((b.c - s.mu) / s.sigma, 3)) / s.n * 1e6)
                 AS BIGINT) / 1000000.0 END AS skew,
       CASE WHEN s.mn = s.mx THEN 0.0
            ELSE CAST(round(SUM(pow((b.c - s.mu) / s.sigma, 4)) / s.n * 1e6)
                 AS BIGINT) / 1000000.0 END AS kurtosis,
       CAST(round(s.v / s.mu / 100.0 * 1e6) AS BIGINT) / 1000000.0 AS vc,
       CAST(count(*) FILTER (b.c = s.mx) AS DOUBLE) AS num_max,
       CAST(count(*) FILTER (b.c = s.mn) AS DOUBLE) AS num_min,
       (SELECT m.c FROM modes m
        WHERE m.source = s.source AND m.bucket_ts = s.bucket_ts AND m.rn = 1)
           / 100.0 AS mode,
       CAST(round(s.nd / s.n * 1e6) AS BIGINT) / 1000000.0 AS cdoc,
       CASE WHEN s.mn = s.mx THEN 0.0
            ELSE CAST(count(*) FILTER (b.c > s.mu) AS DOUBLE) END
           AS n_above_mean,
       CASE WHEN s.mn = s.mx THEN 0.0
            ELSE CAST(count(*) FILTER (b.c < s.mu) AS DOUBLE) END
           AS n_below_mean
FROM base b
JOIN stats s USING (source, bucket_ts)
GROUP BY s.source, s.bucket_ts, s.mu, s.sigma, s.v, s.n, s.mn, s.mx, s.nd
"""

FASTPROP_QUERIES["rollup_1h_shape"] = q_rollup_1h_shape
FASTPROP_ORACLE_SQL["rollup_1h_shape"] = SQL_ROLLUP_1H_SHAPE


def q_fastprop_categorical(sf_dir: str):
    """Categorical features of the FastProp grammar (FastProp.cpp:556-644):
    COUNT DISTINCT over a categorical column + a top-category indicator
    (val == 'purchase' -> 1.0) aggregated numerically, per point-in-time
    window. Categoricals ride as integer codes / 0-1 indicator columns."""
    from .fastprop import FastPropSpec, time_series_features

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    _CODES = {"click": 0, "signup": 1, "error": 2, "view": 3, "purchase": 4}

    def prep(b: pa.Table) -> pa.Table:
        et = np.asarray(b["event_type"]).astype(str)
        codes = np.array([_CODES[x] for x in et], dtype=np.float64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "type_code": pa.array(codes),
                "is_purchase": pa.array((et == "purchase").astype(np.float64)),
            }
        )

    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["type_code", "is_purchase"],
        aggs=["count_distinct", "sum"],
        id_cols=["event_id"],
        horizon_s=60.0,
        memory_s=2 * 86400.0,
        num_partitions=auto_partitions(),
    )
    out = time_series_features(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True), spec
    )

    def fin(b: pa.Table) -> pa.Table:
        cd = np.asarray(b["type_code__count_distinct"], dtype=np.float64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "n_distinct_types": pa.array(np.where(np.isnan(cd), 0.0, cd)),
                "n_purchases": pa.array(
                    np.asarray(b["is_purchase__sum"], dtype=np.float64)
                ),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_CATEGORICAL = """
SELECT p.event_id,
       CAST(count(DISTINCT e.event_type) AS DOUBLE) AS n_distinct_types,
       CAST(count(*) FILTER (e.event_type = 'purchase') AS DOUBLE)
           AS n_purchases
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >  p.ts - INTERVAL '172860 seconds'
 AND e.ts <= p.ts - INTERVAL '60 seconds'
GROUP BY p.event_id
"""

FASTPROP_QUERIES["fastprop_categorical"] = q_fastprop_categorical
FASTPROP_ORACLE_SQL["fastprop_categorical"] = SQL_FASTPROP_CATEGORICAL


def q_fastprop_snowflake(sf_dir: str):
    """Snowflake subfeatures (FastProp.cpp:930-980, recursive FastProp):
    child stage computes per-event `sub_count` = same user's events in the
    trailing hour; parent stage aggregates avg/max of that subfeature onto
    a per-(user, day-end) population grid over a 1-day window. Two chained
    fastprop_features calls — a rollup whose input is another rollup."""
    from .fastprop import FastPropSpec, fastprop_features, time_series_features

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    # child: per-event trailing-hour count (needs a value column; count
    # ignores the values, so reuse `value`)
    child_spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["value"],
        aggs=["count"],
        id_cols=["event_id"],
        horizon_s=0.0,
        memory_s=3600.0,
        num_partitions=auto_partitions(),
    )
    sub = time_series_features(ds, child_spec)
    sub = sub.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "sub_count": b["value__count"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # population grid: (user, day-end)
    def to_grid(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"], unit="day")
        pts = pc.add(day.cast(pa.int64()), 86400 * 1_000_000).cast(
            pa.timestamp("us")
        )
        return pa.table({"user_id": b["user_id"], "pts": pts})

    pop = (
        _read(sf_dir, "events", columns=["ts", "user_id"])
        .map_batches(to_grid, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "pts"])
        .count()
        .drop_columns(["count()"])
    )

    parent_spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="pts",
        peri_ts_col="ts",
        value_cols=["sub_count"],
        aggs=["avg", "max"],
        horizon_s=0.0,
        memory_s=86400.0,
        num_partitions=auto_partitions(),
    )
    out = fastprop_features(pop, sub, parent_spec)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "pts": b["pts"],
                "sub_avg": b["sub_count__avg"],
                "sub_max": b["sub_count__max"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_SNOWFLAKE = """
WITH sub AS (
  SELECT p.event_id, p.user_id, p.ts,
         CAST(count(e.ts) AS DOUBLE) AS sub_count
  FROM events p
  LEFT JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >  p.ts - INTERVAL 1 HOUR
   AND e.ts <= p.ts
  GROUP BY p.event_id, p.user_id, p.ts),
pop AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) + INTERVAL 1 DAY AS pts
  FROM events)
SELECT g.user_id, g.pts,
       SUM(s.sub_count) / CAST(count(s.ts) AS DOUBLE) AS sub_avg,
       MAX(s.sub_count) AS sub_max
FROM pop g
LEFT JOIN sub s
  ON s.user_id = g.user_id
 AND s.ts >  g.pts - INTERVAL 1 DAY
 AND s.ts <= g.pts
GROUP BY g.user_id, g.pts
"""

FASTPROP_QUERIES["fastprop_snowflake"] = q_fastprop_snowflake
FASTPROP_ORACLE_SQL["fastprop_snowflake"] = SQL_FASTPROP_SNOWFLAKE


def q_fastprop_ewma_trend_weighted(sf_dir: str):
    """EWMA_TREND_1h (weighted OLS intercept, Aggregator.hpp:212-278) and
    TIME SINCE LAST MAXIMUM (tie-break: latest max-value row,
    Aggregations.hpp:524-615) over a (t-6h, t] self-join window; cents for
    the exact max-equality, 6 dp fixed-point for the results."""
    from .fastprop import FastPropSpec, time_series_features

    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["cents"],
        aggs=["ewma_trend_1h", "time_since_last_maximum"],
        id_cols=["event_id"],
        horizon_s=0.0,
        memory_s=6 * 3600.0,
        num_partitions=auto_partitions(),
    )
    out = time_series_features(_events_cents(sf_dir), spec)

    def fin(b: pa.Table) -> pa.Table:
        et = np.asarray(b["cents__ewma_trend_1h"], dtype=np.float64) / 100.0
        tslm = np.asarray(
            b["cents__time_since_last_maximum"], dtype=np.float64
        )
        return pa.table(
            {
                "event_id": b["event_id"],
                "f_ewma_trend": _r6(et),
                "f_ts_last_max": _r6(tslm),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_EWMA_TREND_W = """
WITH m AS (
  SELECT p.event_id,
         epoch_us(p.ts) / 1000000.0 - epoch_us(e.ts) / 1000000.0 AS x,
         CAST(round(e.value * 100) AS BIGINT) AS c,
         exp(ln(0.5) * (epoch_us(p.ts) / 1000000.0
                        - epoch_us(e.ts) / 1000000.0) / 3600.0) AS w
  FROM events p
  JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >  p.ts - INTERVAL 6 HOUR
   AND e.ts <= p.ts),
s AS (
  SELECT event_id,
         SUM(w) AS sw, SUM(w * x) AS swx, SUM(w * c) AS swy,
         SUM(w * x * x) AS swxx, SUM(w * x * c) AS swxy,
         MAX(c) AS mx
  FROM m GROUP BY event_id),
tsl AS (
  SELECT m.event_id, MIN(m.x) AS dt_last_max
  FROM m JOIN s ON s.event_id = m.event_id AND m.c = s.mx
  GROUP BY m.event_id)
SELECT s.event_id,
       CAST(round((CASE WHEN s.swxx - s.swx * s.swx / s.sw = 0
                        THEN s.swy / s.sw
                        ELSE s.swy / s.sw
                             - (s.swxy - s.swx * s.swy / s.sw)
                               / (s.swxx - s.swx * s.swx / s.sw)
                               * (s.swx / s.sw) END) / 100.0 * 1e6) AS BIGINT)
           / 1000000.0 AS f_ewma_trend,
       CAST(round(tsl.dt_last_max * 1e6) AS BIGINT) / 1000000.0
           AS f_ts_last_max
FROM s JOIN tsl ON tsl.event_id = s.event_id
"""

FASTPROP_QUERIES["fastprop_ewma_trend_weighted"] = q_fastprop_ewma_trend_weighted
FASTPROP_ORACLE_SQL["fastprop_ewma_trend_weighted"] = SQL_FASTPROP_EWMA_TREND_W


def q_rollup_1h_time_stats(sf_dir: str):
    """Time-based vocabulary over 1h buckets: AVG TIME BETWEEN
    ((max_ts-min_ts)/(count-1), 0.0 when count<=1, Aggregator.hpp:428-446)
    and TIME SINCE FIRST MAXIMUM (dt of the EARLIEST max-value row,
    Aggregations.hpp:524-559); dt measured from the bucket END."""
    from .rollup import RollupConfig, rollup_holistic

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    ds = ds.map_batches(
        lambda b: pa.table(
            {
                "ts": b["ts"],
                "event_type": b["event_type"],
                "cents": pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cfg = RollupConfig(
        source_col="event_type",
        ts_col="ts",
        value_col="cents",
        tiers={"1h": 3600},
        aggs=["avg_time_between", "time_since_first_maximum"],
        num_partitions=auto_partitions(),
    )
    out = rollup_holistic(ds, cfg)["1h"]

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": b["bucket_ts"],
                "avg_tb": _r6(b["avg_time_between"]),
                "ts_first_max": _r6(b["time_since_first_maximum"]),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_ROLLUP_1H_TIME_STATS = """
WITH base AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_ts, ts,
         CAST(round(value * 100) AS BIGINT) AS c,
         epoch_us(date_trunc('hour', ts)) / 1000000.0 + 3600.0
           - epoch_us(ts) / 1000000.0 AS dt
  FROM events),
s AS (
  SELECT source, bucket_ts,
         CAST(count(*) AS BIGINT) AS n,
         epoch_us(MAX(ts)) / 1000000.0 - epoch_us(MIN(ts)) / 1000000.0
             AS span,
         MAX(c) AS mx
  FROM base GROUP BY 1, 2),
fm AS (
  SELECT b.source, b.bucket_ts, MAX(b.dt) AS dt_first_max
  FROM base b JOIN s ON s.source = b.source AND s.bucket_ts = b.bucket_ts
                     AND b.c = s.mx
  GROUP BY 1, 2)
SELECT s.source, s.bucket_ts,
       CAST(round((CASE WHEN s.n <= 1 THEN 0.0 ELSE s.span / (s.n - 1) END)
            * 1e6) AS BIGINT) / 1000000.0 AS avg_tb,
       CAST(round(fm.dt_first_max * 1e6) AS BIGINT) / 1000000.0
           AS ts_first_max
FROM s JOIN fm ON fm.source = s.source AND fm.bucket_ts = s.bucket_ts
"""

FASTPROP_QUERIES["rollup_1h_time_stats"] = q_rollup_1h_time_stats
FASTPROP_ORACLE_SQL["rollup_1h_time_stats"] = SQL_ROLLUP_1H_TIME_STATS


def q_rollup_1h_multimetric(sf_dir: str):
    """Multi-value-column rollup: ONE grouping pass computes metrics over
    both `value` (median, cents-exact) and `user_id` (count_distinct) per
    (source, hour)."""
    from .rollup import RollupConfig, rollup_holistic

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id", "value"]
    )
    ds = ds.map_batches(
        lambda b: pa.table(
            {
                "ts": b["ts"],
                "event_type": b["event_type"],
                "cents": pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                "uid": b["user_id"].cast(pa.float64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cfg = RollupConfig(
        source_col="event_type",
        ts_col="ts",
        value_col=["cents", "uid"],
        tiers={"1h": 3600},
        aggs=["median", "count_distinct"],
        num_partitions=auto_partitions(),
    )
    out = rollup_holistic(ds, cfg)["1h"]

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": b["bucket_ts"],
                "value_median": pc.divide(b["cents__median"], 100.0),
                "n_users": b["uid__count_distinct"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_ROLLUP_1H_MULTI = """
SELECT event_type AS source,
       date_trunc('hour', ts) AS bucket_ts,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) / 100.0
           AS value_median,
       CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users
FROM events GROUP BY 1, 2
"""

FASTPROP_QUERIES["rollup_1h_multimetric"] = q_rollup_1h_multimetric
FASTPROP_ORACLE_SQL["rollup_1h_multimetric"] = SQL_ROLLUP_1H_MULTI


# ---------------------------------------------------------------------------
# FastProp grammar extensions through the driver contract: same-unit
# pop-peri difference matrices, category-equality conditioned windows,
# per-vocab-word text occurrence features (reference FastProp.cpp:714-839,
# :1228-1251; Aggregator.cpp:303-335, :371-414)
# ---------------------------------------------------------------------------

def _r6a(x) -> pa.Array:
    v = np.asarray(x, dtype=np.float64)
    return pa.array(np.rint(v * 1e6) / 1e6)


def q_fastprop_popperi_diff(sf_dir: str):
    """Same-unit pop-peri difference feature MATRIX: per event, aggregates
    of (pop_ts - peri_ts) — the time-since family — and of
    (pop_value - peri_value) over the trailing window. Exact SQL twin."""
    from .autofit import AutoFitSpec, Candidate, autofit_features

    spec = AutoFitSpec(
        key_col="user_id", pop_ts_col="ts", peri_ts_col="ts",
        numeric_cols=[], id_cols=["event_id"],
        same_unit_pairs=[("__ts__", "__ts__"), ("value", "value")],
        aggs=[], horizon_s=60.0, memory_s=3600.0, num_partitions=auto_partitions(),
    )
    win = spec.windows()[0]
    cands = [
        Candidate(name="ts_minus_ts__avg", agg="avg", kind="same_unit",
                  value_col="__ts__", pop_col="__ts__", window=win),
        Candidate(name="ts_minus_ts__max", agg="max", kind="same_unit",
                  value_col="__ts__", pop_col="__ts__", window=win),
        Candidate(name="ts_minus_ts__min", agg="min", kind="same_unit",
                  value_col="__ts__", pop_col="__ts__", window=win),
        Candidate(name="value_minus_value__avg", agg="avg", kind="same_unit",
                  value_col="value", pop_col="value", window=win),
        Candidate(name="value_minus_value__min", agg="min", kind="same_unit",
                  value_col="value", pop_col="value", window=win),
    ]
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    feats = autofit_features(ds, ds, spec, cands)

    def fin(b: pa.Table) -> pa.Table:
        cols = {"event_id": b["event_id"]}
        for c in cands:
            cols[c.name] = _r6a(b[c.name])
        return pa.table(cols)

    return feats.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_POPPERI = """
WITH f AS (
  SELECT p.event_id,
         coalesce(SUM(epoch_us(p.ts) / 1000000.0 - epoch_us(e.ts) / 1000000.0)
                  / nullif(CAST(count(e.ts) AS DOUBLE), 0.0), 0.0) AS d_avg,
         coalesce(MAX(epoch_us(p.ts) / 1000000.0 - epoch_us(e.ts) / 1000000.0),
                  0.0) AS d_max,
         coalesce(MIN(epoch_us(p.ts) / 1000000.0 - epoch_us(e.ts) / 1000000.0),
                  0.0) AS d_min,
         coalesce(SUM(p.value - e.value)
                  / nullif(CAST(count(e.ts) AS DOUBLE), 0.0), 0.0) AS v_avg,
         coalesce(MIN(p.value - e.value), 0.0) AS v_min
  FROM events p
  LEFT JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >  p.ts - INTERVAL '3660' SECOND
   AND e.ts <= p.ts - INTERVAL '60' SECOND
  GROUP BY p.event_id, p.ts, p.value
)
SELECT event_id,
       CAST(round(d_avg * 1e6) AS BIGINT) / 1000000.0 AS ts_minus_ts__avg,
       CAST(round(d_max * 1e6) AS BIGINT) / 1000000.0 AS ts_minus_ts__max,
       CAST(round(d_min * 1e6) AS BIGINT) / 1000000.0 AS ts_minus_ts__min,
       CAST(round(v_avg * 1e6) AS BIGINT) / 1000000.0 AS value_minus_value__avg,
       CAST(round(v_min * 1e6) AS BIGINT) / 1000000.0 AS value_minus_value__min
FROM f
"""


def q_fastprop_category_cond(sf_dir: str):
    """Category-equality condition sets in the window grammar: per event,
    aggregates of value restricted to peri rows with event_type = const,
    plus an indicator-sum feature. Exact SQL twin (FILTER clauses)."""
    from .autofit import AutoFitSpec, Candidate, autofit_features

    spec = AutoFitSpec(
        key_col="user_id", pop_ts_col="ts", peri_ts_col="ts",
        numeric_cols=["value"], id_cols=["event_id"],
        categorical_cols=["event_type"],
        category_values={"event_type": ["purchase", "view"]},
        aggs=[], horizon_s=60.0, memory_s=3600.0, num_partitions=auto_partitions(),
    )
    win = spec.windows()[0]
    cands = [
        Candidate(name="value__count__where_event_type=purchase", agg="count",
                  kind="numeric", value_col="value",
                  cond_col="event_type", cond_value="purchase", window=win),
        Candidate(name="value__sum__where_event_type=purchase", agg="sum",
                  kind="numeric", value_col="value",
                  cond_col="event_type", cond_value="purchase", window=win),
        Candidate(name="value__max__where_event_type=view", agg="max",
                  kind="numeric", value_col="value",
                  cond_col="event_type", cond_value="view", window=win),
        Candidate(name="event_type==purchase__sum", agg="sum",
                  kind="indicator", value_col="event_type",
                  cat_value="purchase", window=win),
    ]
    ds = _read(
        sf_dir, "events",
        columns=["event_id", "ts", "user_id", "value", "event_type"],
    )
    feats = autofit_features(ds, ds, spec, cands)

    def fin(b: pa.Table) -> pa.Table:
        cols = {"event_id": b["event_id"]}
        for c in cands:
            cols[c.name] = _r6a(b[c.name])
        return pa.table(cols)

    return feats.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_CATCOND = """
WITH f AS (
  SELECT p.event_id,
         CAST(count(e.ts) FILTER (e.event_type = 'purchase') AS DOUBLE) AS c_p,
         coalesce(CAST(SUM(e.value) FILTER (e.event_type = 'purchase')
                       AS DOUBLE), 0.0) AS s_p,
         coalesce(CAST(MAX(e.value) FILTER (e.event_type = 'view')
                       AS DOUBLE), 0.0) AS m_v,
         coalesce(CAST(SUM(CASE WHEN e.event_type = 'purchase'
                                THEN 1.0 ELSE 0.0 END) AS DOUBLE), 0.0) AS i_p
  FROM events p
  LEFT JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >  p.ts - INTERVAL '3660' SECOND
   AND e.ts <= p.ts - INTERVAL '60' SECOND
  GROUP BY p.event_id
)
SELECT event_id,
       CAST(round(c_p * 1e6) AS BIGINT) / 1000000.0
           AS "value__count__where_event_type=purchase",
       CAST(round(s_p * 1e6) AS BIGINT) / 1000000.0
           AS "value__sum__where_event_type=purchase",
       CAST(round(m_v * 1e6) AS BIGINT) / 1000000.0
           AS "value__max__where_event_type=view",
       CAST(round(i_p * 1e6) AS BIGINT) / 1000000.0
           AS "event_type==purchase__sum"
FROM f
"""


def q_fastprop_vocab_words(sf_dir: str):
    """Per-vocab-word text occurrence features in windows: documents get a
    derived (key, ts) — key = doc_id % 20, ts = epoch + doc_id * 60 s, both
    reproducible in SQL — then word-occurrence value columns feed a
    trailing-window fastprop sum/avg. Wires Vocabulary/TextFieldSplitter
    into the window grammar (Aggregator.cpp:371-414 apply_text)."""
    from ..stages.text import word_occurrence_columns
    from .fastprop import FastPropSpec, time_series_features

    words = ["data", "join", "merge"]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def derive(b: pa.Table) -> pa.Table:
        did = np.asarray(b["doc_id"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text": b["text"],
                "key": pa.array(did % 20),
                "ts": pa.array(
                    1_700_000_000_000_000 + did * 60 * 1_000_000
                ).cast(pa.timestamp("us")),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    ds = word_occurrence_columns(ds, text_col="text", words=words)
    ds = ds.drop_columns(["text"])
    spec = FastPropSpec(
        key_col="key", pop_ts_col="ts", peri_ts_col="ts",
        value_cols=[f"w_{w}" for w in words],
        aggs=["sum", "count", "avg"],
        id_cols=["doc_id"],
        horizon_s=60.0, memory_s=3600.0,
        nan_to_zero=True, num_partitions=auto_partitions(),
    )
    feats = time_series_features(ds, spec)

    def fin(b: pa.Table) -> pa.Table:
        cols = {"doc_id": b["doc_id"]}
        for w in words:
            cols[f"w_{w}__sum"] = b[f"w_{w}__sum"]
            cols[f"w_{w}__avg"] = _r6a(b[f"w_{w}__avg"])
        return pa.table(cols)

    return feats.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def _sql_vocab_words() -> str:
    word_cols = []
    for w in ("data", "join", "merge"):
        occ = (
            f"CAST(len(list_filter(regexp_split_to_array(e.text, '\\s+'), "
            f"x -> x = '{w}')) AS DOUBLE)"
        )
        word_cols.append(
            f"coalesce(CAST(SUM({occ}) AS DOUBLE), 0.0) AS \"w_{w}__sum\",\n"
            f"         CAST(round(coalesce(SUM({occ}) / "
            f"nullif(CAST(count(e.ts) AS DOUBLE), 0.0), 0.0) * 1e6) AS BIGINT)"
            f" / 1000000.0 AS \"w_{w}__avg\""
        )
    sel = ",\n         ".join(word_cols)
    return f"""
WITH d AS (
  SELECT doc_id, text, doc_id % 20 AS key,
         make_timestamp(1700000000000000 + doc_id * 60 * 1000000) AS ts
  FROM documents
)
SELECT p.doc_id,
         {sel}
FROM d p
LEFT JOIN d e
  ON e.key = p.key
 AND e.ts >  p.ts - INTERVAL '3660' SECOND
 AND e.ts <= p.ts - INTERVAL '60' SECOND
GROUP BY p.doc_id
"""


FASTPROP_QUERIES["fastprop_popperi_diff_events"] = q_fastprop_popperi_diff
FASTPROP_ORACLE_SQL["fastprop_popperi_diff_events"] = SQL_FASTPROP_POPPERI
FASTPROP_QUERIES["fastprop_category_cond_events"] = q_fastprop_category_cond
FASTPROP_ORACLE_SQL["fastprop_category_cond_events"] = SQL_FASTPROP_CATCOND
FASTPROP_QUERIES["fastprop_vocab_words_documents"] = q_fastprop_vocab_words
FASTPROP_ORACLE_SQL["fastprop_vocab_words_documents"] = _sql_vocab_words()


def q_fastprop_upper_bound_events(sf_dir: str):
    """Per-row upper_time_stamp bound (Matchmaker.hpp:92-137): each
    peripheral event expires at valid_until = ts + (event_id % 7200)s
    (NULL when event_id % 5 == 0 => never expires); a row matches a window
    only while valid_until + horizon > population ts."""
    from .fastprop import FastPropSpec, fastprop_features

    base = _events_cents(sf_dir)

    def add_upper(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        ts_us = np.asarray(b["ts"].cast(pa.int64()))
        up = ts_us + (eid % 7200) * 1_000_000
        mask = eid % 5 == 0
        arr = pa.array(
            np.where(mask, 0, up), type=pa.int64()
        ).cast(pa.timestamp("us"))
        return b.append_column(
            "valid_until", pc.if_else(pa.array(mask), pa.nulls(len(b), pa.timestamp("us")), arr)
        )

    peri = base.map_batches(add_upper, batch_format="pyarrow", zero_copy_batch=True)
    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["cents"],
        aggs=["count", "sum", "min", "max"],
        id_cols=["event_id"],
        horizon_s=60.0,
        memory_s=2 * 86400.0,
        num_partitions=auto_partitions(),
        upper_ts_col="valid_until",
    )
    out = fastprop_features(base, peri, spec)

    def fin(b: pa.Table) -> pa.Table:
        c = lambda n: np.asarray(b[f"cents__{n}"], dtype=np.float64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "f_count": pa.array(c("count")),
                "f_sum": pa.array(c("sum") / 100.0),
                "f_min": pa.array(c("min") / 100.0),
                "f_max": pa.array(c("max") / 100.0),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FASTPROP_UPPER = """
WITH peri AS (
  SELECT *,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE ts + to_microseconds((event_id % 7200) * 1000000)
         END AS valid_until
  FROM events)
SELECT p.event_id, p.user_id,
       CAST(count(e.ts) AS DOUBLE) AS f_count,
       COALESCE(CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE), 0.0)
           / 100.0 AS f_sum,
       CAST(MIN(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS f_min,
       CAST(MAX(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS f_max
FROM events p
LEFT JOIN peri e
  ON e.user_id = p.user_id
 AND e.ts >  p.ts - INTERVAL '172860 seconds'
 AND e.ts <= p.ts - INTERVAL '60 seconds'
 AND (e.valid_until IS NULL
      OR e.valid_until + INTERVAL '60 seconds' > p.ts)
GROUP BY p.event_id, p.user_id
"""

FASTPROP_QUERIES["fastprop_upper_bound_events"] = q_fastprop_upper_bound_events
FASTPROP_ORACLE_SQL["fastprop_upper_bound_events"] = SQL_FASTPROP_UPPER


def q_fastprop_timesplit_events(sf_dir: str):
    """The bounded-memory (key, time-range) split lane: identical spec to
    fastprop_self_events plus time_bucket_s=3d — partitions become
    (hash(user) % P, 3-day range) with overlap replication, so one hot key
    can never concentrate in a single task. Same oracle as the unsplit
    lane: the split must be result-invariant."""
    from .fastprop import FastPropSpec, time_series_features

    spec = FastPropSpec(
        key_col="user_id",
        pop_ts_col="ts",
        peri_ts_col="ts",
        value_cols=["cents"],
        aggs=["count", "sum", "avg", "min", "max", "median"],
        id_cols=["event_id"],
        horizon_s=60.0,
        memory_s=2 * 86400.0,
        num_partitions=auto_partitions(),
        time_bucket_s=3 * 86400.0,
    )
    out = time_series_features(_events_cents(sf_dir), spec)

    def fin(b: pa.Table) -> pa.Table:
        c = lambda n: np.asarray(b[f"cents__{n}"], dtype=np.float64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "f_count": pa.array(c("count")),
                "f_sum": pa.array(c("sum") / 100.0),
                "f_avg": pa.array(c("avg") / 100.0),
                "f_min": pa.array(c("min") / 100.0),
                "f_max": pa.array(c("max") / 100.0),
                "f_median": pa.array(c("median") / 100.0),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


FASTPROP_QUERIES["fastprop_timesplit_events"] = q_fastprop_timesplit_events
FASTPROP_ORACLE_SQL["fastprop_timesplit_events"] = SQL_FASTPROP_SELF
