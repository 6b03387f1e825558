"""Driver-contract queries for the series stages: gap-fill (forward-fill +
linear interpolation on an inferred per-source grid) and the Gorilla XOR /
delta-of-delta codec round-trip, both oracle-checked."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _hourly_avg(sf_dir: str):
    """(source, hour_ts, v = avg cents) series per event_type."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["event_type"],
                "hour_ts": pc.floor_temporal(b["ts"], unit="hour"),
                "cents": pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "hour_ts"])
        .aggregate(Sum("cents", alias_name="_s"), Count(alias_name="_n"))
    )

    def fin(b: pa.Table) -> pa.Table:
        v = np.asarray(b["_s"], dtype=np.float64) / np.asarray(
            b["_n"], dtype=np.float64
        )
        return pa.table(
            {"source": b["source"], "hour_ts": b["hour_ts"], "v": pa.array(v)}
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def q_gapfill_hourly_events(sf_dir: str):
    """Per-source hourly average series -> grid inference (median tick
    delta = 1h) -> forward-fill + linear interpolation. ff is exact (same
    doubles as the oracle's window ffill); lin rounded 6 dp (np.interp vs
    the SQL two-point formula differ at ~1e-13)."""
    from ..stages.gapfill import gapfill

    out = gapfill(
        _hourly_avg(sf_dir),
        source_col="source",
        ts_col="hour_ts",
        value_col="v",
        num_partitions=8,
    )

    def fin(b: pa.Table) -> pa.Table:
        lin = np.asarray(b["v_lin"], dtype=np.float64)
        return pa.table(
            {
                "source": b["source"],
                "grid_ts": b["grid_ts"],
                "ff": b["v_ff"],
                "lin": pa.array(np.rint(lin * 1e6) / 1e6),
                "was_filled": b["was_filled"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_GAPFILL_HOURLY = """
WITH obs AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2),
bounds AS (SELECT source, min(h) AS mn, max(h) AS mx FROM obs GROUP BY 1),
grid AS (
  SELECT b.source, g.g AS grid_ts
  FROM bounds b,
       LATERAL (SELECT unnest(generate_series(b.mn, b.mx, INTERVAL 1 HOUR))
                AS g) g),
j AS (SELECT g.source, g.grid_ts, o.v
      FROM grid g LEFT JOIN obs o ON o.source = g.source AND o.h = g.grid_ts),
f AS (
  SELECT source, grid_ts, v,
         last_value(v IGNORE NULLS) OVER (PARTITION BY source ORDER BY grid_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff,
         last_value(CASE WHEN v IS NOT NULL THEN grid_ts END IGNORE NULLS)
             OVER (PARTITION BY source ORDER BY grid_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         first_value(v IGNORE NULLS) OVER (PARTITION BY source ORDER BY grid_ts
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN grid_ts END IGNORE NULLS)
             OVER (PARTITION BY source ORDER BY grid_ts
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j)
SELECT source, grid_ts, ff,
       CAST(round((CASE WHEN v IS NOT NULL THEN v
            ELSE ff + (nv - ff) * (epoch_us(grid_ts) - epoch_us(pt))
                 / (epoch_us(nt) - epoch_us(pt)) END) * 1e6) AS BIGINT)
           / 1000000.0 AS lin,
       v IS NULL AS was_filled
FROM f
"""


def q_codec_roundtrip_events(sf_dir: str):
    """Gorilla XOR (values) + delta-of-delta (timestamps) compression of
    each event_type's (ts, cents) series, then decode inside the same
    pipeline: output per-source point count and decoded-value sum. Matching
    the oracle's count/sum over the RAW table proves the round-trip is
    exact end-to-end."""
    from ..stages.codec import compress_series, decompress_chunks

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["event_type"],
                "event_ts": b["ts"],
                "cents": pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
            }
        )

    chunks = compress_series(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        source_col="source",
        ts_col="event_ts",
        value_col="cents",
    )

    def verify(b: pa.Table) -> pa.Table:
        raw = decompress_chunks(b)
        src = np.asarray(raw["source"]).astype(str)
        v = np.asarray(raw["value"], dtype=np.float64)
        uniq, inv = np.unique(src, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.bincount(inv, weights=v, minlength=len(uniq)) / 100.0
        return pa.table(
            {
                "source": pa.array(uniq, type=pa.string()),
                "n_points": pa.array(n),
                "value_sum": pa.array(s),
            }
        )

    return chunks.map_batches(verify, batch_format="pyarrow", batch_size=None)


SQL_CODEC_ROUNDTRIP = """
SELECT event_type AS source,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS value_sum
FROM events GROUP BY 1
"""


SERIES_QUERIES = {
    "gapfill_hourly_events": q_gapfill_hourly_events,
    "codec_roundtrip_events": q_codec_roundtrip_events,
}

SERIES_ORACLE_SQL = {
    "gapfill_hourly_events": SQL_GAPFILL_HOURLY,
    "codec_roundtrip_events": SQL_CODEC_ROUNDTRIP,
}


def q_sessionize_events(sf_dir: str):
    """30-minute-gap sessionization per user (session index + position
    within session)."""
    from ..stages.windows import sessionize

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    out = sessionize(
        ds, key_col="user_id", ts_col="ts", id_cols=["event_id"],
        gap_s=1800.0,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"],
                "session_ix": pa.array(
                    np.asarray(b["session_ix"], dtype=np.float64)
                ),
                "session_event_ix": pa.array(
                    np.asarray(b["session_event_ix"], dtype=np.float64)
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL '1800 seconds'
              THEN 0 ELSE 1 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT event_id, user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) - 1 AS session_ix
  FROM g)
SELECT event_id,
       CAST(session_ix AS DOUBLE) AS session_ix,
       CAST(row_number() OVER (PARTITION BY user_id, session_ix ORDER BY ts)
            - 1 AS DOUBLE) AS session_event_ix
FROM s
"""

SERIES_QUERIES["sessionize_events"] = q_sessionize_events
SERIES_ORACLE_SQL["sessionize_events"] = SQL_SESSIONIZE


def q_asof_join_events(sf_dir: str):
    """Backward as-of join: each click gets the latest prior purchase value
    of the same user (distributed point-in-time lookup, stages/asof.py)."""
    from ..stages.asof import asof_join

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])
    left = ev.filter(expr="event_type == 'click'")
    right = ev.filter(expr="event_type == 'purchase'")
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], id_cols=["event_id"], num_partitions=16,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": b["_ts"],
                "value_asof": b["value_asof"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_ASOF_JOIN = """
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, r.value AS value_asof
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_asof_tolerance_events(sf_dir: str):
    """As-of join with a 1-hour staleness bound (tolerance_s)."""
    from ..stages.asof import asof_join

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])
    left = ev.filter(expr="event_type == 'click'")
    right = ev.filter(expr="event_type == 'purchase'")
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], id_cols=["event_id"], tolerance_s=3600.0,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"],
                "ts_us": b["_ts"],
                "value_asof": b["value_asof"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_ASOF_TOLERANCE = """
SELECT l.event_id, epoch_us(l.ts) AS ts_us,
       (SELECT r.value FROM events r
         WHERE r.event_type = 'purchase' AND r.user_id = l.user_id
           AND r.ts <= l.ts AND l.ts - r.ts <= INTERVAL '3600 seconds'
         ORDER BY r.ts DESC LIMIT 1) AS value_asof
FROM events l WHERE l.event_type = 'click'
"""

SERIES_QUERIES["asof_join_events"] = q_asof_join_events
SERIES_ORACLE_SQL["asof_join_events"] = SQL_ASOF_JOIN
SERIES_QUERIES["asof_tolerance_events"] = q_asof_tolerance_events
SERIES_ORACLE_SQL["asof_tolerance_events"] = SQL_ASOF_TOLERANCE


def q_rolling_rows_events(sf_dir: str):
    """5-row rolling window per user (SQL ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW): count/sum/avg/min/max over integer cents — integer sums
    are order-exact, so engine and SQL agree bit-for-bit."""
    from ..stages.windows import rolling_rows

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "cents": pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
            }
        )

    ds = ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
    out = rolling_rows(
        ds, key_col="user_id", ts_col="ts", value_col="cents",
        id_cols=["event_id"], window_rows=5, num_partitions=16,
    )
    return out.map_batches(
        lambda b: b.select(
            ["event_id", "r_count", "r_sum", "r_avg", "r_min", "r_max"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_ROLLING_ROWS = """
WITH c AS (
  SELECT event_id, ts, user_id, round(value * 100) AS cents FROM events)
SELECT event_id,
       CAST(count(*) OVER w AS DOUBLE) AS r_count,
       CAST(sum(cents) OVER w AS DOUBLE) AS r_sum,
       CAST(sum(cents) OVER w AS DOUBLE) / count(*) OVER w AS r_avg,
       min(cents) OVER w AS r_min,
       max(cents) OVER w AS r_max
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""

SERIES_QUERIES["rolling_rows_events"] = q_rolling_rows_events
SERIES_ORACLE_SQL["rolling_rows_events"] = SQL_ROLLING_ROWS


def q_range_join_events(sf_dir: str):
    """Range join: each click joined to every purchase window
    [purchase_ts, purchase_ts + 30min] of the same user
    (stages/rangejoin.py — bucket-replicated intervals, one exchange)."""
    from ..stages.rangejoin import range_join

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])
    points = ev.filter(expr="event_type == 'click'")

    def mk_ivl(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table(
            {
                "user_id": b["user_id"],
                "start_ts": b["ts"],
                "end_ts": _pc.add(
                    b["ts"], pa.scalar(1_800_000_000, pa.duration("us"))
                ),
                "iid": b["event_id"],
                "ival": b["value"],
            }
        )

    intervals = ev.filter(expr="event_type == 'purchase'").map_batches(
        mk_ivl, batch_format="pyarrow", zero_copy_batch=True
    )
    out = range_join(
        points, intervals, on="user_id", point_ts="ts",
        start_ts="start_ts", end_ts="end_ts", point_id_cols=["event_id"],
        interval_cols=["iid", "ival"], max_interval_s=1800.0,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "_ts", "iid", "ival"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_RANGE_JOIN = """
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS _ts,
       i.event_id AS iid, i.value AS ival
FROM (SELECT * FROM events WHERE event_type = 'click') p
JOIN (SELECT * FROM events WHERE event_type = 'purchase') i
  ON p.user_id = i.user_id
 AND p.ts >= i.ts AND p.ts <= i.ts + INTERVAL '1800 seconds'
"""

SERIES_QUERIES["range_join_events"] = q_range_join_events
SERIES_ORACLE_SQL["range_join_events"] = SQL_RANGE_JOIN


def q_zscore_anomaly_events(sf_dir: str):
    """Continuous-aggregate anomaly detection: 1h rollup of cents sums per
    event_type, then each bucket's z-score against its trailing 24 rollup
    rows (ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING). All moments come
    from exact int64 prefix sums (sum and sum-of-squares of integer
    cents), so mean/var/z evaluate the identical float64 expression tree
    on both sides; z is 6dp fixed-point. Composition showcase: the
    detection input is the ROLLUP (O(buckets)), never raw events."""
    import ray.data as rd
    import pyarrow.compute as pc

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def hourly(b: pa.Table) -> pa.Table:
        ts = np.asarray(b["ts"].combine_chunks().cast(pa.int64()))
        cents = np.asarray(
            pc.round(pc.multiply(b["value"], 100.0), ndigits=0)
        ).astype(np.int64)
        src = np.asarray(b["event_type"]).astype(str)
        bucket = ts // 3_600_000_000 * 3_600_000_000
        uniq, inv = np.unique(
            np.char.add(np.char.add(src, "|"), bucket.astype(str)),
            return_inverse=True,
        )
        # integer scatter-add: bincount's float64 weights would lose
        # exactness once a per-(batch,bucket) sum exceeds 2^53
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cents)
        first = np.full(len(uniq), -1, dtype=np.int64)
        np.maximum.at(first, inv, np.arange(len(src)))
        return pa.table(
            {
                "source": pa.array(src[first]),
                "bucket_us": pa.array(bucket[first]),
                "s": pa.array(s),
            }
        )

    from ray.data.aggregate import Sum

    rolled = (
        ev.map_batches(hourly, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "bucket_us"])
        .aggregate(Sum("s", alias_name="s"))
    )

    K = 24

    def detect(part: pa.Table) -> pa.Table:
        src = np.asarray(part["source"]).astype(str)
        b = np.asarray(part["bucket_us"])
        s = np.asarray(part["s"])
        order = np.lexsort((b, src))
        src, b, s = src[order], b[order], s[order]
        n = len(s)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new)
        grp_start = np.repeat(starts, np.diff(np.append(starts, n)))
        # trailing-K window [lo, i-1] within the group, via exclusive
        # int64 prefix sums (exact integer arithmetic)
        i = np.arange(n)
        lo = np.maximum(i - K, grp_start)
        pn = i - lo
        cs0 = np.concatenate([[0], np.cumsum(s)])
        css0 = np.concatenate([[0], np.cumsum(s * s)])
        ps = cs0[i] - cs0[lo]
        pss = css0[i] - css0[lo]
        full = pn == K
        mean = ps / float(K)
        var = pss / float(K) - mean * mean
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (s - mean) / np.sqrt(var)
        z = np.rint(z * 1e6) / 1e6
        keep = full & np.isfinite(z)
        return pa.table(
            {
                "source": pa.array(src[keep]),
                "bucket_ts": pa.array(b[keep]).cast(pa.timestamp("us")),
                "z": pa.array(z[keep]),
                "is_anomaly": pa.array(np.abs(z[keep]) > 3.0),
            }
        )

    # per-source grouping so every trailing window sees its WHOLE series
    # (a per-block map would break windows at block edges); the input is
    # rollup-sized, and each source's buckets land in one group
    return rolled.groupby("source").map_groups(
        detect, batch_format="pyarrow"
    )


SQL_ZSCORE_ANOMALY = """
WITH r AS (
  SELECT event_type AS source,
         date_trunc('hour', ts) AS b,
         SUM(CAST(round(value * 100) AS BIGINT)) AS s
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT source, b, s,
         SUM(s) OVER (PARTITION BY source ORDER BY b
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS ps,
         SUM(s * s) OVER (PARTITION BY source ORDER BY b
                          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS pss,
         COUNT(*) OVER (PARTITION BY source ORDER BY b
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS pn
  FROM r
),
z AS (
  SELECT source, b,
         CAST(round(((CAST(s AS DOUBLE) - CAST(ps AS DOUBLE) / 24.0)
           / sqrt(CAST(pss AS DOUBLE) / 24.0
                  - (CAST(ps AS DOUBLE) / 24.0) * (CAST(ps AS DOUBLE) / 24.0)))
           * 1e6) AS BIGINT) / 1000000.0 AS z
  FROM w WHERE pn = 24
    AND CAST(pss AS DOUBLE) / 24.0
        - (CAST(ps AS DOUBLE) / 24.0) * (CAST(ps AS DOUBLE) / 24.0) > 0
)
SELECT source, b AS bucket_ts, z, z > 3.0 OR z < -3.0 AS is_anomaly
FROM z
"""

SERIES_QUERIES["zscore_anomaly_events"] = q_zscore_anomaly_events
SERIES_ORACLE_SQL["zscore_anomaly_events"] = SQL_ZSCORE_ANOMALY


def q_rollup_retention_events(sf_dir: str):
    """Retention-trimmed tier cascade: 1m/1h/1d cents rollups with
    per-tier TTLs (1m kept 7 days, 1h kept 60 days, 1d forever) against
    the corpus watermark (max event ts). Buckets whose END falls before
    watermark - ttl are dropped at materialization
    (pipelines/rollup._apply_retention); the cascade computes BEFORE
    retention trims the finer tier, so coarse buckets stay exact even
    when their constituents expired."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from .rollup import RollupConfig, rollup_decomposable

    # watermark from parquet column stats (no data read)
    wm = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts"]
    )["ts"].cast(pa.int64())
    watermark_us = int(pc.max(wm).as_py())

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ts": b["ts"],
                "event_type": b["event_type"],
                "cents": pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
            }
        )

    cfg = RollupConfig(
        source_col="event_type",
        ts_col="ts",
        value_col="cents",
        tiers={"1m": 60, "1h": 3600, "1d": 86400},
        aggs=["count", "sum"],
        retention={"1m": 7 * 86400, "1h": 60 * 86400, "1d": None},
        watermark_us=watermark_us,
    )
    tiers = rollup_decomposable(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        cfg,
    )
    out = None
    for name, d in tiers.items():
        d = d.map_batches(
            lambda b, n=name: pa.table(
                {
                    "tier": pa.array([n] * len(b), type=pa.string()),
                    "source": b["source"],
                    "bucket_ts": b["bucket_ts"],
                    "n": b["count"].cast(pa.int64()),
                    "sum_cents": b["sum"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        out = d if out is None else out.union(d)
    return out


SQL_ROLLUP_RETENTION = """
WITH w AS (SELECT CAST(epoch_us(max(ts)) AS BIGINT) AS wm FROM events),
e AS (
  SELECT event_type, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
t AS (
  SELECT '1m' AS tier, event_type AS source,
         date_trunc('minute', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n, SUM(cents) AS sum_cents,
         60000000 AS w_us, CAST(604800 AS BIGINT) AS ttl_s
  FROM e GROUP BY 2, 3
  UNION ALL
  SELECT '1h', event_type, date_trunc('hour', ts),
         CAST(count(*) AS BIGINT), SUM(cents),
         3600000000, CAST(5184000 AS BIGINT)
  FROM e GROUP BY 2, 3
  UNION ALL
  SELECT '1d', event_type, date_trunc('day', ts),
         CAST(count(*) AS BIGINT), SUM(cents),
         86400000000, NULL
  FROM e GROUP BY 2, 3
)
SELECT tier, source, bucket_ts, n, CAST(sum_cents AS BIGINT) AS sum_cents
FROM t, w
WHERE ttl_s IS NULL
   OR CAST(epoch_us(bucket_ts) AS BIGINT) + w_us >= wm - ttl_s * 1000000
"""

SERIES_QUERIES["rollup_retention_events"] = q_rollup_retention_events
SERIES_ORACLE_SQL["rollup_retention_events"] = SQL_ROLLUP_RETENTION


def q_late_rerollup_events(sf_dir: str):
    """North-rule resumability through the correctness gate: stage events
    as an 'early' shard (first 80% by ts), run the time-range-partitioned
    checkpointed rollup (state/checkpoint.checkpointed_rollup_timerange —
    one Parquet file + lineage id + stage metrics per partition), then
    append a 'late' shard (the remaining 20%) and run AGAIN: only the
    partitions whose time ranges the late shard touches recompute (their
    per-partition input fingerprint changed), everything else is skipped
    by lineage. The returned table is the final on-disk rollup — the
    oracle is a plain GROUP BY over ALL events, so the hash-match proves
    the late-data path converges to the full recompute."""
    import glob
    import hashlib
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..state.checkpoint import checkpointed_rollup_timerange
    from .rollup import RollupConfig

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    base = f"/tmp/graft_late_rerollup_{tag}"
    in_dir, out_dir = f"{base}/in", f"{base}/out"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(in_dir)

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    cents = pc.round(pc.multiply(ev["value"], 100.0), ndigits=0)
    ev = pa.table(
        {"ts": ev["ts"], "event_type": ev["event_type"], "cents": cents}
    )
    ts = np.asarray(ev["ts"].combine_chunks().cast(pa.int64()))
    cut = np.quantile(ts, 0.8)
    early = ev.filter(pa.array(ts <= cut))
    late = ev.filter(pa.array(ts > cut))
    # time-sorted shards (the staging layout of a real ingest)
    early = early.take(
        pa.array(np.argsort(np.asarray(early["ts"].combine_chunks().cast(pa.int64())), kind="stable"))
    )
    late = late.take(
        pa.array(np.argsort(np.asarray(late["ts"].combine_chunks().cast(pa.int64())), kind="stable"))
    )
    cfg = RollupConfig(
        source_col="event_type", ts_col="ts", value_col="cents",
        tiers={"1m": 60, "1h": 3600, "1d": 86400},
        aggs=["count", "sum"], num_partitions=8, retention={},
    )
    pq.write_table(early, f"{in_dir}/shard-early.parquet")
    checkpointed_rollup_timerange(in_dir, out_dir, cfg, lane="decomposable")
    pq.write_table(late, f"{in_dir}/shard-late.parquet")
    checkpointed_rollup_timerange(in_dir, out_dir, cfg, lane="decomposable")

    out = rd.read_parquet(sorted(glob.glob(f"{out_dir}/part-*.parquet")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tier": b["tier"],
                "source": b["source"],
                "bucket_ts": b["bucket_ts"],
                "n": b["count"].cast(pa.int64()),
                "sum_cents": b["sum"].cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_LATE_REROLLUP = """
WITH e AS (
  SELECT event_type, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT '1m' AS tier, event_type AS source,
       date_trunc('minute', ts) AS bucket_ts,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM e GROUP BY 2, 3
UNION ALL
SELECT '1h', event_type, date_trunc('hour', ts),
       CAST(count(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
FROM e GROUP BY 2, 3
UNION ALL
SELECT '1d', event_type, date_trunc('day', ts),
       CAST(count(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
FROM e GROUP BY 2, 3
"""

SERIES_QUERIES["late_rerollup_events"] = q_late_rerollup_events
SERIES_ORACLE_SQL["late_rerollup_events"] = SQL_LATE_REROLLUP


def q_counter_increase_events(sf_dir: str):
    """PromQL-style counter deltas over a per-user synthetic byte counter
    (cumulative cents, wrapped at 10^6 to inject resets — both sides
    derive the identical counter): per user in ts order, delta vs lag and
    reset-aware increase (stages/windows.counter_increase)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.windows import counter_increase

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    # deterministic synthetic counter: |cents| wrapped at 1e6 (both sides
    # spell the same arithmetic; resets appear wherever the wrap bites)
    def counter(b: pa.Table) -> pa.Table:
        cents = np.asarray(
            pc.round(pc.multiply(b["value"], 100.0), ndigits=0)
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "ctr": pa.array(np.abs(cents) % 1_000_000),
            }
        )

    return counter_increase(
        ev.map_batches(counter, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id", ts_col="ts", value_col="ctr",
        id_cols=["event_id"],
    )


SQL_COUNTER_INCREASE = """
WITH c AS (
  SELECT event_id, ts, user_id,
         abs(CAST(round(value * 100) AS BIGINT)) % 1000000 AS ctr
  FROM events
),
d AS (
  SELECT event_id,
         ctr - lag(ctr) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS delta,
         ctr
  FROM c
)
SELECT event_id, delta,
       CASE WHEN delta IS NULL THEN NULL
            WHEN delta >= 0 THEN delta
            ELSE ctr END AS increase
FROM d
"""

SERIES_QUERIES["counter_increase_events"] = q_counter_increase_events
SERIES_ORACLE_SQL["counter_increase_events"] = SQL_COUNTER_INCREASE


def q_interval_overlap_events(sf_dir: str):
    """Interval-interval overlap join (stages/rangejoin.
    interval_overlap_join): per user, 'view' activity windows
    [ts, ts+20min) overlap-joined to 'purchase' windows — the
    attribution-style temporal join beside as-of (point-to-latest) and
    range (point-in-interval). Pairs aggregate to (user_id, n_pairs)."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count

    from ..stages.rangejoin import interval_overlap_join

    W = 1_200_000_000  # 20 min in us

    def side(sf, etype, idname):
        ds = _read(sf, "events", columns=["event_id", "user_id", "ts",
                                          "event_type"])

        def f(b: pa.Table) -> pa.Table:
            keep = _pc.equal(b["event_type"], etype)
            t = b.filter(keep)
            tsus = t["ts"].cast(pa.int64())
            return pa.table(
                {
                    idname: t["event_id"],
                    "user_id": t["user_id"],
                    "s": tsus.cast(pa.timestamp("us")),
                    "e": _pc.add(tsus, W).cast(pa.timestamp("us")),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    pairs = interval_overlap_join(
        side(sf_dir, "view", "id_a"),
        side(sf_dir, "purchase", "id_b"),
        on="user_id",
        left_start="s", left_end="e", right_start="s", right_end="e",
        left_cols=["id_a"], right_cols=["id_b"],
        max_interval_s=1200.0,
    )
    agg = pairs.groupby("user_id").aggregate(Count(alias_name="n_pairs"))
    from ..stages.blocks import norm_empty_blocks

    agg = norm_empty_blocks(
        agg, [("user_id", pa.int64()), ("n_pairs", pa.int64())]
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "n_pairs": b["n_pairs"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


SQL_INTERVAL_OVERLAP = """
WITH l AS (
  SELECT event_id AS id_a, user_id,
         epoch_us(ts) AS s_a, epoch_us(ts) + 1200000000 AS e_a
  FROM events WHERE event_type = 'view'),
r AS (
  SELECT event_id AS id_b, user_id,
         epoch_us(ts) AS s_b, epoch_us(ts) + 1200000000 AS e_b
  FROM events WHERE event_type = 'purchase')
SELECT l.user_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM l JOIN r ON l.user_id = r.user_id
             AND l.s_a < r.e_b AND r.s_b < l.e_a
GROUP BY 1
"""

SERIES_QUERIES["interval_overlap_events"] = q_interval_overlap_events
SERIES_ORACLE_SQL["interval_overlap_events"] = SQL_INTERVAL_OVERLAP
