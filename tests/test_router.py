"""Continuous-aggregate tier router (pipelines/router.py): cover tiling
property + routed answer vs direct computation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from getml_community_ray.pipelines.router import (
    US,
    route_range_aggregate,
    tier_cover,
)

WIDTHS = [60 * US, 3600 * US, 86400 * US]


def test_cover_tiles_exactly():
    rng = np.random.default_rng(7)
    for _ in range(300):
        a = int(rng.integers(0, 40 * 86400 * US))
        b = a + int(rng.integers(1, 35 * 86400 * US))
        spans = tier_cover(a, b, WIDTHS)
        # pairwise disjoint + union == [a, b)
        spans_sorted = sorted(spans, key=lambda s: s[1])
        cur = a
        for i, lo, hi in spans_sorted:
            assert lo == cur and hi > lo
            if i >= 0:
                w = WIDTHS[i]
                assert lo % w == 0 and hi % w == 0
            cur = hi
        assert cur == b
        # raw edges are sub-finest-width
        for i, lo, hi in spans:
            if i == -1:
                assert hi - lo < WIDTHS[0]


def test_cover_degenerate():
    assert tier_cover(5, 5, WIDTHS) == []
    # entirely inside one finest bucket -> one raw span
    assert tier_cover(10, 20, WIDTHS) == [(-1, 10, 20)]
    # exactly one coarse bucket
    assert tier_cover(0, 86400 * US, WIDTHS) == [(2, 0, 86400 * US)]


@pytest.mark.usefixtures("ray_session")
def test_routed_answer_matches_direct(tmp_path):
    import ray.data as rd

    from getml_community_ray.pipelines.rollup import (
        RollupConfig,
        rollup_decomposable,
    )

    rng = np.random.default_rng(11)
    n = 20_000
    ts_us = np.sort(rng.integers(0, 9 * 86400 * US, size=n))
    src = rng.choice(["a", "b", "c"], size=n)
    cents = rng.integers(0, 100_000, size=n).astype(np.float64)
    tbl = pa.table(
        {
            "ts": pa.array(ts_us).cast(pa.timestamp("us")),
            "source": pa.array(src),
            "cents": pa.array(cents),
        }
    )

    cfg = RollupConfig(
        source_col="source",
        ts_col="ts",
        value_col="cents",
        tiers={"1m": 60, "1h": 3600, "1d": 86400},
        aggs=["count", "sum", "min", "max"],
        num_partitions=4,
    )
    tiers = rollup_decomposable(rd.from_arrow(tbl).repartition(6), cfg)

    a_us = int(1.37 * 86400 * US)
    b_us = int(7.83 * 86400 * US) + 17_500_000  # unaligned both ends

    def raw_read(lo, hi):
        return rd.from_arrow(tbl)

    out = (
        route_range_aggregate(
            tiers, dict(cfg.tiers), raw_read,
            a_us=a_us, b_us=b_us,
            source_col="source", ts_col="ts", value_col="cents",
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )

    mask = (ts_us >= a_us) & (ts_us < b_us)
    df = pd.DataFrame({"source": src[mask], "cents": cents[mask]})
    exp = (
        df.groupby("source")["cents"]
        .agg(n_events="count", sum_cents="sum", min_cents="min",
             max_cents="max")
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in ["n_events", "sum_cents", "min_cents", "max_cents"]:
        assert (out[c].to_numpy() == exp[c].to_numpy().astype(np.int64)).all()
    assert list(out["source"]) == list(exp["source"])


def test_calendar_bucket_us_week_and_month():
    from getml_community_ray.stages.rollup import US, calendar_bucket_us

    # 2024-01-03 is a Wednesday -> week starts Monday 2024-01-01
    ts = np.array(
        [np.datetime64("2024-01-03T15:30:00", "us").astype(np.int64),
         np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64),
         np.datetime64("2024-01-07T23:59:59", "us").astype(np.int64),
         np.datetime64("2024-02-29T12:00:00", "us").astype(np.int64)],
        dtype=np.int64,
    )
    wk = calendar_bucket_us(ts, "week")
    assert (
        wk[:3] == np.datetime64("2024-01-01", "us").astype(np.int64)
    ).all()
    assert wk[3] == np.datetime64("2024-02-26", "us").astype(np.int64)
    mo = calendar_bucket_us(ts, "month")
    assert (mo[:3] == np.datetime64("2024-01-01", "us").astype(np.int64)).all()
    assert mo[3] == np.datetime64("2024-02-01", "us").astype(np.int64)


@pytest.mark.usefixtures("ray_session")
def test_router_from_parquet_sink(tmp_path):
    """Materialized-view path: tiers written to partitioned Parquet, the
    router reads them back from disk — answer identical to routing over
    the in-memory tier Datasets."""
    import ray.data as rd

    from getml_community_ray.pipelines.rollup import (
        RollupConfig,
        rollup_decomposable,
    )

    rng = np.random.default_rng(23)
    n = 10_000
    ts_us = np.sort(rng.integers(0, 5 * 86400 * US, size=n))
    tbl = pa.table(
        {
            "ts": pa.array(ts_us).cast(pa.timestamp("us")),
            "source": pa.array(rng.choice(["x", "y"], size=n)),
            "cents": pa.array(
                rng.integers(0, 10**6, size=n).astype(np.float64)
            ),
        }
    )
    cfg = RollupConfig(
        source_col="source", ts_col="ts", value_col="cents",
        tiers={"1m": 60, "1h": 3600, "1d": 86400},
        aggs=["count", "sum", "min", "max"], num_partitions=4,
    )
    tiers = rollup_decomposable(rd.from_arrow(tbl), cfg)
    # persist each tier partitioned by day of its bucket (resumable layout)
    disk_tiers = {}
    for name, t in tiers.items():
        d = str(tmp_path / name)
        t.write_parquet(d)
        disk_tiers[name] = rd.read_parquet(d)

    a_us = int(0.7 * 86400 * US) + 123_456
    b_us = int(4.2 * 86400 * US) + 789_000

    def raw_read(lo, hi):
        return rd.from_arrow(tbl)

    kw = dict(a_us=a_us, b_us=b_us, source_col="source",
              ts_col="ts", value_col="cents")
    mem = (
        route_range_aggregate(tiers, dict(cfg.tiers), raw_read, **kw)
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    dsk = (
        route_range_aggregate(disk_tiers, dict(cfg.tiers), raw_read, **kw)
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    assert mem.equals(dsk)
    # and both equal direct computation
    mask = (ts_us >= a_us) & (ts_us < b_us)
    src = np.asarray(tbl["source"]).astype(str)[mask]
    cents = np.asarray(tbl["cents"])[mask]
    for i, s in enumerate(sorted(np.unique(src))):
        sel = cents[src == s]
        assert mem.loc[i, "n_events"] == len(sel)
        assert mem.loc[i, "sum_cents"] == int(sel.sum())
