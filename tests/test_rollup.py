"""End-to-end rollup pipeline vs the scalar oracle on the synthetic corpus
(FIXTURES.md F2): every tier, both lanes, exact/1e-12 agreement."""

import math

import numpy as np
import pyarrow as pa
import pytest

from getml_community_ray.kernels import oracle
from getml_community_ray.pipelines.rollup import RollupConfig, rollup
from getml_community_ray.sources.synth import generate_shard

US = 1_000_000

HOLISTIC_AGGS = [
    "count", "sum", "avg", "min", "max", "median", "q25", "q90", "stddev",
    "var", "skew", "kurtosis", "mode", "num_max", "count_distinct", "first",
    "last", "trend", "ewma_1h", "ewma_trend_1d", "time_since_last_maximum",
    "avg_time_between", "variation_coefficient",
]


def _corpus_table() -> pa.Table:
    parts = [generate_shard(k, 4, 3000, n_sources=8, seed=7, with_tokens=False)
             for k in range(4)]
    return pa.concat_tables(parts)


def _oracle_rollup(tbl: pa.Table, width_s: int, aggs):
    """Per (source, bucket): oracle over rows ordered by (ts, value)."""
    src = np.asarray(tbl["source"]).astype(str)
    ts_us = np.asarray(tbl["event_ts"].cast(pa.int64()))
    v = np.asarray(tbl["n_tok"], dtype=np.float64)
    bucket = ts_us // (width_s * US)
    out = {}
    keys = sorted(set(zip(src, bucket)))
    for s, b in keys:
        m = (src == s) & (bucket == b)
        order = np.lexsort((v[m], ts_us[m]))
        vals = list(v[m][order])
        tss = list(ts_us[m][order] / US)
        t_out = float((b + 1) * width_s)
        out[(s, int(b))] = {
            a: oracle.compute(a, vals, tss, t_out) for a in aggs
        }
    return out


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd

    tbl = _corpus_table()
    return tbl, rd.from_arrow(tbl)


def _check(res_ds, expected, aggs, width_s):
    got = res_ds.to_pandas()
    assert len(got) == len(expected), (len(got), len(expected))
    for _, row in got.iterrows():
        bucket = int(pa.scalar(row["bucket_ts"]).cast(pa.int64()).as_py() // (width_s * US))
        key = (row["source"], bucket)
        exp = expected[key]
        for a in aggs:
            e, g = exp[a], float(row[a])
            if isinstance(e, float) and math.isnan(e):
                assert math.isnan(g), (key, a, g)
            else:
                assert g == pytest.approx(e, rel=1e-12, abs=1e-12), (key, a, e, g)


@pytest.mark.parametrize("tier,width", [("1m", 60), ("1h", 3600), ("1d", 86400)])
def test_holistic_rollup_matches_oracle(corpus, tier, width):
    tbl, ds = corpus
    cfg = RollupConfig(aggs=HOLISTIC_AGGS, num_partitions=8)
    res = rollup(ds, cfg)
    expected = _oracle_rollup(tbl, width, HOLISTIC_AGGS)
    _check(res[tier], expected, HOLISTIC_AGGS, width)


@pytest.mark.parametrize("tier,width", [("1m", 60), ("1h", 3600), ("1d", 86400)])
def test_decomposable_rollup_matches_oracle(corpus, tier, width):
    tbl, ds = corpus
    aggs = ["count", "sum", "avg", "min", "max", "first", "last"]
    cfg = RollupConfig(aggs=aggs)
    res = rollup(ds, cfg)
    expected = _oracle_rollup(tbl, width, aggs)
    _check(res[tier], expected, aggs, width)


def test_lanes_agree(corpus):
    """Decomposable fast lane == holistic lane on the shared agg set."""
    _, ds = corpus
    aggs = ["count", "sum", "avg", "min", "max", "first", "last"]
    fast = rollup(ds, RollupConfig(aggs=aggs))["1h"].to_pandas()
    slow = rollup(ds, RollupConfig(aggs=aggs + ["median"], num_partitions=8))[
        "1h"
    ].to_pandas()
    fast = fast.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    slow = slow.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    assert len(fast) == len(slow)
    for col in aggs:
        np.testing.assert_allclose(
            fast[col].to_numpy(), slow[col].to_numpy(), rtol=1e-12, atol=1e-12
        )


def test_retention_drops_expired_buckets(corpus):
    tbl, ds = corpus
    ts_us = np.asarray(tbl["event_ts"].cast(pa.int64()))
    watermark = int(ts_us.max())
    aggs = ["count", "sum"]
    cfg = RollupConfig(
        aggs=aggs,
        retention={"1m": 600, "1h": None, "1d": None},
        watermark_us=watermark,
    )
    res = rollup(ds, cfg)
    got = res["1m"].to_pandas()
    cutoff = watermark - 600 * US
    ends = got["bucket_ts"].astype("int64") + 60 * US
    assert (ends >= cutoff).all()
    assert len(got) > 0
    # unretained tiers unaffected
    assert len(res["1d"].to_pandas()) > 0
