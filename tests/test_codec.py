"""Codec round-trip fixtures (FIXTURES.md F4): byte-exact recovery, size
bounds on grid-like inputs, pipeline round trip incl. tokens passthrough."""

import numpy as np
import pyarrow as pa
import pytest

from getml_community_ray.stages.codec import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gorilla_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(100, 30, 500)
    v[::50] = np.nan  # NaNs must round-trip bit-exactly too
    v[::70] = np.inf
    out = gorilla_decode(gorilla_encode(v), len(v))
    assert v.tobytes() == out.tobytes()  # byte equality, not just value


def test_gorilla_roundtrip_constant_and_integerish():
    v = np.full(1000, 42.0)
    enc = gorilla_encode(v)
    assert len(enc) < 8 + 1000 // 8 + 2  # one '0' bit per repeat
    assert gorilla_decode(enc, len(v)).tobytes() == v.tobytes()

    v2 = np.array([8.0, 8.0, 9.0, 12.0, 12.0, 4096.0, 8.0])
    assert gorilla_decode(gorilla_encode(v2), len(v2)).tobytes() == v2.tobytes()


def test_gorilla_empty_and_single():
    assert len(gorilla_decode(gorilla_encode(np.empty(0)), 0)) == 0
    one = np.array([3.14159])
    assert gorilla_decode(gorilla_encode(one), 1).tobytes() == one.tobytes()


@pytest.mark.parametrize("seed", [0, 1])
def test_dod_roundtrip(seed):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000
    # regular grid with jitter and gaps — the corpus shape
    ts = base + np.cumsum(rng.choice([10_000_000, 20_000_000], 400))
    ts = ts + rng.integers(-5000, 5000, 400)
    ts = np.sort(ts).astype(np.int64)
    out = dod_decode(dod_encode(ts), len(ts))
    np.testing.assert_array_equal(ts, out)


def test_dod_regular_grid_compresses_hard():
    base = 1_700_000_000_000_000
    ts = base + np.arange(10_000, dtype=np.int64) * 10_000_000
    enc = dod_encode(ts)
    # dod == 0 except the first delta -> ~1 byte per point
    assert len(enc) < 8 + 6 + 10_000 * 1.1
    np.testing.assert_array_equal(dod_decode(enc, len(ts)), ts)


def test_compress_pipeline_roundtrip(ray_session):
    import ray.data as rd

    from getml_community_ray.sources.synth import generate_shard
    from getml_community_ray.stages.codec import compress_series, decompress_chunks

    tbl = generate_shard(0, 1, 2000, n_sources=3, seed=5, with_tokens=True)
    ds = rd.from_arrow(tbl)
    chunks = compress_series(ds, num_partitions=4).materialize()
    comp_bytes = sum(
        len(r["ts_codec"]) + len(r["val_codec"]) for r in chunks.take_all()
    )
    raw_bytes = len(tbl) * 16
    assert comp_bytes < raw_bytes * 0.6  # compresses the (ts, value) lane

    restored = chunks.map_batches(
        decompress_chunks, batch_format="pyarrow"
    ).to_pandas()
    restored = restored.sort_values(["source", "event_ts"]).reset_index(drop=True)

    orig = tbl.select(["source", "event_ts", "n_tok"]).to_pandas()
    orig["n_tok"] = orig["n_tok"].astype("float64")
    orig = orig.rename(columns={"n_tok": "value"})
    orig = orig.sort_values(["source", "event_ts"]).reset_index(drop=True)
    assert restored["source"].equals(orig["source"])
    assert (
        restored["event_ts"].astype("datetime64[us]").equals(
            orig["event_ts"].astype("datetime64[us]")
        )
    )
    np.testing.assert_array_equal(
        restored["value"].to_numpy(), orig["value"].to_numpy()
    )


def test_tokens_passthrough_byte_equality(ray_session):
    """BASELINE per-row invariant: tokens survive the pipeline byte-equal
    (they never enter any shuffle — scalar lanes only read scalar cols)."""
    import ray.data as rd

    from getml_community_ray.sources.synth import generate_shard

    tbl = generate_shard(0, 1, 500, n_sources=2, seed=9, with_tokens=True)
    ds = rd.from_arrow(tbl)
    # a realistic pass: filter + project keeping tokens, zero-copy
    out = ds.map_batches(
        lambda b: b.filter(pa.compute.greater(b["n_tok"], 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    got = pa.concat_tables(
        out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks()
    orig = tbl.combine_chunks()
    got = got.sort_by("doc_id")
    orig = orig.sort_by("doc_id")
    assert got["tokens"].equals(orig["tokens"])  # Arrow-level equality
    # buffer-level byte check on the flattened values
    a = got["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    b = orig["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    assert a.tobytes() == b.tobytes()
