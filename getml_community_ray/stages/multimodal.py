"""Multimodal columns: image/audio/video payloads as opaque `binary`
columns with typed metadata, processed by actor-pool `map_batches` stages.

The reference has no multimodal surface; this is new 100 TB-corpus surface
(task brief): the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested; the codec step itself is
STUBBED because no image/audio library ships in this container:

- `DecodeImage` raises NotImplementedError when `real=True` (the marked
  integration point for PIL/libvips) and otherwise produces a
  DETERMINISTIC FAKE decode: payload bytes -> seeded tiled uint8 grid of
  the metadata's (width, height) — enough to exercise resize /
  feature-extraction end-to-end with byte-stable outputs.

Payload schema convention:
    id:int64, payload:binary, media_type:string, width:int32, height:int32

Scale notes: payloads are wide — stages keep `batch_size` small (payload
bytes x batch_size x concurrency must fit worker heaps), never shuffle the
payload column (features/fingerprints shuffle instead), and run as actor
pools so any real codec state (decoder tables, model weights) loads once
per actor in `__init__`.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

PAYLOAD_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def make_payload_table(ids, blobs, media_type="image/fake", width=16, height=16):
    n = len(ids)
    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(blobs, type=pa.binary()),
            "media_type": pa.array([media_type] * n, type=pa.string()),
            "width": pa.array([width] * n, type=pa.int32()),
            "height": pa.array([height] * n, type=pa.int32()),
        }
    )


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: crc-seeded byte tile
    of shape (h, w). Same payload -> same pixels, any process."""
    seed = zlib.crc32(payload)
    base = np.frombuffer(payload, dtype=np.uint8)
    if len(base) == 0:
        base = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(w * h / len(base)))
    tile = np.tile(base, reps)[: w * h].astype(np.uint16)
    return ((tile + seed) % 256).astype(np.uint8).reshape(h, w)


class DecodeImage:
    """Actor-pool decode stage. `__init__` is the once-per-actor setup
    (real codecs / model weights would load here); `__call__` streams
    batches. Output adds `pixels:list<uint8>` (row-major) per row."""

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "real image decoding requires PIL/libvips, not present in "
                "this environment — integration point, plumbing is tested "
                "with the deterministic fake decode (real=False)"
            )
        self.real = real

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = np.asarray(batch["width"], dtype=np.int64)
        hs = np.asarray(batch["height"], dtype=np.int64)
        pix = [
            _fake_decode(p, int(w), int(h)).ravel()
            for p, w, h in zip(payloads, ws, hs)
        ]
        return batch.append_column(
            "pixels", pa.array([x.tolist() for x in pix], type=pa.list_(pa.uint8()))
        )


class ResizeImage:
    """Nearest-neighbor resize of decoded pixels to (out_w, out_h) —
    vectorized per row with numpy index grids (no per-pixel Python)."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w = out_w
        self.out_h = out_h
        # precomputed per-shape index grids (actor-lifetime cache)
        self._grids: dict[tuple, tuple] = {}

    def _grid(self, w: int, h: int):
        key = (w, h)
        if key not in self._grids:
            xs = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            ys = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            self._grids[key] = (ys[:, None] * w + xs[None, :]).ravel()
        return self._grids[key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = np.asarray(batch["width"], dtype=np.int64)
        hs = np.asarray(batch["height"], dtype=np.int64)
        pixcol = batch["pixels"].combine_chunks()
        out = []
        for i in range(len(batch)):
            px = np.asarray(pixcol[i].values, dtype=np.uint8)
            out.append(px[self._grid(int(ws[i]), int(hs[i]))].tolist())
        t = batch.drop_columns(["pixels"])
        return t.append_column(
            "pixels_resized", pa.array(out, type=pa.list_(pa.uint8()))
        )


class ByteHistogramFeatures:
    """Real (non-stub) payload featurization: 16-bin byte histogram +
    length + crc32 — shuffle-safe small columns derived from wide payloads.

    normalize=True emits per-byte fractions (rounded 6dp); normalize=False
    emits exact integer bin counts (the oracle-checkable form)."""

    BINS = 16

    def __init__(self, normalize: bool = True):
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["payload"].combine_chunks()
        if pa.types.is_large_binary(col.type):
            off_dtype = np.int64
        else:
            off_dtype = np.int32
        bufs = col.buffers()
        vals = np.frombuffer(bufs[2] or b"", dtype=np.uint8)
        # offset buffer is absolute into vals; honor any array-level offset
        all_offs = np.frombuffer(bufs[1], dtype=off_dtype)
        offs = all_offs[col.offset : col.offset + len(col) + 1].astype(np.int64)
        n = len(col)
        length = np.diff(offs)
        # one fused bincount over the concatenated payload bytes: key =
        # row * 16 + (byte >> 4) — no per-row Python
        row_of = np.repeat(np.arange(n, dtype=np.int64), length)
        key = row_of * self.BINS + (vals[offs[0] : offs[-1]] >> 4)
        hist = np.bincount(key, minlength=n * self.BINS).reshape(n, self.BINS)
        crc = np.array(
            [zlib.crc32(col[i].as_py()) for i in range(n)], dtype=np.int64
        )
        if self.normalize:
            frac = hist / np.maximum(length[:, None], 1)
            hist_col = pa.array(
                [row.tolist() for row in np.rint(frac * 1e6) / 1e6],
                type=pa.list_(pa.float64()),
            )
        else:
            hist_col = pa.array(
                [row.tolist() for row in hist.astype(np.int64)],
                type=pa.list_(pa.int64()),
            )
        return pa.table(
            {
                "id": batch["id"],
                "n_bytes": pa.array(length),
                "crc32": pa.array(crc),
                "byte_hist": hist_col,
            }
        )


class SampleFrames:
    """Video-style frame sampling stub: treat the payload as a concatenated
    sequence of `frame_bytes` chunks, emit every `stride`-th chunk id +
    its crc (one output row per sampled frame — a flat_map)."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_ix, crcs = [], [], []
        for i, p in zip(batch["id"].to_pylist(), batch["payload"].to_pylist()):
            n_frames = max(1, len(p) // self.frame_bytes)
            for f in range(0, n_frames, self.stride):
                chunk = p[f * self.frame_bytes : (f + 1) * self.frame_bytes]
                ids_out.append(i)
                frame_ix.append(f)
                crcs.append(zlib.crc32(chunk))
        return pa.table(
            {
                "id": pa.array(ids_out, type=pa.int64()),
                "frame_ix": pa.array(frame_ix, type=pa.int64()),
                "frame_crc": pa.array(crcs, type=pa.int64()),
            }
        )


def decode_features_pipeline(ds, *, out_w: int = 8, out_h: int = 8,
                             concurrency: int = 2, batch_size: int = 64):
    """decode -> resize -> histogram features, all actor pools with payload-
    aware batch sizing. Returns (features_ds, resized_ds)."""
    decoded = ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    resized = decoded.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    feats = ds.map_batches(
        ByteHistogramFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return feats, resized
