"""Time-series compression codecs: Gorilla XOR for float64 values and
delta-of-delta zigzag varint for int64-microsecond timestamps — plus the
map_batches stage that compresses per-(source, chunk) and the lossless
decoder (round-trip byte equality is test-enforced).

Formats (ours; the reference has no codecs — this is the north-rule's new
surface, designs follow the published Gorilla paper "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015, §4.1):

Gorilla XOR stream:
  first value: 64 raw bits. Then per value x_i: xor = bits(x_i)^bits(x_{i-1})
    - '0'                  if xor == 0
    - '10' + meaningful    if xor fits the previous (leading, length) window
    - '11' + 5b leading + 6b length + meaningful bits otherwise
Delta-of-delta varint stream:
  first ts: 8-byte little-endian; second: zigzag varint of delta;
  then zigzag varints of delta-of-delta (regular grids -> mostly 1 byte).

Encode is vectorized end-to-end: a lean Python state-machine pass emits
(value, nbits) token pairs (the window-reuse chain is sequentially
dependent by format), then ONE numpy pass expands tokens to bits and
`np.packbits` them. Varint encode/decode are fully vectorized
(repeat/cumsum byte expansion; bitwise_or.reduceat parse). Gorilla decode
keeps a Python loop (bit-level control flow), with byte-span reads instead
of bit-by-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        pos = self.pos
        end = pos + bits
        b0, b1 = pos >> 3, (end + 7) >> 3
        val = int.from_bytes(self.data[b0:b1], "big") >> ((b1 << 3) - end)
        self.pos = end
        return val & ((1 << bits) - 1)


def gorilla_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return b""
    bits = v.view(np.uint64)
    xors = np.zeros(n, dtype=np.uint64)
    xors[1:] = bits[1:] ^ bits[:-1]
    # vectorized leading/trailing zero counts
    nz = xors != 0
    lead = np.full(n, 64, dtype=np.int64)
    trail = np.full(n, 64, dtype=np.int64)
    if nz.any():
        x = xors[nz]
        # leading: 63 - floor(log2(x))
        hi = np.zeros(len(x), dtype=np.int64)
        xx = x.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            m = xx >= (np.uint64(1) << np.uint64(shift))
            hi[m] += shift
            xx[m] >>= np.uint64(shift)
        lead[nz] = 63 - hi
        trail[nz] = _trailing_zeros(x)

    # state-machine pass: emit (value, nbits) token pairs into plain
    # Python lists (the window-reuse chain is sequentially dependent by
    # format); the expensive bit packing happens once, vectorized
    xs = xors.tolist()
    les = lead.tolist()
    trs = trail.tolist()
    vals = [int(bits[0])]
    nbs = [64]
    prev_lead, prev_len, prev_trail = -1, -1, 129
    for i in range(1, n):
        x = xs[i]
        if x == 0:
            vals.append(0)
            nbs.append(1)
            continue
        le, tr = les[i], trs[i]
        if le > 31:
            le = 31
        if le >= prev_lead >= 0 and tr >= prev_trail:
            # value fits the previous (leading, length) window; tag and
            # payload stay separate tokens (fused could exceed 64 bits
            # when prev_len == 64)
            vals.append(0b10)
            nbs.append(2)
            vals.append(x >> prev_trail)
            nbs.append(prev_len)
        else:
            mlen = 64 - le - tr
            # '11' + 5b leading + 6b length (64 wraps to 0; decoder maps
            # 0 -> 64) fused into a 13-bit token; payload separate (the
            # fused form could exceed 64 bits)
            vals.append((0b11 << 11) | (le << 6) | (mlen & 63))
            nbs.append(13)
            vals.append(x >> tr)
            nbs.append(mlen)
            prev_lead, prev_len, prev_trail = le, mlen, tr
    return _pack_tokens(
        np.array(vals, dtype=np.uint64), np.array(nbs, dtype=np.int64)
    )


def _pack_tokens(vals: np.ndarray, nbits: np.ndarray) -> bytes:
    """MSB-first bit-pack of variable-width tokens, one numpy pass:
    expand every token to its bits (repeat/cumsum indexing), packbits.
    The final byte is zero-padded on the right, same as _BitWriter."""
    total = int(nbits.sum())
    if total == 0:
        return b""
    ends = np.cumsum(nbits)
    tok = np.repeat(np.arange(len(vals)), nbits)
    k = np.arange(total) - np.repeat(ends - nbits, nbits)
    sh = (nbits[tok] - 1 - k).astype(np.uint64)
    bitstream = ((vals[tok] >> sh) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bitstream).tobytes()


def _trailing_zeros(x: np.ndarray) -> np.ndarray:
    out = np.zeros(len(x), dtype=np.int64)
    xx = x.copy()
    alive = xx != 0
    for shift in (32, 16, 8, 4, 2, 1):
        mask = np.uint64((1 << shift) - 1)
        m = alive & ((xx & mask) == 0)
        out[m] += shift
        xx[m] >>= np.uint64(shift)
    return out


def gorilla_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.float64)
    r = _BitReader(data)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    prev = int(out[0])
    prev_lead, prev_len = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            mbits = r.read(prev_len)
            x = mbits << (64 - prev_lead - prev_len)
        else:  # '11' new window
            le = r.read(5)
            mlen = r.read(6)
            if mlen == 0:
                mlen = 64
            mbits = r.read(mlen)
            x = mbits << (64 - le - mlen)
            prev_lead, prev_len = le, mlen
        prev ^= x
        out[i] = prev
    return out.view(np.float64).copy()


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def dod_encode(ts_us: np.ndarray) -> bytes:
    t = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = len(t)
    if n == 0:
        return b""
    head = int(t[0]).to_bytes(8, "little", signed=True)
    if n == 1:
        return head
    deltas = np.diff(t)
    stream = np.empty(n - 1, dtype=np.int64)
    stream[0] = deltas[0]
    stream[1:] = np.diff(deltas)
    # vectorized zigzag varint: (v<<1)^(v>>63) on int64 IS the zigzag map
    # (arithmetic shift), viewed unsigned for the byte split
    z = ((stream << 1) ^ (stream >> 63)).view(np.uint64)
    nb = np.ones(len(z), dtype=np.int64)
    for k in range(1, 10):
        nb[z >= (np.uint64(1) << np.uint64(7 * k))] = k + 1
    total = int(nb.sum())
    ends = np.cumsum(nb)
    tok = np.repeat(np.arange(len(z)), nb)
    # multiply in int64 (u64 array x scalar has no SIMD path on numpy
    # 1.26 — see kernels/hashing.py), cast to u64 only for the shift
    sh = ((np.arange(total) - np.repeat(ends - nb, nb)) * 7).astype(np.uint64)
    b = ((z[tok] >> sh) & np.uint64(0x7F)).astype(np.uint8)
    cont = np.arange(total) != np.repeat(ends, nb) - 1
    b[cont] |= 0x80
    return head + b.tobytes()


def dod_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t0 = int.from_bytes(data[:8], "little", signed=True)
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    if n == 1:
        return out
    # vectorized varint parse: terminator bytes (high bit clear) delimit
    # tokens; per-byte 7-bit contributions OR-reduce per token
    buf = np.frombuffer(data, dtype=np.uint8, offset=8)
    term = (buf & 0x80) == 0
    ends = np.flatnonzero(term)
    starts = np.concatenate(([0], ends[:-1] + 1))
    widths = ends - starts + 1
    sh = ((np.arange(len(buf)) - np.repeat(starts, widths)) * 7).astype(
        np.uint64
    )
    contrib = (buf & np.uint8(0x7F)).astype(np.uint64) << sh
    z = np.bitwise_or.reduceat(contrib, starts)
    # unzigzag: (z>>1) ^ -(z&1), two's complement via u64 subtract
    one = np.array(1, dtype=np.uint64)  # array const: u64 scalar add/sub cliff
    s = ((z >> one) ^ (np.uint64(0) - (z & one))).view(np.int64)
    # stream[0] is the first delta, the rest are delta-of-deltas:
    # deltas = cumsum(stream); ts = t0 + cumsum(deltas)
    np.cumsum(s, out=s)
    out[1:] = t0 + np.cumsum(s)
    return out


class SeriesCompressor:
    """Actor-pool stage: one hash partition of raw rows in -> one compressed
    chunk row per source out. Codec scratch state lives per actor
    (`__init__` once), matching the reference's stateful-preprocessor
    contract (`Preprocessor.hpp:25-63`)."""

    def __init__(self, *, source_col: str, ts_col: str, value_col: str):
        self.source_col = source_col
        self.ts_col = ts_col
        self.value_col = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .rollup import ts_to_us

        src = np.asarray(batch[self.source_col]).astype(str)
        ts_us = ts_to_us(batch[self.ts_col].combine_chunks())
        v = np.asarray(batch[self.value_col].combine_chunks(), dtype=np.float64)
        if len(src) == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "start_ts": pa.array([], type=pa.timestamp("us")),
                    "ts_codec": pa.array([], type=pa.binary()),
                    "val_codec": pa.array([], type=pa.binary()),
                }
            )
        order = np.lexsort((ts_us, src))
        src, ts_us, v = src[order], ts_us[order], v[order]
        uniq, starts = np.unique(src, return_index=True)
        bounds = np.append(starts, len(src))
        rows = {"source": [], "n": [], "start_ts": [], "ts_codec": [], "val_codec": []}
        for i, name in enumerate(uniq):
            s, e = bounds[i], bounds[i + 1]
            rows["source"].append(name)
            rows["n"].append(e - s)
            rows["start_ts"].append(int(ts_us[s]))
            rows["ts_codec"].append(dod_encode(ts_us[s:e]))
            rows["val_codec"].append(gorilla_encode(v[s:e]))
        return pa.table(
            {
                "source": pa.array(rows["source"], type=pa.string()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "start_ts": pa.array(rows["start_ts"], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "ts_codec": pa.array(rows["ts_codec"], type=pa.binary()),
                "val_codec": pa.array(rows["val_codec"], type=pa.binary()),
            }
        )


def decompress_chunks(batch: pa.Table) -> pa.Table:
    """Inverse of SeriesCompressor: chunk rows -> raw (source, ts, value)."""
    srcs, tss, vss = [], [], []
    for i in range(len(batch)):
        n = batch["n"][i].as_py()
        src = batch["source"][i].as_py()
        ts = dod_decode(batch["ts_codec"][i].as_py(), n)
        vals = gorilla_decode(batch["val_codec"][i].as_py(), n)
        srcs.append(np.full(n, src))
        tss.append(ts)
        vss.append(vals)
    if not srcs:
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "event_ts": pa.array([], type=pa.timestamp("us")),
                "value": pa.array([], type=pa.float64()),
            }
        )
    return pa.table(
        {
            "source": pa.array(np.concatenate(srcs), type=pa.string()),
            "event_ts": pa.array(np.concatenate(tss)).cast(pa.timestamp("us")),
            "value": pa.array(np.concatenate(vss)),
        }
    )


def compress_series(
    ds,
    *,
    source_col: str = "source",
    ts_col: str = "event_ts",
    value_col: str = "n_tok",
    num_partitions: int = 32,
    concurrency: int = 8,
):
    """Hash-partition by source, then an actor pool compresses each
    partition's sources (codec state amortized per actor)."""
    from .rollup import crc_hash_sources

    def add_part(b: pa.Table) -> pa.Table:
        h = crc_hash_sources(np.asarray(b[source_col]).astype(str))
        return b.append_column(
            "_part", pa.array((h * 0x9E3779B1 % num_partitions).astype(np.int64))
        )

    stage = SeriesCompressor(
        source_col=source_col, ts_col=ts_col, value_col=value_col
    )
    return (
        ds.select_columns([source_col, ts_col, value_col])
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: stage(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )
