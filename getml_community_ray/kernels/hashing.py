"""Vectorized 64-bit hashing kernels with exact DuckDB-SQL twins.

The dedup/text stages previously hashed shingles with per-gram Python
zlib.crc32 calls — the dominant CPU at corpus scale and inexpressible in
SQL, leaving the whole near-dedup chain without oracles. This module
replaces that with:

- a polynomial rolling hash over raw bytes (Horner form, numpy uint64
  wraparound — one fused pass over the batch's concatenated text, no
  per-gram Python), and
- splitmix64 finalizers / per-permutation mixers (already vectorized),

plus GENERATORS that emit the *same arithmetic* as DuckDB SQL (HUGEINT
mod-2^64 multiplies, UBIGINT xor/shift — verified bit-identical), so
MinHash/SimHash/fingerprint outputs get exact value-hash oracles.

The hash spec is this engine's own (new surface; the reference's only
hashing is hash-set membership inside COUNT DISTINCT,
`src/engine/include/fastprop/aggregations/Aggregations.hpp:142-161`) —
determinism + uniformity are the requirements, and SQL-expressibility is
what makes the spec *auditable*.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_M64 = 1 << 64
GOLDEN = 0x9E3779B97F4A7C15
MIX1 = 0xBF58476D1CE4E5B9
MIX2 = 0x94D049BB133111EB
POLY_B = 0x100000001B3  # FNV-ish odd multiplier for the rolling hash


def _s64(c: int) -> np.int64:
    """Constant as a two's-complement int64 (for wraparound multiplies)."""
    return np.int64(c - _M64 if c >= 1 << 63 else c)


def _mulw(x: np.ndarray, c: int) -> np.ndarray:
    """x * c mod 2^64 on a uint64 array — computed on int64 VIEWS.

    numpy 1.26 has no SIMD kernel for uint64 multiply (measured 32M/s vs
    438M/s for int64 on this box, a 14x cliff); int64 multiplication wraps
    mod 2^64 with the same low-64 bits, so viewing through int64 is
    bit-identical and ~14x faster. Shifts/xors stay uint64 (logical
    shift; those kernels are fast in both dtypes)."""
    return (x.view(np.int64) * _s64(c)).view(np.uint64)


_A_GOLDEN = np.full(1, GOLDEN, dtype=np.uint64)


def splitmix64_into(x: np.ndarray, out: np.ndarray,
                    tmp: np.ndarray) -> np.ndarray:
    """splitmix64 with caller-provided buffers (`x is out` allowed).

    Three perf cliffs measured on this box drive the shape of this kernel
    (all bit-identical to the plain formulation):
    - numpy 1.26 u64-array x u64-scalar multiply has no SIMD path
      (32M/s vs 438M/s for int64): multiplies run on int64 views, which
      wrap mod 2^64 with the same bits;
    - u64-array + scalar add is ~17x slower than array + array: the
      GOLDEN add broadcasts a 1-element array;
    - fresh multi-MB temporaries cost a page-fault storm per call under
      this hypervisor (composed throughput 1-5M/s vs 300M/s per op):
      every op writes into `out`/`tmp`, so a caller looping over chunks
      allocates exactly twice."""
    np.add(x, _A_GOLDEN, out=out)
    np.right_shift(out, U64(30), out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    oi = out.view(np.int64)
    np.multiply(oi, _s64(MIX1), out=oi)
    np.right_shift(out, U64(27), out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    np.multiply(oi, _s64(MIX2), out=oi)
    np.right_shift(out, U64(31), out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    return out


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraparound semantics)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    out = np.empty_like(x)
    return splitmix64_into(x, out, np.empty_like(x))


_SCRATCH: dict = {}


def scratch_u64(key: str, n: int) -> np.ndarray:
    """Persistent per-process uint64 scratch buffer (grow-only).

    Under this hypervisor the first touch of a fresh multi-MB mmap costs
    orders of magnitude more than the compute that fills it (measured:
    identical xor kernel 25s cold vs 0.06s warm on a 26MB buffer). Hot
    per-batch kernels therefore reuse one named buffer per worker process
    instead of allocating per call; Ray map_batches tasks run
    single-threaded per worker, so a module-level cache is safe."""
    a = _SCRATCH.get(key)
    if a is None or len(a) < n:
        _SCRATCH[key] = a = np.empty(n, dtype=np.uint64)
    return a[:n]


def perm_seeds(num_perm: int) -> np.ndarray:
    """Per-permutation mixing seeds: splitmix64(1..num_perm)."""
    return splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))


def poly_hash_bytes(buf: np.ndarray, k: int) -> np.ndarray:
    """Rolling polynomial hash of every k-byte window of `buf` (uint8
    array): H[i] = sum_j buf[i+j] * B^(k-1-j) mod 2^64, Horner form —
    k vectorized passes, N-sized temporaries only (no (N, k) blowup)."""
    n = len(buf)
    if n < k:
        return poly_hash_whole(buf)[None][:0]  # empty; caller handles short
    out = buf[: n - k + 1].astype(np.uint64)
    for j in range(1, k):
        out = _mulw(out, POLY_B) + buf[j : n - k + 1 + j].astype(np.uint64)
    return out


def poly_hash_whole(buf: np.ndarray) -> np.ndarray:
    """Polynomial hash of the entire byte buffer (the <k-byte doc case)."""
    h = U64(0)
    for b in buf.astype(np.uint64):
        h = h * U64(POLY_B) + b
    return np.array([h], dtype=np.uint64)


def batch_gram_hashes(
    texts: "list[bytes]", k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Gram hashes for a whole batch in one fused pass.

    Returns (hashes, offsets): `hashes` concatenates every doc's gram
    hashes in order; `offsets[i]:offsets[i+1]` slices doc i's grams.
    Docs shorter than k contribute one whole-text gram (matching the
    engine's historical shingle contract)."""
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    n_grams = np.maximum(lens - k + 1, 1)
    offsets = np.concatenate([[0], np.cumsum(n_grams)])
    if len(texts) == 0:
        return np.zeros(0, dtype=np.uint64), offsets

    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)])
    out = np.empty(offsets[-1], dtype=np.uint64)

    # windows that don't cross doc boundaries, selected from one global pass
    if len(buf) >= k:
        allh = poly_hash_bytes(buf, k)
        # doc i's windows start at buf positions starts[i] .. starts[i]+len-k
        long_mask = lens >= k
        if long_mask.any():
            li = np.flatnonzero(long_mask)
            cnt = lens[li] - k + 1
            src = np.repeat(starts[li], cnt) + _intra(cnt)
            dst = np.repeat(offsets[li], cnt) + _intra(cnt)
            out[dst] = allh[src]
    for i in np.flatnonzero(lens < k):
        out[offsets[i]] = poly_hash_whole(
            buf[starts[i] : starts[i] + lens[i]]
        )[0]
    return out, offsets


def _intra(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (repeat/cumsum gather trick)."""
    total = int(counts.sum())
    return np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(counts[:-1])]), counts
    )


def segment_min(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment min over a 1-D or 2-D (rows=items) array."""
    return np.minimum.reduceat(values, offsets[:-1], axis=0)


# ---------------------------------------------------------------------------
# SQL twins (DuckDB): the same arithmetic as HUGEINT mod-2^64 expressions
# ---------------------------------------------------------------------------

SQL_M64 = "18446744073709551616"


def sql_mulmod(expr: str, const: int) -> str:
    """(expr * const) mod 2^64 in DuckDB. HUGEINT is a *signed* 128-bit —
    a full 64x64 product can overflow it, so split the constant into
    32-bit halves: a*c = a*cl + ((a mod 2^32)*ch mod 2^32)<<32 (mod 2^64);
    every intermediate stays under 2^96."""
    cl, ch = const & 0xFFFFFFFF, const >> 32
    lo = f"CAST({expr} AS HUGEINT) * {cl}"
    hi = f"(((CAST({expr} AS HUGEINT) % 4294967296) * {ch}) % 4294967296) * 4294967296"
    return f"CAST((({lo}) + ({hi})) % {SQL_M64} AS UBIGINT)"


def sql_addmod(expr: str, const: int) -> str:
    return f"CAST((CAST({expr} AS HUGEINT) + {const}) % {SQL_M64} AS UBIGINT)"


def sql_splitmix64_cols(x_expr: str, prefix: str) -> list[str]:
    """SELECT-list fragments computing splitmix64(x) via DuckDB lateral
    column aliases; the result lands in column `{prefix}out`."""
    p = prefix
    return [
        f"{sql_addmod(x_expr, GOLDEN)} AS {p}z1",
        f"{sql_mulmod(f'xor({p}z1, {p}z1 >> 30)', MIX1)} AS {p}z2",
        f"{sql_mulmod(f'xor({p}z2, {p}z2 >> 27)', MIX2)} AS {p}z3",
        f"xor({p}z3, {p}z3 >> 31) AS {p}out",
    ]


def sql_poly_gram_hash(gram_expr: str, k: int) -> str:
    """Polynomial hash of a k-char ASCII gram column: matches
    poly_hash_bytes for texts where char == byte (validated by callers)."""
    pows = [pow(POLY_B, k - 1 - j, _M64) for j in range(k)]
    terms = " + ".join(
        f"CAST(ord(substring({gram_expr}, {j + 1}, 1)) AS HUGEINT) * {p}"
        for j, p in enumerate(pows)
    )
    return f"CAST(({terms}) % {SQL_M64} AS UBIGINT)"


def sql_signed64(expr: str) -> str:
    """uint64 -> int64 two's-complement reinterpretation (the engine stores
    hashes as int64 Arrow columns)."""
    return (
        f"CAST(CASE WHEN {expr} >= 9223372036854775808 "
        f"THEN CAST({expr} AS HUGEINT) - {SQL_M64} "
        f"ELSE CAST({expr} AS HUGEINT) END AS BIGINT)"
    )
