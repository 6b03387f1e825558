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


def ngram_jaccard_pairs(
    ds,
    *,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 5,
    threshold: float = 0.5,
):
    """Exact n-gram Jaccard over MinHash-LSH candidate pairs.

    Stage 1 = `minhash_lsh_candidates` (signatures + band buckets — the only
    shuffle, of small hash columns). Stage 2 re-reads ONLY candidate docs'
    texts via a broadcast id-set filter and verifies each pair exactly with
    its shingle sets. Candidate volume is the LSH output (tiny vs corpus);
    at 100 TB the verify stage would hash-join texts to pairs instead of
    broadcasting — here candidates fit one ray.put object.
    Returns (id_a, id_b, jaccard) with jaccard >= threshold, id_a < id_b.
    """
    import ray

    cands = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col,
        num_perm=num_perm, bands=bands, shingle=shingle,
    )
    pair_set: set[tuple] = set()
    for b in cands.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for ids in b["ids"].to_pylist():
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pair_set.add((ids[i], ids[j]))
    if not pair_set:
        return _empty_pairs()
    cand_ids = sorted({x for p in pair_set for x in p})
    id_ref = ray.put(frozenset(cand_ids))

    def keep(b: pa.Table) -> pa.Table:
        wanted = ray.get(id_ref)
        ids = np.asarray(b[id_col])
        mask = np.array([i in wanted for i in ids.tolist()], dtype=bool)
        return b.filter(pa.array(mask))

    texts = {}
    small = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    for b in small.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            texts[i] = t

    def shingles(t: str) -> frozenset:
        bb = t.encode()
        if len(bb) < shingle:
            return frozenset([bb])
        return frozenset(bb[j : j + shingle] for j in range(len(bb) - shingle + 1))

    rows_a, rows_b, rows_j = [], [], []
    sh_cache = {i: shingles(texts[i]) for i in cand_ids}
    for a, b_ in sorted(pair_set):
        sa, sb = sh_cache[a], sh_cache[b_]
        inter = len(sa & sb)
        union = len(sa | sb)
        j = inter / union if union else 1.0
        if j >= threshold:
            rows_a.append(a)
            rows_b.append(b_)
            rows_j.append(np.rint(j * 1e6) / 1e6)
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(rows_a, type=pa.int64()),
                "id_b": pa.array(rows_b, type=pa.int64()),
                "jaccard": pa.array(rows_j, type=pa.float64()),
            }
        )
    )


def _empty_pairs():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
    )


def cosine_neardup_exact(
    ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
):
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b).

    The (normalized) full matrix is broadcast once via ray.put; each batch
    does one matmul against it — O(n^2 d / B) per batch but zero shuffle.
    This is the small-reference-set lane; at corpus scale use
    `cosine_neardup_lsh` (bucketed candidates, then this as the verifier
    within buckets).
    """
    import ray

    from .similarity import _stack_embeddings

    rows = []
    ids_all = []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        rows.append(_stack_embeddings(b[emb_col]))
        ids_all.append(np.asarray(b[id_col], dtype=np.int64))
    X = np.concatenate(rows).astype(np.float64)
    ids = np.concatenate(ids_all)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    ref = ray.put((ids, Xn))

    def pairs(b: pa.Table) -> pa.Table:
        all_ids, M = ray.get(ref)
        bx = _stack_embeddings(b[emb_col]).astype(np.float64)
        bids = np.asarray(b[id_col], dtype=np.int64)
        bn = bx / np.maximum(np.linalg.norm(bx, axis=1, keepdims=True), 1e-30)
        sims = bn @ M.T
        ii, jj = np.nonzero(sims >= threshold)
        a, c = bids[ii], all_ids[jj]
        keep = a < c
        return pa.table(
            {
                "id_a": pa.array(a[keep]),
                "id_b": pa.array(c[keep]),
                "cosine": pa.array(np.rint(sims[ii, jj][keep] * 1e6) / 1e6),
            }
        )

    return ds.select_columns([id_col, emb_col]).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )


def cosine_neardup_lsh(
    ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
):
    """Scale path: random-hyperplane LSH buckets -> exact cosine verify
    within each bucket (groupby on the bucket signature; only (id, vector)
    columns shuffle). Approximate: recall measured in tests."""
    from .similarity import _stack_embeddings

    def _planes(dim: int):
        # regenerated per batch from the fixed seed: deterministic on every
        # worker, no broadcast needed, dim inferred from the data
        rng = np.random.default_rng(seed)
        return [rng.standard_normal((dim, n_planes)) for _ in range(n_tables)]

    def to_buckets(b: pa.Table) -> pa.Table:
        X = _stack_embeddings(b[emb_col]).astype(np.float64)
        planes = _planes(X.shape[1])
        ids = np.asarray(b[id_col], dtype=np.int64)
        n = len(ids)
        out_t, out_sig, out_id, out_vec = [], [], [], []
        for t, P in enumerate(planes):
            bits = (X @ P) > 0
            sig = np.zeros(n, dtype=np.int64)
            for k in range(n_planes):
                sig |= bits[:, k].astype(np.int64) << k
            out_t.append(np.full(n, t, dtype=np.int64))
            out_sig.append(sig)
            out_id.append(ids)
            out_vec.append(b[emb_col].combine_chunks())
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(out_t)),
                "sig": pa.array(np.concatenate(out_sig)),
                id_col: pa.array(np.concatenate(out_id)),
                emb_col: pa.concat_arrays(
                    [v.cast(v.type) for v in out_vec]
                ),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        X = _stack_embeddings(group[emb_col]).astype(np.float64)
        ids = np.asarray(group[id_col], dtype=np.int64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        sims = Xn @ Xn.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = ids[ii] < ids[jj]
        return pa.table(
            {
                "id_a": pa.array(ids[ii][keep]),
                "id_b": pa.array(ids[jj][keep]),
                "cosine": pa.array(np.rint(sims[ii, jj][keep] * 1e6) / 1e6),
            }
        )

    pairs = (
        ds.select_columns([id_col, emb_col])
        .map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["table_id", "sig"])
        .map_groups(verify, batch_format="pyarrow")
    )
    # dedupe pairs found in multiple tables
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine", alias_name="cosine")
    )


def near_dedup_clusters(
    ds,
    *,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 5,
):
    """End-to-end near-duplicate clustering: MinHash-LSH candidates ->
    exact n-gram Jaccard verify -> connected components -> one canonical
    (smallest) id per cluster.

    The verified edge list is tiny relative to the corpus (it is the output
    of `ngram_jaccard_pairs`), so components are resolved with driver-side
    union-find — at larger edge volumes swap in iterative label
    propagation (hash-join the label table to the edge list until fixed
    point). Returns (doc_id, canonical_id, cluster_size); docs with no
    near-dup edge map to themselves with size 1.
    """
    import ray.data as rd

    pairs = ngram_jaccard_pairs(
        ds, text_col=text_col, id_col=id_col, threshold=threshold,
        num_perm=num_perm, bands=bands, shingle=shingle,
    ).to_pandas()

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # smaller id wins -> canonical = min of cluster

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        parent.setdefault(int(a), int(a))
        parent.setdefault(int(b), int(b))
        union(int(a), int(b))

    canon = {x: find(x) for x in parent}
    sizes: dict = {}
    for x, c in canon.items():
        sizes[c] = sizes.get(c, 0) + 1
    import ray

    ref = ray.put((canon, sizes))

    def assign(b: pa.Table) -> pa.Table:
        cmap, smap = ray.get(ref)
        ids = np.asarray(b[id_col])
        cid = np.array([cmap.get(int(i), int(i)) for i in ids], dtype=np.int64)
        sz = np.array([smap.get(int(c), 1) for c in cid], dtype=np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "canonical_id": pa.array(cid),
                "cluster_size": pa.array(sz),
            }
        )

    return ds.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def simhash_candidates(
    ds,
    *,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    shingle: int = 5,
):
    """SimHash near-dup pairs: 64-bit signatures -> 4x16-bit band buckets
    (pigeonhole: any pair with hamming distance <= 3 shares at least one
    exact band) -> exact hamming verify within buckets. Only (id, signature)
    columns shuffle. Returns (id_a, id_b, hamming) with id_a < id_b."""
    sigs = simhash_signatures(ds, text_col=text_col, id_col=id_col)

    def to_bands(b: pa.Table) -> pa.Table:
        s = np.asarray(b["simhash"]).astype(np.uint64)
        ids = np.asarray(b[id_col])
        n = len(s)
        band_ix, band_val, out_id, out_sig = [], [], [], []
        for k in range(4):
            band_ix.append(np.full(n, k, dtype=np.int64))
            band_val.append(
                ((s >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int64)
            )
            out_id.append(ids)
            out_sig.append(s.astype(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(band_ix)),
                "band_val": pa.array(np.concatenate(band_val)),
                id_col: pa.array(np.concatenate(out_id)),
                "simhash": pa.array(np.concatenate(out_sig)),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col])
        s = np.asarray(group["simhash"]).astype(np.uint64)
        if len(ids) < 2:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        x = s[:, None] ^ s[None, :]
        ham = np.zeros(x.shape, dtype=np.int64)
        v = x.copy()
        for _ in range(64):
            ham += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        ii, jj = np.nonzero((ham <= max_hamming) & (ids[:, None] < ids[None, :]))
        return pa.table(
            {
                "id_a": pa.array(ids[ii].astype(np.int64)),
                "id_b": pa.array(ids[jj].astype(np.int64)),
                "hamming": pa.array(ham[ii, jj]),
            }
        )

    pairs = (
        sigs.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_val"])
        .map_groups(verify, batch_format="pyarrow")
    )
    from ray.data.aggregate import Min

    # dedupe pairs discovered via multiple bands
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )
