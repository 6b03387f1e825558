"""Corpus-composition operators for LLM training-data pipelines:
deterministic source-weighted mixture sampling and concat-and-chunk
sequence packing.

Neither exists in the reference (its corpus surface is tabular feature
engineering), but both are required stages of any 100 TB pretraining
pipeline: mixing decides WHICH documents enter the corpus, packing
decides HOW documents are laid out into fixed-length training sequences.
Both are expressed as pure Ray Data transforms with exact DuckDB twins:

- `mixture_sample`: keep a row iff splitmix64(id) < floor(weight[source]
  * 2^64). The per-row hash is the engine's vectorized splitmix64
  (kernels/hashing.py:36) and the threshold is an exact integer computed
  once on the driver, so engine and SQL oracle agree bit-for-bit. No
  shuffle — a stateless `map_batches` filter, trivially linear at scale.

- `pack_documents`: GPT-style concat-and-chunk packing. Documents are
  ordered by id within a (source, shard = id % num_shards) stream; each
  document's start offset is the exclusive prefix sum of token counts in
  that stream, its bin is floor(start / context_len). Sharding makes the
  prefix sum embarrassingly parallel (one vectorized pass per hash
  partition — the sessionize pattern, stages/windows.py:166) and mirrors
  how real pipelines pack per input shard rather than globally. The
  whole layout is a window function in SQL, so the oracle is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import splitmix64
from .rollup import crc_hash_sources

_M64 = 1 << 64


def mixture_thresholds(weights: dict[str, float]) -> dict[str, int]:
    """Exact integer keep-thresholds: floor(clamp(w) * 2^64). Computed in
    arbitrary-precision Python once so the engine comparison and the SQL
    HUGEINT literal are the same number."""
    from fractions import Fraction

    out = {}
    for s, w in weights.items():
        w = min(max(float(w), 0.0), 1.0)
        out[s] = min(int(Fraction(w) * _M64), _M64)  # exact floor
    return out


def mixture_sample(ds, *, id_col: str, source_col: str,
                   weights: dict[str, float]):
    """Deterministic source-weighted subsample (data mixing / temperature
    reweighting): keep a row iff splitmix64(id) < floor(weight[source] *
    2^64). Rows from sources absent from `weights` are dropped. The same
    id always gets the same verdict at any scale or partitioning — the
    sample is reproducible and resumable by construction."""
    thr = mixture_thresholds(weights)

    def f(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64).view(np.uint64)
        h = splitmix64(ids)
        src = np.asarray(b[source_col]).astype(str)
        keep = np.zeros(len(b), dtype=bool)
        for s, t in thr.items():
            m = src == s
            if t >= _M64:
                keep |= m
            elif t > 0:
                keep |= m & (h < np.uint64(t))
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def mixture_sample_sql(table: str, *, id_col: str, source_col: str,
                       weights: dict[str, float],
                       extra_cols: tuple[str, ...] = ()) -> str:
    """DuckDB twin of `mixture_sample` via the splitmix64 SQL fragments."""
    from ..kernels.hashing import sql_splitmix64_cols

    thr = mixture_thresholds(weights)
    cases = " ".join(
        f"WHEN '{s}' THEN CAST({t} AS HUGEINT)" for s, t in sorted(thr.items())
    )
    cols = ", ".join((id_col, source_col) + tuple(extra_cols))
    mix = ",\n       ".join(
        sql_splitmix64_cols(f"CAST({id_col} AS UBIGINT)", "h")
    )
    return f"""
WITH m AS (
    SELECT {cols},
       {mix}
    FROM {table}
)
SELECT {cols}
FROM m
WHERE CAST(hout AS HUGEINT) < CASE {source_col} {cases} ELSE -1 END
"""


def pack_documents(ds, *, id_col: str, source_col: str, n_tok_col: str,
                   context_len: int, num_shards: int = 8,
                   num_partitions: int | None = None):
    """Concat-and-chunk sequence packing: within each (source,
    shard = id % num_shards) stream ordered by id, a document's tokens
    start at the exclusive prefix sum of the stream's token counts;
    `bin_id` = start // context_len and `bin_offset` = start %
    context_len. Documents may straddle bin boundaries (the standard
    pretraining layout — no padding, no document drops).

    One hash shuffle on (source, shard), then a single vectorized
    lexsort + segmented cumsum per partition. Partition count is a
    memory knob only: every (source, shard) stream lands whole in
    exactly one partition, so results are partitioning-invariant."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    C = int(context_len)
    S = int(num_shards)

    def add_part(b: pa.Table) -> pa.Table:
        src = crc_hash_sources(np.asarray(b[source_col]).astype(str))
        shard = np.asarray(b[id_col], dtype=np.int64) % S
        part = ((src * 31 + shard) * 0x9E3779B1) % num_partitions
        return b.append_column("_part", pa.array(part.astype(np.int64)))

    def part_fn(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        ntok = np.asarray(b[n_tok_col], dtype=np.int64)
        src = np.asarray(b[source_col]).astype(str)
        shard = ids % S
        # stream id = dense code of (source, shard)
        _, scode = np.unique(src, return_inverse=True)
        stream = scode * S + shard
        order = np.lexsort((ids, stream))
        st, nt = stream[order], ntok[order]
        cs = np.cumsum(nt) - nt  # exclusive prefix sum, global
        seg_first = np.ones(len(st), dtype=bool)
        if len(st) > 1:
            seg_first[1:] = st[1:] != st[:-1]
        # subtract each stream's starting offset
        seg_id = np.cumsum(seg_first) - 1
        start = cs - cs[seg_first][seg_id]
        take = pa.array(order)
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().take(take),
                source_col: b[source_col].combine_chunks().take(take),
                "shard": pa.array(shard[order]),
                n_tok_col: b[n_tok_col].combine_chunks().take(take),
                "bin_id": pa.array(start // C),
                "bin_offset": pa.array(start % C),
            }
        )

    cols = list(dict.fromkeys([id_col, source_col, n_tok_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: part_fn(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def _bottom_k_local(b: pa.Table, *, id_col: str, key_col: str, k: int,
                    hash_col: str) -> pa.Table:
    """Keep each key's k smallest-hash rows within this table (exact
    bottom-k is a semilattice: local prune then merge gives the global
    answer). Ties broken by id — deterministic at any partitioning."""
    ids = np.asarray(b[id_col], dtype=np.int64)
    if hash_col in b.column_names:
        h = np.asarray(b[hash_col], dtype=np.int64).view(np.uint64)
    else:
        h = splitmix64(ids.view(np.uint64))
        b = b.append_column(hash_col, pa.array(h.view(np.int64)))
    key = np.asarray(b[key_col])
    uniq, gid = np.unique(key, return_inverse=True)
    order = np.lexsort((ids, h.view(np.uint64), gid))
    g_sorted = gid[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(g_sorted)) + 1))
    counts = np.diff(np.concatenate((starts, [len(g_sorted)])))
    pos = np.arange(len(g_sorted)) - np.repeat(starts, counts)
    keep = order[pos < k]
    keep.sort()
    return b.take(pa.array(keep))


def sample_per_key(ds, *, id_col: str, key_col: str, k: int,
                   num_partitions: int | None = None):
    """Deterministic k-per-key subsample: keep the k rows with the
    smallest splitmix64(id) within each key (ties by id). Equivalent to a
    seeded uniform reservoir sample but reproducible, resumable and
    partitioning-independent by construction.

    Scale shape: a per-batch bottom-k COMBINER prunes candidates to at
    most k x keys-per-batch BEFORE the one hash exchange, so the shuffle
    moves O(k x keys) rows, not the table."""
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)
    hash_col = "_smpl_h"

    def local(b: pa.Table) -> pa.Table:
        out = _bottom_k_local(
            b, id_col=id_col, key_col=key_col, k=k, hash_col=hash_col
        )
        key = np.asarray(out[key_col])
        if key.dtype.kind in "iu":
            hk = key.astype(np.int64)
        else:
            hk = crc_hash_sources(key.astype(str))
        part = (hk * 0x9E3779B1 % num_partitions).astype(np.int64)
        return out.append_column("_part", pa.array(part))

    def final(t: pa.Table) -> pa.Table:
        out = _bottom_k_local(
            t.drop_columns(["_part"]), id_col=id_col, key_col=key_col,
            k=k, hash_col=hash_col,
        )
        return out.drop_columns([hash_col])

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def sample_per_key_sql(table: str, *, id_col: str, key_col: str, k: int,
                       select_cols: list[str]) -> str:
    """DuckDB twin: the same splitmix64 ranking via QUALIFY."""
    from ..kernels.hashing import sql_splitmix64_cols

    sm = ",\n       ".join(
        sql_splitmix64_cols(f"CAST({id_col} AS UBIGINT)", "s_")
    )
    cols = ", ".join(select_cols)
    return f"""
WITH h AS (
  SELECT {cols}, {id_col} AS _sid, {key_col} AS _skey,
       {sm}
  FROM {table})
SELECT {cols} FROM h
QUALIFY row_number() OVER (PARTITION BY _skey ORDER BY s_out, _sid) <= {k}
"""


def deterministic_shuffle(
    ds,
    *,
    id_col: str,
    seed: int = 0,
    num_shards: int = 64,
):
    """Deterministic global shuffle for training-data output: every row is
    assigned its reproducible GLOBAL position under the permutation
    h = splitmix64(id + seed), ordered by (h, id). The standard final step
    of a pretraining pipeline (`ds.random_shuffle` is neither seeded-stable
    across cluster sizes nor resumable; this is both, because the
    permutation is a pure function of row identity).

    No global sort. h's TOP bits pick the shard — shards are then ordered
    RANGES of h, so global order = (shard, h, id):

    1. one streaming pass counts rows per shard (O(num_shards) combiner
       rows, tiny groupby merge, offsets on the driver — O(num_shards)
       state);
    2. one hash exchange BY SHARD + per-partition lexsort assigns
       pos = shard_offset + local rank.

    Any shard recomputes in isolation (checkpoint-friendly), and the same
    input yields byte-identical positions at any parallelism. num_shards
    must be a power of two.

    Precondition: `id_col` must be UNIQUE (it is the row's identity — the
    permutation is a function of it). Rows sharing an id would tie on the
    full (h, id) sort key and their relative order would depend on
    partition layout."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    if num_shards < 1 or num_shards & (num_shards - 1):
        raise ValueError("num_shards must be a power of two")
    # num_shards=1 would need shift=64, which is undefined for numpy uint64
    # (x86 shifts mod 64) — short-circuit to shard 0 instead.
    shift = np.uint64(64 - int(num_shards).bit_length() + 1)
    seed_u = np.uint64(seed)

    def _hashes(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = splitmix64(ids.astype(np.uint64) + seed_u)
        if num_shards == 1:
            return h, np.zeros(len(h), dtype=np.int64)
        return h, (h >> shift).astype(np.int64)

    def count_shards(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        _, shard = _hashes(ids)
        cnt = np.bincount(shard, minlength=num_shards)
        return pa.table(
            {
                "shard": pa.array(np.arange(num_shards, dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        ds.select_columns([id_col])
        .map_batches(count_shards, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(num_shards) rows — driver state is result-sized
    )
    full = np.zeros(num_shards, dtype=np.int64)
    full[counts["shard"].to_numpy()] = counts["n"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])

    import ray

    off_ref = ray.put(offsets)

    def add_shard(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        h, shard = _hashes(ids)
        b = b.append_column("_h", pa.array(h.astype(np.int64)))
        return b.append_column("_part", pa.array(shard))

    def part_fn(t: pa.Table) -> pa.Table:
        shard = int(t["_part"][0].as_py())
        ids = np.asarray(t[id_col], dtype=np.int64)
        h = np.asarray(t["_h"], dtype=np.int64).view(np.uint64)
        order = np.lexsort((ids, h))
        off = ray.get(off_ref)[shard]
        t = t.drop_columns(["_h", "_part"]).take(pa.array(order))
        return t.append_column(
            "shuffle_pos",
            pa.array(off + np.arange(len(t), dtype=np.int64)),
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(part_fn, batch_format="pyarrow")
    )


def deterministic_shuffle_sql(table: str, *, id_col: str, seed: int,
                              select_cols: list[str]) -> str:
    """DuckDB twin: ROW_NUMBER() - 1 over ORDER BY (splitmix64(id + seed),
    id) — the identical permutation (shard = top bits of h is a prefix of
    the (h, id) order, so the twin needs no shard column)."""
    from ..kernels.hashing import sql_splitmix64_cols

    sm = ",\n       ".join(
        sql_splitmix64_cols(
            f"CAST((CAST({id_col} AS HUGEINT) + {seed}) % {1 << 64} AS UBIGINT)",
            "s_",
        )
    )
    cols = ", ".join(select_cols)
    return f"""
WITH h AS (
  SELECT {cols}, {id_col} AS _sid,
       {sm}
  FROM {table})
SELECT {cols},
       CAST(row_number() OVER (ORDER BY s_out, _sid) - 1 AS BIGINT)
           AS shuffle_pos
FROM h
"""


def stratified_sample(
    ds,
    *,
    key_col: str,
    id_col: str,
    num: int,
    den: int,
    num_partitions: int | None = None,
):
    """Stratified subsample with EXACT integer per-stratum quotas: each
    stratum (key) keeps exactly floor(n_key * num / den) rows — the ones
    with the smallest splitmix64(id), ties by id — so corpus composition
    is preserved exactly under sampling (mixture_sample keeps expected
    fractions; this keeps exact counts, the train/val/test-split
    requirement).

    Two passes: (1) O(strata) count aggregate -> integer quotas broadcast
    via ray.put; (2) per-batch combiner prunes each key to its quota
    BEFORE the one hash exchange (a row outside a batch-local bottom-quota
    cannot be in the global bottom-quota), then the per-partition final
    selection. Deterministic at any partitioning; fraction passed as
    num/den so engine and SQL twin compute the identical integer quota."""
    import ray
    from ray.data.aggregate import Sum

    if not (0 <= num <= den) or den <= 0:
        raise ValueError("need 0 <= num <= den, den > 0")
    if num_partitions is None:
        from .partitioning import auto_partitions

        num_partitions = auto_partitions(ds)

    # per-batch combiner (one row per key per batch) before the tiny merge
    # groupby: Ray's native groupby().aggregate(Count) sort-shuffles whole
    # rows — measured 10x slower than this at 200M rows in STRESS_r5
    def count_partial(b: pa.Table) -> pa.Table:
        # null keys never receive a quota (bottom_quota's lookup misses and
        # drops them) — drop them here too, matching the replaced native
        # groupby path's net behavior and keeping np.unique off None/NaN
        col = b[key_col].combine_chunks().drop_null()
        keys = np.asarray(col)
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table({
            key_col: pa.array(uniq, type=b[key_col].type),
            "n": pa.array(cnt.astype(np.int64)),
        })

    counts = (
        ds.select_columns([key_col])
        .map_batches(count_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=65536)
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(strata) driver state
    )
    quota = {
        k: (int(n) * num) // den
        for k, n in zip(counts[key_col], counts["n"])
    }
    q_ref = ray.put(quota)

    def bottom_quota(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        col = t[key_col]
        if col.null_count:
            # null keys carry no quota; dropping them here also keeps an
            # int key column from surfacing as float64+NaN (which would
            # never match the integer quota keys)
            import pyarrow.compute as _pc

            t = t.filter(_pc.is_valid(col))
            if len(t) == 0:
                return t
        q = ray.get(q_ref)
        key = np.asarray(t[key_col])
        ids = np.asarray(t[id_col], dtype=np.int64)
        h = splitmix64(ids.view(np.uint64))
        ks = key.astype(str) if key.dtype.kind not in "iu" else key
        order = np.lexsort((ids, h, ks))
        kk = ks[order]
        new = np.ones(len(kk), dtype=bool)
        if len(kk) > 1:
            new[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(new)
        grp_start = np.repeat(starts, np.diff(np.append(starts, len(kk))))
        rank = np.arange(len(kk)) - grp_start
        quotas = np.array([q.get(k, 0) for k in kk[starts]], dtype=np.int64)
        keep = order[rank < np.repeat(quotas, np.diff(np.append(starts, len(kk))))]
        return t.take(pa.array(np.sort(keep)))

    def add_part(b: pa.Table) -> pa.Table:
        key = np.asarray(b[key_col])
        if key.dtype.kind in "iu":
            hv = splitmix64(key.astype(np.uint64)).astype(np.int64)
        else:
            hv = crc_hash_sources(key.astype(str))
        return b.append_column(
            "_part", pa.array(np.abs(hv) % num_partitions)
        )

    pruned = ds.map_batches(bottom_quota, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=65536)
    return (
        pruned.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: bottom_quota(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )


def stratified_sample_sql(table: str, *, key_col: str, id_col: str,
                          num: int, den: int,
                          select_cols: list[str]) -> str:
    """DuckDB twin: identical integer quota + splitmix64 bottom-quota."""
    from ..kernels.hashing import sql_splitmix64_cols

    sm = ",\n       ".join(
        sql_splitmix64_cols(f"CAST({id_col} AS UBIGINT)", "s_")
    )
    cols = ", ".join(select_cols)
    return f"""
WITH h AS (
  SELECT {cols}, {id_col} AS _sid, {key_col} AS _skey,
       {sm}
  FROM {table}),
q AS (SELECT {key_col} AS _qkey,
             (CAST(count(*) AS BIGINT) * {num}) // {den} AS _quota
      FROM {table} GROUP BY 1)
SELECT {cols} FROM h JOIN q ON h._skey = q._qkey
QUALIFY row_number() OVER (PARTITION BY _skey ORDER BY s_out, _sid)
        <= _quota
"""
