"""Joins and lookups — the reference exposes joins only through the data
model (many-to-one staging joins `staging.cpp:146-236`, point-in-time window
matches `Matchmaker.hpp:92-137`); here they are first-class stages.

- broadcast_join: the staging join for small dimension tables — `ray.put`
  the built lookup once, every batch maps through it (no shuffle). This is
  the scale path whenever the right side fits in memory (dimensions,
  vocabularies, category maps).
- hash_join: both sides large -> Ray's native `Dataset.join` (hash
  partitioned).
- semi_join_filter: broadcast the key set, filter inside map_batches
  (FastProp's subfeature row pruning, FastProp.cpp:1344-1396).
- as-of/windowed joins live in stages/windows.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_join(
    ds,
    right_df: pd.DataFrame,
    *,
    on: str,
    how: str = "left",
    right_cols: list[str] | None = None,
):
    """Map-side join against a small table (one-to-one/many-to-one — the
    reference errors on >1 match, staging.cpp:198-236).

    Zero-copy Arrow: the broadcast side is put once as (keys, payload)
    arrays; each batch does `pc.index_in` (hash probe) + `Table.take`,
    which NULL-fills rows with no match — the reference's 'left' staging
    semantics. No pandas round trip, left row order preserved."""
    import pyarrow.compute as pc

    import ray

    right = (
        pa.Table.from_pandas(right_df, preserve_index=False)
        if isinstance(right_df, pd.DataFrame)
        else pa.table(right_df)
    )
    if right_cols is not None:
        right = right.select([on] + list(right_cols))
    keys = right[on].combine_chunks()
    if pc.count_distinct(keys).as_py() != len(right) or keys.null_count:
        raise ValueError("broadcast_join right side must be unique on the key "
                         "(many-to-one staging join contract, staging.cpp:198-236)")
    payload = right.drop_columns([on]).combine_chunks()
    ref = ray.put((keys, payload))

    class Joiner:
        def __init__(self):
            self.keys, self.payload = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(batch[on], value_set=self.keys)
            if how == "inner":
                valid = pc.is_valid(idx)
                batch = batch.filter(valid)
                idx = idx.filter(valid)
            taken = self.payload.take(idx)
            left_names = set(batch.column_names)
            for name in taken.column_names:
                out = name if name not in left_names else f"{name}_right"
                batch = batch.append_column(out, taken[name])
            return batch

    return ds.map_batches(
        Joiner, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )


def hash_join(
    ds_left,
    ds_right,
    *,
    on,
    right_on=None,
    how: str = "inner",
    num_partitions: int = 16,
):
    """Both sides large: Ray Data native hash join."""
    key = (on,) if isinstance(on, str) else tuple(on)
    rkey = None
    if right_on is not None:
        rkey = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return ds_left.join(
        ds_right,
        join_type=how,
        num_partitions=num_partitions,
        on=key,
        right_on=rkey,
    )


def semi_join_filter(ds, keys, *, on: str, anti: bool = False):
    """Keep rows whose key is (not) in the broadcast key set."""
    import ray

    arr = np.asarray(list(keys) if not isinstance(keys, np.ndarray) else keys)
    ref = ray.put(arr)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = np.isin(np.asarray(batch[on]), ks)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def bloom_semi_join(
    ds,
    keys_ds,
    *,
    on: str,
    keys_on=None,
    bits_per_key: int = 16,
    num_hashes: int = 6,
    max_bits: int = 1 << 33,
):
    """Broadcast-Bloom semi-join: keep `ds` rows whose integer `on` value is
    *probably* present in `keys_ds` — no false negatives, false-positive
    rate ~(1-e^(-k/b))^k ≈ 4e-4 at 16 bits/key, k=6.

    This is the scale path for semi joins whose key side is too big to
    broadcast exactly (`semi_join_filter`) but where shuffling the big side
    (`hash_join`) would move the whole table: the filter costs ONE pass over
    the small side + a fixed-size bitmap broadcast, and the big side never
    shuffles. Follow with an exact join when false positives matter — the
    near-dedup verify chain does exactly that (candidate-id bloom filter,
    then exact hash joins drop the FPs, so results are bit-identical to the
    unfiltered plan).

    The bitmap is built distributed: one partial bitmap per key block, then
    a tree of pairwise ORs as Ray tasks — the driver holds only refs, so a
    10^9-key build never funnels ids through the driver. Bitmap size is the
    next power of two >= bits_per_key x count(keys), capped at `max_bits`
    (1 GiB of bits; past the cap the FP rate degrades gracefully, never
    correctness). Integer keys only (doc ids / row ids); `keys_on` may name
    several columns of `keys_ds`, all of whose values are inserted (e.g.
    both endpoints of a candidate-pair edge list).
    """
    import ray

    from ..kernels.hashing import splitmix64

    keys_on = [on] if keys_on is None else (
        [keys_on] if isinstance(keys_on, str) else list(keys_on)
    )
    # Materialize once: count() + to_arrow_refs() would otherwise execute
    # the keys pipeline twice for callers that didn't pre-materialize.
    keys_ds = keys_ds.materialize()
    n_keys = keys_ds.count() * len(keys_on)
    if n_keys == 0:
        return ds.map_batches(
            lambda b: b.slice(0, 0), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    bits = 1 << max(14, int(np.ceil(np.log2(bits_per_key * n_keys))))
    bits = min(bits, max_bits)
    mask_bits = np.uint64(bits - 1)
    # per-probe seeds: fixed, so the filter is deterministic across runs
    seeds = splitmix64(
        np.arange(0x9E3779B9, 0x9E3779B9 + num_hashes, dtype=np.uint64)
    )

    def _ids_u64(col: pa.ChunkedArray) -> np.ndarray:
        arr = np.asarray(col)
        if not np.issubdtype(arr.dtype, np.integer):
            raise TypeError(
                f"bloom_semi_join needs integer keys, got {arr.dtype}"
            )
        return np.ascontiguousarray(arr, dtype=np.int64).view(np.uint64)

    @ray.remote
    def _partial(tbl: pa.Table) -> np.ndarray:
        bm = np.zeros(bits >> 6, dtype=np.uint64)
        for colname in keys_on:
            # empty partitions surface as zero-COLUMN blocks (same Ray
            # artifact the near-dedup joins guard against) — nothing to add
            if tbl.num_rows == 0:
                continue
            if colname not in tbl.column_names:
                # loud, not silent: a misnamed keys_on would otherwise
                # build an empty bitmap and filter EVERYTHING out
                raise KeyError(
                    f"bloom_semi_join: keys column {colname!r} not in "
                    f"keys_ds block (has {tbl.column_names})"
                )
            ids = _ids_u64(tbl[colname])
            for s in seeds:
                h = splitmix64(ids ^ s) & mask_bits
                np.bitwise_or.at(
                    bm, (h >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (h & np.uint64(63)),
                )
        return bm

    @ray.remote
    def _or(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.bitwise_or(a, b)

    refs = [_partial.remote(blk) for blk in keys_ds.to_arrow_refs()]
    while len(refs) > 1:  # tree OR-merge, O(log n) depth, driver holds refs
        nxt = [_or.remote(refs[i], refs[i + 1])
               for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    bloom_ref = refs[0]

    class BloomFilter:
        def __init__(self):
            self.bm = ray.get(bloom_ref)  # zero-copy plasma read

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            ids = _ids_u64(batch[on])
            keep = np.ones(len(ids), dtype=bool)
            for s in seeds:
                h = splitmix64(ids ^ s) & mask_bits
                w = self.bm[(h >> np.uint64(6)).astype(np.int64)]
                keep &= ((w >> (h & np.uint64(63))) & np.uint64(1)).astype(
                    bool
                )
            return batch.filter(pa.array(keep))

    return ds.map_batches(
        BloomFilter, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 16),
    )


def hash_split(ds, *, on: str, frac_train: float = 0.8, modulus: int = 1000):
    """Deterministic train/test split by key hash — the scale-correct
    replacement for the reference's seeded-mt19937 row sampling
    (split.random, getml/data/split/random.py:23-29): reproducible at any
    parallelism and stable across reruns."""

    def f(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[on])
        bucket = (k.astype(np.int64) % modulus + modulus) % modulus
        split = np.where(bucket < int(frac_train * modulus), "train", "test")
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def time_split(ds, *, ts_col: str, test_start):
    """Threshold split on a timestamp (split.time, getml/data/split/time.py)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        split = pc.if_else(
            pc.greater_equal(batch[ts_col], pa.scalar(test_start)),
            pa.scalar("test", pa.string()),
            pa.scalar("train", pa.string()),
        )
        return batch.append_column("split", split)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
