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
