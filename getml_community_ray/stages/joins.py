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
    """Map-side join against a small pandas table (one-to-one/many-to-one —
    the reference errors on >1 match; pandas merge keeps the reference's
    NULL-fill-on-no-match behavior for 'left')."""
    import ray

    if right_cols is not None:
        right_df = right_df[[on] + right_cols]
    if right_df[on].duplicated().any():
        raise ValueError("broadcast_join right side must be unique on the key "
                         "(many-to-one staging join contract, staging.cpp:198-236)")
    ref = ray.put(right_df)

    class Joiner:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.right, on=on, how=how)

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=(1, 8))


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
