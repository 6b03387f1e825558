"""Salted-key skew mitigation: two-level partial-state merge.

The reference statically range-partitions rows and a hot join key stalls one
thread (`FastProp.cpp:1400-1443`, no mitigation). Here hot keys are spread
explicitly (north-star requirement):

    phase 0 (combiner): per-batch partial states — a hot key contributes at
        most ONE partial row per batch, but with many batches its partials
        still all hash to one reducer;
    phase 1 (salted merge): partials are partitioned by
        hash(key) * SALT + salt, salt = row_index % SALT, so one hot key's
        partial stream is merged by SALT reducers in parallel;
    phase 2 (final merge): the <= SALT surviving rows per key are merged by
        hash(key) — each reducer now sees O(keys/P * SALT) tiny rows.

Used for count/sum-style mergeable states (word counts, category counts).
For the rollup lanes, skew is handled structurally instead: the partition
unit (source, coarse-bucket) bounds any hot source's group to one day, and
the clustered lanes keep hot keys out of the exchange entirely.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rollup import crc_hash_sources


def salted_group_count(
    ds,
    key_col: str,
    *,
    num_partitions: int = 16,
    salt: int = 8,
):
    """Distributed count-by-key with two-level salted merge; exact for any
    key distribution, scales for Zipf-hot keys."""

    def partial(b: pa.Table) -> pa.Table:
        vals = np.asarray(b[key_col]).astype(str)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table(
            {
                key_col: pa.array(uniq, type=pa.string()),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def add_salted_part(b: pa.Table) -> pa.Table:
        h = crc_hash_sources(np.asarray(b[key_col]).astype(str))
        s = np.arange(len(b), dtype=np.int64) % salt
        part = ((h * np.int64(salt) + s) % (num_partitions * salt)).astype(
            np.int64
        )
        return b.append_column("_part", pa.array(part))

    def merge(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[key_col]).astype(str)
        cnt = np.asarray(t["cnt"])
        uniq, inv = np.unique(vals, return_inverse=True)
        # int64 scatter-add: float64 bincount weights lose exactness past 2^53
        out = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(out, inv, np.asarray(cnt, dtype=np.int64))
        return pa.table(
            {
                key_col: pa.array(uniq, type=pa.string()),
                "cnt": pa.array(out),
            }
        )

    def add_final_part(b: pa.Table) -> pa.Table:
        h = crc_hash_sources(np.asarray(b[key_col]).astype(str))
        return b.append_column(
            "_part", pa.array((h % num_partitions).astype(np.int64))
        )

    salted = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_salted_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: merge(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )
    return (
        salted.map_batches(
            add_final_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_part")
        .map_groups(
            lambda t: merge(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )
