"""Dataset integrity: order-invariant content checksum.

The 100 TB copy-verification primitive: after a migration, compaction or
re-partition, prove the data is the same WITHOUT sorting or shuffling
anything — per row a chained splitmix64 over the identity columns, summed
mod 2^64 (addition is commutative, so any block order / partitioning gives
the same digest). One stateless streaming pass; the exchange is two int64
limb sums per batch.

Reference analog: getML fingerprints DataFrames for its caches
(`src/engine/src/engine/DataFrameTracker.cpp:18-120`); this is the
distributed, order-invariant version of that fingerprint."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import splitmix64

_M64 = 1 << 64


def dataset_checksum(ds, *, int_cols: list[str]):
    """Order-invariant checksum over int64-encodable columns.

    Per row: h = splitmix64(col0) then h = splitmix64(h ^ coli) for each
    further column (chained, so column order is part of the identity).
    Digest = sum of h mod 2^64, plus the row count. Per-batch partials
    carry the sum as two 32-bit limbs in int64 columns, so Ray's native
    Sum merges them without overflow for up to 2^31 batches; the driver
    reassembles mod 2^64. Returns a one-row Table
    (n_rows:int64, checksum:int64 — two's-complement of the uint64
    digest, matching the SQL twin's signed cast)."""
    from ray.data.aggregate import Sum

    if not int_cols:
        raise ValueError("need at least one column")

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"n": pa.array([], type=pa.int64()),
                 "lo": pa.array([], type=pa.int64()),
                 "hi": pa.array([], type=pa.int64())}
            )
        h = splitmix64(
            np.asarray(b[int_cols[0]], dtype=np.int64).view(np.uint64)
        )
        for c in int_cols[1:]:
            h = splitmix64(
                h ^ np.asarray(b[c], dtype=np.int64).view(np.uint64)
            )
        lo = int((h & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
        hi = int((h >> np.uint64(32)).sum(dtype=np.uint64))
        # limb sums of a 65536-row batch fit well inside int64
        return pa.table(
            {"n": pa.array([len(b)], type=pa.int64()),
             "lo": pa.array([lo & (_M64 - 1)], type=pa.int64()),
             "hi": pa.array([hi & (_M64 - 1)], type=pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=65536)
        .aggregate(Sum("n", alias_name="n"),
                   Sum("lo", alias_name="lo"),
                   Sum("hi", alias_name="hi"))
    )
    n = int(agg["n"] or 0)
    digest = ((int(agg["lo"] or 0) + (int(agg["hi"] or 0) << 32)) % _M64)
    signed = digest - _M64 if digest >= (1 << 63) else digest
    return pa.table(
        {"n_rows": pa.array([n], type=pa.int64()),
         "checksum": pa.array([signed], type=pa.int64())}
    )


def dataset_checksum_sql(table: str, *, int_cols: list[str],
                         where: str = "") -> str:
    """DuckDB twin: the identical chained splitmix64 + HUGEINT sum mod
    2^64, signed-cast to BIGINT."""
    from ..kernels.hashing import SQL_M64, sql_signed64, sql_splitmix64_cols

    frags: list[str] = []
    prev = None
    for i, c in enumerate(int_cols):
        x = (
            f"CAST(CASE WHEN {c} < 0 THEN CAST({c} AS HUGEINT) + {SQL_M64} "
            f"ELSE CAST({c} AS HUGEINT) END AS UBIGINT)"
        )
        expr = x if prev is None else f"xor({prev}, {x})"
        frags.extend(sql_splitmix64_cols(expr, f"c{i}_"))
        prev = f"c{i}_out"
    sm = ",\n       ".join(frags)
    wh = f"WHERE {where}" if where else ""
    return f"""
WITH h AS (
  SELECT {sm}
  FROM {table} {wh})
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       {sql_signed64(f"CAST(SUM(CAST({prev} AS HUGEINT)) % {SQL_M64} AS UBIGINT)")}
           AS checksum
FROM h
"""
