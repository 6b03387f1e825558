"""Block-schema hygiene shared across stages.

Ray's hash-shuffle aggregate/join emits zero-COLUMN blocks for empty
partitions; a downstream join or groupby then fails with 'No match for
key field reference' (flaky by partition emptiness) or logs 'RefBundle
with a different schema' warnings. Whenever the inter-stage schema is
statically known, chain `norm_empty_blocks` right after the wide op to
rewrite empty blocks with that schema — one shared helper instead of
per-call-site copies.
"""

from __future__ import annotations

import pyarrow as pa


def empty_block_normalizer(fields):
    """Return a map_batches fn that rewrites zero-column blocks to an
    empty table with the given [(name, type), ...] schema."""
    schema = pa.schema(list(fields))

    def f(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return schema.empty_table()
        return b

    return f


def norm_empty_blocks(ds, fields):
    """Chain the normalizer onto a Dataset after a Ray aggregate/join."""
    return ds.map_batches(
        empty_block_normalizer(fields),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
