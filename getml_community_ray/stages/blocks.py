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


def drop_empty_blocks(ds, fields):
    """Rebuild a Dataset from only its non-empty blocks (schema-preserving).

    `norm_empty_blocks` can't fix every case: when a Project/map chain is
    fused, the executor never hands a 0-row input block to the UDF, so a
    zero-column block can flow through untouched and break a downstream
    Acero join ('No match for key field reference'). This helper
    materializes the (small — use only on candidate-sized datasets) input,
    keeps the non-empty block refs (rows never touch the driver; a tiny
    remote fn reports per-block row counts) and rebuilds the Dataset; if
    everything was empty it returns one empty block with the given
    [(name, type), ...] schema."""
    import ray
    import ray.data as rd

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    refs = ds.to_arrow_refs()
    ns = ray.get([_nrows.remote(r) for r in refs])
    keep = [r for r, n in zip(refs, ns) if n > 0]
    if not keep:
        return rd.from_arrow(pa.schema(list(fields)).empty_table())
    return rd.from_arrow_refs(keep)
