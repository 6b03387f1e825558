"""Token-array analytics over pre-tokenized sequence tables (the
input_hint payload: `tokens: list<int32>`).

Scale design: every operator here is a per-batch combiner over the
FLATTENED token values (zero-copy Arrow ListArray -> values buffer) that
shrinks a batch to O(vocab) integer rows BEFORE any shuffle — the exchange
carries per-(batch, token) partial counts, never raw token arrays. The
token payload itself never enters a shuffle (same invariant as the rollup
lanes; `/root/reference` has no token concept — these are the
training-data-pipeline extensions the graft calls for)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def token_histogram(ds, *, tokens_col: str = "tokens"):
    """Corpus-wide token-id frequency table: (token_id, cnt).

    Per-batch bincount over the flattened list values (token ids are
    small non-negative ints, so bincount is a single O(n) pass with an
    O(vocab) dense scratch), emitting only the nonzero ids; ONE tiny
    groupby merges the per-batch partials. Exchange volume is
    O(batches x vocab), independent of corpus token count."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = b[tokens_col].combine_chunks()
        # flatten() honors the array's offset window (values() would leak
        # sibling rows of a sliced block)
        vals = np.asarray(toks.flatten(), dtype=np.int64)
        if len(vals) == 0:
            return pa.table(
                {
                    "token_id": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        acc = np.bincount(vals)
        nz = np.flatnonzero(acc)
        return pa.table(
            {
                "token_id": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(acc[nz].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .groupby("token_id")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def token_bigram_counts(ds, *, tokens_col: str = "tokens", top_k: int = 100):
    """Top-k adjacent token bigrams across the corpus: (t0, t1, cnt).

    Bigrams never cross row boundaries. Per-batch combiner packs each
    bigram into one int64 key (vocab fits 2^31), counts via np.unique,
    merges through ONE groupby, then a small sort+limit —
    the exchange carries per-batch distinct bigrams only."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks = b[tokens_col].combine_chunks()
        flat = toks.flatten()
        vals = np.asarray(flat, dtype=np.int64)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        empty = pa.table(
            {
                "t0": pa.array([], type=pa.int64()),
                "t1": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        if len(vals) < 2:
            return empty
        # mask out the pair that would span row i's last and row i+1's
        # first token
        keep = np.ones(len(vals) - 1, dtype=bool)
        ends = off[1:-1] - 1
        keep[ends[(ends >= 0) & (ends < len(keep))]] = False
        a = vals[:-1][keep]
        bb = vals[1:][keep]
        if len(a) == 0:
            return empty
        key = (a << 31) | bb
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "t0": pa.array(uniq >> 31),
                "t1": pa.array(uniq & ((1 << 31) - 1)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    merged = (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .groupby(["t0", "t1"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return merged.sort(["cnt", "t0", "t1"], descending=[True, False, False]).limit(
        top_k
    )
