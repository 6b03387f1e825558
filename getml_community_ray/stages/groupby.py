"""Vectorized distributed group-by for sum/count aggregates.

Ray Data's generic `groupby().aggregate()` sort-aggregates whole rows; for
the common sum/count case this stage is several times faster: per-batch
numpy partials (one row per distinct key per batch — the combiner), then a
hash-partitioned vectorized merge. Exact for any key distribution (integer
sums merge associatively; float sums follow partial order like any
distributed sum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rollup import crc_hash_sources


def _group_codes(batch: pa.Table, key_cols: list[str]):
    """Dense group codes for multi-column keys + per-key first row index."""
    code = None
    for c in key_cols:
        vals = np.asarray(batch[c])
        if vals.dtype.kind not in "iu":
            vals = vals.astype(str)
        _, inv = np.unique(vals, return_inverse=True)
        n = inv.max() + 1 if len(inv) else 1
        code = inv if code is None else code * n + inv
    uniq, first_ix, gid = np.unique(code, return_index=True, return_inverse=True)
    return gid, first_ix, len(uniq)


def _reduce(batch: pa.Table, key_cols: list[str], sum_cols: list[str],
            cnt_col: str) -> pa.Table:
    if len(batch) == 0:
        cols = {c: batch[c] for c in key_cols}
        for c in sum_cols:
            cols[c] = pa.array([], type=pa.float64())
        cols[cnt_col] = pa.array([], type=pa.int64())
        return pa.table(cols)
    gid, first_ix, G = _group_codes(batch, key_cols)
    cols = {c: batch[c].combine_chunks().take(pa.array(first_ix)) for c in key_cols}
    for c in sum_cols:
        v = np.asarray(batch[c], dtype=np.float64)
        cols[c] = pa.array(np.bincount(gid, weights=v, minlength=G))
    if cnt_col in batch.column_names:  # merging partials: sum the counts
        cnt = np.asarray(batch[cnt_col], dtype=np.int64)
        cols[cnt_col] = pa.array(np.bincount(gid, weights=cnt, minlength=G).astype(np.int64))
    else:
        cols[cnt_col] = pa.array(np.bincount(gid, minlength=G).astype(np.int64))
    return pa.table(cols)


def grouped_sums(
    ds,
    key_cols: list[str],
    sum_cols: list[str],
    *,
    cnt_col: str = "n",
    num_partitions: int = 16,
    combine_batch_size: int = 65536,
):
    """groupby(key_cols) computing SUM(sum_cols) + COUNT(*) as `cnt_col`."""

    def partial(b: pa.Table) -> pa.Table:
        return _reduce(b, key_cols, sum_cols, cnt_col)

    def add_part(b: pa.Table) -> pa.Table:
        h = np.zeros(len(b), dtype=np.int64)
        for c in key_cols:
            vals = np.asarray(b[c])
            if vals.dtype.kind in "iu":
                hv = vals.astype(np.int64)
            else:
                hv = crc_hash_sources(vals.astype(str))
            h = h * 0x9E3779B1 + hv
        return b.append_column(
            "_part", pa.array((h % num_partitions + num_partitions) % num_partitions)
        )

    return (
        ds.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=combine_batch_size,
        )
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: _reduce(
                t.drop_columns(["_part"]), key_cols, sum_cols, cnt_col
            ),
            batch_format="pyarrow",
        )
    )


def add_rank_by_key(ds, key_col: str, *, num_buckets: int = 64,
                    out_col: str = "rowid"):
    """Distributed zipWithIndex by key: rank = position of the row's key in
    the global ascending key order (0-based; ties get consecutive ranks in
    arbitrary-but-deterministic order, unique keys get exact ranks).

    The reference's `rowid` numbers rows in their (single-node) physical
    order (`FloatOpParser.cpp:286-288`); block order is not meaningful in a
    distributed Dataset, so the scale-correct contract is rank-by-key:
    pass 1 histograms keys into fixed buckets (one tiny driver reduction),
    pass 2 shuffles rows by bucket, sorts within the bucket, and adds the
    bucket's global offset.
    """
    import ray

    # pass 1: global min/max + per-bucket counts
    def mm(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col], dtype=np.float64)
        return pa.table({"mn": pa.array([k.min()]), "mx": pa.array([k.max()])})

    agg = ds.map_batches(mm, batch_format="pyarrow", zero_copy_batch=True)
    mn = agg.min("mn")
    mx = agg.max("mx")
    width = (mx - mn) / num_buckets or 1.0

    def bucket_of(k):
        return np.clip(((k - mn) / width).astype(np.int64), 0, num_buckets - 1)

    def hist(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col], dtype=np.float64)
        c = np.bincount(bucket_of(k), minlength=num_buckets)
        return pa.table(
            {
                "bucket": pa.array(np.arange(num_buckets, dtype=np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    counts = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .sum("c")
        .to_pandas()
        .sort_values("bucket")
    )
    full = np.zeros(num_buckets, dtype=np.int64)
    full[counts["bucket"].to_numpy()] = counts["sum(c)"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])
    off_ref = ray.put(offsets)

    def add_bucket(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col], dtype=np.float64)
        return b.append_column("_bucket", pa.array(bucket_of(k)))

    def rank_bucket(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        bkt = int(t["_bucket"][0].as_py())
        k = np.asarray(t[key_col], dtype=np.float64)
        order = np.argsort(k, kind="stable")
        rank = np.empty(len(k), dtype=np.int64)
        rank[order] = off[bkt] + np.arange(len(k))
        return t.drop_columns(["_bucket"]).append_column(out_col, pa.array(rank))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def hll_count_distinct(ds, *, key_col: str, group_col: str, p: int = 10):
    """Approximate per-group COUNT DISTINCT via HyperLogLog registers
    (kernels/sketches.py). The scale lane beside the exact
    count_distinct aggregation: each batch contributes O(m) integer
    register rows (a combiner — the shuffle moves registers, never
    values), merged by a max aggregate. Returns the REGISTER table
    (grp, reg, rho), bit-reproducible at any partitioning; fold with
    `hll_estimate` for the numeric estimate."""
    from ray.data.aggregate import Max

    from ..kernels.sketches import hll_rows

    def partial(b: pa.Table) -> pa.Table:
        keys = np.asarray(b[key_col])
        if keys.dtype.kind not in "iu":
            keys = crc_hash_sources(keys.astype(str))
        grp = np.asarray(b[group_col])
        uniq, gid = np.unique(grp, return_inverse=True)
        g_ix, reg, rho = hll_rows(
            keys.astype(np.int64).view(np.uint64), gid, len(uniq), p=p
        )
        return pa.table(
            {
                "grp": pa.array(uniq[g_ix]),
                "reg": pa.array(reg),
                "rho": pa.array(rho),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["grp", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
    )


def grouped_histogram(ds, *, value_col: str, group_col: str,
                      n_bins: int = 64):
    """Deterministic fixed-grid histogram per group — the bounded-memory
    approximate-quantile lane beside the holistic lane's exact quantiles
    (whose mergeable states are O(distinct values); this is O(n_bins)).

    Two linear passes: (1) per-group min/max (tiny partial rows, merged by
    a min/max aggregate, broadcast back); (2) per-batch bincount combiner
    -> sum merge. Output: integer rows (grp, bin, cnt) — deterministic at
    any partitioning, exact SQL twin (same IEEE double bin arithmetic).
    Quantiles fold from the histogram with error <= one bin width
    (kernels/sketches.histogram_quantile)."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def mm_partial(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col].combine_chunks(), dtype=np.float64)
        grp = np.asarray(b[group_col])
        uniq, gid = np.unique(grp, return_inverse=True)
        mn = np.full(len(uniq), np.inf)
        mx = np.full(len(uniq), -np.inf)
        np.minimum.at(mn, gid, v)
        np.maximum.at(mx, gid, v)
        return pa.table(
            {"grp": pa.array(uniq), "mn": pa.array(mn), "mx": pa.array(mx)}
        )

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("grp")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
    )
    bounds = {
        r.grp: (float(r.mn), float(r.mx)) for r in mm.itertuples(index=False)
    }
    ref = ray.put(bounds)

    def hist_partial(b: pa.Table) -> pa.Table:
        bd = ray.get(ref)
        v = np.asarray(b[value_col].combine_chunks(), dtype=np.float64)
        grp = np.asarray(b[group_col])
        uniq, gid = np.unique(grp, return_inverse=True)
        mn = np.array([bd[g][0] for g in uniq.tolist()])
        mx = np.array([bd[g][1] for g in uniq.tolist()])
        width = (mx - mn) / n_bins
        # degenerate group (all values equal): every row in bin 0 — the
        # SQL twin spells the same CASE
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = np.floor((v - mn[gid]) / width[gid])
        bins = np.where(
            width[gid] == 0.0, 0.0, np.minimum(raw, n_bins - 1)
        ).astype(np.int64)
        flat = gid * n_bins + bins
        acc = np.bincount(flat, minlength=len(uniq) * n_bins)
        nz = np.flatnonzero(acc)
        return pa.table(
            {
                "grp": pa.array(uniq[nz // n_bins]),
                "bin": pa.array((nz % n_bins).astype(np.int64)),
                "cnt": pa.array(acc[nz].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["grp", "bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def grouped_histogram_quantiles(
    ds, *, value_col: str, group_col: str, n_bins: int = 64,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
):
    """Quantile ESTIMATES per group from the fixed-grid histogram — the
    PromQL `histogram_quantile` analog over `grouped_histogram`'s sketch.
    Error <= one bin width; fully distributed: the histogram exchange is
    O(groups x n_bins) integer rows, the fold per group is O(n_bins).

    Estimate = the UPPER edge of the first bin whose cumulative count
    reaches ceil(q * n) (kernels/sketches.histogram_quantile) — every
    float op is spelled identically in the DuckDB twin, so the estimates
    hash-match exactly. Returns (grp, q, n, q_est)."""
    import ray

    from ray.data.aggregate import Max, Min

    hist = grouped_histogram(
        ds, value_col=value_col, group_col=group_col, n_bins=n_bins
    )

    # per-group (mn, mx) — recomputed as a tiny aggregate; broadcast once
    def mm_partial(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col].combine_chunks(), dtype=np.float64)
        grp = np.asarray(b[group_col])
        uniq, gid = np.unique(grp, return_inverse=True)
        mn = np.full(len(uniq), np.inf)
        mx = np.full(len(uniq), -np.inf)
        np.minimum.at(mn, gid, v)
        np.maximum.at(mx, gid, v)
        return pa.table(
            {"grp": pa.array(uniq), "mn": pa.array(mn), "mx": pa.array(mx)}
        )

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("grp")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
    )
    bounds = {
        r.grp: (float(r.mn), float(r.mx)) for r in mm.itertuples(index=False)
    }
    ref = ray.put(bounds)
    q_arr = np.asarray(qs, dtype=np.float64)

    def fold(t: pa.Table) -> pa.Table:
        bd = ray.get(ref)
        grp = t["grp"][0].as_py()
        mn, mx = bd[grp]
        b = np.asarray(t["bin"], dtype=np.int64)
        c = np.asarray(t["cnt"], dtype=np.int64)
        order = np.argsort(b)
        b, c = b[order], c[order]
        n = int(c.sum())
        cum = np.cumsum(c)
        width = (mx - mn) / n_bins
        targets = np.maximum(1, np.ceil(q_arr * n)).astype(np.int64)
        ix = np.searchsorted(cum, targets, side="left")
        est = mn + (b[ix] + 1) * width
        return pa.table(
            {
                "grp": pa.array([grp] * len(q_arr)),
                "q": pa.array(q_arr),
                "n": pa.array(np.full(len(q_arr), n, dtype=np.int64)),
                "q_est": pa.array(est),
            }
        )

    return hist.groupby("grp").map_groups(fold, batch_format="pyarrow")


def cms_counters(ds, *, key_col: str, depth: int = 4, width: int = 1024):
    """Count-min sketch counter table over a key column — the mergeable
    heavy-hitter / point-frequency lane beside exact group counts
    (kernels/sketches.cms_rows). Each batch contributes O(depth x width)
    integer rows (combiner); ONE tiny groupby merges by sum. Returns
    (row_j, slot, cnt), bit-reproducible at any partitioning; probe with
    `cms_point_estimate`.

    Key contract: negative integer keys wrap mod 2^64 (int64 view as
    uint64) — the SQL twin must wrap identically (CASE ... + 2^64 before
    CAST AS UBIGINT; a bare CAST raises in DuckDB on negatives)."""
    from ray.data.aggregate import Sum

    from ..kernels.sketches import cms_rows

    def partial(b: pa.Table) -> pa.Table:
        keys = np.asarray(b[key_col])
        if keys.dtype.kind not in "iu":
            keys = crc_hash_sources(keys.astype(str))
        j, slot, cnt = cms_rows(
            keys.astype(np.int64).view(np.uint64), depth=depth, width=width
        )
        return pa.table(
            {
                "row_j": pa.array(j),
                "slot": pa.array(slot),
                "cnt": pa.array(cnt),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=65536)
        .groupby(["row_j", "slot"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def grouped_topk(ds, *, key_col: str, value_col: str, id_col: str, k: int):
    """Per-key top-k rows by value (ties broken by smallest id) — the
    grouped leaderboard beside the global sort+limit.

    Scale shape: a per-batch combiner prunes each key to its local
    top-k BEFORE the shuffle (exchange carries <= k rows per key per
    batch); one groupby finishes the selection. Deterministic at any
    partitioning: ordering key is (value desc, id asc)."""

    def local_topk(b: pa.Table) -> pa.Table:
        key = np.asarray(b[key_col])
        v = np.asarray(b[value_col], dtype=np.int64)
        i = np.asarray(b[id_col], dtype=np.int64)
        if len(key) == 0:
            return b
        ks = key.astype(str) if key.dtype.kind not in "iu" else key
        order = np.lexsort((i, -v, ks))
        kk = ks[order]
        new = np.ones(len(kk), dtype=bool)
        if len(kk) > 1:
            new[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(new)
        grp_start = np.repeat(starts, np.diff(np.append(starts, len(kk))))
        rank = np.arange(len(kk)) - grp_start
        keep = order[rank < k]
        return b.take(pa.array(np.sort(keep)))

    pruned = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    def final_topk(t: pa.Table) -> pa.Table:
        t = local_topk(t)
        v = np.asarray(t[value_col], dtype=np.int64)
        i = np.asarray(t[id_col], dtype=np.int64)
        order = np.lexsort((i, -v))
        t = t.take(pa.array(order))
        return t.append_column(
            "rank", pa.array(np.arange(1, len(t) + 1, dtype=np.int64))
        )

    return pruned.groupby(key_col).map_groups(
        final_topk, batch_format="pyarrow"
    )


def heavy_hitters(make_ds, *, key_col: str, k: int):
    """Keys with global frequency STRICTLY greater than n/k, with EXACT
    counts — the phi-heavy-hitter primitive (reference exposes only full
    group counts; at 100 TB a groupby over all distinct keys to find the
    few heavy ones is the wrong exchange).

    Candidate-bounded two-pass shape (Misra-Gries pigeonhole):

    1. per-batch EXACT counts (np.unique inside the batch) emit only keys
       with count_b * k > n_b. If count(x) > n/k globally, some batch has
       count_b(x)/n_b > 1/k (pigeonhole), so the union of batch summaries
       is a SUPERSET of the true heavy hitters; each batch contributes
       < k rows, so the exchange is O(k x num_batches), never the rows.
    2. the deduped candidate set (driver state, < k x num_batches keys)
       is broadcast via ray.put; one more streaming pass counts ONLY
       candidate keys exactly (np.isin screen, combiner partials, one
       candidate-sized groupby-sum), and count * k > n filters the final
       answer. n_total rides along pass 1 as null-keyed sentinel rows, so
       the input executes exactly twice.

    `make_ds` is a zero-arg callable returning the input Dataset (two
    passes — a Dataset can't be iterated twice). Returns (key, n) sorted
    by key. Deterministic at any partitioning/batching."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if k < 2:
        raise ValueError("k must be >= 2")

    key_types: dict[str, object] = {}

    def batch_heavy(b: pa.Table) -> pa.Table:
        # candidates above the batch 1/k threshold, plus ONE null-keyed
        # sentinel row carrying the batch size so n_total comes out of the
        # same pass (the operator is strictly two passes over the input)
        keys = np.asarray(b[key_col])
        n_b = len(keys)
        if n_b == 0:
            uniq = keys[:0]
            keep = np.zeros(0, dtype=bool)
        else:
            uniq, cnt = np.unique(keys, return_counts=True)
            keep = cnt * k > n_b
        key_arr = pa.array(uniq[keep], type=b[key_col].type)
        return pa.table({
            key_col: pa.concat_arrays(
                [key_arr, pa.array([None], type=b[key_col].type)]
            ),
            "n_b": pa.array(
                np.concatenate([np.zeros(len(key_arr), dtype=np.int64),
                                [n_b]])
            ),
        })

    summ = (
        make_ds()
        .select_columns([key_col])
        .map_batches(batch_heavy, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=65536)
        .to_pandas()  # candidate-sized (< (k+1) rows per batch)
    )
    n_total = int(summ.loc[summ[key_col].isna(), "n_b"].sum())
    cand_vals = summ.loc[~summ[key_col].isna(), key_col].unique()
    if len(cand_vals) == 0:
        sch = make_ds().schema()
        ktype = dict(zip(sch.names, sch.types))[key_col]
        return rd.from_arrow(pa.table({
            key_col: pa.array([], type=ktype),
            "n": pa.array([], type=pa.int64()),
        }))
    cand = np.sort(np.asarray(cand_vals))
    cand_ref = ray.put(cand)

    def count_candidates(b: pa.Table) -> pa.Table:
        keys = np.asarray(b[key_col])
        c = ray.get(cand_ref)
        keys = keys[np.isin(keys, c)]
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table({
            key_col: pa.array(uniq, type=b[key_col].type),
            "n": pa.array(cnt.astype(np.int64)),
        })

    counted = (
        make_ds()
        .select_columns([key_col])
        .map_batches(count_candidates, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=65536)
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
    )

    # By definition at most k-1 keys can exceed n/k, so the confirmed
    # result is O(k): assemble it driver-side with an explicit schema
    # (an all-filtered empty Dataset would otherwise lose its columns).
    key_type = None
    parts = []
    for b in counted.iter_batches(batch_size=65536, batch_format="pyarrow"):
        key_type = key_type or b[key_col].type
        n = np.asarray(b["n"], dtype=np.int64)
        parts.append(b.filter(pa.array(n * k > n_total)))
    schema = pa.schema([(key_col, key_type or pa.int64()),
                        ("n", pa.int64())])
    parts = [p.cast(schema) for p in parts if p.num_rows]
    if not parts:
        return rd.from_arrow(schema.empty_table())
    final = pa.concat_tables(parts)
    order = np.argsort(np.asarray(final[key_col]), kind="stable")
    return rd.from_arrow(final.take(pa.array(order)))


def pivot_counts(ds, *, key_col: str, cat_col: str, categories: list[str]):
    """Pivot a categorical column to wide per-key count columns
    (`c_<category>`), plus `c_other` for values outside the list — the
    classic long->wide reshape with a STATIC schema (the category list
    must be given, as at 100 TB a data-derived schema would need an extra
    full pass; pair with CategoryTrimmer/vocabulary to pick the list).

    Decomposable: per-batch bincount combiner emits <= distinct-keys rows
    with all count columns; ONE native groupby-sum merges. Exchange is
    O(keys x categories) integers, never the input rows."""
    from ray.data.aggregate import Sum

    cats = list(categories)
    cat_to_ix = {c: i for i, c in enumerate(cats)}
    n_cat = len(cats) + 1  # trailing slot = other
    col_names = [f"c_{c}" for c in cats] + ["c_other"]

    def partial(b: pa.Table) -> pa.Table:
        key = np.asarray(b[key_col])
        cat = np.asarray(b[cat_col]).astype(str)
        uniq, gid = np.unique(key, return_inverse=True)
        # vectorized category -> index (sorted lookup over the fixed list)
        sc = np.sort(np.array(cats))
        pos = np.searchsorted(sc, cat)
        pos_c = np.minimum(pos, len(sc) - 1)
        hit = sc[pos_c] == cat if len(sc) else np.zeros(len(cat), bool)
        cix = np.full(len(cat), n_cat - 1, dtype=np.int64)
        if len(sc):
            # map back from sorted position to the caller's column order
            order_ix = np.argsort(np.array(cats), kind="stable")
            cix[hit] = order_ix[pos_c[hit]]
        acc = np.bincount(
            gid * n_cat + cix, minlength=len(uniq) * n_cat
        ).reshape(len(uniq), n_cat)
        out = {key_col: pa.array(uniq)}
        for j, name in enumerate(col_names):
            out[name] = pa.array(acc[:, j].astype(np.int64))
        return pa.table(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(*[Sum(n, alias_name=n) for n in col_names])
    )


def grouping_sets_counts(
    ds,
    *,
    dim_a: str,
    dim_b_us,
    value_col: str,
    num_partitions: int | None = None,
):
    """SQL GROUPING SETS ((a, b), (a), (b), ()) — count + int64 sum at all
    four aggregation levels in ONE pass over the input: the per-batch
    combiner collapses to finest-level (a, b) partials, one packed-key
    exchange produces exact (a, b) totals, and the coarser levels fold
    from the finest (tier-cascade style) in a final output-sized task.
    `dim_b_us(batch) -> int64 ndarray` computes the second dimension
    (e.g. a day bucket). Output: (a | NULL, b_us | NULL, n, s)."""
    import ray
    import ray.data as rd

    from ..kernels.hashing import splitmix64
    from .partitioning import auto_partitions
    from .rollup import crc_hash_sources

    parts = num_partitions or auto_partitions(ds)

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"a": pa.array([], type=pa.string()),
                 "b_us": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.int64())}
            )
        a = np.asarray(b[dim_a]).astype(str)
        bu = dim_b_us(b)
        v = np.asarray(b[value_col], dtype=np.int64)
        ua, ai = np.unique(a, return_inverse=True)
        ub, bi = np.unique(bu, return_inverse=True)
        key = ai.astype(np.int64) * len(ub) + bi
        uk, first_ix, gid = np.unique(key, return_index=True,
                                      return_inverse=True)
        n = np.bincount(gid, minlength=len(uk))
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, gid, v)
        return pa.table(
            {"a": pa.array(a[first_ix], type=pa.string()),
             "b_us": pa.array(bu[first_ix]),
             "n": pa.array(n.astype(np.int64)),
             "s": pa.array(s)}
        )

    def add_part(b: pa.Table) -> pa.Table:
        h = splitmix64(
            crc_hash_sources(np.asarray(b["a"]).astype(str)).view(np.uint64)
            ^ np.asarray(b["b_us"], dtype=np.int64).view(np.uint64)
        )
        return b.append_column(
            "_part", pa.array((h % np.uint64(parts)).astype(np.int64))
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"a": pa.array([], type=pa.string()),
                 "b_us": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.int64())}
            )
        a = np.asarray(t["a"]).astype(str)
        bu = np.asarray(t["b_us"], dtype=np.int64)
        n = np.asarray(t["n"], dtype=np.int64)
        s = np.asarray(t["s"], dtype=np.int64)
        ua, ai = np.unique(a, return_inverse=True)
        ub, bi = np.unique(bu, return_inverse=True)
        key = ai.astype(np.int64) * len(ub) + bi
        uk, first_ix, gid = np.unique(key, return_index=True,
                                      return_inverse=True)
        nn = np.zeros(len(uk), dtype=np.int64)
        ss = np.zeros(len(uk), dtype=np.int64)
        np.add.at(nn, gid, n)
        np.add.at(ss, gid, s)
        return pa.table(
            {"a": pa.array(a[first_ix], type=pa.string()),
             "b_us": pa.array(bu[first_ix]),
             "n": pa.array(nn),
             "s": pa.array(ss)}
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=65536)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(lambda t: merge(t.drop_columns(["_part"])),
                    batch_format="pyarrow")
    )

    # coarser levels fold from the finest — output-sized, one task
    tbls = [t for t in ray.get(fine.to_arrow_refs()) if t.num_rows]
    if not tbls:
        base = pa.table(
            {"a": pa.array([], type=pa.string()),
             "b_us": pa.array([], type=pa.int64()),
             "n": pa.array([], type=pa.int64()),
             "s": pa.array([], type=pa.int64())}
        )
    else:
        base = pa.concat_tables(tbls)
    a = np.asarray(base["a"]).astype(str)
    bu = np.asarray(base["b_us"], dtype=np.int64)
    n = np.asarray(base["n"], dtype=np.int64)
    s = np.asarray(base["s"], dtype=np.int64)

    out_a, out_b, out_n, out_s = [], [], [], []
    # (a, b) level
    out_a.append(pa.array(a, type=pa.string()))
    out_b.append(pa.array(bu))
    out_n.append(pa.array(n))
    out_s.append(pa.array(s))
    if len(a):
        ua, ai = np.unique(a, return_inverse=True)
        nn = np.zeros(len(ua), dtype=np.int64); ss = np.zeros(len(ua), dtype=np.int64)
        np.add.at(nn, ai, n); np.add.at(ss, ai, s)
        out_a.append(pa.array(ua, type=pa.string()))
        out_b.append(pa.nulls(len(ua), pa.int64()))
        out_n.append(pa.array(nn)); out_s.append(pa.array(ss))
        ub, bi = np.unique(bu, return_inverse=True)
        nn = np.zeros(len(ub), dtype=np.int64); ss = np.zeros(len(ub), dtype=np.int64)
        np.add.at(nn, bi, n); np.add.at(ss, bi, s)
        out_a.append(pa.nulls(len(ub), pa.string()))
        out_b.append(pa.array(ub))
        out_n.append(pa.array(nn)); out_s.append(pa.array(ss))
        out_a.append(pa.nulls(1, pa.string()))
        out_b.append(pa.nulls(1, pa.int64()))
        out_n.append(pa.array([int(n.sum())])); out_s.append(pa.array([int(s.sum())]))
    final = pa.table(
        {"a": pa.concat_arrays([x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in out_a]),
         "b_us": pa.concat_arrays([x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in out_b]),
         "n": pa.concat_arrays([x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in out_n]),
         "s": pa.concat_arrays([x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in out_s])}
    )
    return rd.from_arrow(final)
