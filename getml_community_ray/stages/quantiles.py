"""Distributed EXACT quantiles without a global sort: iterative histogram
refinement (multi-pass selection).

A full `ds.sort(value)` is an all-to-all shuffle of every row — the one
thing a 100 TB engine must not do for a 3-number answer. This lane instead
finds the exact rank-k element with O(log_B(range)) streaming passes, each
pass carrying only O(B * n_quantiles) int64 counters through the object
store (B = 4096 buckets): for integer cents spanning ~1e6 distinct values
that is 2 passes. The classic distributed selection algorithm
(Blum et al. selection generalized to histogram bisection; the same
refinement loop DuckDB itself uses for windowed MODE).

Rank semantics: value at 1-indexed rank ceil(q * n / 100) of the ascending
multiset — deterministic under ties and spelled identically in the SQL
twin (ROW_NUMBER join), so the oracle is exact.

Reference analog: getML's column-level eager aggregates include quantiles
computed by per-column sort (src/engine/include/fastprop/algorithm/
Aggregator.hpp MEDIAN branch); this replaces the sort with streaming
refinement so the aggregate stays exact at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def exact_quantiles(
    make_ds,
    *,
    value_col: str,
    q_pcts: list[int],
    n_buckets: int = 4096,
):
    """Exact integer quantiles over `value_col` (int64-encodable values).

    `make_ds` is a zero-arg factory returning the input Dataset — each
    refinement pass re-executes the (lazy, streaming) read rather than
    pinning the corpus in memory; passes = O(log_B(value range)).

    Returns a pyarrow Table (q_pct, value) — driver-side tiny result, the
    shape of an aggregate, not a Dataset."""
    from ray.data.aggregate import Count, Max, Min

    q_pcts = sorted(set(int(q) for q in q_pcts))
    if not q_pcts or any(q < 0 or q > 100 for q in q_pcts):
        raise ValueError("q_pcts must be integer percentages in [0, 100]")

    stats = (
        make_ds()
        .aggregate(
            Count(),
            Min(value_col, alias_name="mn"),
            Max(value_col, alias_name="mx"),
        )
    )
    n = int(stats["count()"])
    if n == 0:
        return pa.table(
            {"q_pct": pa.array([], type=pa.int64()),
             "value": pa.array([], type=pa.int64())}
        )
    gmin, gmax = int(stats["mn"]), int(stats["mx"])

    # per-quantile state: inclusive bracket [lo, hi] + remaining rank
    # inside it (1-indexed).  rank 0 (q=0) clamps to rank 1 = the minimum.
    lo = np.full(len(q_pcts), gmin, dtype=np.int64)
    hi = np.full(len(q_pcts), gmax, dtype=np.int64)
    rank = np.array(
        [max(1, -(-q * n // 100)) for q in q_pcts], dtype=np.int64
    )

    while True:
        active = np.flatnonzero(lo < hi)
        if len(active) == 0:
            break
        a_lo, a_hi = lo[active].copy(), hi[active].copy()
        width = np.maximum(1, -(-(a_hi - a_lo + 1) // n_buckets))

        def hist(b: pa.Table, a_lo=a_lo, a_hi=a_hi, width=width) -> pa.Table:
            v = np.asarray(b[value_col], dtype=np.int64)
            qs, bks, cts = [], [], []
            for j in range(len(a_lo)):
                m = (v >= a_lo[j]) & (v <= a_hi[j])
                if not m.any():
                    continue
                bk = (v[m] - a_lo[j]) // width[j]
                cnt = np.bincount(bk)
                nz = np.flatnonzero(cnt)
                qs.append(np.full(len(nz), j, dtype=np.int64))
                bks.append(nz.astype(np.int64))
                cts.append(cnt[nz].astype(np.int64))
            if not qs:
                return pa.table(
                    {"qid": pa.array([], type=pa.int64()),
                     "bucket": pa.array([], type=pa.int64()),
                     "n": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {"qid": pa.array(np.concatenate(qs)),
                 "bucket": pa.array(np.concatenate(bks)),
                 "n": pa.array(np.concatenate(cts))}
            )

        from ray.data.aggregate import Sum

        rows = (
            make_ds()
            .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["qid", "bucket"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )  # O(n_buckets * n_active) rows — an aggregate-sized result
        by_q: dict[int, list[tuple[int, int]]] = {}
        for r in rows:
            by_q.setdefault(int(r["qid"]), []).append(
                (int(r["bucket"]), int(r["n"]))
            )
        for j in range(len(active)):
            g = active[j]
            pairs = sorted(by_q.get(j, []))
            cum = 0
            for bk, cnt in pairs:
                if cum + cnt >= rank[g]:
                    rank[g] -= cum
                    lo[g] = a_lo[j] + bk * width[j]
                    hi[g] = min(a_hi[j], a_lo[j] + (bk + 1) * width[j] - 1)
                    break
                cum += cnt
            else:  # pragma: no cover - rank exceeds bracket population
                raise AssertionError("rank fell outside its bracket")

    return pa.table(
        {"q_pct": pa.array(np.array(q_pcts, dtype=np.int64)),
         "value": pa.array(lo)}
    )


def grouped_exact_quantiles(
    make_ds,
    *,
    key_col: str,
    value_col: str,
    q_pcts: list[int],
    n_buckets: int = 1024,
):
    """Per-key exact integer quantiles WITHOUT per-key sorts: the same
    multi-pass histogram refinement as `exact_quantiles`, with one bracket
    per (key, quantile) refined simultaneously — each pass is one
    streaming scan, fully vectorized per batch (per-row bracket params
    gathered by key index; one bincount over packed (key, q, bucket)
    ids). Passes = O(log_B(range)) regardless of key count.

    Driver state is O(keys x quantiles) int64 — the same size as the
    result itself (the bound any grouped-quantile output already has).
    Returns a pyarrow Table (key, q_pct, value)."""
    from ray.data.aggregate import Count, Max, Min

    q_pcts = sorted(set(int(q) for q in q_pcts))
    if not q_pcts or any(q < 0 or q > 100 for q in q_pcts):
        raise ValueError("q_pcts must be integer percentages in [0, 100]")
    nq = len(q_pcts)

    stats = (
        make_ds()
        .groupby(key_col)
        .aggregate(
            Count(),
            Min(value_col, alias_name="mn"),
            Max(value_col, alias_name="mx"),
        )
        .take_all()
    )
    if not stats:
        return pa.table(
            {"key": pa.array([], type=pa.string()),
             "q_pct": pa.array([], type=pa.int64()),
             "value": pa.array([], type=pa.int64())}
        )
    stats.sort(key=lambda r: r[key_col])
    keys = np.array([r[key_col] for r in stats])
    counts = np.array([int(r["count()"]) for r in stats], dtype=np.int64)
    gmin = np.array([int(r["mn"]) for r in stats], dtype=np.int64)
    gmax = np.array([int(r["mx"]) for r in stats], dtype=np.int64)
    nk = len(keys)

    lo = np.repeat(gmin, nq).reshape(nk, nq)
    hi = np.repeat(gmax, nq).reshape(nk, nq)
    rank = np.empty((nk, nq), dtype=np.int64)
    for j, q in enumerate(q_pcts):
        rank[:, j] = np.maximum(1, -(-q * counts // 100))

    while (lo < hi).any():
        width = np.maximum(1, -(-(hi - lo + 1) // n_buckets))
        lo_c, hi_c, width_c = lo.copy(), hi.copy(), width.copy()

        def hist(b: pa.Table, lo=lo_c, hi=hi_c, width=width_c) -> pa.Table:
            k = np.asarray(b[key_col])
            v = np.asarray(b[value_col], dtype=np.int64)
            kix = np.searchsorted(keys, k)
            # rows whose key is known (always true for a consistent ds)
            slot_ids, slot_cnt = [], []
            for j in range(nq):
                l = lo[kix, j]
                w = width[kix, j]
                m = (v >= l) & (v <= hi[kix, j])
                if not m.any():
                    continue
                bk = (v[m] - l[m]) // w[m]
                sid = (kix[m] * nq + j) * n_buckets + bk
                slot_ids.append(sid)
            if not slot_ids:
                return pa.table(
                    {"sid": pa.array([], type=pa.int64()),
                     "n": pa.array([], type=pa.int64())}
                )
            sid = np.concatenate(slot_ids)
            u, c = np.unique(sid, return_counts=True)
            return pa.table(
                {"sid": pa.array(u), "n": pa.array(c.astype(np.int64))}
            )

        from ray.data.aggregate import Sum

        rows = (
            make_ds()
            .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("sid")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        acc: dict[int, list[tuple[int, int]]] = {}
        for r in rows:
            sid = int(r["sid"])
            acc.setdefault(sid // n_buckets, []).append(
                (sid % n_buckets, int(r["n"]))
            )
        for g in range(nk):
            for j in range(nq):
                if lo[g, j] >= hi[g, j]:
                    continue
                pairs = sorted(acc.get(g * nq + j, []))
                cum = 0
                for bk, cnt in pairs:
                    if cum + cnt >= rank[g, j]:
                        rank[g, j] -= cum
                        new_lo = lo[g, j] + bk * width[g, j]
                        hi[g, j] = min(hi[g, j],
                                       new_lo + width[g, j] - 1)
                        lo[g, j] = new_lo
                        break
                    cum += cnt
                else:  # pragma: no cover
                    raise AssertionError("rank outside bracket")

    key_out = np.repeat(keys, nq)
    q_out = np.tile(np.array(q_pcts, dtype=np.int64), nk)
    return pa.table(
        {"key": pa.array(key_out),
         "q_pct": pa.array(q_out),
         "value": pa.array(lo.reshape(-1))}
    )


def exact_ecdf(ds, *, value_col: str, keep_cols: list[str] | None = None):
    """Exact ECDF / rank annotation of an integer column: every row gets
    `n_less` (rows with a strictly smaller value, = SQL RANK() - 1) and
    `pct_rank` (= SQL PERCENT_RANK(): n_less / (n - 1), one double
    division spelled identically in the oracle).

    Scale shape: the exchange is the O(distinct-values) integer histogram
    (per-batch bincount combiner -> one tiny groupby), never the rows; the
    prefix LUT (sorted values + exclusive prefix counts) is broadcast once
    via ray.put and the annotation pass is a stateless searchsorted
    gather. Distinct integer cents are bounded by the VALUE DOMAIN, not
    the row count, so the LUT stays small at any corpus size (documented
    assumption; for unbounded domains compose with a fixed-grid bucketing
    first)."""
    import ray
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    def hist_partial(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col], dtype=np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(uniq), "c": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        ds.select_columns([value_col])
        .map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # O(distinct values) — domain-bounded driver state
    )
    sv = hist["v"].to_numpy(dtype=np.int64)
    order = np.argsort(sv)
    sv = sv[order]
    cnt = hist["c"].to_numpy(dtype=np.int64)[order]
    prefix = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    n = int(cnt.sum())
    lut_ref = ray.put((sv, prefix))

    denom = float(n - 1) if n > 1 else 1.0

    def annotate(b: pa.Table) -> pa.Table:
        sv_, pref_ = ray.get(lut_ref)
        v = np.asarray(b[value_col], dtype=np.int64)
        ix = np.searchsorted(sv_, v)
        n_less = pref_[ix]
        cols = {c: b[c] for c in (keep_cols or b.column_names)}
        cols[value_col] = b[value_col]
        cols["n_less"] = pa.array(n_less)
        cols["pct_rank"] = pa.array(n_less.astype(np.float64) / denom)
        return pa.table(cols)

    return ds.map_batches(annotate, batch_format="pyarrow",
                          zero_copy_batch=True)


def weighted_exact_quantiles(
    make_ds,
    *,
    value_col: str,
    weight_col: str,
    q_pcts: list[int],
    n_buckets: int = 4096,
):
    """Exact WEIGHTED quantiles (importance-weighted percentiles): the
    value at weighted rank ceil(q * W / 100) — i.e. the smallest v whose
    cumulative weight reaches the target — with positive int64 weights.
    Same multi-pass histogram refinement as `exact_quantiles`, but each
    pass sums WEIGHTS per bucket (exact int64), so no sort and no float
    accumulation anywhere. The corpus-curation use: percentiles of a
    quality score weighted by token count."""
    from ray.data.aggregate import Max, Min, Sum

    q_pcts = sorted(set(int(q) for q in q_pcts))
    if not q_pcts or any(q < 0 or q > 100 for q in q_pcts):
        raise ValueError("q_pcts must be integer percentages in [0, 100]")

    stats = make_ds().aggregate(
        Sum(weight_col, alias_name="w"),
        Min(value_col, alias_name="mn"),
        Max(value_col, alias_name="mx"),
    )
    W = int(stats["w"] or 0)
    if W == 0:
        return pa.table(
            {"q_pct": pa.array([], type=pa.int64()),
             "value": pa.array([], type=pa.int64())}
        )
    gmin, gmax = int(stats["mn"]), int(stats["mx"])

    lo = np.full(len(q_pcts), gmin, dtype=np.int64)
    hi = np.full(len(q_pcts), gmax, dtype=np.int64)
    # weighted rank target in weight units, exact integer ceil
    rank = np.array(
        [max(1, (q * W + 99) // 100) for q in q_pcts], dtype=np.int64
    )

    while True:
        active = np.flatnonzero(lo < hi)
        if len(active) == 0:
            break
        a_lo, a_hi = lo[active].copy(), hi[active].copy()
        width = np.maximum(1, -(-(a_hi - a_lo + 1) // n_buckets))

        def hist(b: pa.Table, a_lo=a_lo, a_hi=a_hi, width=width) -> pa.Table:
            v = np.asarray(b[value_col], dtype=np.int64)
            w = np.asarray(b[weight_col], dtype=np.int64)
            qs, bks, cts = [], [], []
            for j in range(len(a_lo)):
                m = (v >= a_lo[j]) & (v <= a_hi[j])
                if not m.any():
                    continue
                bk = (v[m] - a_lo[j]) // width[j]
                # all-integer accumulation (np.bincount(weights=...) sums in
                # float64 and would lose exactness above 2^53)
                cnt = np.zeros(int(bk.max()) + 1, dtype=np.int64)
                np.add.at(cnt, bk, w[m])
                nz = np.flatnonzero(cnt)
                qs.append(np.full(len(nz), j, dtype=np.int64))
                bks.append(nz.astype(np.int64))
                cts.append(cnt[nz])
            if not qs:
                return pa.table(
                    {"qid": pa.array([], type=pa.int64()),
                     "bucket": pa.array([], type=pa.int64()),
                     "n": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {"qid": pa.array(np.concatenate(qs)),
                 "bucket": pa.array(np.concatenate(bks)),
                 "n": pa.array(np.concatenate(cts))}
            )

        rows = (
            make_ds()
            .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["qid", "bucket"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        by_q: dict[int, list[tuple[int, int]]] = {}
        for r in rows:
            by_q.setdefault(int(r["qid"]), []).append(
                (int(r["bucket"]), int(r["n"]))
            )
        for j in range(len(active)):
            g = active[j]
            pairs = sorted(by_q.get(j, []))
            cum = 0
            for bk, cnt in pairs:
                if cum + cnt >= rank[g]:
                    rank[g] -= cum
                    lo[g] = a_lo[j] + bk * width[j]
                    hi[g] = min(a_hi[j], a_lo[j] + (bk + 1) * width[j] - 1)
                    break
                cum += cnt
            else:  # pragma: no cover - rank exceeds bracket population
                raise AssertionError("weighted rank fell outside bracket")

    return pa.table(
        {"q_pct": pa.array(np.array(q_pcts, dtype=np.int64)),
         "value": pa.array(lo)}
    )
