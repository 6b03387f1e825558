"""Mergeable partial states for the "holistic" aggregation vocabulary.

Insight behind the clustered holistic lane's boundary exchange: every member
of the vocabulary (quantiles, mode, count_distinct, moments, EWMA, trend,
time-since-extreme, ...) is decomposable once the shuffled unit is a
per-(group) VALUE HISTOGRAM plus a handful of scalar states, because the
bucket-end timestamp t_out — the anchor of every dt-based aggregation — is
known locally from the bucket id alone:

- order statistics / mode / distinct / num_max / count_above_mean: exact
  from the merged (value -> count) histogram;
- sum / avg / var / skew / kurtosis: from the histogram (counts merge
  exactly; centered moments are recomputed from the merged histogram with
  the same two-pass formula as the row kernel);
- ewma_h: sum(w) and sum(w*v) with w = exp(ln0.5 * (t_out - t)/h) are plain
  sums — computable per fragment since t_out is known locally;
- trend / ewma_trend: per-fragment CENTERED regression sums merged with the
  pairwise update of Chan, Golub & LeVeque (1979, "Updating formulae and a
  pairwise algorithm for computing sample variances") — numerically stable
  and exactly zero Sxx when every timestamp is equal, matching the row
  kernel's `xx == 0 -> mean_y` branch;
- first / last / time_since_*: argmin/argmax states with the row kernel's
  tie rules encoded lexicographically (see kind table below).

State row layout (one Arrow table):
    tier:int8  src:int32(dictionary code)  bucket:int64  kind:int16
    a,b,c,d,e: float64
Only (a, b) are meaningful for most kinds; trend-family kinds use all five.
`kind = col_idx * COL_STRIDE + base_kind` supports multi-value-column
rollups (tie-break column is always vcols[0], like the row kernel).

Row-kernel parity (tie rules, null handling) follows
kernels/aggregations.py, which pins them to the reference engine
(Aggregations.hpp / Aggregator.hpp); merged results match the row kernel to
float-summation-reorder precision (~1e-12 relative), bit-exactly for the
histogram-derived order statistics.
"""

from __future__ import annotations

import numpy as np

from .aggregations import (
    EWMA_HALF_LIVES,
    LOG05,
    QUANTILES,
    _first_last_occurrence,
    _seg_reduce,
    _segments,
)

# base kinds (per value column)
HIST = 0  # (value, count) — merge: sum count per (group, value)
FIRST = 1  # (-ts, -v)  lexmax -> (min ts, min v)
LAST = 2  # (ts, -v)   lexmax -> (max ts, min v)
TS_LAST_MAX = 3  # (v, ts)    lexmax
TS_FIRST_MAX = 4  # (v, -ts)   lexmax
TS_LAST_MIN = 5  # (-v, ts)   lexmax
TS_FIRST_MIN = 6  # (-v, -ts)  lexmax
TRANGE = 7  # (-tmin, tmax) — independent max on a and b
NROWS = 8  # (rows_incl_nonfinite, 0) — sum
TREND = 9  # (n, mean_x, mean_y, Sxx, Sxy) — pairwise combine
EWMA_BASE = 16  # +hl index: (sum_w, sum_wv) — sum
EWMA_TREND_BASE = 24  # +hl index: (sum_w, mean_x, mean_y, Sxx, Sxy) — pairwise
COL_STRIDE = 64

_HL_KEYS = list(EWMA_HALF_LIVES)

_LEXMAX_KINDS = (FIRST, LAST, TS_LAST_MAX, TS_FIRST_MAX, TS_LAST_MIN, TS_FIRST_MIN)

_TS_EXTREME_KIND = {
    "time_since_last_maximum": TS_LAST_MAX,
    "time_since_first_maximum": TS_FIRST_MAX,
    "time_since_last_minimum": TS_LAST_MIN,
    "time_since_first_minimum": TS_FIRST_MIN,
}


def required_kinds(aggs: list[str]) -> list[int]:
    """Base state kinds needed to finalize `aggs` (HIST/NROWS always)."""
    kinds = {HIST, NROWS}
    for a in aggs:
        if a == "first":
            kinds.add(FIRST)
        elif a == "last":
            kinds.add(LAST)
        elif a in _TS_EXTREME_KIND:
            kinds.add(_TS_EXTREME_KIND[a])
        elif a == "avg_time_between":
            kinds.add(TRANGE)
        elif a == "trend":
            kinds.add(TREND)
        elif a.startswith("ewma_trend_"):
            kinds.add(EWMA_TREND_BASE + _HL_KEYS.index(a[len("ewma_trend_") :]))
        elif a.startswith("ewma_"):
            kinds.add(EWMA_BASE + _HL_KEYS.index(a[len("ewma_") :]))
    return sorted(kinds)


def _centered_sums(gids_f, x, y, w, n_groups):
    """Per-group (W, mean_x, mean_y, Sxx, Sxy) with optional weights."""
    if w is None:
        W = np.bincount(gids_f, minlength=n_groups).astype(np.float64)
        swx = np.bincount(gids_f, weights=x, minlength=n_groups)
        swy = np.bincount(gids_f, weights=y, minlength=n_groups)
    else:
        W = np.bincount(gids_f, weights=w, minlength=n_groups)
        swx = np.bincount(gids_f, weights=w * x, minlength=n_groups)
        swy = np.bincount(gids_f, weights=w * y, minlength=n_groups)
    with np.errstate(invalid="ignore", divide="ignore"):
        mx = swx / W
        my = swy / W
    # all-weights-underflowed fragments: keep finite (zero) means so the
    # pairwise merge stays NaN-free; the final `sum(w) == 0 -> NaN` branch
    # is applied after the merge, over the MERGED weight
    dead = ~np.isfinite(mx)
    mx[dead] = 0.0
    my[dead] = 0.0
    xc = x - mx[gids_f]
    yc = y - my[gids_f]
    if w is None:
        xx_w = xc * xc
        xy_w = xc * yc
    else:
        # keep the row kernel's association: w * (xc*xc)
        xx_w = w * (xc * xc)
        xy_w = w * (xc * yc)
    sxx = np.bincount(gids_f, weights=xx_w, minlength=n_groups)
    sxy = np.bincount(gids_f, weights=xy_w, minlength=n_groups)
    return W, mx, my, sxx, sxy


def fragment_states(
    aggs: list[str],
    gid: np.ndarray,
    v: np.ndarray,
    ts: np.ndarray,
    t_out: np.ndarray,
    n_groups: int,
    col_idx: int = 0,
):
    """Per-(group fragment) states for one value column.

    Rows must be sorted by (gid, ts, tie-value) — the row kernel's canonical
    order — so argmin/argmax tie rules match it exactly.
    Returns (kind:int16, gi:int64, a..e: float64) arrays; `gi` indexes the
    caller's local group table.
    """
    base = col_idx * COL_STRIDE
    kinds_out: list[np.ndarray] = []
    gi_out: list[np.ndarray] = []
    cols_out: list[np.ndarray] = []  # stacked (5, n) blocks

    def emit(kind, gi, a, b, c=None, d=None, e=None):
        n = len(gi)
        z = np.zeros(n)
        block = np.stack(
            [a, b, c if c is not None else z, d if d is not None else z,
             e if e is not None else z]
        )
        kinds_out.append(np.full(n, base + kind, dtype=np.int16))
        gi_out.append(np.asarray(gi, dtype=np.int64))
        cols_out.append(block)

    gid = np.asarray(gid, dtype=np.int64)
    v = np.asarray(v, dtype=np.float64)
    ts = np.asarray(ts, dtype=np.float64)

    rows_total = np.bincount(gid, minlength=n_groups).astype(np.float64)
    present = rows_total > 0
    pres_ix = np.flatnonzero(present)
    emit(NROWS, pres_ix, rows_total[pres_ix], np.zeros(len(pres_ix)))

    finite = np.isfinite(v)
    gids_f = gid[finite] if not finite.all() else gid
    vf = v[finite] if not finite.all() else v
    tf = ts[finite] if not finite.all() else ts
    if len(gids_f) == 0:
        kind = np.concatenate(kinds_out)
        gi = np.concatenate(gi_out)
        abcde = np.concatenate(cols_out, axis=1)
        return kind, gi, abcde

    counts, starts = _segments(gids_f, n_groups)
    ne = counts > 0
    ne_ix = np.flatnonzero(ne)
    ends = starts + counts - 1

    need = set(required_kinds(aggs))

    # histogram: rows (value, count) per distinct finite value per group
    order_v = np.lexsort((vf, gids_f))
    gv, vv = gids_f[order_v], vf[order_v]
    change = np.empty(len(gv), dtype=bool)
    change[0] = True
    np.logical_or(gv[1:] != gv[:-1], vv[1:] != vv[:-1], out=change[1:])
    rs = np.flatnonzero(change)
    emit(
        HIST,
        gv[rs],
        vv[rs],
        np.diff(np.append(rs, len(gv))).astype(np.float64),
    )

    if FIRST in need:
        emit(FIRST, ne_ix, -tf[starts[ne_ix]], -vf[starts[ne_ix]])
    if LAST in need:
        last_ts = np.full(n_groups, np.nan)
        last_ts[ne] = tf[ends[ne]]
        mask = tf == last_ts[gids_f]
        first, _, has = _first_last_occurrence(mask, gids_f, n_groups)
        hix = np.flatnonzero(has)
        emit(LAST, hix, tf[first[hix]], -vf[first[hix]])
    if need & set(_TS_EXTREME_KIND.values()) - {FIRST, LAST}:
        gmax = _seg_reduce(np.maximum, vf, starts, counts, np.nan)
        gmin = _seg_reduce(np.minimum, vf, starts, counts, np.nan)
        for kind in need & set(_TS_EXTREME_KIND.values()):
            ext = gmax if kind in (TS_LAST_MAX, TS_FIRST_MAX) else gmin
            sign = 1.0 if kind in (TS_LAST_MAX, TS_FIRST_MAX) else -1.0
            mask = vf == ext[gids_f]
            first, last, has = _first_last_occurrence(mask, gids_f, n_groups)
            idx = first if kind in (TS_FIRST_MAX, TS_FIRST_MIN) else last
            tsgn = -1.0 if kind in (TS_FIRST_MAX, TS_FIRST_MIN) else 1.0
            hix = np.flatnonzero(has)
            emit(kind, hix, sign * ext[hix], tsgn * tf[idx[hix]])
    if TRANGE in need:
        tmax = _seg_reduce(np.maximum, tf, starts, counts, np.nan)
        tmin = _seg_reduce(np.minimum, tf, starts, counts, np.nan)
        emit(TRANGE, ne_ix, -tmin[ne_ix], tmax[ne_ix])

    x = None
    if TREND in need or any(k >= EWMA_BASE for k in need):
        x = t_out[gids_f] - tf
    if TREND in need:
        W, mx, my, sxx, sxy = _centered_sums(gids_f, x, vf, None, n_groups)
        emit(TREND, ne_ix, W[ne_ix], mx[ne_ix], my[ne_ix], sxx[ne_ix], sxy[ne_ix])
    for kind in need:
        if EWMA_BASE <= kind < EWMA_TREND_BASE:
            h = EWMA_HALF_LIVES[_HL_KEYS[kind - EWMA_BASE]]
            with np.errstate(over="ignore", under="ignore"):
                w = np.exp(LOG05 * x / h)
            sw = np.bincount(gids_f, weights=w, minlength=n_groups)
            swv = np.bincount(gids_f, weights=w * vf, minlength=n_groups)
            emit(kind, ne_ix, sw[ne_ix], swv[ne_ix])
        elif kind >= EWMA_TREND_BASE:
            h = EWMA_HALF_LIVES[_HL_KEYS[kind - EWMA_TREND_BASE]]
            with np.errstate(over="ignore", under="ignore"):
                w = np.exp(LOG05 * x / h)
            W, mx, my, sxx, sxy = _centered_sums(gids_f, x, vf, w, n_groups)
            # emit even when sum(w) underflows to 0: the kernel's
            # `res[sw == 0] -> NaN` branch needs to see the group
            emit(kind, ne_ix, W[ne_ix], mx[ne_ix], my[ne_ix], sxx[ne_ix],
                 sxy[ne_ix])

    kind = np.concatenate(kinds_out)
    gi = np.concatenate(gi_out)
    abcde = np.concatenate(cols_out, axis=1)
    return kind, gi, abcde


def _pairwise_merge(gid, a, b, c, d, e, n_groups):
    """Sequentially combine (W, mx, my, Sxx, Sxy) fragments per group with
    the Chan et al. pairwise update. Rows must be sorted by gid; O(log F)
    vectorized rounds where F = max fragments per group."""
    while True:
        counts, starts = _segments(gid, n_groups)
        if not (counts > 1).any():
            break
        pos = np.arange(len(gid)) - starts[gid]
        lead = (pos % 2 == 0) & (pos + 1 < counts[gid])
        li = np.flatnonzero(lead)
        ri = li + 1
        W = a[li] + a[ri]
        with np.errstate(invalid="ignore", divide="ignore"):
            f2 = a[ri] / W
            fprod = a[li] * a[ri] / W
        dx = b[ri] - b[li]
        dy = c[ri] - c[li]
        a2 = W
        b2 = b[li] + dx * f2
        c2 = c[li] + dy * f2
        d2 = d[li] + d[ri] + fprod * (dx * dx)
        e2 = e[li] + e[ri] + fprod * (dx * dy)
        zero = W == 0.0  # all-underflow ewma_trend fragments
        b2[zero] = b[li][zero]
        c2[zero] = c[li][zero]
        d2[zero] = (d[li] + d[ri])[zero]
        e2[zero] = (e[li] + e[ri])[zero]
        a[li], b[li], c[li], d[li], e[li] = a2, b2, c2, d2, e2
        keep = np.ones(len(gid), dtype=bool)
        keep[ri] = False
        gid, a, b, c, d, e = (arr[keep] for arr in (gid, a, b, c, d, e))
    return gid, a, b, c, d, e


def _group_rank_lookup(hist_gid_runs, cum, counts_h, starts_h, targets):
    """values sorted ascending within group; cum = within-group cumulative
    counts. For each group g with target rank r_g (0-based), return the
    index (into the run arrays) of the first run whose cumulative count
    exceeds r_g. Vectorized with a packed searchsorted."""
    BIG = float(2**53)
    key = hist_gid_runs * BIG + cum
    tg = np.arange(len(targets), dtype=np.float64) * BIG + targets
    return np.searchsorted(key, tg, side="right")


def merge_and_finalize(
    aggs: list[str],
    tier: np.ndarray,
    src: np.ndarray,
    bucket: np.ndarray,
    kind: np.ndarray,
    abcde: np.ndarray,
    tier_widths_us: np.ndarray,
    n_cols: int = 1,
):
    """Merge state rows (any number of fragments per group) and finalize.

    Returns (g_tier, g_src, g_bucket, {col_idx: {agg: np.ndarray}}).
    """
    n = len(kind)
    order = np.lexsort((kind, bucket, src, tier))
    tier_s, src_s, bucket_s = tier[order], src[order], bucket[order]
    kind_s = kind[order].astype(np.int64)
    A = abcde[:, order]

    gchange = np.empty(n, dtype=bool)
    gchange[0] = True
    np.logical_or.reduce(
        [tier_s[1:] != tier_s[:-1], src_s[1:] != src_s[:-1],
         bucket_s[1:] != bucket_s[:-1]],
        out=gchange[1:],
    )
    gid = np.cumsum(gchange) - 1
    gstart = np.flatnonzero(gchange)
    G = gid[-1] + 1
    g_tier = tier_s[gstart]
    g_src = src_s[gstart]
    g_bucket = bucket_s[gstart]
    width_us = tier_widths_us[g_tier]
    t_out = ((g_bucket + 1) * width_us) / 1e6

    results: dict[int, dict[str, np.ndarray]] = {}
    for ci in range(n_cols):
        base = ci * COL_STRIDE
        out: dict[str, np.ndarray] = {}

        def sub(k):
            m = kind_s == (base + k)
            return gid[m], A[0][m], A[1][m], A[2][m], A[3][m], A[4][m]

        # --- histogram merge: (group, value) -> summed count ---
        hg, hv, hc, _, _, _ = sub(HIST)
        ov = np.lexsort((hv, hg))
        hg, hv, hc = hg[ov], hv[ov], hc[ov]
        if len(hg):
            rchange = np.empty(len(hg), dtype=bool)
            rchange[0] = True
            np.logical_or(hg[1:] != hg[:-1], hv[1:] != hv[:-1], out=rchange[1:])
            rid = np.cumsum(rchange) - 1
            rs = np.flatnonzero(rchange)
            run_gid = hg[rs]
            run_val = hv[rs]
            run_cnt = np.bincount(rid, weights=hc)
        else:
            run_gid = np.empty(0, dtype=np.int64)
            run_val = np.empty(0)
            run_cnt = np.empty(0)

        counts_h, starts_h = _segments(run_gid, G)  # distinct values per grp
        cnt = np.zeros(G)
        np.add.at(cnt, run_gid, run_cnt)
        empty = cnt == 0.0
        nonempty = ~empty
        ends_h = starts_h + counts_h - 1

        ssum = np.zeros(G)
        np.add.at(ssum, run_gid, run_val * run_cnt)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = ssum / cnt
        mean[empty] = np.nan
        gmin = np.full(G, np.nan)
        gmax = np.full(G, np.nan)
        gmin[nonempty] = run_val[starts_h[nonempty]]
        gmax[nonempty] = run_val[ends_h[nonempty]]

        cache: dict[str, np.ndarray] = {}

        def _var():
            if "var" not in cache:
                d = run_val - mean[run_gid]
                m2 = np.zeros(G)
                np.add.at(m2, run_gid, run_cnt * d * d)
                with np.errstate(invalid="ignore", divide="ignore"):
                    vv = m2 / cnt
                vv[empty] = np.nan
                cache["var"] = vv
            return cache["var"]

        def _all_same():
            if "all_same" not in cache:
                same = np.ones(G, dtype=bool)
                m = cnt > 1
                same[m] = gmin[m] == gmax[m]
                cache["all_same"] = same
            return cache["all_same"]

        def _gcum():
            """Global cumulative of run counts (strictly increasing since
            every run count >= 1) plus per-group start offsets; rank lookup
            inside group g = searchsorted(gcum, start_off[g] + rank)."""
            if "gcum" not in cache:
                gc = np.cumsum(run_cnt)
                start_off = np.where(
                    starts_h > 0, gc[np.maximum(starts_h - 1, 0)], 0.0
                )
                cache["gcum"] = (gc, start_off)
            return cache["gcum"]

        def _quantile(q: float):
            res = np.full(G, np.nan)
            m = np.flatnonzero(nonempty)
            if len(m) == 0 or len(run_cnt) == 0:
                return res
            gc, start_off = _gcum()
            n_g = cnt[m]
            ixf = (n_g - 1.0) * q
            ix = np.floor(ixf)
            share = ixf - ix
            hi_rank = np.minimum(ix + 1.0, n_g - 1.0)
            lo_pos = np.searchsorted(gc, start_off[m] + ix, side="right")
            hi_pos = np.searchsorted(gc, start_off[m] + hi_rank, side="right")
            res[m] = run_val[hi_pos] * share + run_val[lo_pos] * (1.0 - share)
            return res

        # --- scalar states ---
        def lexmax(k):
            g2, a2, b2, _, _, _ = sub(k)
            o = np.lexsort((b2, a2, g2))
            g2, a2, b2 = g2[o], a2[o], b2[o]
            av = np.full(G, np.nan)
            bv = np.full(G, np.nan)
            if len(g2):
                ch = np.empty(len(g2), dtype=bool)
                ch[:-1] = g2[1:] != g2[:-1]
                ch[-1] = True
                li = np.flatnonzero(ch)
                av[g2[li]] = a2[li]
                bv[g2[li]] = b2[li]
            return av, bv

        def summed(k):
            g2, a2, b2, c2, d2, e2 = sub(k)
            outs = []
            for arr in (a2, b2, c2, d2, e2):
                s = np.zeros(G)
                np.add.at(s, g2, arr)
                outs.append(s)
            return outs

        def pairwise(k):
            g2, a2, b2, c2, d2, e2 = sub(k)
            g2, a2, b2, c2, d2, e2 = _pairwise_merge(
                g2, a2.copy(), b2.copy(), c2.copy(), d2.copy(), e2.copy(), G
            )
            W = np.zeros(G)
            mx = np.full(G, np.nan)
            my = np.full(G, np.nan)
            sxx = np.zeros(G)
            sxy = np.zeros(G)
            W[g2], mx[g2], my[g2], sxx[g2], sxy[g2] = a2, b2, c2, d2, e2
            present = np.zeros(G, dtype=bool)
            present[g2] = True
            return W, mx, my, sxx, sxy, present

        def _trend_final(W, mx, my, sxx, sxy, present):
            with np.errstate(invalid="ignore", divide="ignore"):
                beta = sxy / sxx
                r = my - mx * beta
            r = np.where(sxx == 0.0, my, r)
            r[(W == 0.0) | ~present] = np.nan
            return r

        for a in aggs:
            if a == "count":
                r = cnt.copy()
            elif a == "sum":
                r = ssum.copy()
            elif a == "avg":
                r = mean.copy()
            elif a == "min":
                r = gmin.copy()
            elif a == "max":
                r = gmax.copy()
            elif a == "var":
                r = _var().copy()
            elif a == "stddev":
                with np.errstate(invalid="ignore"):
                    r = np.sqrt(_var())
            elif a in ("skew", "kurtosis"):
                p = 3 if a == "skew" else 4
                with np.errstate(invalid="ignore", divide="ignore"):
                    sd = np.sqrt(_var())
                    z = (run_val - mean[run_gid]) / sd[run_gid]
                    zf = np.isfinite(z)
                    acc = np.zeros(G)
                    np.add.at(acc, run_gid[zf], run_cnt[zf] * z[zf] ** p)
                    r = acc / cnt
                r[_all_same()] = 0.0
                r[empty] = np.nan
            elif a == "variation_coefficient":
                with np.errstate(invalid="ignore", divide="ignore"):
                    r = _var() / mean
                r[(mean == 0.0) | ~np.isfinite(mean)] = np.nan
            elif a == "median":
                r = _quantile(0.5)
            elif a in QUANTILES:
                r = _quantile(QUANTILES[a])
            elif a == "mode":
                r = np.full(G, np.nan)
                if len(run_gid):
                    best = _seg_reduce(
                        np.maximum, run_cnt, starts_h, counts_h, 0.0
                    )
                    is_best = run_cnt == best[run_gid]
                    first, _, has = _first_last_occurrence(
                        is_best, run_gid, G
                    )
                    r[has] = run_val[first[has]]
            elif a == "count_distinct":
                r = counts_h.astype(np.float64)
            elif a == "count_distinct_over_count":
                with np.errstate(invalid="ignore", divide="ignore"):
                    r = counts_h / cnt
                r[empty] = np.nan
            elif a == "count_minus_count_distinct":
                r = cnt - counts_h
            elif a == "num_max":
                r = np.zeros(G)
                r[nonempty] = run_cnt[ends_h[nonempty]]
            elif a == "num_min":
                r = np.zeros(G)
                r[nonempty] = run_cnt[starts_h[nonempty]]
            elif a in ("count_above_mean", "count_below_mean"):
                r = np.zeros(G)
                if len(run_cnt):
                    cmp = (
                        run_val > mean[run_gid]
                        if a == "count_above_mean"
                        else run_val < mean[run_gid]
                    )
                    np.add.at(r, run_gid[cmp], run_cnt[cmp])
                r[_all_same()] = 0.0
            elif a == "first":
                av, bv = lexmax(FIRST)
                r = -bv
            elif a == "last":
                av, bv = lexmax(LAST)
                r = -bv
            elif a == "trend":
                r = _trend_final(*pairwise(TREND))
            elif a.startswith("ewma_trend_"):
                k = EWMA_TREND_BASE + _HL_KEYS.index(a[len("ewma_trend_") :])
                r = _trend_final(*pairwise(k))
            elif a.startswith("ewma_"):
                k = EWMA_BASE + _HL_KEYS.index(a[len("ewma_") :])
                s = summed(k)
                with np.errstate(invalid="ignore", divide="ignore"):
                    r = s[1] / s[0]
                g2 = sub(k)[0]
                present = np.zeros(G, dtype=bool)
                present[g2] = True
                r[(s[0] == 0.0) | ~present] = np.nan
            elif a == "avg_time_between":
                g2, a2, b2, _, _, _ = sub(TRANGE)
                tmin = np.full(G, np.nan)
                tmax = np.full(G, np.nan)
                if len(g2):
                    o = np.argsort(g2, kind="stable")
                    g2s = g2[o]
                    cts, sts = _segments(g2s, G)
                    nz = cts > 0
                    tmin[nz] = -_seg_reduce(
                        np.maximum, a2[o], sts, cts, np.nan
                    )[nz]
                    tmax[nz] = _seg_reduce(
                        np.maximum, b2[o], sts, cts, np.nan
                    )[nz]
                with np.errstate(invalid="ignore", divide="ignore"):
                    r = (tmax - tmin) / (cnt - 1.0)
                r[cnt <= 1.0] = 0.0
            elif a in _TS_EXTREME_KIND:
                av, bv = lexmax(_TS_EXTREME_KIND[a])
                tsgn = (
                    -1.0
                    if _TS_EXTREME_KIND[a] in (TS_FIRST_MAX, TS_FIRST_MIN)
                    else 1.0
                )
                r = t_out - tsgn * bv
            else:
                raise ValueError(f"unknown aggregation: {a}")
            out[a] = np.asarray(r, dtype=np.float64)
        results[ci] = out
    return g_tier, g_src, g_bucket, results
