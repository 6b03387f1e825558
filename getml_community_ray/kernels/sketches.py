"""Mergeable cardinality sketches (HyperLogLog).

At 10^12-sequence scale an exact COUNT_DISTINCT is a full shuffle of every
distinct value; an HLL sketch is O(m) per group, mergeable by register-max —
the decomposable-aggregate shape the rollup lanes are built on (Flajolet et
al. 2007; the reference's COUNT_DISTINCT is exact, `Aggregator.cpp` — this
is the documented approximation lane beside it, not a replacement).

Design for oracle-exactness: the distributed artifact is the REGISTER table
(group, reg, rho) — all integers, bit-reproducible at any partitioning, and
spellable in SQL (splitmix64 twin + printf('%b') bit-length). The float
estimate is a trivial driver-side fold over it.

Layout: h = splitmix64(key); reg = h mod m (low p bits); w = h >> p;
rho = (64-p) - bitlen(w) + 1  (w = 0 -> (64-p)+1).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64, sql_splitmix64_cols


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length of uint64 (0 -> 0), vectorized shift
    ladder — float log2 is wrong above 2^53."""
    out = np.zeros(len(w), dtype=np.int64)
    x = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(shift))
        out[m] += shift
        x[m] >>= np.uint64(shift)
    out[w > 0] += 1
    return out


def hll_rows(keys: np.ndarray, gid: np.ndarray, n_groups: int, *,
             p: int = 10):
    """Partial HLL registers for one batch: (gid, reg, rho) with per-
    (gid, reg) max rho, rho >= 1 only for observed registers. Integer
    arrays, mergeable by max."""
    m = 1 << p
    h = splitmix64(keys.astype(np.uint64))
    reg = (h % np.uint64(m)).astype(np.int64)
    w = h >> np.uint64(p)
    rho = (64 - p) - _bitlen_u64(w) + 1
    flat = gid.astype(np.int64) * m + reg
    acc = np.zeros(n_groups * m, dtype=np.int64)
    np.maximum.at(acc, flat, rho)
    nz = np.flatnonzero(acc)
    return nz // m, nz % m, acc[nz]


def hll_estimate(regs: np.ndarray, *, p: int = 10) -> float:
    """Standard HLL estimate from a DENSE register vector (missing
    registers = 0), with the small-range linear-counting correction."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(e)


def sql_hll_registers(table: str, *, key_expr: str, group_col: str,
                      p: int = 10) -> str:
    """DuckDB twin of the register table: same splitmix64, same layout.
    bitlen(w) is length(bin(w)) — exact for 64-bit integers (w > 0)."""
    m = 1 << p
    sm = ",\n       ".join(sql_splitmix64_cols(key_expr, "h_"))
    return f"""
WITH h AS (
  SELECT {group_col} AS grp,
       {sm}
  FROM {table}),
r AS (
  SELECT grp,
         CAST(h_out % {m} AS BIGINT) AS reg,
         CASE WHEN h_out // {m} = 0 THEN {64 - p + 1}
              ELSE {64 - p} - length(bin(h_out // {m})) + 1
         END AS rho
  FROM h)
SELECT grp, reg, CAST(max(rho) AS BIGINT) AS rho
FROM r GROUP BY grp, reg
"""


def histogram_quantile(bins: np.ndarray, cnts: np.ndarray, *, mn: float,
                       mx: float, n_bins: int, q: float) -> float:
    """Quantile estimate from a (bin, cnt) histogram: the UPPER edge of
    the bin where the cumulative count first reaches ceil(q * n) — within
    one bin width of the exact q-quantile."""
    order = np.argsort(bins)
    b, c = bins[order], cnts[order]
    n = int(c.sum())
    if n == 0:
        return float("nan")
    target = max(1, int(np.ceil(q * n)))
    ix = int(np.searchsorted(np.cumsum(c), target))
    width = (mx - mn) / n_bins
    return mn + (int(b[ix]) + 1) * width


def sql_grouped_histogram(table: str, *, value_col: str, group_col: str,
                          n_bins: int = 64) -> str:
    """DuckDB twin of grouped_histogram: identical IEEE double bin
    arithmetic, integer output rows."""
    return f"""
WITH mm AS (
  SELECT {group_col} AS grp, min({value_col}) AS mn, max({value_col}) AS mx
  FROM {table} GROUP BY 1),
b AS (
  SELECT t.{group_col} AS grp,
         CASE WHEN mm.mx = mm.mn THEN 0
              ELSE CAST(least(floor(({value_col} - mm.mn)
                              / ((mm.mx - mm.mn) / {n_bins})),
                        {n_bins - 1}) AS BIGINT)
         END AS bin
  FROM {table} t JOIN mm ON t.{group_col} = mm.grp)
SELECT grp, bin, count(*) AS cnt FROM b GROUP BY grp, bin
"""


def sql_grouped_histogram_quantiles(
    table: str, *, value_col: str, group_col: str, n_bins: int = 64,
    qs: tuple = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB twin of grouped_histogram_quantiles: identical IEEE double
    bin arithmetic AND identical estimate formula
    mn + (bin + 1) * ((mx - mn) / n_bins)."""
    q_vals = ", ".join(f"({q!r})" for q in qs)
    return f"""
WITH mm AS (
  SELECT {group_col} AS grp, min({value_col}) AS mn, max({value_col}) AS mx
  FROM {table} GROUP BY 1),
b AS (
  SELECT t.{group_col} AS grp,
         CASE WHEN mm.mx = mm.mn THEN 0
              ELSE CAST(least(floor(({value_col} - mm.mn)
                              / ((mm.mx - mm.mn) / {n_bins})),
                        {n_bins - 1}) AS BIGINT)
         END AS bin
  FROM {table} t JOIN mm ON t.{group_col} = mm.grp),
hist AS (SELECT grp, bin, count(*) AS cnt FROM b GROUP BY grp, bin),
c AS (
  SELECT grp, bin, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY grp) AS n
  FROM hist),
quants AS (SELECT * FROM (VALUES {q_vals}) AS t(q)),
sel AS (
  SELECT c.grp, quants.q, MIN(c.bin) AS qbin, MIN(c.n) AS n
  FROM c JOIN quants
    ON c.cum >= GREATEST(1, CEIL(quants.q * c.n))
  GROUP BY c.grp, quants.q)
SELECT sel.grp, CAST(sel.q AS DOUBLE) AS q, CAST(sel.n AS BIGINT) AS n,
       mm.mn + (sel.qbin + 1) * ((mm.mx - mm.mn) / {n_bins}) AS q_est
FROM sel JOIN mm ON sel.grp = mm.grp
ORDER BY sel.grp, q
"""


# ---------------------------------------------------------------------------
# count-min sketch (heavy-hitter / frequency counters)
# ---------------------------------------------------------------------------

# odd salt spacing the d hash rows; j-th row hashes splitmix64(key + j*SALT)
CMS_SALT = 0xD1B54A32D192ED03


def cms_rows(keys: np.ndarray, *, depth: int = 4, width: int = 1024):
    """Count-min counter increments for one batch: (row_j, slot, cnt).

    All integers, mergeable by SUM — the same decomposable shape as the
    HLL register table. Point estimate for a key is min_j counters[j,
    h_j(key)], an upper bound with error <= n * e / width at confidence
    1 - e^-depth (Cormode & Muthukrishnan 2005). The distributed artifact
    is the counter table, bit-reproducible at any partitioning."""
    from .hashing import splitmix64

    k = np.ascontiguousarray(keys, dtype=np.uint64)
    js, slots, cnts = [], [], []
    for j in range(depth):
        # 1-element-array add: u64 array + scalar has no SIMD path on
        # this numpy (see kernels/hashing.py)
        salt = np.array([(j * CMS_SALT) % (1 << 64)], dtype=np.uint64)
        h = splitmix64(k + salt)
        slot = (h % np.uint64(width)).astype(np.int64)
        acc = np.bincount(slot, minlength=width)
        nz = np.flatnonzero(acc)
        js.append(np.full(len(nz), j, dtype=np.int64))
        slots.append(nz)
        cnts.append(acc[nz])
    return (
        np.concatenate(js),
        np.concatenate(slots),
        np.concatenate(cnts).astype(np.int64),
    )


def cms_point_estimate(
    counters: np.ndarray, key: int, *, depth: int = 4, width: int = 1024
) -> int:
    """min over rows of the key's counter; `counters` is dense
    (depth, width)."""
    from .hashing import splitmix64

    ks = np.full(depth, np.uint64(key), dtype=np.uint64)
    salts = (np.arange(depth, dtype=np.uint64) * np.uint64(CMS_SALT))
    h = splitmix64(ks + salts)
    slots = (h % np.uint64(width)).astype(np.int64)
    return int(counters[np.arange(depth), slots].min())


def sql_cms_counters(
    table: str, *, key_expr: str, depth: int = 4, width: int = 1024
) -> str:
    """DuckDB twin of the counter table: same splitmix64(key + j*salt),
    same slot layout, integer counts."""
    from .hashing import sql_addmod, sql_splitmix64_cols

    parts = []
    for j in range(depth):
        salted = sql_addmod(key_expr, (j * CMS_SALT) % (1 << 64))
        sm = ",\n         ".join(sql_splitmix64_cols(salted, f"h{j}_"))
        parts.append(
            f"SELECT {j} AS row_j, CAST(h{j}_out % {width} AS BIGINT) AS slot\n"
            f"  FROM (SELECT {sm} FROM {table})"
        )
    body = "\nUNION ALL\n".join(parts)
    return (
        f"SELECT row_j, slot, CAST(count(*) AS BIGINT) AS cnt\n"
        f"FROM (\n{body}\n)\nGROUP BY row_j, slot"
    )
