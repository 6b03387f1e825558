"""Generated DuckDB oracles that replicate the engine's hash arithmetic
bit-for-bit (kernels/hashing SQL twins), giving exact driver oracles to the
dedup/text queries that were previously rows-only.

Scope note: the gram-hash SQL assumes char == byte (pure-ASCII text) —
true for the driver's documents table and asserted nowhere else; the
engine itself hashes raw UTF-8 bytes.
"""

from __future__ import annotations

from ..kernels.hashing import (
    perm_seeds,
    sql_poly_gram_hash,
    sql_signed64,
    sql_splitmix64_cols,
)


def _seed_values(num_perm: int) -> str:
    seeds = perm_seeds(num_perm)
    return ", ".join(
        f"({p}, CAST({int(s)} AS UBIGINT))" for p, s in enumerate(seeds)
    )


def sql_minhash_lsh(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 5,
) -> str:
    """Oracle for minhash_lsh_candidates: (band, band_hash, ids, group_size)
    for groups of size > 1. Mirrors stages/dedup.py exactly:
    sig[p] = min over grams of splitmix64(polyhash(gram) ^ seed[p]);
    band_hash = fold splitmix64(h ^ s_j) over the band's row signatures."""
    r = num_perm // bands
    if r != 4:
        raise NotImplementedError("oracle generator is specialized to rows_per_band=4")
    gh = sql_poly_gram_hash("gram", shingle)
    sm_mix = ",\n       ".join(sql_splitmix64_cols("xor(gh, seed)", "m_"))
    # one CTE layer per folded splitmix: lateral aliases expand
    # SYNTACTICALLY in the binder (~8 copies of the argument per splitmix),
    # so chaining three in one SELECT produces an 8^3-size expression tree
    # and ~50 s of planning; MATERIALIZED layers keep it linear (~1 s).
    sm1 = ",\n       ".join(sql_splitmix64_cols("xor(s0, s1)", "b1_"))
    sm2 = ",\n       ".join(sql_splitmix64_cols("xor(h1, s2)", "b2_"))
    sm3 = ",\n       ".join(sql_splitmix64_cols("xor(h2, s3)", "b3_"))
    return f"""
WITH seeds(p, seed) AS (VALUES {_seed_values(num_perm)}),
g AS MATERIALIZED (
  SELECT {id_col} AS did, {gh} AS gh
  FROM (
    SELECT {id_col}, substring({text_col}, CAST(s AS INT), {shingle}) AS gram
    FROM {table},
         LATERAL (SELECT unnest(generate_series(
             1, greatest(length({text_col}) - {shingle - 1}, 1))) AS s) t
  )
),
gd AS MATERIALIZED (SELECT DISTINCT did, gh FROM g),
uh AS MATERIALIZED (SELECT DISTINCT gh FROM gd),
mix AS MATERIALIZED (
  SELECT gh, p,
       {sm_mix}
  FROM uh CROSS JOIN seeds
),
sig AS MATERIALIZED (
  SELECT did, p, min(m_out) AS s
  FROM gd JOIN mix USING (gh) GROUP BY did, p
),
piv AS (
  SELECT did, p // 4 AS band,
         max(CASE WHEN p % 4 = 0 THEN s END) AS s0,
         max(CASE WHEN p % 4 = 1 THEN s END) AS s1,
         max(CASE WHEN p % 4 = 2 THEN s END) AS s2,
         max(CASE WHEN p % 4 = 3 THEN s END) AS s3
  FROM sig GROUP BY did, p // 4
),
bh1 AS MATERIALIZED (
  SELECT did, band, s2, s3,
       {sm1}
  FROM piv
),
bh2 AS MATERIALIZED (
  SELECT did, band, s3, b1_out AS h1,
       {sm2}
  FROM bh1
),
bh3 AS MATERIALIZED (
  SELECT did, band, b2_out AS h2,
       {sm3}
  FROM bh2
),
grp AS (
  SELECT CAST(band AS BIGINT) AS band,
         {sql_signed64('b3_out')} AS band_hash,
         list(did ORDER BY did) AS ids,
         CAST(count(*) AS BIGINT) AS group_size
  FROM bh3 GROUP BY 1, 2
)
SELECT band, band_hash, ids, group_size FROM grp WHERE group_size > 1
"""


def sql_simhash(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
) -> str:
    """Oracle for simhash_signatures: bit voting over
    splitmix64(polyhash(gram)) with gram multiplicity preserved."""
    gh = sql_poly_gram_hash("gram", shingle)
    sm = ",\n       ".join(sql_splitmix64_cols("gh", "h_"))
    return f"""
WITH g AS (
  SELECT {id_col} AS did, {gh} AS gh
  FROM (
    SELECT {id_col}, substring({text_col}, CAST(s AS INT), {shingle}) AS gram
    FROM {table},
         LATERAL (SELECT unnest(generate_series(
             1, greatest(length({text_col}) - {shingle - 1}, 1))) AS s) t
  )
),
h AS (SELECT did, {sm} FROM g),
bits AS (
  SELECT did, b.bit,
         SUM(CAST((h_out >> CAST(b.bit AS UBIGINT)) & 1 AS BIGINT)) AS ones,
         count(*) AS n
  FROM h, LATERAL (SELECT unnest(generate_series(0, 63)) AS bit) b
  GROUP BY did, b.bit
),
sig AS (
  SELECT did,
         CAST(SUM(CASE WHEN ones * 2 > n
                       THEN CAST(1 AS HUGEINT) << CAST(bit AS INT)
                       ELSE 0 END) AS HUGEINT) AS u
  FROM bits GROUP BY did
)
SELECT did AS {id_col},
       CAST(CASE WHEN u >= 9223372036854775808
                 THEN u - 18446744073709551616 ELSE u END AS BIGINT)
           AS simhash
FROM sig
"""


def sql_ngram_jaccard(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
    threshold: float = 0.5,
) -> str:
    """Brute-force distinct-shingle Jaccard >= threshold, id_a < id_b.

    Valid as an oracle for the LSH-then-verify engine path because on the
    driver's documents table every true pair sits at jaccard >= 0.9 where
    16-band/4-row LSH recall is 1 - 4e-8 (verified empirically: engine
    output == brute force at sf0.001 and sf0.01)."""
    return f"""
WITH g AS (
  SELECT DISTINCT {id_col} AS did,
         substring({text_col}, CAST(s AS INT), {shingle}) AS gram
  FROM {table},
       LATERAL (SELECT unnest(generate_series(
           1, greatest(length({text_col}) - {shingle - 1}, 1))) AS s) t
),
c AS (SELECT did, count(*) AS n FROM g GROUP BY 1),
inter AS (
  SELECT a.did AS id_a, b.did AS id_b, count(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram AND a.did < b.did
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(round(CAST(i AS DOUBLE) / (ca.n + cb.n - i) * 1e6) AS BIGINT)
           / 1000000.0 AS jaccard
FROM inter
JOIN c ca ON ca.did = id_a
JOIN c cb ON cb.did = id_b
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= {threshold}
"""


def sql_near_dedup_clusters(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
    threshold: float = 0.5,
) -> str:
    """Connected components over the brute-force Jaccard edge list via a
    recursive reachability CTE; canonical = min id of the component."""
    return f"""
WITH RECURSIVE g AS (
  SELECT DISTINCT {id_col} AS did,
         substring({text_col}, CAST(s AS INT), {shingle}) AS gram
  FROM {table},
       LATERAL (SELECT unnest(generate_series(
           1, greatest(length({text_col}) - {shingle - 1}, 1))) AS s) t
),
c AS (SELECT did, count(*) AS n FROM g GROUP BY 1),
inter AS (
  SELECT a.did AS id_a, b.did AS id_b, count(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram AND a.did < b.did
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN c ca ON ca.did = id_a JOIN c cb ON cb.did = id_b
  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= {threshold}
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
),
canon AS (
  SELECT d.{id_col} AS doc_id,
         least(d.{id_col}, coalesce(r.mn, d.{id_col})) AS canonical_id
  FROM {table} d
  LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) r
    ON r.a = d.{id_col}
)
SELECT doc_id, canonical_id,
       CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
           AS cluster_size
FROM canon
"""


def sql_fingerprint(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
) -> str:
    """Oracle for stages/text.fingerprint: min over strided byte windows of
    splitmix64(polyhash(window)). Assumes every doc longer than `window`
    (true for the driver corpus; engine handles short docs generally)."""
    gh = sql_poly_gram_hash("gram", window)
    sm = ",\n       ".join(sql_splitmix64_cols("gh", "f_"))
    step = max(1, window // 2)
    return f"""
WITH g AS (
  SELECT {id_col} AS did, {gh} AS gh
  FROM (
    SELECT {id_col}, substring({text_col}, CAST(s AS INT), {window}) AS gram
    FROM {table},
         LATERAL (SELECT unnest(generate_series(
             1, length({text_col}) - {window - 1}, {step})) AS s) t
  )
),
h AS (SELECT did, {sm} FROM g),
mn AS (SELECT did, min(f_out) AS m FROM h GROUP BY did)
SELECT did AS {id_col}, {sql_signed64('m')} AS fingerprint FROM mn
"""


def sql_random_by_key(
    *,
    table: str = "orders",
    key_col: str = "o_orderkey",
    seed: int = 5849,
    out_col: str = "random",
) -> str:
    """Oracle for functions/scalar.random_by_key (integer keys): the
    documented hash contract x = key + seed*GOLDEN -> 3-stage mix ->
    (x >> 11) / 2^53."""
    from ..kernels.hashing import GOLDEN, MIX1, MIX2, sql_mulmod

    start = (seed * GOLDEN) % (1 << 64)
    return f"""
SELECT {key_col},
       CAST((CAST({key_col} AS HUGEINT) + {start}) % 18446744073709551616
            AS UBIGINT) AS x1,
       {sql_mulmod('xor(x1, x1 >> 30)', MIX1)} AS x2,
       {sql_mulmod('xor(x2, x2 >> 27)', MIX2)} AS x3,
       xor(x3, x3 >> 31) AS x4
FROM {table}
"""


def sql_random_by_key_final(
    *,
    table: str = "orders",
    key_col: str = "o_orderkey",
    seed: int = 5849,
    out_col: str = "random",
) -> str:
    inner = sql_random_by_key(
        table=table, key_col=key_col, seed=seed, out_col=out_col
    )
    return f"""
SELECT {key_col},
       CAST(x4 >> 11 AS DOUBLE) / 9007199254740992.0 AS {out_col}
FROM ({inner})
"""

def sql_langid(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle for stages/text.LangId: stopword voting over lowercased word
    matches in the first 2000 chars; argmax with ties to the
    lexicographically larger language; zero votes -> 'unknown'."""
    from ..stages.text import _STOPWORDS_DE, _STOPWORDS_EN, _STOPWORDS_FR

    vals = ", ".join(
        f"('{lang}', '{w}')"
        for lang, tbl in (
            ("en", _STOPWORDS_EN), ("de", _STOPWORDS_DE), ("fr", _STOPWORDS_FR)
        )
        for w in sorted(tbl)
    )
    return f"""
WITH sw(lang, word) AS (VALUES {vals}),
w AS (
  SELECT {id_col} AS did,
         lower(unnest(regexp_extract_all(
             substring({text_col}, 1, 2000), '[a-zA-Zäöüéèêàç]+'))) AS word
  FROM {table}
),
sc AS (
  SELECT did, lang, count(*) AS score FROM w JOIN sw USING (word)
  GROUP BY 1, 2
),
grid AS (
  SELECT d.{id_col} AS did, l.lang, coalesce(s.score, 0) AS score
  FROM {table} d
  CROSS JOIN (SELECT DISTINCT lang FROM sw) l
  LEFT JOIN sc s ON s.did = d.{id_col} AND s.lang = l.lang
),
best AS (
  SELECT did, lang, score,
         row_number() OVER (PARTITION BY did
                            ORDER BY score DESC, lang DESC) AS rn
  FROM grid
)
SELECT did AS {id_col},
       CASE WHEN score > 0 THEN lang ELSE 'unknown' END AS lang_pred
FROM best WHERE rn = 1
"""


def sql_simhash_pairs(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
    max_hamming: int = 3,
) -> str:
    """Oracle for simhash_candidates: pairs sharing at least one exact
    16-bit band of the 64-bit simhash, with hamming(xor) <= max_hamming.
    Band sharing is exactly the engine's bucket rule, so this is a twin of
    the banded pipeline, not merely a brute-force superset."""
    sig = sql_simhash(
        table=table, id_col=id_col, text_col=text_col, shingle=shingle
    )
    band_match = " OR ".join(
        f"((a.us >> {16 * k}) & 65535) = ((b.us >> {16 * k}) & 65535)"
        for k in range(4)
    )
    return f"""
WITH sig AS MATERIALIZED ({sig}),
u AS (
  SELECT {id_col} AS did,
         CAST(CASE WHEN simhash < 0
                   THEN CAST(simhash AS HUGEINT) + 18446744073709551616
                   ELSE CAST(simhash AS HUGEINT) END AS UBIGINT) AS us
  FROM sig
)
SELECT a.did AS id_a, b.did AS id_b,
       CAST(bit_count(xor(a.us, b.us)) AS BIGINT) AS hamming
FROM u a JOIN u b ON a.did < b.did
WHERE ({band_match})
  AND bit_count(xor(a.us, b.us)) <= {max_hamming}
"""


def sql_rollup_full(
    *,
    parquet_glob: str,
    tiers: dict[str, int] | None = None,
    source_col: str = "source",
    ts_col: str = "event_ts",
    value_col: str = "n_tok",
) -> str:
    """Oracle for the full-vocabulary holistic rollup (q_rollup_sequences_full):
    one SELECT per tier over the corpus parquet, UNION ALL, long format with a
    `tier` literal. Twin of kernels/aggregations semantics:

    - dt = bucket_end_seconds - ts_seconds (bucket END drives dt);
    - mode ties -> smallest value; first/last tie-break (ts asc, value asc);
    - time_since_last_maximum = dt of the LATEST maximum (smaller dt);
    - trend = OLS intercept of v on dt, mean(v) when var(dt) == 0;
    - ewma_1h weights exp(ln .5 * dt / 3600);
    - order-dependent float aggs rounded 6dp fixed-point on both sides.
    """
    tiers = tiers or {"1m": 60, "1h": 3600, "1d": 86400}

    def r6(expr: str) -> str:
        return f"CAST(round(({expr}) * 1e6) AS BIGINT) / 1000000.0"

    parts = []
    for name, w in tiers.items():
        wus = w * 1_000_000
        dt = f"((b + 1) * {w} - ts)"
        parts.append(f"""
SELECT '{name}' AS tier, source,
       make_timestamp(b * {wus}) AS bucket_ts,
       CAST(count(*) AS DOUBLE) AS "count",
       CAST(SUM(v) AS DOUBLE) AS "sum",
       CAST(SUM(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS "avg",
       CAST(MIN(v) AS DOUBLE) AS "min",
       CAST(MAX(v) AS DOUBLE) AS "max",
       {r6("quantile_cont(v, 0.5)")} AS "median",
       {r6("quantile_cont(v, 0.25)")} AS "q25",
       {r6("quantile_cont(v, 0.90)")} AS "q90",
       {r6("stddev_pop(v)")} AS "stddev",
       CAST(MIN(v) FILTER (cv = cvmax) AS DOUBLE) AS "mode",
       CAST(count(DISTINCT v) AS DOUBLE) AS "count_distinct",
       MAX(CASE WHEN rf = 1 THEN v END) AS "first",
       MAX(CASE WHEN rl = 1 THEN v END) AS "last",
       {r6(f"CASE WHEN var_pop({dt}) = 0 THEN avg(v) ELSE regr_intercept(v, {dt}) END")} AS "trend",
       {r6(f"SUM(v * exp(ln(0.5) * {dt} / 3600.0)) / SUM(exp(ln(0.5) * {dt} / 3600.0))")} AS "ewma_1h",
       {r6(f"(b + 1) * {w} - MAX(ts) FILTER (v = vmax)")} AS "time_since_last_maximum"
FROM (
  SELECT source, b, ts, v,
         max(v) OVER (PARTITION BY source, b) AS vmax,
         cv0 AS cv,
         max(cv0) OVER (PARTITION BY source, b) AS cvmax,
         row_number() OVER (PARTITION BY source, b
                            ORDER BY ts ASC, v ASC) AS rf,
         row_number() OVER (PARTITION BY source, b
                            ORDER BY ts DESC, v ASC) AS rl
  FROM (
    SELECT {source_col} AS source,
           epoch_us({ts_col}) // {wus} AS b,
           epoch_us({ts_col}) / 1000000.0 AS ts,
           CAST({value_col} AS DOUBLE) AS v,
           count(*) OVER (PARTITION BY {source_col},
                          epoch_us({ts_col}) // {wus}, {value_col}) AS cv0
    FROM read_parquet('{parquet_glob}')
  )
)
GROUP BY tier, source, b""")
    return "\nUNION ALL\n".join(parts)


def sql_logreg_purchase(*, n_iter: int = 25, lr: float = 1.0) -> str:
    """Oracle for q_logreg_purchase: the engine's full-batch gradient descent
    UNROLLED into one CTE layer per iteration (GD is deterministic: zero
    init, fixed lr / iteration count, so each step is a closed-form
    aggregate over the previous weights). Scaler = population mean/std;
    metrics twin classification_metrics / the rank-based AUC. Outputs
    rounded 6dp fixed-point on both sides."""

    def r6(expr: str) -> str:
        return f"CAST(round(({expr}) * 1e6) AS BIGINT) / 1000000.0"

    sig_prev = "1.0 / (1.0 + exp(-(w.wv * d.v + w.wh * d.h + w.b)))"
    layers = ["it0 AS (SELECT 0.0 AS wv, 0.0 AS wh, 0.0 AS b)"]
    for k in range(1, n_iter + 1):
        layers.append(f"""it{k} AS (
  SELECT w.wv - {lr} * SUM(({sig_prev} - d.y) * d.v) / count(*) AS wv,
         w.wh - {lr} * SUM(({sig_prev} - d.y) * d.h) / count(*) AS wh,
         w.b  - {lr} * SUM(({sig_prev} - d.y)) / count(*) AS b
  FROM d, it{k - 1} w GROUP BY w.wv, w.wh, w.b)""")
    final = f"it{n_iter}"
    return f"""
WITH d0 AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
         value AS v0, CAST(hour(ts) AS DOUBLE) AS h0
  FROM events
),
st AS (
  SELECT avg(v0) AS mv,
         CASE WHEN sqrt(greatest(avg(v0 * v0) - avg(v0) * avg(v0), 0.0)) = 0
              THEN 1.0
              ELSE sqrt(greatest(avg(v0 * v0) - avg(v0) * avg(v0), 0.0)) END AS sv,
         avg(h0) AS mh,
         CASE WHEN sqrt(greatest(avg(h0 * h0) - avg(h0) * avg(h0), 0.0)) = 0
              THEN 1.0
              ELSE sqrt(greatest(avg(h0 * h0) - avg(h0) * avg(h0), 0.0)) END AS sh
  FROM d0
),
d AS (
  SELECT y, (v0 - mv) / sv AS v, (h0 - mh) / sh AS h FROM d0, st
),
{",".join(layers)},
scored AS (
  SELECT d.y,
         least(greatest(1.0 / (1.0 + exp(-(w.wv * d.v + w.wh * d.h + w.b))),
                        1e-15), 1.0 - 1e-15) AS p
  FROM d, {final} w
),
met AS (
  SELECT avg(CASE WHEN (p >= 0.5) = (y > 0.5) THEN 1.0 ELSE 0.0 END) AS acc,
         avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))) AS xent
  FROM scored
),
ranked AS (
  SELECT y, AVG(rn) OVER (PARTITION BY p) AS ar
  FROM (SELECT p, y, row_number() OVER (ORDER BY p) AS rn FROM scored)
),
aucv AS (
  SELECT (SUM(ar) FILTER (y = 1.0)
          - COUNT(*) FILTER (y = 1.0) * (COUNT(*) FILTER (y = 1.0) + 1) / 2.0)
         / (COUNT(*) FILTER (y = 1.0) * COUNT(*) FILTER (y = 0.0)) AS auc
  FROM ranked
)
SELECT {r6("w.wv")} AS coef_value,
       {r6("w.wh")} AS coef_hour,
       {r6("w.b")} AS intercept,
       {r6("met.acc")} AS accuracy,
       {r6("met.xent")} AS cross_entropy,
       {r6("aucv.auc")} AS auc
FROM {final} w, met, aucv
"""


def sql_pipeline_e2e_events(
    *,
    horizon_s: float = 60.0,
    memory_s: float = 7200.0,
) -> str:
    """Oracle for q_pipeline_e2e_events: FastProp features (trailing-window
    count/avg/max of value per user, window (t-h-m, t-h], NaN->0) feeding
    closed-form OLS. The engine solves the centered 3x3 normal equations
    with LAPACK; the oracle solves the SAME system by Cramer's rule —
    identical up to float solve order, absorbed by 6dp rounding of the
    predictions and fit R^2."""
    lo = horizon_s + memory_s

    def r6(expr: str) -> str:
        return f"CAST(round(({expr}) * 1e6) AS BIGINT) / 1000000.0"

    return f"""
WITH feat AS (
  SELECT p.event_id, p.value AS y,
         CAST(count(e.ts) AS DOUBLE) AS f1,
         coalesce(CAST(SUM(e.value) AS DOUBLE)
                  / nullif(CAST(count(e.ts) AS DOUBLE), 0.0), 0.0) AS f2,
         coalesce(CAST(MAX(e.value) AS DOUBLE), 0.0) AS f3
  FROM events p
  LEFT JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >  p.ts - INTERVAL '{lo}' SECOND
   AND e.ts <= p.ts - INTERVAL '{horizon_s}' SECOND
  GROUP BY p.event_id, p.value
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         avg(f1) AS m1, avg(f2) AS m2, avg(f3) AS m3, avg(y) AS my
  FROM feat
),
g AS (
  SELECT
    SUM((f1 - m1) * (f1 - m1)) AS g11, SUM((f1 - m1) * (f2 - m2)) AS g12,
    SUM((f1 - m1) * (f3 - m3)) AS g13, SUM((f2 - m2) * (f2 - m2)) AS g22,
    SUM((f2 - m2) * (f3 - m3)) AS g23, SUM((f3 - m3) * (f3 - m3)) AS g33,
    SUM((f1 - m1) * (y - my)) AS b1, SUM((f2 - m2) * (y - my)) AS b2,
    SUM((f3 - m3) * (y - my)) AS b3
  FROM feat, m
),
coef AS (
  SELECT
    (b1 * (g22 * g33 - g23 * g23)
     - g12 * (b2 * g33 - g23 * b3)
     + g13 * (b2 * g23 - g22 * b3)) / det AS c1,
    (g11 * (b2 * g33 - b3 * g23)
     - b1 * (g12 * g33 - g23 * g13)
     + g13 * (g12 * b3 - b2 * g13)) / det AS c2,
    (g11 * (g22 * b3 - g23 * b2)
     - g12 * (g12 * b3 - b2 * g13)
     + b1 * (g12 * g23 - g22 * g13)) / det AS c3
  FROM g, LATERAL (
    SELECT g11 * (g22 * g33 - g23 * g23)
           - g12 * (g12 * g33 - g23 * g13)
           + g13 * (g12 * g23 - g22 * g13) AS det
  ) d
),
ic AS (
  SELECT c1, c2, c3, my - (c1 * m1 + c2 * m2 + c3 * m3) AS b0 FROM coef, m
),
pred AS (
  SELECT event_id, y, b0 + c1 * f1 + c2 * f2 + c3 * f3 AS yhat
  FROM feat, ic
),
r2 AS (
  SELECT 1.0 - SUM((y - yhat) * (y - yhat))
               / (SUM(y * y) - SUM(y) * SUM(y) / (SELECT n FROM m)) AS r
  FROM pred
)
SELECT event_id, {r6("yhat")} AS prediction, {r6("r2.r")} AS fit_r2
FROM pred, r2
"""


def _token_lsh_cte_body(
    *,
    src: str,
    id_col: str,
    tokens_col: str,
    num_perm: int,
    n: int,
) -> str:
    """Shared CTE chain (seeds .. bh3 + gd) replicating the token-MinHash
    arithmetic: gram hash = sum tokens[s+j] * B^(n-1-j) mod 2^64, then
    the same splitmix64 permutation/band-fold chain as sql_minhash_lsh.
    Specialized to rows_per_band = 4 (callers enforce)."""
    from ..stages.tokens import _TOK_B

    m64 = "18446744073709551616"
    terms = " + ".join(
        f"CAST({tokens_col}[CAST(s AS INT) + {j}] AS HUGEINT) * "
        f"{pow(_TOK_B, n - 1 - j, 1 << 64)}"
        for j in range(n)
    )
    sm_mix = ",\n       ".join(sql_splitmix64_cols("xor(gh, seed)", "m_"))
    sm1 = ",\n       ".join(sql_splitmix64_cols("xor(s0, s1)", "b1_"))
    sm2 = ",\n       ".join(sql_splitmix64_cols("xor(h1, s2)", "b2_"))
    sm3 = ",\n       ".join(sql_splitmix64_cols("xor(h2, s3)", "b3_"))
    return f"""seeds(p, seed) AS (VALUES {_seed_values(num_perm)}),
g AS MATERIALIZED (
  SELECT {id_col} AS did,
         CAST(({terms}) % {m64} AS UBIGINT) AS gh
  FROM {src},
       LATERAL (SELECT unnest(generate_series(
           1, len({tokens_col}) - {n - 1})) AS s) t
  WHERE len({tokens_col}) >= {n}
),
gd AS MATERIALIZED (SELECT DISTINCT did, gh FROM g),
uh AS MATERIALIZED (SELECT DISTINCT gh FROM gd),
mix AS MATERIALIZED (
  SELECT gh, p,
       {sm_mix}
  FROM uh CROSS JOIN seeds
),
sig AS MATERIALIZED (
  SELECT did, p, min(m_out) AS s
  FROM gd JOIN mix USING (gh) GROUP BY did, p
),
piv AS (
  SELECT did, p // 4 AS band,
         max(CASE WHEN p % 4 = 0 THEN s END) AS s0,
         max(CASE WHEN p % 4 = 1 THEN s END) AS s1,
         max(CASE WHEN p % 4 = 2 THEN s END) AS s2,
         max(CASE WHEN p % 4 = 3 THEN s END) AS s3
  FROM sig GROUP BY did, p // 4
),
bh1 AS MATERIALIZED (
  SELECT did, band, s2, s3,
       {sm1}
  FROM piv
),
bh2 AS MATERIALIZED (
  SELECT did, band, s3, b1_out AS h1,
       {sm2}
  FROM bh1
),
bh3 AS MATERIALIZED (
  SELECT did, band, b2_out AS h2,
       {sm3}
  FROM bh2
)"""


def sql_token_minhash_lsh(
    *,
    src: str,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_perm: int = 16,
    bands: int = 4,
    n: int = 8,
) -> str:
    """Oracle for stages/tokens.token_minhash_lsh_candidates: the gram
    universe is length-n token-id windows hashed with the token polynomial
    (sum tokens[s+j] * B^(n-1-j) mod 2^64); the permutation / band-fold
    arithmetic is byte-identical to sql_minhash_lsh. Docs with < n tokens
    contribute no grams (engine contract)."""
    r = num_perm // bands
    if r != 4:
        raise NotImplementedError(
            "oracle generator is specialized to rows_per_band=4"
        )
    body = _token_lsh_cte_body(
        src=src, id_col=id_col, tokens_col=tokens_col,
        num_perm=num_perm, n=n,
    )
    return f"""
WITH {body},
grp AS (
  SELECT CAST(band AS BIGINT) AS band,
         {sql_signed64('b3_out')} AS band_hash,
         list(did ORDER BY did) AS ids,
         CAST(count(*) AS BIGINT) AS group_size
  FROM bh3 GROUP BY 1, 2
)
SELECT band, band_hash, ids, group_size FROM grp WHERE group_size > 1
"""


def sql_token_jaccard_pairs(
    *,
    src: str,
    id_col: str = "doc_key",
    tokens_col: str = "tokens",
    num_perm: int = 32,
    bands: int = 8,
    n: int = 8,
    threshold: float = 0.5,
) -> str:
    """Oracle for stages/tokens.token_jaccard_pairs — the EXACT pipeline
    twin (not a brute-force approximation): candidate pairs come from the
    same LSH band buckets (bh3 self-join), verified with exact
    distinct-gram Jaccard from gd. Exact regardless of LSH recall."""
    if num_perm // bands != 4:
        raise NotImplementedError(
            "oracle generator is specialized to rows_per_band=4"
        )
    body = _token_lsh_cte_body(
        src=src, id_col=id_col, tokens_col=tokens_col,
        num_perm=num_perm, n=n,
    )
    return f"""
WITH {body},
pairs AS MATERIALIZED (
  SELECT DISTINCT l.did AS id_a, r.did AS id_b
  FROM bh3 l JOIN bh3 r
    ON l.band = r.band AND l.b3_out = r.b3_out AND l.did < r.did
),
c AS (SELECT did, count(*) AS sz FROM gd GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS i
  FROM pairs p
  JOIN gd ga ON ga.did = p.id_a
  JOIN gd gb ON gb.did = p.id_b AND gb.gh = ga.gh
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b,
       CAST(round(CAST(COALESCE(i.i, 0) AS DOUBLE)
                  / (ca.sz + cb.sz - COALESCE(i.i, 0)) * 1e6) AS BIGINT)
           / 1000000.0 AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN c ca ON ca.did = p.id_a
JOIN c cb ON cb.did = p.id_b
WHERE CAST(COALESCE(i.i, 0) AS DOUBLE)
      / (ca.sz + cb.sz - COALESCE(i.i, 0)) >= {threshold}
"""


def sql_token_near_dedup(
    *,
    src: str,
    id_col: str = "doc_key",
    tokens_col: str = "tokens",
    num_perm: int = 32,
    bands: int = 8,
    n: int = 8,
    threshold: float = 0.5,
) -> str:
    """Oracle for stages/tokens.token_near_dedup_clusters: recursive
    reachability over the exact LSH+verify edge list (same CTEs as
    sql_token_jaccard_pairs); canonical = min id of the component,
    untouched docs map to themselves with size 1."""
    if num_perm // bands != 4:
        raise NotImplementedError(
            "oracle generator is specialized to rows_per_band=4"
        )
    body = _token_lsh_cte_body(
        src=src, id_col=id_col, tokens_col=tokens_col,
        num_perm=num_perm, n=n,
    )
    return f"""
WITH RECURSIVE {body},
cand AS MATERIALIZED (
  SELECT DISTINCT l.did AS id_a, r.did AS id_b
  FROM bh3 l JOIN bh3 r
    ON l.band = r.band AND l.b3_out = r.b3_out AND l.did < r.did
),
c AS (SELECT did, count(*) AS sz FROM gd GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS i
  FROM cand p
  JOIN gd ga ON ga.did = p.id_a
  JOIN gd gb ON gb.did = p.id_b AND gb.gh = ga.gh
  GROUP BY 1, 2
),
pairs AS (
  SELECT p.id_a, p.id_b
  FROM cand p
  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
  JOIN c ca ON ca.did = p.id_a
  JOIN c cb ON cb.did = p.id_b
  WHERE CAST(COALESCE(i.i, 0) AS DOUBLE)
        / (ca.sz + cb.sz - COALESCE(i.i, 0)) >= {threshold}
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
),
canon AS (
  SELECT d.{id_col} AS {id_col},
         least(d.{id_col}, coalesce(r.mn, d.{id_col})) AS canonical_id
  FROM {src} d
  LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) r
    ON r.a = d.{id_col}
)
SELECT {id_col}, canonical_id,
       CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
           AS cluster_size
FROM canon
"""
