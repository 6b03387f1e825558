"""FastProp fit-time feature search: candidate enumeration x condition sets
x sampled-R² selection — the reference's "automated feature engineering"
loop (`src/engine/src/fastprop/FastProp.cpp:880-926` fit_on_peripheral,
`:1479-1509` select_features, `:1228-1251` make_categorical_conditions,
`:714-839` fit_on_same_units_*; default aggregation set
`getml/feature_learning/aggregations/sets.py:241-260`).

Candidate grammar (per window x per condition set):
- numericals:   every agg over each peripheral numeric column
  (fit_on_numericals, FastProp.cpp:681);
- categoricals-by-category: every numeric agg over the indicator
  (peri[cat] == value) for each enumerated category value
  (fit_on_categoricals_by_categories, FastProp.cpp:597 /
  Aggregator.cpp:98-115 extract_value -> 1.0/0.0);
- same-unit:    every agg over pop[out] - peri[in] for declared same-unit
  column pairs — with the (pop_ts, peri_ts) pair this is the reference's
  "time since X" family (fit_on_same_units_numerical, FastProp.cpp:798 /
  Aggregator.cpp:303-335 extract_value = col1[out] - col2[in]);
- avg_time_between over the peripheral timestamps (FastProp.cpp:917-921);
- condition sets: category-equality filters peri[cat] == value applied to
  the window rows before aggregation (make_categorical_conditions) and lag
  windows (make_lag_conditions, handled by the spec's windows()).

Selection: per-candidate simple-OLS R² against the target on a
deterministically sampled population (`calc_r_squared` / RSquared.cpp),
keep the top `num_features` (reference keeps r² > threshold where
threshold is the num_features-th largest — identical set up to ties;
ties broken here by name asc for determinism). The reference samples rows
with a sequential mt19937 (`sample_from_population`, FastProp.cpp:1463-75);
this engine uses a deterministic key-hash sample instead — same documented
divergence as the hash-based splits.

Ray-Data-first execution: ONE hash-partition exchange of the tagged union
(only key/ts/value/cat columns ever shuffle), a vectorized per-partition
kernel that expands windows once and evaluates EVERY candidate on the
expanded arrays (masks per condition, one grouped_aggregate call per
(value, condition) group), then a single streaming partial-moment pass
scoring all candidates at once (stages/predictors.select_features math).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..stages.rollup import ts_to_us
from .fastprop import _hash_part

US = 1_000_000

# reference default aggregation set (sets.py:241-260), minus FIRST/LAST/MODE
# when sql_safe is requested (their window-SQL tie-breaks are not portable;
# they remain in the full set and are pinned by kernel unit tests).
DEFAULT_AGGS = [
    "avg", "count", "count_distinct", "count_minus_count_distinct",
    "first", "last", "max", "median", "min", "mode", "stddev", "sum",
    "trend",
]
SQL_SAFE_AGGS = [
    "avg", "count", "count_distinct", "count_minus_count_distinct",
    "max", "median", "min", "stddev", "sum", "trend",
]


@dataclass(frozen=True)
class Candidate:
    """One abstract feature (AbstractFeature.hpp analog)."""

    name: str
    agg: str
    kind: str  # numeric | indicator | same_unit | avg_time_between
    value_col: str | None = None  # peripheral column (numeric / cat / pair-in)
    pop_col: str | None = None  # same_unit population column
    cat_value: str | None = None  # indicator value
    cond_col: str | None = None  # condition: peri[cond_col] == cond_value
    cond_value: str | None = None
    window: tuple[str, float, float] = ("", 0.0, 0.0)


@dataclass
class AutoFitSpec:
    key_col: str
    pop_ts_col: str
    peri_ts_col: str
    numeric_cols: list[str]
    id_cols: list[str] = field(default_factory=list)
    categorical_cols: list[str] = field(default_factory=list)
    # explicit category values per column (static enumeration); pass None to
    # discover the n_most_frequent per column at fit time (data-dependent)
    category_values: dict[str, list[str]] | None = None
    n_most_frequent: int = 3
    # (pop_col, peri_col) same-unit pairs; ("__ts__", "__ts__") is the
    # timestamp pair (float seconds), generating the time-since family
    same_unit_pairs: list[tuple[str, str]] = field(default_factory=list)
    aggs: list[str] = field(default_factory=lambda: list(DEFAULT_AGGS))
    horizon_s: float = 0.0
    memory_s: float = 0.0
    lag_delta_s: float = 0.0
    n_lags: int = 0
    num_features: int = 200
    sampling_factor: float = 1.0
    num_partitions: int = 32

    def windows(self) -> list[tuple[str, float, float]]:
        if self.lag_delta_s > 0 and self.n_lags > 0:
            return [
                (
                    f"__lag{i}",
                    self.horizon_s + (i + 1) * self.lag_delta_s,
                    self.horizon_s + i * self.lag_delta_s,
                )
                for i in range(self.n_lags)
            ]
        return [("", self.horizon_s + self.memory_s, self.horizon_s)]


def _sanitize(v: str) -> str:
    return str(v).replace(" ", "_")


def enumerate_candidates(
    spec: AutoFitSpec, category_values: dict[str, list[str]]
) -> list[Candidate]:
    """Static candidate grammar — fit_on_peripheral's loop order."""
    out: list[Candidate] = []
    conditions: list[tuple[str | None, str | None]] = [(None, None)]
    for cat in spec.categorical_cols:
        for v in category_values.get(cat, []):
            conditions.append((cat, v))

    for win in spec.windows():
        wsuf = win[0]
        for cond_col, cond_value in conditions:
            csuf = (
                f"__where_{cond_col}={_sanitize(cond_value)}"
                if cond_col is not None
                else ""
            )
            for c in spec.numeric_cols:
                for agg in spec.aggs:
                    out.append(Candidate(
                        name=f"{c}__{agg}{wsuf}{csuf}", agg=agg,
                        kind="numeric", value_col=c,
                        cond_col=cond_col, cond_value=cond_value, window=win,
                    ))
            for cat in spec.categorical_cols:
                for v in category_values.get(cat, []):
                    if cond_col == cat:
                        continue  # condition already fixes this column
                    for agg in spec.aggs:
                        out.append(Candidate(
                            name=f"{cat}=={_sanitize(v)}__{agg}{wsuf}{csuf}",
                            agg=agg, kind="indicator", value_col=cat,
                            cat_value=v, cond_col=cond_col,
                            cond_value=cond_value, window=win,
                        ))
            for pop_col, peri_col in spec.same_unit_pairs:
                pname = "ts" if pop_col == "__ts__" else pop_col
                iname = "ts" if peri_col == "__ts__" else peri_col
                for agg in spec.aggs:
                    out.append(Candidate(
                        name=f"{pname}_minus_{iname}__{agg}{wsuf}{csuf}",
                        agg=agg, kind="same_unit", value_col=peri_col,
                        pop_col=pop_col, cond_col=cond_col,
                        cond_value=cond_value, window=win,
                    ))
            out.append(Candidate(
                name=f"avg_time_between{wsuf}{csuf}", agg="avg_time_between",
                kind="avg_time_between", cond_col=cond_col,
                cond_value=cond_value, window=win,
            ))
    return out


class _CandidateKernel:
    """Per-partition evaluation of every candidate: one window expansion per
    distinct window, one grouped_aggregate call per (value-array, condition,
    window) group. NaN/Inf -> 0.0 (FastProp.cpp:100 feature-matrix
    semantics)."""

    def __init__(self, spec: AutoFitSpec, candidates: list[Candidate],
                 target_col: str | None):
        self.spec = spec
        self.candidates = candidates
        self.target_col = target_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..kernels.aggregations import grouped_aggregate

        spec = self.spec
        side = np.asarray(t["_side"])
        pop = t.filter(pa.array(side == 0))
        peri = t.filter(pa.array(side == 1))
        n_pop = len(pop)
        if n_pop == 0:
            return self._empty(t.schema)

        pop_key = np.asarray(pop[spec.key_col])
        peri_key = np.asarray(peri[spec.key_col])
        pop_ts = ts_to_us(pop["_ts"].combine_chunks())
        peri_ts = ts_to_us(peri["_ts"].combine_chunks())

        uniq, inv = np.unique(
            np.concatenate([pop_key, peri_key]), return_inverse=True
        )
        pop_g, peri_g = inv[:n_pop], inv[n_pop:]

        pop_order = np.lexsort((pop_ts, pop_g))
        pop_g, pop_ts = pop_g[pop_order], pop_ts[pop_order]

        num_cols = list(dict.fromkeys(
            spec.numeric_cols
            + [p for _, p in spec.same_unit_pairs if p != "__ts__"]
        ))
        vals = {
            c: np.asarray(peri[c].combine_chunks(), dtype=np.float64)
            for c in num_cols
        }
        cats = {
            c: np.asarray(peri[c].combine_chunks()).astype(str)
            for c in spec.categorical_cols
        }
        tie = vals[num_cols[0]] if num_cols else np.zeros(len(peri))
        peri_order = np.lexsort((tie, peri_ts, peri_g))
        peri_g, peri_ts = peri_g[peri_order], peri_ts[peri_order]
        vals = {c: v[peri_order] for c, v in vals.items()}
        cats = {c: v[peri_order] for c, v in cats.items()}

        pop_num = {
            pc: np.asarray(pop[pc].combine_chunks(), dtype=np.float64)[pop_order]
            for pc, _ in spec.same_unit_pairs
            if pc != "__ts__"
        }

        t0 = int(min(peri_ts.min(), pop_ts.min())) if len(peri_ts) else int(pop_ts.min())
        rel_peri = peri_ts - t0
        rel_pop = pop_ts - t0
        time_ranks = np.unique(rel_peri)
        spanr = len(time_ranks) + 1
        comp = peri_g * spanr + np.searchsorted(time_ranks, rel_peri)

        out_cols: dict[str, pa.Array] = {}
        for c in spec.id_cols:
            out_cols[c] = pop[c].combine_chunks().take(pa.array(pop_order))
        out_cols[spec.key_col] = pa.array(uniq[pop_g])
        out_cols[spec.pop_ts_col] = (
            pop["_ts"].combine_chunks().take(pa.array(pop_order))
        )
        if self.target_col:
            out_cols[self.target_col] = (
                pop[self.target_col].combine_chunks().take(pa.array(pop_order))
            )
        t_out_sec = pop_ts / 1e6

        # group candidates by (window, condition) -> one expansion + mask
        by_win: dict[tuple, list[Candidate]] = {}
        for cand in self.candidates:
            by_win.setdefault(cand.window, []).append(cand)

        for win, cands in by_win.items():
            _, low_s, up_s = win
            lo_t = rel_pop - int(low_s * US) + 1
            hi_t = rel_pop - int(up_s * US) + 1
            lo_r = np.searchsorted(time_ranks, lo_t, side="left")
            hi_r = np.searchsorted(time_ranks, hi_t, side="left")
            lo = np.searchsorted(comp, pop_g * spanr + lo_r, side="left")
            hi = np.searchsorted(comp, pop_g * spanr + hi_r, side="left")
            cnt = hi - lo
            eg = np.repeat(np.arange(n_pop), cnt)
            cum = np.concatenate([[0], np.cumsum(cnt)])
            idx = (
                np.arange(int(cnt.sum())) - np.repeat(cum[:-1], cnt)
                + np.repeat(lo, cnt)
            )
            ets = peri_ts[idx] / 1e6

            # condition masks (None -> all rows)
            by_cond: dict[tuple, list[Candidate]] = {}
            for cand in cands:
                by_cond.setdefault((cand.cond_col, cand.cond_value), []).append(cand)
            for (cc, cv), cl in by_cond.items():
                if cc is None:
                    m = slice(None)
                    eg_m, ets_m = eg, ets
                else:
                    m = cats[cc][idx] == cv
                    eg_m, ets_m = eg[m], ets[m]
                # group by value array so each distinct (value, cond) pays
                # ONE grouped_aggregate call covering all its aggs
                by_val: dict[tuple, list[Candidate]] = {}
                for cand in cl:
                    key = (cand.kind, cand.value_col, cand.pop_col, cand.cat_value)
                    by_val.setdefault(key, []).append(cand)
                for (kind, vc, pc, catv), group in by_val.items():
                    if kind == "numeric":
                        v = vals[vc][idx][m] if cc is not None else vals[vc][idx]
                    elif kind == "indicator":
                        base = cats[vc][idx]
                        v = (base == catv).astype(np.float64)
                        v = v[m] if cc is not None else v
                    elif kind == "same_unit":
                        pv = t_out_sec[eg] if pc == "__ts__" else pop_num[pc][eg]
                        iv = ets if vc == "__ts__" else vals[vc][idx]
                        v = pv - iv
                        v = v[m] if cc is not None else v
                    else:  # avg_time_between aggregates the timestamps
                        v = ets_m
                    aggs = sorted({c.agg for c in group})
                    res = grouped_aggregate(
                        aggs, eg_m, v, n_pop, ts=ets_m, t_out=t_out_sec
                    )
                    for cand in group:
                        arr = res[cand.agg]
                        arr = np.where(np.isfinite(arr), arr, 0.0)
                        out_cols[cand.name] = pa.array(arr)
        return pa.table(out_cols)

    def _empty(self, schema: pa.Schema) -> pa.Table:
        spec = self.spec
        cols: dict[str, pa.Array] = {}
        for c in spec.id_cols:
            cols[c] = pa.array([], type=schema.field(c).type)
        cols[spec.key_col] = pa.array([], type=schema.field(spec.key_col).type)
        cols[spec.pop_ts_col] = pa.array([], type=schema.field("_ts").type)
        if self.target_col:
            cols[self.target_col] = pa.array(
                [], type=schema.field(self.target_col).type
            )
        for cand in self.candidates:
            cols[cand.name] = pa.array([], type=pa.float64())
        return pa.table(cols)


def _tagged_union(population_ds, peripheral_ds, spec: AutoFitSpec,
                  target_col: str | None, sample: bool):
    """Tag + hash-partition both sides; only key/ts/value/cat columns
    shuffle. `sample=True` applies the deterministic key-hash row sample
    (sampling_factor) to the population side."""
    num_cols = list(dict.fromkeys(
        spec.numeric_cols
        + [p for _, p in spec.same_unit_pairs if p != "__ts__"]
    ))
    pop_num = [p for p, _ in spec.same_unit_pairs if p != "__ts__"]
    frac = spec.sampling_factor

    def tag_pop(b: pa.Table) -> pa.Table:
        k = np.asarray(b[spec.key_col])
        if sample and frac < 1.0:
            # deterministic hash sample on (key, ts) — divergence from the
            # reference's sequential mt19937 documented in the module docstring
            ts = ts_to_us(b[spec.pop_ts_col].combine_chunks())
            h = (
                _hash_part(k, 1 << 20).astype(np.uint64) * np.uint64(2654435761)
                + ts.astype(np.uint64)
            ) * np.uint64(0x9E3779B97F4A7C15)
            keep = (h >> np.uint64(40)) < np.uint64(int(frac * (1 << 24)))
            b = b.filter(pa.array(keep))
            k = np.asarray(b[spec.key_col])
        cols = {c: b[c] for c in spec.id_cols}
        if target_col:
            cols[target_col] = b[target_col].cast(pa.float64())
        cols[spec.key_col] = b[spec.key_col]
        cols["_ts"] = b[spec.pop_ts_col]
        for c in pop_num:
            cols[c] = b[c].cast(pa.float64())
        for c in num_cols:
            if c not in cols:
                cols[c] = pa.nulls(len(b), pa.float64())
        for c in spec.categorical_cols:
            cols[c] = pa.nulls(len(b), pa.string())
        cols["_side"] = pa.array(np.zeros(len(b), dtype=np.int8))
        cols["_part"] = pa.array(_hash_part(k, spec.num_partitions))
        return pa.table(cols)

    try:
        _pop_schema = population_ds.schema()
        _pop_pa = getattr(_pop_schema, "base_schema", _pop_schema)
        id_types = {c: _pop_pa.field(c).type for c in spec.id_cols}
    except Exception:
        id_types = {c: pa.int64() for c in spec.id_cols}

    def tag_peri(b: pa.Table) -> pa.Table:
        k = np.asarray(b[spec.key_col])
        cols = {}
        for c in spec.id_cols:
            cols[c] = pa.nulls(len(b), id_types[c])
        if target_col:
            cols[target_col] = pa.nulls(len(b), pa.float64())
        cols[spec.key_col] = b[spec.key_col]
        cols["_ts"] = b[spec.peri_ts_col]
        for c in pop_num:
            if c in num_cols:
                continue
            cols[c] = pa.nulls(len(b), pa.float64())
        for c in num_cols:
            cols[c] = b[c].cast(pa.float64())
        for c in spec.categorical_cols:
            cols[c] = b[c].cast(pa.string())
        cols["_side"] = pa.array(np.ones(len(b), dtype=np.int8))
        cols["_part"] = pa.array(_hash_part(k, spec.num_partitions))
        return pa.table(cols)

    pop_cols = list(dict.fromkeys(
        spec.id_cols + ([target_col] if target_col else [])
        + [spec.key_col, spec.pop_ts_col] + pop_num
    ))
    peri_cols = list(dict.fromkeys(
        [spec.key_col, spec.peri_ts_col] + num_cols + spec.categorical_cols
    ))
    pop = population_ds.select_columns(pop_cols).map_batches(
        tag_pop, batch_format="pyarrow", zero_copy_batch=True
    )
    peri = peripheral_ds.select_columns(peri_cols).map_batches(
        tag_peri, batch_format="pyarrow", zero_copy_batch=True
    )
    return pop.union(peri)


def _discover_categories(peripheral_ds, spec: AutoFitSpec) -> dict[str, list[str]]:
    """Top n_most_frequent per categorical column via a tiny distributed
    count (find_most_frequent_categories analog); ties by value asc."""
    if spec.category_values is not None:
        return spec.category_values
    out: dict[str, list[str]] = {}
    for cat in spec.categorical_cols:
        counts = (
            peripheral_ds.select_columns([cat]).groupby(cat).count().to_pandas()
        )
        counts = counts.sort_values(
            ["count()", cat], ascending=[False, True]
        )
        out[cat] = [str(v) for v in counts[cat].head(spec.n_most_frequent)]
    return out


def autofit_features(population_ds, peripheral_ds, spec: AutoFitSpec,
                     candidates: list[Candidate], *,
                     target_col: str | None = None, sample: bool = False):
    """Evaluate `candidates` for every (sampled) population row."""
    kernel = _CandidateKernel(spec, candidates, target_col)
    return (
        _tagged_union(population_ds, peripheral_ds, spec, target_col, sample)
        .groupby("_part")
        .map_groups(
            lambda g: kernel(g.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )


@dataclass
class AutoFitResult:
    spec: AutoFitSpec
    category_values: dict[str, list[str]]
    candidates: list[Candidate]
    selected: list[Candidate]
    r2: dict[str, float]

    def transform(self, population_ds, peripheral_ds,
                  target_col: str | None = None):
        """Feature matrix of the SELECTED candidates on the full data."""
        return autofit_features(
            population_ds, peripheral_ds, self.spec, self.selected,
            target_col=target_col, sample=False,
        )


def autofit(population_ds, peripheral_ds, spec: AutoFitSpec, *,
            target_col: str) -> AutoFitResult:
    """Enumerate -> evaluate on the sampled population -> score every
    candidate's simple-OLS R² against the target in ONE streaming
    partial-moment pass -> keep the top num_features (r² rounded 6dp desc,
    name asc — the same fixed-point ranking as the SQL twin, so last-ulp
    differences in distributed float summation can never flip the selected
    set between runs)."""
    from ..stages.predictors import select_features

    category_values = _discover_categories(peripheral_ds, spec)
    candidates = enumerate_candidates(spec, category_values)
    feats = autofit_features(
        population_ds, peripheral_ds, spec, candidates,
        target_col=target_col, sample=True,
    )
    scored = select_features(
        feats,
        feature_cols=[c.name for c in candidates],
        target_col=target_col,
        k=len(candidates),
    )
    scored = [(name, float(np.rint(r2 * 1e6) / 1e6)) for name, r2 in scored]
    scored.sort(key=lambda t: (-t[1], t[0]))
    top = scored[: spec.num_features]
    chosen = {name for name, _ in top}
    selected = [c for c in candidates if c.name in chosen]
    return AutoFitResult(
        spec=spec,
        category_values=category_values,
        candidates=candidates,
        selected=selected,
        r2=dict(top),
    )


# ---------------------------------------------------------------------------
# SQL twin of the scoring pass (driver oracle) — reference parity with the
# transpilation layer (SQLMaker.cpp): every candidate is an expression, the
# R² of the selection loop is spelled with the engine's exact guard.
# ---------------------------------------------------------------------------

_DT_SQL = "(epoch_us(p.{pts}) / 1000000.0 - epoch_us(e.{ts}) / 1000000.0)"


def _value_sql(cand: Candidate, spec: AutoFitSpec) -> str:
    if cand.kind == "numeric":
        return f"e.{cand.value_col}"
    if cand.kind == "indicator":
        return (
            f"CASE WHEN e.{cand.value_col} = '{cand.cat_value}' "
            "THEN 1.0 ELSE 0.0 END"
        )
    if cand.kind == "same_unit":
        pv = (
            f"epoch_us(p.{spec.pop_ts_col}) / 1000000.0"
            if cand.pop_col == "__ts__"
            else f"p.{cand.pop_col}"
        )
        iv = (
            f"epoch_us(e.{spec.peri_ts_col}) / 1000000.0"
            if cand.value_col == "__ts__"
            else f"e.{cand.value_col}"
        )
        return f"({pv} - {iv})"
    raise ValueError(cand.kind)


def _agg_sql(cand: Candidate, spec: AutoFitSpec) -> str:
    """NaN->0 feature-matrix semantics baked in (FastProp.cpp:100)."""
    filt = ""
    if cand.cond_col is not None:
        filt = f" FILTER (e.{cand.cond_col} = '{cand.cond_value}')"
    ts = f"e.{spec.peri_ts_col}"
    if cand.kind == "avg_time_between":
        es = f"epoch_us({ts}) / 1000000.0"
        return (
            f"CASE WHEN count({ts}){filt} <= 1 THEN 0.0 ELSE "
            f"(MAX({es}){filt} - MIN({es}){filt})"
            f" / (count({ts}){filt} - 1) END"
        )
    v = _value_sql(cand, spec)
    a = cand.agg
    if a == "count":
        return f"CAST(count({ts}){filt} AS DOUBLE)"
    if a == "sum":
        return f"coalesce(CAST(SUM({v}){filt} AS DOUBLE), 0.0)"
    if a == "avg":
        return (
            f"coalesce(CAST(SUM({v}){filt} AS DOUBLE)"
            f" / nullif(CAST(count({ts}){filt} AS DOUBLE), 0.0), 0.0)"
        )
    if a == "min":
        return f"coalesce(CAST(MIN({v}){filt} AS DOUBLE), 0.0)"
    if a == "max":
        return f"coalesce(CAST(MAX({v}){filt} AS DOUBLE), 0.0)"
    if a == "median":
        return f"coalesce(quantile_cont({v}, 0.5){filt}, 0.0)"
    if a == "stddev":
        return f"coalesce(stddev_pop({v}){filt}, 0.0)"
    if a == "count_distinct":
        return f"CAST(count(DISTINCT {v}){filt} AS DOUBLE)"
    if a == "count_minus_count_distinct":
        return (
            f"CAST(count({v}){filt} AS DOUBLE)"
            f" - CAST(count(DISTINCT {v}){filt} AS DOUBLE)"
        )
    if a == "trend":
        dt = _DT_SQL.format(pts=spec.pop_ts_col, ts=spec.peri_ts_col)
        return (
            f"coalesce(CASE WHEN var_pop({dt}){filt} = 0"
            f" THEN avg({v}){filt}"
            f" ELSE regr_intercept({v}, {dt}){filt} END, 0.0)"
        )
    raise ValueError(f"aggregation {a!r} is not SQL-transpilable")


def autofit_scores_sql(
    spec: AutoFitSpec,
    candidates: list[Candidate],
    *,
    population_table: str,
    peripheral_table: str,
    target_col: str,
    top_k: int,
) -> str:
    """One CTE evaluating every candidate per population row (the window
    LEFT JOIN), then the engine's R² = cov²/(var_x · var_y) guard per
    candidate, rank by (r² rounded 6dp desc, name asc), top_k."""
    wins = spec.windows()
    if len(wins) != 1:
        raise NotImplementedError("scores oracle supports a single window")
    _, low_s, up_s = wins[0]
    cols = [
        f'{_agg_sql(c, spec)} AS "f{i}"' for i, c in enumerate(candidates)
    ]
    scores = "\nUNION ALL\n".join(
        f"SELECT '{c.name}' AS feature, "
        f'CASE WHEN var_pop("f{i}") > 0 AND var_pop(y) > 0 '
        f'THEN covar_pop("f{i}", y) * covar_pop("f{i}", y)'
        f' / (var_pop("f{i}") * var_pop(y)) ELSE 0.0 END AS r2 '
        "FROM feat"
        for i, c in enumerate(candidates)
    )
    sel = ",\n       ".join(cols)
    ids = "".join(f"p.{c}, " for c in spec.id_cols)
    return f"""
WITH feat AS MATERIALIZED (
  SELECT {ids}p.{spec.key_col}, p.{spec.pop_ts_col},
         p.{target_col} AS y,
         {sel}
  FROM {population_table} p
  LEFT JOIN {peripheral_table} e
    ON e.{spec.key_col} = p.{spec.key_col}
   AND e.{spec.peri_ts_col} >  p.{spec.pop_ts_col} - INTERVAL '{low_s}' SECOND
   AND e.{spec.peri_ts_col} <= p.{spec.pop_ts_col} - INTERVAL '{up_s}' SECOND
  GROUP BY ALL
),
scores AS (
{scores}
)
SELECT feature,
       CAST(round(r2 * 1e6) AS BIGINT) / 1000000.0 AS r2,
       CAST(row_number() OVER (
           ORDER BY CAST(round(r2 * 1e6) AS BIGINT) DESC, feature ASC)
           AS BIGINT) AS rank
FROM scores QUALIFY rank <= {top_k}
"""
