"""Transpile a FastPropSpec into portable ANSI/DuckDB SQL.

Reference parity: getML transpiles every learned feature into SQL for 11
dialects (`src/engine/src/fastprop/SQLMaker.cpp`,
`src/engine/include/transpilation/`, `getml/pipeline/dialect.py`) so
features are portable specs. This module does the same for our windowed
feature specs: the generated SQL reproduces the reference match rule
`t - horizon - memory < pts <= t - horizon` as join predicates.

Supported aggregations: count, sum, avg, min, max, median (the
SQL-expressible core); EWMA/TREND are emitted via exp/regr expressions.
"""

from __future__ import annotations

from .fastprop import FastPropSpec

_SIMPLE = {
    "count": "CAST(count(e.{ts}) {flt} AS DOUBLE)",
    "sum": "COALESCE(CAST(SUM(e.{val}) {flt} AS DOUBLE), 0.0)",
    "avg": "CAST(SUM(e.{val}) {flt} AS DOUBLE) / CAST(count(e.{ts}) {flt} AS DOUBLE)",
    "min": "CAST(MIN(e.{val}) {flt} AS DOUBLE)",
    "max": "CAST(MAX(e.{val}) {flt} AS DOUBLE)",
    "median": "quantile_cont(e.{val}, 0.5) {flt}",
    "stddev": "stddev_pop(e.{val}) {flt}",
    "var": "var_pop(e.{val}) {flt}",
    "count_distinct": "CAST(count(DISTINCT e.{val}) {flt} AS DOUBLE)",
}

_DT = "(epoch_us(p.{pts}) / 1000000.0 - epoch_us(e.{ts}) / 1000000.0)"

_EWMA = (
    "SUM(e.{val} * exp(ln(0.5) * " + _DT + " / {h})) {flt}"
    " / SUM(exp(ln(0.5) * " + _DT + " / {h})) {flt}"
)
_TREND = (
    "CASE WHEN var_pop(" + _DT + ") {flt} = 0 THEN avg(e.{val}) {flt} "
    "ELSE regr_intercept(e.{val}, " + _DT + ") {flt} END"
)

from ..kernels.aggregations import EWMA_HALF_LIVES  # noqa: E402


def _agg_sql(agg: str, spec: FastPropSpec, filt: str) -> str:
    ctx = dict(
        val="{val}", ts=spec.peri_ts_col, pts=spec.pop_ts_col, flt=filt
    )
    if agg in _SIMPLE:
        return _SIMPLE[agg].format(**ctx)
    if agg.startswith("ewma_") and agg[5:] in EWMA_HALF_LIVES:
        return _EWMA.format(h=EWMA_HALF_LIVES[agg[5:]], **ctx)
    if agg == "trend":
        return _TREND.format(**ctx)
    raise ValueError(f"aggregation {agg!r} is not SQL-transpilable")


def fastprop_to_sql(
    spec: FastPropSpec,
    *,
    population_table: str,
    peripheral_table: str,
    pop_id_cols: list[str] | None = None,
) -> str:
    """Generate one SELECT reproducing `fastprop_features(...)` for every
    SQL-transpilable aggregation in the spec (column names match the Ray
    output: `<value>__<agg>[__lag<i>]`)."""
    ids = pop_id_cols if pop_id_cols is not None else spec.id_cols
    sel_ids = [f"p.{c}" for c in ids] + [
        f"p.{spec.key_col}",
        f"p.{spec.pop_ts_col}",
    ]

    windows = spec.windows()
    low_all = max(w[1] for w in windows)
    up_all = min(w[2] for w in windows)
    join = (
        f"LEFT JOIN {peripheral_table} e\n"
        f"  ON e.{spec.key_col} = p.{spec.key_col}\n"
        f" AND e.{spec.peri_ts_col} >  p.{spec.pop_ts_col}"
        f" - INTERVAL '{low_all}' SECOND\n"
        f" AND e.{spec.peri_ts_col} <= p.{spec.pop_ts_col}"
        f" - INTERVAL '{up_all}' SECOND"
    )

    cols = []
    for suffix, low_s, up_s in windows:
        if (low_s, up_s) == (low_all, up_all):
            filt = ""
        else:
            filt = (
                f"FILTER (e.{spec.peri_ts_col} > p.{spec.pop_ts_col}"
                f" - INTERVAL '{low_s}' SECOND"
                f" AND e.{spec.peri_ts_col} <= p.{spec.pop_ts_col}"
                f" - INTERVAL '{up_s}' SECOND)"
            )
        for vc in spec.value_cols:
            for agg in spec.aggs:
                expr = _agg_sql(agg, spec, filt).replace("{val}", vc)
                cols.append(f'{expr} AS "{vc}__{agg}{suffix}"')

    group_by = ", ".join(sel_ids)
    select = ",\n       ".join(sel_ids + cols)
    return (
        f"SELECT {select}\n"
        f"FROM {population_table} p\n{join}\nGROUP BY {group_by}"
    )
