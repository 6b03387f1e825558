"""Transpile a FastPropSpec into SQL, multi-dialect.

Reference parity: getML transpiles every learned feature into SQL for 11
dialects (`src/engine/src/fastprop/SQLMaker.cpp`,
`src/engine/include/transpilation/`, `getml/pipeline/dialect.py`) so
features are portable specs. This module does the same for our windowed
feature specs: the generated SQL reproduces the reference match rule
`t - horizon - memory < pts <= t - horizon` as join predicates.

Dialects: duckdb (default; doubles as ANSI), postgres, mysql, sqlite,
spark, bigquery, tsql. Timestamp handling per dialect:
- duckdb / postgres / mysql / spark / bigquery / tsql: native timestamp
  columns, shifted with each dialect's interval arithmetic.
- sqlite: NO timestamp type — time stamp columns are FLOAT SECONDS since
  the epoch, exactly the reference engine's own model
  (`src/engine/include/helpers/Float.hpp`, ts parsing
  `FloatOpParser.cpp:86-111`; getML ships a sqlite3 runner,
  `getml/sqlite3/`). This makes the sqlite dialect executable against
  Python's stdlib sqlite3, which tests/test_transpile.py does.

Aggregation support varies by dialect (e.g. mysql/sqlite have no
median/regr_*); unsupported combinations raise ValueError rather than
emitting wrong SQL.
"""

from __future__ import annotations

from dataclasses import dataclass

from .fastprop import FastPropSpec

from ..kernels.aggregations import EWMA_HALF_LIVES  # noqa: E402


@dataclass(frozen=True)
class Dialect:
    name: str
    qo: str  # identifier quote open
    qc: str  # identifier quote close
    filter_clause: bool  # FILTER (WHERE ...) vs CASE WHEN inside the agg
    has_median: bool
    has_regr: bool
    numeric_ts: bool = False  # sqlite: ts columns are float seconds

    def quote(self, ident: str) -> str:
        return f"{self.qo}{ident}{self.qc}"

    # -- timestamp fragments ------------------------------------------------

    def ts_minus(self, col: str, seconds: float) -> str:
        """`col - <seconds>` as a comparable expression."""
        if self.numeric_ts:
            return f"{col} - {seconds}"
        if self.name in ("duckdb", "postgres"):
            return f"{col} - INTERVAL '{seconds}' SECOND"
        if self.name in ("mysql", "spark"):
            return f"{col} - INTERVAL {seconds} SECOND"
        if self.name == "bigquery":
            # BigQuery INTERVAL takes int64; feature windows are whole secs
            return f"TIMESTAMP_SUB({col}, INTERVAL {int(seconds)} SECOND)"
        if self.name == "tsql":
            return f"DATEADD(second, -{int(seconds)}, {col})"
        raise AssertionError(self.name)

    def epoch_sec(self, col: str) -> str:
        """`col` as float seconds since the epoch."""
        if self.numeric_ts:
            return col
        return {
            "duckdb": f"epoch_us({col}) / 1000000.0",
            "postgres": f"EXTRACT(EPOCH FROM {col})",
            "mysql": f"UNIX_TIMESTAMP({col})",
            "spark": f"CAST({col} AS DOUBLE)",
            "bigquery": f"UNIX_MICROS({col}) / 1000000.0",
            "tsql": f"CAST(DATEDIFF_BIG(millisecond, '1970-01-01', {col}) "
                    f"AS FLOAT) / 1000.0",
        }[self.name]


DIALECTS = {
    "duckdb": Dialect("duckdb", '"', '"', True, True, True),
    "postgres": Dialect("postgres", '"', '"', True, True, True),
    "mysql": Dialect("mysql", "`", "`", False, False, False),
    "sqlite": Dialect("sqlite", '"', '"', True, False, False, numeric_ts=True),
    "spark": Dialect("spark", "`", "`", False, True, False),
    "bigquery": Dialect("bigquery", "`", "`", False, False, False),
    "tsql": Dialect("tsql", "[", "]", False, False, False),
}
# The reference's dialect names (`getml/pipeline/dialect.py:33-43`) as
# aliases. `human_readable_sql` is the reference's display dialect — a
# sqlite3-flavored rendering (HumanReadableSQLGenerator.cpp: double-quoted
# identifiers, float-seconds timestamps), so it shares the sqlite Dialect.
DIALECTS["sqlite3"] = DIALECTS["sqlite"]
DIALECTS["spark_sql"] = DIALECTS["spark"]
DIALECTS["human_readable_sql"] = DIALECTS["sqlite"]


def _median_sql(d: Dialect, arg: str) -> str:
    if d.name == "duckdb":
        return f"quantile_cont({arg}, 0.5)"
    if d.name == "postgres":
        return f"percentile_cont(0.5) WITHIN GROUP (ORDER BY {arg})"
    if d.name == "spark":
        return f"percentile({arg}, 0.5)"
    raise ValueError(f"median is not transpilable to {d.name}")


def _agg_sql(d: Dialect, agg: str, spec: FastPropSpec, cond: str | None) -> str:
    """One aggregation over `{val}` with an optional window sub-condition."""

    def F(fn: str, arg: str) -> str:
        """fn(arg) with the dialect's conditional pushdown."""
        if cond is None:
            return f"{fn}({arg})"
        if d.filter_clause:
            return f"{fn}({arg}) FILTER (WHERE {cond})"
        return f"{fn}(CASE WHEN {cond} THEN {arg} END)"

    ets, pts = f"e.{spec.peri_ts_col}", f"p.{spec.pop_ts_col}"
    dt = f"({d.epoch_sec(pts)} - {d.epoch_sec(ets)})"
    val = "{val}"
    if agg == "count":
        return f"CAST({F('count', ets)} AS DOUBLE)"
    if agg == "sum":
        return f"COALESCE(CAST({F('SUM', val)} AS DOUBLE), 0.0)"
    if agg == "avg":
        return (
            f"CAST({F('SUM', val)} AS DOUBLE) / "
            f"CAST({F('count', ets)} AS DOUBLE)"
        )
    if agg == "min":
        return f"CAST({F('MIN', val)} AS DOUBLE)"
    if agg == "max":
        return f"CAST({F('MAX', val)} AS DOUBLE)"
    if agg == "stddev":
        if d.name == "sqlite":
            # sqlite has no stddev builtin: population sd from moments
            return (
                f"CASE WHEN {F('count', val)} > 0 THEN "
                f"sqrt({F('AVG', f'({val})*({val})')} - "
                f"{F('AVG', val)} * {F('AVG', val)}) END"
            )
        fn = "STDEVP" if d.name == "tsql" else "stddev_pop"
        return F(fn, val)
    if agg == "var":
        if d.name == "sqlite":
            return (
                f"CASE WHEN {F('count', val)} > 0 THEN "
                f"{F('AVG', f'({val})*({val})')} - "
                f"{F('AVG', val)} * {F('AVG', val)} END"
            )
        fn = "VARP" if d.name == "tsql" else "var_pop"
        return F(fn, val)
    if agg == "count_distinct":
        if cond is not None and not d.filter_clause:
            return (
                f"CAST(count(DISTINCT CASE WHEN {cond} THEN {val} END) "
                f"AS DOUBLE)"
            )
        return f"CAST({F('count', f'DISTINCT {val}')} AS DOUBLE)"
    if agg == "median":
        m = _median_sql(d, val)
        if cond is not None:
            if not d.filter_clause:
                if d.name == "spark":
                    return f"percentile(CASE WHEN {cond} THEN {val} END, 0.5)"
                raise ValueError(
                    f"median with lag conditions not transpilable to {d.name}"
                )
            return f"{m} FILTER (WHERE {cond})"
        return m
    if agg.startswith("ewma_") and agg[5:] in EWMA_HALF_LIVES:
        h = EWMA_HALF_LIVES[agg[5:]]
        ln05 = "ln(0.5)" if d.name != "tsql" else "LOG(0.5)"
        w = f"exp({ln05} * {dt} / {h})"
        return f"{F('SUM', f'{val} * {w}')} / {F('SUM', w)}"
    if agg == "trend":
        if not d.has_regr:
            raise ValueError(f"trend is not transpilable to {d.name}")
        vp = F("var_pop", dt)
        return (
            f"CASE WHEN {vp} = 0 THEN {F('avg', val)} "
            f"ELSE {F('regr_intercept', f'{val}, {dt}')} END"
        )
    raise ValueError(f"aggregation {agg!r} is not SQL-transpilable")


def fastprop_to_sql(
    spec: FastPropSpec,
    *,
    population_table: str,
    peripheral_table: str,
    pop_id_cols: list[str] | None = None,
    dialect: str = "duckdb",
) -> str:
    """Generate one SELECT reproducing `fastprop_features(...)` for every
    SQL-transpilable aggregation in the spec (column names match the Ray
    output: `<value>__<agg>[__lag<i>]`).

    `dialect`: one of duckdb (default/ANSI), postgres, mysql, sqlite,
    spark, bigquery, tsql — the reference's SQLMaker dialect set
    (`getml/pipeline/dialect.py`) minus engine-internal variants."""
    d = DIALECTS[dialect]
    ids = pop_id_cols if pop_id_cols is not None else spec.id_cols
    sel_ids = [f"p.{c}" for c in ids] + [
        f"p.{spec.key_col}",
        f"p.{spec.pop_ts_col}",
    ]

    windows = spec.windows()
    low_all = max(w[1] for w in windows)
    up_all = min(w[2] for w in windows)
    ets, pts = f"e.{spec.peri_ts_col}", f"p.{spec.pop_ts_col}"
    join = (
        f"LEFT JOIN {peripheral_table} e\n"
        f"  ON e.{spec.key_col} = p.{spec.key_col}\n"
        f" AND {ets} >  {d.ts_minus(pts, low_all)}\n"
        f" AND {ets} <= {d.ts_minus(pts, up_all)}"
    )
    if spec.upper_ts_col is not None:
        up = f"e.{spec.upper_ts_col}"
        shifted_pop = d.ts_minus(pts, spec.horizon_s)
        join += (
            f"\n AND ({up} IS NULL OR {up} > {shifted_pop})"
        )

    cols = []
    for suffix, low_s, up_s in windows:
        if (low_s, up_s) == (low_all, up_all):
            cond = None
        else:
            cond = (
                f"{ets} > {d.ts_minus(pts, low_s)}"
                f" AND {ets} <= {d.ts_minus(pts, up_s)}"
            )
        for vc in spec.value_cols:
            for agg in spec.aggs:
                expr = _agg_sql(d, agg, spec, cond).replace("{val}", f"e.{vc}")
                cols.append(f"{expr} AS {d.quote(f'{vc}__{agg}{suffix}')}")

    group_by = ", ".join(sel_ids)
    select = ",\n       ".join(sel_ids + cols)
    return (
        f"SELECT {select}\n"
        f"FROM {population_table} p\n{join}\nGROUP BY {group_by}"
    )
