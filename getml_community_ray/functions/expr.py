"""Lazy, composable column expressions — the user-facing analog of the
reference's ColumnView algebra (`containers/ColumnView.hpp:64-92`,
`ViewParser.cpp:155-180`): every unary/binary/ternary op builds a deferred
expression node; nothing evaluates until the expression is applied to a
Dataset, where the WHOLE tree compiles into ONE fused `map_batches` pass
(zero-copy Arrow in, one vectorized pyarrow.compute kernel per node,
shared subtrees evaluated once).

The reference composes per-element closures on a single node; here the
same algebra vectorizes per batch and distributes for free — an `Expr` is
a plan, `map_batches` is the executor.

Each node also knows how to render itself as ANSI SQL (`Expr.sql()`), the
same portability story as the reference's to_sql transpilation
(`fastprop/SQLMaker.cpp`) applied to the column algebra: the exact
expression a Ray pipeline evaluates doubles as its DuckDB oracle.

Example::

    e = (col("extendedprice") * (lit(1.0) - col("discount"))).log()
    ds2 = select(ds, revenue_log=e, big=e > 7.0)
    sql = e.sql()   # LN("extendedprice" * (1.0 - "discount"))
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from .scalar import (
    BOOL_OPS,
    FLOAT_BINARY,
    FLOAT_UNARY,
    STRING_OPS,
    as_num,
    as_ts,
    boolean_as_num,
)

# SQL renderers (DuckDB-flavored ANSI) per op name ---------------------------

_SQL_FLOAT_UNARY = {
    "abs": "ABS({0})", "acos": "ACOS({0})", "asin": "ASIN({0})",
    "atan": "ATAN({0})", "cbrt": "CBRT({0})", "ceil": "CEIL({0})",
    "cos": "COS({0})", "exp": "EXP({0})", "floor": "FLOOR({0})",
    "lgamma": "LGAMMA({0})", "log": "LN({0})", "round": "ROUND({0})",
    "sin": "SIN({0})", "sqrt": "SQRT({0})", "tan": "TAN({0})",
    "tgamma": "GAMMA({0})",
    "erf": None,  # no DuckDB builtin; expressions using erf have no SQL twin
}

# date extractors: SQL side assumes a TIMESTAMP operand (engine side
# auto-coerces float-seconds via `_ts`; for float epoch columns call
# `.from_epoch()` first so both renderings agree)
for _ex, _part in [
    ("day", "day"), ("hour", "hour"), ("minute", "minute"),
    ("month", "month"), ("second", "second"), ("weekday", "dow"),
    ("year", "year"), ("yearday", "doy"),
]:
    _SQL_FLOAT_UNARY[_ex] = f"CAST(EXTRACT({_part} FROM {{0}}) AS DOUBLE)"

_SQL_FLOAT_BINARY = {
    "plus": "({0} + {1})",
    "minus": "({0} - {1})",
    "multiplies": "({0} * {1})",
    # NOTE: Arrow float division by zero yields ±inf/NaN; DuckDB yields
    # NULL. Same for LN(x<0): Arrow NaN, DuckDB raises. SQL twins of
    # expressions that hit those inputs will diverge — keep domains clean
    # or compare with the engine result as ground truth.
    "divides": "({0} / {1})",
    # reference fmod = a - trunc(a/b)*b (C fmod); DuckDB FMOD matches
    "fmod": "FMOD({0}, {1})",
    "pow": "POW({0}, {1})",
}

_SQL_BOOL = {
    "and": "({0} AND {1})", "or": "({0} OR {1})",
    "xor": "({0} <> {1})", "not": "(NOT {0})",
    "equal_to": "({0} = {1})", "not_equal_to": "({0} <> {1})",
    "greater": "({0} > {1})", "greater_equal": "({0} >= {1})",
    "less": "({0} < {1})", "less_equal": "({0} <= {1})",
    "is_null": "({0} IS NULL)",
    "is_nan": "ISNAN({0})", "is_inf": "ISINF({0})",
}

_SQL_STRING = {
    "concat": None,  # variadic, handled specially
    "substr": None,  # carries literal args, handled specially
    "contains": "CONTAINS({0}, {1})",
    "upper": "UPPER({0})", "lower": "LOWER({0})", "strip": "TRIM({0})",
    "num_as_string": "CAST({0} AS VARCHAR)",
    "ts_as_string": "STRFTIME({0}::TIMESTAMP, '%Y-%m-%dT%H:%M:%S+0000')",
}

_SQL_OTHER = {
    "as_num": "CAST({0} AS DOUBLE)",
    "boolean_as_num": "CAST({0} AS DOUBLE)",
    "if_else": "(CASE WHEN {0} THEN {1} ELSE {2} END)",
    # float unix-seconds -> timestamp[us] (matches _ts's round(x*1e6))
    "from_epoch":
        "MAKE_TIMESTAMP(CAST(ROUND(CAST({0} AS DOUBLE)*1000000) AS BIGINT))",
}


def _kernel(kind: str, name: str) -> Callable:
    table = {
        "float_unary": FLOAT_UNARY,
        "float_binary": FLOAT_BINARY,
        "string": STRING_OPS,
        "bool": BOOL_OPS,
    }[kind]
    fn = table[name]
    if fn is None:
        raise KeyError(name)
    return fn


def _sql_template(kind: str, name: str) -> str | None:
    return {
        "float_unary": _SQL_FLOAT_UNARY,
        "float_binary": _SQL_FLOAT_BINARY,
        "string": _SQL_STRING,
        "bool": _SQL_BOOL,
        "other": _SQL_OTHER,
    }[kind].get(name)


class Expr:
    """One node of a deferred column expression.

    kind: "col" (payload = column name), "lit" (payload = python scalar) or
    an op-table kind ("float_unary" / "float_binary" / "string" / "bool" /
    "other", payload = op name) with child Exprs.
    """

    __slots__ = ("kind", "payload", "children", "extra")

    def __init__(self, kind: str, payload, children: tuple = (), extra=None):
        self.kind = kind
        self.payload = payload
        self.children = children
        self.extra = extra

    # -- construction helpers -------------------------------------------------
    @staticmethod
    def _wrap(x) -> "Expr":
        return x if isinstance(x, Expr) else Expr("lit", x)

    def _op(self, kind: str, name: str, *others, extra=None) -> "Expr":
        return Expr(kind, name,
                    (self, *(Expr._wrap(o) for o in others)), extra=extra)

    # float binary — operators
    def __add__(self, o): return self._op("float_binary", "plus", o)
    def __radd__(self, o): return Expr._wrap(o)._op("float_binary", "plus", self)
    def __sub__(self, o): return self._op("float_binary", "minus", o)
    def __rsub__(self, o): return Expr._wrap(o)._op("float_binary", "minus", self)
    def __mul__(self, o): return self._op("float_binary", "multiplies", o)
    def __rmul__(self, o): return Expr._wrap(o)._op("float_binary", "multiplies", self)
    def __truediv__(self, o): return self._op("float_binary", "divides", o)
    def __rtruediv__(self, o): return Expr._wrap(o)._op("float_binary", "divides", self)
    def __mod__(self, o): return self._op("float_binary", "fmod", o)
    def __pow__(self, o): return self._op("float_binary", "pow", o)

    # comparisons / boolean algebra
    def __gt__(self, o): return self._op("bool", "greater", o)
    def __ge__(self, o): return self._op("bool", "greater_equal", o)
    def __lt__(self, o): return self._op("bool", "less", o)
    def __le__(self, o): return self._op("bool", "less_equal", o)
    def __eq__(self, o): return self._op("bool", "equal_to", o)  # type: ignore[override]
    def __ne__(self, o): return self._op("bool", "not_equal_to", o)  # type: ignore[override]
    def __and__(self, o): return self._op("bool", "and", o)
    def __or__(self, o): return self._op("bool", "or", o)
    def __xor__(self, o): return self._op("bool", "xor", o)
    def __invert__(self): return self._op("bool", "not")
    __hash__ = object.__hash__  # __eq__ builds Exprs; keep identity hashing

    def is_null(self): return self._op("bool", "is_null")
    def is_nan(self): return self._op("bool", "is_nan")
    def is_inf(self): return self._op("bool", "is_inf")

    # string ops
    def substr(self, begin: int, length: int):
        return Expr("string", "substr", (self,), extra=(begin, length))

    def contains(self, pat: str):
        return Expr("string", "contains", (self,), extra=(pat,))

    def upper(self): return self._op("string", "upper")
    def lower(self): return self._op("string", "lower")
    def strip(self): return self._op("string", "strip")
    def num_as_string(self): return self._op("string", "num_as_string")
    def ts_as_string(self): return self._op("string", "ts_as_string")

    def concat(self, *others):
        return Expr("string", "concat",
                    (self, *(Expr._wrap(o) for o in others)))

    # casts / conditionals
    def as_num(self): return self._op("other", "as_num")
    def as_ts(self): return self._op("other", "as_ts")
    def boolean_as_num(self): return self._op("other", "boolean_as_num")

    def from_epoch(self):
        """Float unix-seconds -> timestamp (engine `_ts` coercion made
        explicit so the SQL twin can spell it)."""
        return self._op("other", "from_epoch")

    def update(self, other, condition):
        """Conditional overwrite: self where NOT condition, other where
        condition (FloatOpParser.cpp:478-495)."""
        return Expr("other", "if_else",
                    (Expr._wrap(condition), Expr._wrap(other), self))

    # -- evaluation ------------------------------------------------------------
    def evaluate(self, batch: pa.Table, _cache: dict | None = None):
        """Evaluate against one Arrow batch; shared subtrees (by node
        identity) evaluate once per batch."""
        cache = {} if _cache is None else _cache
        key = id(self)
        if key in cache:
            return cache[key]
        if self.kind == "col":
            out = batch[self.payload]
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
        elif self.kind == "lit":
            out = pa.scalar(self.payload)
        else:
            args = [c.evaluate(batch, cache) for c in self.children]
            if self.kind == "other":
                from .scalar import _ts

                fn = {"as_num": as_num, "as_ts": as_ts,
                      "boolean_as_num": boolean_as_num,
                      "if_else": pc.if_else, "from_epoch": _ts}[self.payload]
                out = fn(*args)
            elif self.payload == "substr":
                b, ln = self.extra
                out = STRING_OPS["substr"](args[0], b, ln)
            elif self.payload == "contains":
                out = STRING_OPS["contains"](args[0], self.extra[0])
            else:
                out = _kernel(self.kind, self.payload)(*args)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        cache[key] = out
        return out

    # -- SQL rendering ---------------------------------------------------------
    def sql(self) -> str:
        """Render as a DuckDB-executable scalar expression — the oracle
        twin of `evaluate` (raises ValueError on ops with no SQL builtin,
        e.g. erf)."""
        if self.kind == "col":
            return f'"{self.payload}"'
        if self.kind == "lit":
            v = self.payload
            if isinstance(v, bool):
                return "TRUE" if v else "FALSE"
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            if isinstance(v, float):
                import math

                if math.isnan(v):
                    return "'NaN'::DOUBLE"
                if math.isinf(v):
                    return f"'{'-' if v < 0 else ''}Infinity'::DOUBLE"
                return repr(v)
            return str(v)
        parts = [c.sql() for c in self.children]
        if self.payload == "substr":
            b, ln = self.extra
            # reference substr counts codeunits from 0; SQL from 1
            return f"SUBSTR({parts[0]}, {b + 1}, {ln})"
        if self.payload == "contains":
            pat = self.extra[0].replace("'", "''")
            return f"CONTAINS({parts[0]}, '{pat}')"
        if self.payload == "concat":
            return "CONCAT(" + ", ".join(parts) + ")"
        if self.payload == "as_ts":
            return f"CAST({parts[0]} AS TIMESTAMP)"
        tpl = _sql_template(self.kind, self.payload)
        if tpl is None:
            raise ValueError(f"no SQL rendering for op {self.payload!r}")
        return tpl.format(*parts)

    def __repr__(self) -> str:
        if self.kind == "col":
            return f"col({self.payload!r})"
        if self.kind == "lit":
            return f"lit({self.payload!r})"
        return f"{self.payload}({', '.join(map(repr, self.children))})"

    # unary float methods are attached below (one per FLOAT_UNARY name)


def _attach_unary(name: str):
    def m(self: Expr) -> Expr:
        return self._op("float_unary", name)

    m.__name__ = name
    m.__qualname__ = f"Expr.{name}"
    setattr(Expr, name, m)


for _n in FLOAT_UNARY:
    if not hasattr(Expr, _n):
        _attach_unary(_n)


def col(name: str) -> Expr:
    return Expr("col", name)


def lit(value) -> Expr:
    return Expr("lit", value)


# ---------------------------------------------------------------------------
# Dataset application: the whole expression set compiles to ONE map_batches.
# ---------------------------------------------------------------------------


def select(ds, **exprs: Expr):
    """Project a Dataset to exactly the given named expressions (one fused
    zero-copy map_batches; shared subtrees across output columns evaluate
    once per batch)."""

    def f(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        cols, names = [], []
        for name, e in exprs.items():
            out = e.evaluate(batch, cache)
            if isinstance(out, pa.Scalar):
                out = pa.array([out.as_py()] * len(batch), type=out.type)
            names.append(name)
            cols.append(out)
        return pa.table(dict(zip(names, cols)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def with_columns(ds, **exprs: Expr):
    """Append/replace computed expression columns, keeping existing ones."""

    def f(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        for name, e in exprs.items():
            out = e.evaluate(batch, cache)
            if isinstance(out, pa.Scalar):
                out = pa.array([out.as_py()] * len(batch), type=out.type)
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(name), name, out
                )
            else:
                batch = batch.append_column(name, out)
        return batch

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def where(ds, predicate: Expr):
    """Row filter by a boolean expression (View.where /
    from_boolean_subselection, ColumnView.hpp:297-390) — one fused
    map_batches, nulls in the mask drop the row (reference semantics)."""

    def f(batch: pa.Table) -> pa.Table:
        mask = predicate.evaluate(batch)
        if isinstance(mask, pa.Scalar):
            keep = bool(mask.as_py())
            return batch if keep else batch.slice(0, 0)
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
