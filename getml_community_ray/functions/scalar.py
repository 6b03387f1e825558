"""Scalar column functions: the reference's lazy ColumnView vocabulary
re-expressed as pyarrow.compute kernels applied inside `map_batches`.

Coverage (citations into /root/reference):
- Float unary ops + date extractors: FloatOpParser.cpp:344-474
- Float binary ops: FloatOpParser.cpp:152-191
- as_num / as_ts / boolean_as_num / update / rowid: FloatOpParser.cpp:66-111,
  :195-210, :286-288, :478-495
- String ops (concat/substr/format): StringOpParser.cpp:23-174
- Boolean ops: BoolOpParser.cpp:24-236

The reference evaluates these lazily per element via closure composition
(ColumnView.hpp:64-92); here each op is a vectorized Arrow kernel, and
laziness comes from Ray Data's deferred `map_batches` lineage.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


def _ts(x):
    """Interpret a float-seconds or timestamp column as timestamp[us]."""
    if pa.types.is_timestamp(x.type):
        return x
    return pc.cast(pc.round(pc.multiply(pc.cast(x, pa.float64()), 1_000_000.0)), pa.int64()).cast(pa.timestamp("us"))


# ---- Float unary (FloatOpParser.cpp:344-474) --------------------------------
FLOAT_UNARY: dict[str, Callable] = {
    "abs": pc.abs,
    "acos": pc.acos,
    "asin": pc.asin,
    "atan": pc.atan,
    "cbrt": lambda x: pc.power(pc.cast(x, pa.float64()), 1.0 / 3.0),
    "ceil": pc.ceil,
    "cos": pc.cos,
    "erf": None,  # no Arrow kernel; filled below with numpy fallback
    "exp": pc.exp,
    "floor": pc.floor,
    "lgamma": None,
    "log": pc.ln,
    "round": pc.round,
    "sin": pc.sin,
    "sqrt": pc.sqrt,
    "tan": pc.tan,
    "tgamma": None,
}


def _np_unary(fn_name: str):
    def g(x):
        import math

        import numpy as np

        arr = np.asarray(pc.cast(x, pa.float64()).combine_chunks()
                         if isinstance(x, pa.ChunkedArray) else pc.cast(x, pa.float64()),
                         dtype=np.float64)
        fn = {"erf": np.vectorize(math.erf), "lgamma": np.vectorize(math.lgamma),
              "tgamma": np.vectorize(math.gamma)}[fn_name]
        out = np.full(arr.shape, float("nan"))
        ok = np.isfinite(arr)
        out[ok] = fn(arr[ok])
        return pa.array(out, type=pa.float64())

    return g


for _name in ("erf", "lgamma", "tgamma"):
    FLOAT_UNARY[_name] = _np_unary(_name)

# date extractors (engine/utils/Time.hpp; dispatch FloatOpParser.cpp:386-470)
DATE_EXTRACTORS: dict[str, Callable] = {
    "day": lambda x: pc.cast(pc.day(_ts(x)), pa.float64()),
    "hour": lambda x: pc.cast(pc.hour(_ts(x)), pa.float64()),
    "minute": lambda x: pc.cast(pc.minute(_ts(x)), pa.float64()),
    "month": lambda x: pc.cast(pc.month(_ts(x)), pa.float64()),
    "second": lambda x: pc.cast(pc.second(_ts(x)), pa.float64()),
    # reference: weekday 0=Sunday..6=Saturday (utils::Time uses day_of_week)
    "weekday": lambda x: pc.cast(pc.day_of_week(_ts(x), count_from_zero=True, week_start=7), pa.float64()),
    "year": lambda x: pc.cast(pc.year(_ts(x)), pa.float64()),
    "yearday": lambda x: pc.cast(pc.day_of_year(_ts(x)), pa.float64()),
}
FLOAT_UNARY.update(DATE_EXTRACTORS)

# ---- Float binary (FloatOpParser.cpp:152-191) -------------------------------
FLOAT_BINARY: dict[str, Callable] = {
    "plus": pc.add,
    "minus": pc.subtract,
    "multiplies": pc.multiply,
    "divides": pc.divide,
    "fmod": lambda a, b: pc.subtract(
        a, pc.multiply(pc.trunc(pc.divide(pc.cast(a, pa.float64()), b)), b)
    ),
    "pow": pc.power,
}

# ---- String ops (StringOpParser.cpp) ----------------------------------------
STRING_OPS: dict[str, Callable] = {
    "concat": lambda *cols: pc.binary_join_element_wise(*cols, ""),
    "substr": lambda x, begin, length: pc.utf8_slice_codeunits(
        x, start=begin, stop=begin + length
    ),
    "contains": lambda x, pat: pc.match_substring(x, pat),
    "upper": pc.utf8_upper,
    "lower": pc.utf8_lower,
    "strip": pc.utf8_trim_whitespace,
    "num_as_string": lambda x: pc.cast(x, pa.string()),
    "ts_as_string": lambda x: pc.strftime(_ts(x), format="%Y-%m-%dT%H:%M:%S%z"),
}

# ---- Boolean ops (BoolOpParser.cpp:24-236) ----------------------------------
BOOL_OPS: dict[str, Callable] = {
    "and": pc.and_,
    "or": pc.or_,
    "xor": pc.xor,
    "not": pc.invert,
    "equal_to": pc.equal,
    "not_equal_to": pc.not_equal,
    "greater": pc.greater,
    "greater_equal": pc.greater_equal,
    "less": pc.less,
    "less_equal": pc.less_equal,
    "is_null": pc.is_null,
    "is_nan": lambda x: pc.is_nan(pc.cast(x, pa.float64())),
    "is_inf": lambda x: pc.is_inf(pc.cast(x, pa.float64())),
}

# ---- Other float constructors ----------------------------------------------


def as_num(x):
    """String -> float parse (FloatOpParser.cpp:66-82)."""
    return pc.cast(x, pa.float64())


def as_ts(x, formats=("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d")):
    """Multi-format timestamp parse cascade (FloatOpParser.cpp:86-111)."""
    out = None
    for fmt in formats:
        parsed = pc.strptime(x, format=fmt, unit="us", error_is_null=True)
        out = parsed if out is None else pc.coalesce(out, parsed)
    return out


def boolean_as_num(x):
    return pc.cast(x, pa.float64())


def update(col, other, condition):
    """Conditional overwrite (FloatOpParser.cpp:478-495)."""
    return pc.if_else(condition, other, col)


def apply_op(kind: str, name: str, *args):
    table = {
        "float_unary": FLOAT_UNARY,
        "float_binary": FLOAT_BINARY,
        "string": STRING_OPS,
        "bool": BOOL_OPS,
    }[kind]
    return table[name](*args)


def with_columns(ds, exprs: dict[str, Callable], batch_format: str = "pyarrow"):
    """Append computed columns: exprs maps new-column-name -> fn(batch)->Array."""

    def f(batch: pa.Table) -> pa.Table:
        for name, fn in exprs.items():
            col = fn(batch)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(name), name, col
                )
            else:
                batch = batch.append_column(name, col)
        return batch

    return ds.map_batches(f, batch_format=batch_format, zero_copy_batch=True)


def arange_dataset(start: float, stop: float, step: float = 1.0):
    """FloatColumn.arange analog (FloatOpParser.cpp:22-62) as a Dataset.

    Row count matches the reference exactly: (stop-start)/step rows when the
    span divides evenly, +1 otherwise (FloatOpParser.cpp:56-59) — i.e. ceil
    semantics, half-open [start, stop)."""
    import math

    import ray.data as rd

    if step == 0.0:
        raise ValueError("arange: step cannot be zero.")
    if (stop - start) * step < 0.0:
        raise ValueError("arange: stop - start must have the same sign as step.")
    n = max(0, math.ceil((stop - start) / step))
    return rd.range(n).map_batches(
        lambda b: pa.table(
            {"value": pc.add(pc.multiply(pc.cast(b["id"], pa.float64()), step), start)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def random_by_key(ds, key_col: str, seed: int = 5849, out_col: str = "random"):
    """Deterministic uniform [0,1) per key — the scale-correct analog of the
    reference's seeded mt19937 column (`FloatOpParser.hpp:155-165`): the
    reference's values depend on single-node row order, which has no
    distributed meaning, so the contract here is hash(key, seed) -> uniform,
    reproducible at any parallelism."""
    import numpy as np

    def f(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col])
        if k.dtype.kind in "iu":
            h = k.astype(np.uint64)
        else:
            import zlib

            h = np.array(
                [zlib.crc32(str(x).encode()) for x in k], dtype=np.uint64
            )
        x = h + np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        u = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        return b.append_column(out_col, pa.array(u))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
