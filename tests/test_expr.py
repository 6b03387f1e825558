"""Lazy column-expression algebra (functions/expr.py): Expr.evaluate vs
DuckDB executing the SAME expression's .sql() rendering — every op is its
own oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from getml_community_ray.functions.expr import Expr, col, lit, select, where, with_columns


def _frame(n=500, seed=0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "x": rng.normal(2.0, 5.0, n),
            "y": rng.uniform(0.5, 9.5, n),
            "pos": rng.uniform(0.01, 100.0, n),
            "ts": rng.uniform(0, 2_000_000_000, n).round(3),
            "s": np.array(
                [f"Item-{i % 37:04d}x{'ab'[i % 2]}" for i in range(n)]
            ),
            "flag": rng.integers(0, 2, n).astype(bool),
        }
    )


EXPRS = {
    "arith": (col("x") + col("y")) * lit(2.0) - col("x") / col("y"),
    "powmod": (col("pos") ** lit(1.5)) % col("y"),
    "unary_chain": (col("pos").log().abs() + lit(1.0)).sqrt(),
    "trig": col("x").sin() * col("y").cos() + col("x").atan(),
    "rounding": col("x").ceil() - col("x").floor() + col("x").round(),
    "gamma": col("pos").lgamma() + col("pos").tgamma().log(),
    "cbrt": col("pos").cbrt(),
    "date_parts": col("ts").from_epoch().year() * lit(10000.0)
    + col("ts").from_epoch().month() * lit(100.0)
    + col("ts").from_epoch().day(),
    "time_parts": col("ts").from_epoch().hour() * lit(3600.0)
    + col("ts").from_epoch().minute() * lit(60.0)
    + col("ts").from_epoch().second(),
    "weekdays": col("ts").from_epoch().weekday()
    + col("ts").from_epoch().yearday() * lit(10.0),
    "comparison": (col("x") > col("y")).boolean_as_num()
    + (col("x") <= lit(0.0)).boolean_as_num() * lit(2.0),
    "boolalg": ((col("flag") & (col("x") > lit(0.0)))
                | ~(col("y") >= lit(5.0))).boolean_as_num(),
    "xor_ne": ((col("flag") ^ (col("x") < lit(1.0))).boolean_as_num()
               + (col("s") != lit("Item-0001xa")).boolean_as_num()),
    "conditional": col("x").update(col("y") * lit(-1.0),
                                   col("x") > col("y")),
    "strings": col("s").substr(2, 4).upper().concat(
        lit("_"), col("s").lower().strip()
    ),
    "contains_case": col("s").contains("1x").boolean_as_num()
    + col("s").num_as_string().contains("Item").boolean_as_num(),
    "nan_inf": ((col("x") + lit(float("nan"))).is_nan().boolean_as_num()
                + (lit(float("inf")) * col("pos")).is_inf()
                .boolean_as_num()),
}


@pytest.mark.parametrize("name", sorted(EXPRS))
def test_expr_matches_duckdb(ray_session, name):
    import ray.data as rd

    df = _frame()
    e = EXPRS[name]
    got = (
        select(rd.from_pandas(df), eid=col("ts"), out=e)
        .to_pandas()
        .sort_values("eid")["out"]
        .to_numpy()
    )
    con = duckdb.connect()
    con.register("t", df)
    want = (
        con.execute(f'SELECT "ts" AS eid, {e.sql()} AS out FROM t ORDER BY eid')
        .df()["out"]
        .to_numpy()
    )
    assert len(got) == len(want)
    if got.dtype.kind == "f" or want.dtype.kind == "f":
        assert np.allclose(
            got.astype(float), want.astype(float),
            rtol=1e-12, atol=1e-12, equal_nan=True,
        ), name
    else:
        assert (got == want).all(), name


def test_where_and_with_columns(ray_session):
    import ray.data as rd

    df = _frame(300, seed=7)
    pred = (col("x") > lit(0.0)) & col("s").contains("xa")
    out = (
        with_columns(where(rd.from_pandas(df), pred), z=col("x") * lit(3.0))
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    m = df[(df.x > 0) & df.s.str.contains("xa")].sort_values("ts")
    assert len(out) == len(m)
    assert np.allclose(out["z"].to_numpy(), (m.x * 3.0).to_numpy())
    # with_columns keeps originals
    assert set(df.columns) <= set(out.columns)


def test_where_null_mask_drops(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"a": [1.0, None, 3.0], "b": [0.5, 1.0, None]})
    out = where(rd.from_pandas(df), col("a") > col("b")).to_pandas()
    # rows with null comparison (either operand null) must drop
    assert out["a"].tolist() == [1.0]


def test_shared_subtree_single_eval(ray_session):
    """A shared subexpression used by two outputs is evaluated once per
    batch (identity cache) — same values as independent evaluation."""
    import ray.data as rd

    df = _frame(100, seed=3)
    shared = (col("x") * col("y")).exp()
    out = select(
        rd.from_pandas(df), eid=col("ts"), a=shared + lit(1.0),
        b=shared * lit(2.0),
    ).to_pandas().sort_values("eid")
    base = np.exp(df.sort_values("ts").x.to_numpy()
                  * df.sort_values("ts").y.to_numpy())
    assert np.allclose(out["a"].to_numpy(), base + 1.0, equal_nan=True)
    assert np.allclose(out["b"].to_numpy(), base * 2.0, equal_nan=True)


def test_expr_repr_and_sql_error():
    e = (col("x") + lit(1.0)).erf()
    assert "erf" in repr(e)
    with pytest.raises(ValueError):
        e.sql()


def test_is_null_vs_duckdb(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"eid": range(6), "v": [1.0, None, 3.0, None, 5.0, 6.0]}
    )
    e = col("v").is_null().boolean_as_num()
    got = select(rd.from_pandas(df), eid=col("eid"), out=e).to_pandas()
    got = got.sort_values("eid")["out"].to_numpy()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        f'SELECT {e.sql()} AS out FROM t ORDER BY eid'
    ).df()["out"].to_numpy()
    assert np.allclose(got, want)
