"""Driver-contract queries for source/sink coverage: CSV round-trip and
partitioned (resumable-layout) Parquet write + read-back.

Reference IO surface: CSV reader/sniffer (`io/CSVReader.hpp`,
`io/CSVSniffer.hpp`), Parquet in/out (`ArrowHandler.cpp:180-213,369-396`).
Floats are converted to integer cents BEFORE the CSV hop so text
round-tripping is exact."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.partitioning import auto_partitions


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q_csv_roundtrip_supplier(sf_dir: str):
    """parquet -> write_csv -> read_csv -> groupby: proves the CSV lane."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/graft_csv_supplier_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)

    ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    ds = ds.map_batches(
        lambda b: pa.table(
            {
                "s_suppkey": b["s_suppkey"],
                "s_nationkey": b["s_nationkey"],
                "bal_c": pc.cast(
                    pc.round(pc.multiply(b["s_acctbal"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds.write_csv(out_dir)

    back = rd.read_csv(out_dir)
    agg = back.groupby("s_nationkey").aggregate(
        Count(alias_name="n_suppliers"), Sum("bal_c", alias_name="_bc")
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_nationkey": b["s_nationkey"].cast(pa.int64()),
                "n_suppliers": pa.array(
                    np.asarray(b["n_suppliers"], dtype=np.float64)
                ),
                "total_bal": pa.array(
                    np.asarray(b["_bc"], dtype=np.float64) / 100.0
                ),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_CSV_ROUNDTRIP = """
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       CAST(count(*) AS DOUBLE) AS n_suppliers,
       CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS total_bal
FROM supplier GROUP BY 1
"""


def q_csv_dialect_sniff_supplier(sf_dir: str):
    """Exotic-dialect CSV ingest (reference `io/CSVSniffer.hpp` +
    `CSVReader.hpp` quote/sep options): write supplier as a ';'-separated
    quoted CSV, SNIFF the dialect + types from a bounded sample
    (sources/csv.sniff_csv — delimiter consistency rule, header detection,
    the reference's {float64, string, timestamp} type lattice), then read
    the whole directory with the sniffed options and aggregate."""
    import ray.data as rd
    from pyarrow import csv as pacsv
    from ray.data.aggregate import Count, Sum

    from ..sources.csv import read_csv_sniffed, sniff_csv

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/graft_csv_dialect_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)

    ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    ds = ds.map_batches(
        lambda b: pa.table(
            {
                "s_suppkey": b["s_suppkey"],
                "s_nationkey": b["s_nationkey"],
                "bal_c": pc.cast(
                    pc.round(pc.multiply(b["s_acctbal"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # arrow_csv_args_fn: WriteOptions is not picklable, so the writer task
    # builds it locally from this factory
    ds.write_csv(
        out_dir,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(
                delimiter=";", quoting_style="all_valid"
            )
        },
    )

    # sniffer contract: the detected dialect must be the one written
    import glob as _glob

    first = sorted(_glob.glob(f"{out_dir}/*"))[0]
    d = sniff_csv(first)
    assert d["delimiter"] == ";" and d["has_header"], d

    back = read_csv_sniffed(out_dir)
    agg = back.groupby("s_nationkey").aggregate(
        Count(alias_name="n_suppliers"), Sum("bal_c", alias_name="_bc")
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_nationkey": b["s_nationkey"].cast(pa.int64()),
                "n_suppliers": pa.array(
                    np.asarray(b["n_suppliers"], dtype=np.float64)
                ),
                "total_bal": pa.array(
                    np.asarray(b["_bc"], dtype=np.float64) / 100.0
                ),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def q_partitioned_write_lineitem(sf_dir: str):
    """Resumable output layout: write partitioned by l_returnflag (one
    directory per key — a failed run skips finished partitions), read back
    ONE partition, aggregate."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/graft_part_lineitem_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)

    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    )
    ds.write_parquet(out_dir, partition_cols=["l_returnflag"])

    back = rd.read_parquet(f"{out_dir}/l_returnflag=R")
    agg = back.groupby("l_linestatus").aggregate(
        Count(alias_name="n_lines"), Sum("l_quantity", alias_name="sum_qty")
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_linestatus": b["l_linestatus"],
                "n_lines": pa.array(np.asarray(b["n_lines"], dtype=np.float64)),
                "sum_qty": pa.array(np.asarray(b["sum_qty"], dtype=np.float64)),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_PARTITIONED_WRITE = """
SELECT l_linestatus,
       CAST(count(*) AS DOUBLE) AS n_lines,
       SUM(l_quantity) AS sum_qty
FROM lineitem WHERE l_returnflag = 'R'
GROUP BY l_linestatus
"""


def q_from_items_arrow(sf_dir: str):
    """from_items / from_arrow ingestion lane (DataFrame.from_json analog,
    `DataFrameManager_from_json.cpp`): build a tiny dimension in-memory,
    broadcast-join it against the parquet fact table."""
    import ray.data as rd

    from ..stages.joins import broadcast_join
    import pandas as pd

    dim = pd.DataFrame(
        {
            "o_orderstatus": ["O", "F", "P"],
            "status_name": ["open", "finished", "pending"],
        }
    )
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    joined = broadcast_join(ds, dim, on="o_orderstatus")

    from ray.data.aggregate import Count

    agg = joined.groupby("status_name").aggregate(Count(alias_name="n"))
    return agg.map_batches(
        lambda b: pa.table(
            {
                "status_name": b["status_name"],
                "n": pa.array(np.asarray(b["n"], dtype=np.float64)),
            }
        ),
        batch_format="pyarrow",
    )


SQL_FROM_ITEMS = """
SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
            ELSE 'pending' END AS status_name,
       CAST(count(*) AS DOUBLE) AS n
FROM orders GROUP BY 1
"""


IO_QUERIES = {
    "csv_roundtrip_supplier": q_csv_roundtrip_supplier,
    "partitioned_write_lineitem": q_partitioned_write_lineitem,
    "from_items_join_orders": q_from_items_arrow,
}

IO_ORACLE_SQL = {
    "csv_roundtrip_supplier": SQL_CSV_ROUNDTRIP,
    "partitioned_write_lineitem": SQL_PARTITIONED_WRITE,
    "from_items_join_orders": SQL_FROM_ITEMS,
}

# exotic-dialect CSV lane: same aggregate, so the round-trip oracle is
# shared — the query itself asserts the sniffed dialect matches what was
# written
IO_QUERIES["csv_dialect_sniff_supplier"] = q_csv_dialect_sniff_supplier
IO_ORACLE_SQL["csv_dialect_sniff_supplier"] = SQL_CSV_ROUNDTRIP


def q_email_domain_customer(sf_dir: str):
    """EMailDomain preprocessor (EMailDomain.cpp:61-80): synthesize an
    email column (name@segment.example.com, every 7th row invalid), then
    extract the '@domain' (must contain a dot; empty when invalid)."""
    from ..stages.preprocessors import EMailDomain

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])

    def mk_email(b: pa.Table) -> pa.Table:
        key = np.asarray(b["c_custkey"], dtype=np.int64)
        seg = np.asarray(b["c_mktsegment"]).astype(str)
        name = np.asarray(b["c_name"]).astype(str)
        email = np.where(
            key % 7 == 0,
            name,  # no @domain -> invalid
            np.char.add(
                np.char.add(name, "@"),
                np.char.add(np.char.lower(seg), ".example.com"),
            ),
        )
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "email": pa.array(email, type=pa.string()),
            }
        )

    withmail = ds.map_batches(mk_email, batch_format="pyarrow", zero_copy_batch=True)
    out = EMailDomain(["email"]).fit(withmail).transform(withmail)
    return out.select_columns(["c_custkey", "email_domain"])


SQL_EMAIL_DOMAIN = """
SELECT c_custkey,
       CASE WHEN c_custkey % 7 = 0 THEN ''
            ELSE lower(c_mktsegment) || '.example.com' END AS email_domain
FROM customer
"""


def q_column_aggregates_lineitem(sf_dir: str):
    """Column-level eager aggregate vocabulary (AggOpParser.cpp:38-111):
    avg/count/max/median/min/stddev/sum/var + count_distinct over one
    column, as a one-row table (cents-exact sums, 6 dp moments)."""
    from ..kernels.aggregations import grouped_aggregate

    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])

    # partial pass: per-batch (sorted values would be needed for exact
    # median at scale — here the column is modest, collect per-batch partial
    # lists via a single-group grouped_aggregate per batch then merge by
    # recomputation over the gathered raw values; l_quantity is small-domain
    # integer-valued so the driver-side merge is a histogram)
    import collections

    hist: collections.Counter = collections.Counter()
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        v = np.asarray(b["l_quantity"], dtype=np.float64)
        vals, cnts = np.unique(v, return_counts=True)
        for x, c in zip(vals, cnts):
            hist[float(x)] += int(c)

    vals = np.array(sorted(hist))
    cnts = np.array([hist[x] for x in sorted(hist)], dtype=np.int64)
    expanded = np.repeat(vals, cnts)  # small domain -> fine
    gids = np.zeros(len(expanded), dtype=np.int64)
    res = grouped_aggregate(
        ["count", "sum", "avg", "min", "max", "median", "stddev", "var",
         "count_distinct"],
        gids, expanded, 1,
    )
    import pandas as pd

    r6 = lambda x: float(np.rint(float(x) * 1e6) / 1e6)
    return pd.DataFrame(
        {
            "count": [float(res["count"][0])],
            "sum": [float(res["sum"][0])],
            "avg": [r6(res["avg"][0])],
            "min": [float(res["min"][0])],
            "max": [float(res["max"][0])],
            "median": [float(res["median"][0])],
            "stddev": [r6(res["stddev"][0])],
            "var": [r6(res["var"][0])],
            "count_distinct": [float(res["count_distinct"][0])],
        }
    )


SQL_COLUMN_AGGS = """
SELECT CAST(count(l_quantity) AS DOUBLE) AS count,
       SUM(l_quantity) AS sum,
       CAST(round(AVG(l_quantity) * 1e6) AS BIGINT) / 1000000.0 AS avg,
       MIN(l_quantity) AS min,
       MAX(l_quantity) AS max,
       quantile_cont(l_quantity, 0.5) AS median,
       CAST(round(stddev_pop(l_quantity) * 1e6) AS BIGINT) / 1000000.0 AS stddev,
       CAST(round(var_pop(l_quantity) * 1e6) AS BIGINT) / 1000000.0 AS var,
       CAST(count(DISTINCT l_quantity) AS DOUBLE) AS count_distinct
FROM lineitem
"""

IO_QUERIES.update(
    {
        "email_domain_customer": q_email_domain_customer,
        "column_aggregates_lineitem": q_column_aggregates_lineitem,
    }
)
IO_ORACLE_SQL.update(
    {
        "email_domain_customer": SQL_EMAIL_DOMAIN,
        "column_aggregates_lineitem": SQL_COLUMN_AGGS,
    }
)


def q_float_funcs_lineitem(sf_dir: str):
    """Float unary/binary vocabulary (FloatOpParser.cpp:152-191,344-474):
    abs/sqrt/ln/exp/floor/ceil/round + plus/minus/multiplies/divides/fmod/
    pow over lineitem measures, 6 dp fixed-point."""
    from ..functions.scalar import FLOAT_BINARY, FLOAT_UNARY

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber",
                                            "l_quantity", "l_discount"])

    def f(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].combine_chunks()
        d = b["l_discount"].combine_chunks()
        r6 = lambda arr: pa.array(
            np.rint(np.asarray(arr, dtype=np.float64) * 1e6) / 1e6
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"],
                "f_abs": r6(FLOAT_UNARY["abs"](pc.subtract(q, 25.0))),
                "f_sqrt": r6(FLOAT_UNARY["sqrt"](q)),
                "f_ln": r6(FLOAT_UNARY["log"](q)),
                "f_exp": r6(FLOAT_UNARY["exp"](d)),
                "f_floor": pa.array(np.asarray(FLOAT_UNARY["floor"](pc.multiply(q, 0.3)), dtype=np.float64)),
                "f_ceil": pa.array(np.asarray(FLOAT_UNARY["ceil"](pc.multiply(q, 0.3)), dtype=np.float64)),
                "f_plus": pa.array(np.asarray(FLOAT_BINARY["plus"](q, d), dtype=np.float64)),
                "f_mult": r6(FLOAT_BINARY["multiplies"](q, d)),
                "f_fmod": pa.array(np.asarray(FLOAT_BINARY["fmod"](q, pa.scalar(7.0)), dtype=np.float64)),
                "f_pow": r6(FLOAT_BINARY["pow"](q, pa.scalar(2.0))),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


import pyarrow.compute as pc  # noqa: E402

SQL_FLOAT_FUNCS = """
SELECT l_orderkey, l_linenumber,
       CAST(round(abs(l_quantity - 25.0) * 1e6) AS BIGINT) / 1000000.0 AS f_abs,
       CAST(round(sqrt(l_quantity) * 1e6) AS BIGINT) / 1000000.0 AS f_sqrt,
       CAST(round(ln(l_quantity) * 1e6) AS BIGINT) / 1000000.0 AS f_ln,
       CAST(round(exp(l_discount) * 1e6) AS BIGINT) / 1000000.0 AS f_exp,
       floor(l_quantity * 0.3) AS f_floor,
       ceil(l_quantity * 0.3) AS f_ceil,
       l_quantity + l_discount AS f_plus,
       CAST(round(l_quantity * l_discount * 1e6) AS BIGINT) / 1000000.0 AS f_mult,
       l_quantity - trunc(l_quantity / 7.0) * 7.0 AS f_fmod,
       CAST(round(pow(l_quantity, 2.0) * 1e6) AS BIGINT) / 1000000.0 AS f_pow
FROM lineitem
"""


def q_ts_parse_update_orders(sf_dir: str):
    """as_ts multi-format parse (FloatOpParser.cpp:86-111) round-trip +
    update/if_else conditional overwrite (:478-495) + boolean_as_num."""
    from ..functions.scalar import as_ts, boolean_as_num, update

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderdate", "o_orderstatus",
                        "o_totalprice"])

    def f(b: pa.Table) -> pa.Table:
        # ts -> string -> as_ts round trip
        # NOTE: Arrow's %S emits fractional seconds, which %S cannot re-parse;
        # the date-only format is in the as_ts cascade
        s = pc.strftime(b["o_orderdate"].combine_chunks(), format="%Y-%m-%d")
        parsed = as_ts(s)
        is_f = pc.equal(b["o_orderstatus"], "F")
        price_c = pc.round(pc.multiply(b["o_totalprice"], 100.0), ndigits=0)
        capped = update(price_c, pa.scalar(0.0), is_f)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_year": pc.cast(pc.year(parsed), pa.float64()),
                "is_finished": boolean_as_num(is_f),
                "price_or_zero": pc.divide(capped, 100.0),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_TS_PARSE_UPDATE = """
SELECT o_orderkey,
       CAST(year(CAST(strftime(o_orderdate, '%Y-%m-%d') AS TIMESTAMP))
            AS DOUBLE) AS o_year,
       CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS is_finished,
       CASE WHEN o_orderstatus = 'F' THEN 0.0
            ELSE CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                 / 100.0 END AS price_or_zero
FROM orders
"""

IO_QUERIES.update(
    {
        "float_funcs_lineitem": q_float_funcs_lineitem,
        "ts_parse_update_orders": q_ts_parse_update_orders,
    }
)
IO_ORACLE_SQL.update(
    {
        "float_funcs_lineitem": SQL_FLOAT_FUNCS,
        "ts_parse_update_orders": SQL_TS_PARSE_UPDATE,
    }
)


def q_rowid_orders(sf_dir: str):
    """Distributed rowid (rank by unique key, FloatOpParser.cpp:286-288
    analog): bucket histogram -> per-bucket sort + global offsets."""
    from ..stages.groupby import add_rank_by_key

    ds = _read(sf_dir, "orders", columns=["o_orderkey"])
    return add_rank_by_key(ds, "o_orderkey", out_col="rowid").map_batches(
        lambda b: pa.table(
            {"o_orderkey": b["o_orderkey"],
             "rowid": pa.array(np.asarray(b["rowid"], dtype=np.float64))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_ROWID = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS DOUBLE) AS rowid
FROM orders
"""


def q_arange(sf_dir: str):
    """FloatColumn.arange (start=2.5, stop=1000, step=3.25)."""
    from ..functions.scalar import arange_dataset

    return arange_dataset(2.5, 1000.0, 3.25)


SQL_ARANGE = """
SELECT 2.5 + CAST(g AS DOUBLE) * 3.25 AS value
FROM generate_series(0, CAST(ceil((1000.0 - 2.5) / 3.25) AS BIGINT) - 1) t(g)
"""


def q_random_by_key_orders(sf_dir: str):
    """Deterministic seeded random column (mt19937-analog, scale-correct
    hash contract): same values at any block count, and now exactly
    oracle-checked — the documented mix arithmetic has a DuckDB twin
    (pipelines/sql_oracles.sql_random_by_key_final)."""
    from ..functions.scalar import random_by_key

    ds = _read(sf_dir, "orders", columns=["o_orderkey"])
    return random_by_key(ds, "o_orderkey", seed=5849)


def _sql_random_by_key() -> str:
    from .sql_oracles import sql_random_by_key_final

    return sql_random_by_key_final(
        table="orders", key_col="o_orderkey", seed=5849, out_col="random"
    )


IO_QUERIES.update(
    {
        "rowid_orders": q_rowid_orders,
        "arange": q_arange,
        "random_by_key_orders": q_random_by_key_orders,
    }
)
IO_ORACLE_SQL.update(
    {
        "rowid_orders": SQL_ROWID,
        "arange": SQL_ARANGE,
        "random_by_key_orders": _sql_random_by_key(),
    }
)


def q_from_db_sqlite_orders(sf_dir: str):
    """from_db surface (Sqlite3.cpp connector analog): stream orders into a
    SQLite file through the single-writer actor, read it back with the
    partitioned rowid-range scanner (one Ray task per range), aggregate.
    Prices hop as integer cents so the DB round trip is exact."""
    from ray.data.aggregate import Count, Sum

    from ..sources.db import read_sqlite_table, write_sqlite_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    db = f"/tmp/graft_sqlite_{tag}.db"
    if os.path.exists(db):
        os.remove(db)

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_orderstatus": b["o_orderstatus"],
                "price_c": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    write_sqlite_table(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        db,
        "orders_c",
    )
    back = read_sqlite_table(db, "orders_c", num_partitions=8)
    agg = back.groupby("o_orderstatus").aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="total_cents")
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": b["o_orderstatus"],
                "n_orders": pa.array(np.asarray(b["n_orders"], dtype=np.int64)),
                "total_cents": pa.array(
                    np.asarray(b["total_cents"], dtype=np.int64)
                ),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FROM_DB_SQLITE = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders GROUP BY 1
"""

IO_QUERIES["from_db_sqlite_orders"] = q_from_db_sqlite_orders
IO_ORACLE_SQL["from_db_sqlite_orders"] = SQL_FROM_DB_SQLITE


def q_from_db_postgres_orders(sf_dir: str):
    """Network-connector surface (reference `database/Postgres.cpp` /
    `MySQL.cpp`): key-range-partitioned parallel pull through the generic
    DB-API reader `sources/db.read_db_table` — the EXACT code path
    `read_postgres_table` / `read_mysql_table` execute.

    SANDBOX SKIP (documented): this environment has no network and no
    psycopg2/pymysql, so the connection factory is the DB-API SQLite
    stand-in (`SqliteConnect`); `read_postgres_table` itself raises a
    clear NotImplementedError at connect time (contract-tested in
    tests/test_text_quality_db.py). Everything above the driver —
    MIN/MAX range planning on the key column, one Ray task per
    `WHERE key BETWEEN lo AND hi` server cursor, Arrow assembly —
    runs for real here and is oracle-checked."""
    from ray.data.aggregate import Count, Sum

    from ..sources.db import SqliteConnect, read_db_table, write_sqlite_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    db = f"/tmp/graft_pgstandin_{tag}.db"
    if os.path.exists(db):
        os.remove(db)

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_orderpriority": b["o_orderpriority"],
                "price_c": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    write_sqlite_table(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        db,
        "orders_c",
    )
    back = read_db_table(
        SqliteConnect(db), "orders_c", key_col="o_orderkey",
        columns=["o_orderpriority", "price_c"], num_partitions=8,
    )
    agg = back.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="total_cents")
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_orders": pa.array(np.asarray(b["n_orders"], dtype=np.int64)),
                "total_cents": pa.array(
                    np.asarray(b["total_cents"], dtype=np.int64)
                ),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_FROM_DB_POSTGRES = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders GROUP BY 1
"""

IO_QUERIES["from_db_postgres_orders"] = q_from_db_postgres_orders
IO_ORACLE_SQL["from_db_postgres_orders"] = SQL_FROM_DB_POSTGRES


def q_semi_join_lineitem(sf_dir: str):
    """Semi + anti join coverage via the SCALE lane
    (stages/joins.bloom_semi_join): lineitem rows whose order is URGENT
    (semi) counted against the rest (anti). The key side stays a Dataset
    end to end — no driver take_all() — so the same plan works when the
    key set outgrows one node: the Bloom bitmap is built distributed
    (tree OR-merge) and broadcast once; the ~4e-4 false-positive tail is
    dropped by ONE candidate-sized exact join (o_orderkey is unique, so
    inner join == exact semi join). Anti count = total - semi."""
    import ray.data as rd

    from ..stages.joins import bloom_semi_join, hash_join

    keys_ds = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"],
        )
        .filter(expr="o_orderpriority == '1-URGENT'")
        .select_columns(["o_orderkey"])
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )
    n_total = li.count()
    cands = bloom_semi_join(li, keys_ds, on="l_orderkey",
                            keys_on="o_orderkey")
    semi = hash_join(
        cands, keys_ds, on="l_orderkey", right_on="o_orderkey",
        how="inner", num_partitions=auto_partitions(),
    )
    import pyarrow as pa

    n_semi = semi.count()
    return pa.table(
        {"n_semi": pa.array([n_semi], pa.int64()),
         "n_anti": pa.array([n_total - n_semi], pa.int64())}
    )


SQL_SEMI_JOIN = """
SELECT
  CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'))
       AS BIGINT) AS n_semi,
  CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
        (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'))
       AS BIGINT) AS n_anti
"""

IO_QUERIES["semi_join_lineitem"] = q_semi_join_lineitem
IO_ORACLE_SQL["semi_join_lineitem"] = SQL_SEMI_JOIN


def q_compaction_roundtrip_events(sf_dir: str):
    """Retention-tier compaction round trip (state/compaction.py): land the
    1-minute rollup as MANY small part files (one per block, the sink
    lane's natural layout), compact them into target-sized files in
    parallel Ray tasks (idempotent, crash-recoverable tombstones), read
    the compacted directory back and return it. The exact oracle
    (SQL_ROLLUP_1M) proves compaction is byte-faithful to the data; the
    summary invariants are asserted inline so a silent no-op fails loudly."""
    import ray.data as rd

    from ..state.compaction import compact_dir
    from .queries import QUERIES

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/graft_compact_events_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)

    rollup = QUERIES["rollup_1m"](sf_dir)
    # many small files: one file per (small) block
    rollup.repartition(24).write_parquet(out_dir)
    summary = compact_dir(
        out_dir, target_bytes=64 << 20, sort_cols=["source", "bucket_ts"]
    )
    assert summary["files_after"] < summary["files_before"], summary
    # rerun is a no-op (everything already compacted into one target file
    # per size bucket)
    again = compact_dir(out_dir, target_bytes=64 << 20)
    assert again["groups"] == 0, again
    return rd.read_parquet(out_dir)


IO_QUERIES["compaction_roundtrip_events"] = q_compaction_roundtrip_events
# oracle: the 1m rollup SQL — assigned from queries.py AFTER its
# ORACLE_SQL.update(IO_ORACLE_SQL) to avoid a circular module import.
