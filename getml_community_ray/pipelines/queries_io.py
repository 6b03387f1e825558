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
