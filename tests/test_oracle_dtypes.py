"""Registry-wide oracle dtype audit (r4 verdict item 2b).

Every oracle_sql() entry is executed on DuckDB at sf0.001 and must not emit
HUGEINT/UHUGEINT result columns: DuckDB widens uncast SUM(BIGINT) (plain and
windowed) to HUGEINT, pandas renders HUGEINT as float64, and the driver's
value-hash then refuses to match the engine's int64 even when values are
identical (the r4 `window_funcs_events` / `cusum_changepoint_events` reds).
House rule: wrap such sums in CAST(... AS BIGINT) in the SQL twin.

No Ray needed — only the SQL side runs.
"""

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _oracles():
    import __ray_entry__ as entrymod

    return entrymod.oracle_sql()


def test_no_hugeint_oracle_columns():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, sql in _oracles().items():
        try:
            rel = con.sql(sql)
        except Exception as e:  # noqa: BLE001
            errors[name] = repr(e)
            continue
        bad = [
            f"{col}:{typ}"
            for col, typ in zip(rel.columns, rel.types)
            if "HUGEINT" in str(typ).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not errors, f"oracle SQL failed to bind/run: {errors}"
    assert not offenders, (
        "oracles emit HUGEINT columns (cast to BIGINT in the SQL twin): "
        f"{offenders}"
    )
