"""In-process database connectors — the Ray-Data mapping of the reference's
`from_db` surface (src/engine/src/database/Sqlite3.cpp; MySQL.cpp and
Postgres.cpp are network connectors and stay out of scope in this sandbox —
the partitioned-read pattern below is exactly what they would use, with
`WHERE <key> BETWEEN lo AND hi` pushed to the server instead of rowid).

Scale design:
- `read_sqlite_table` issues ONE Ray task per rowid range, so a large table
  is decoded in parallel and never funnels through the driver. SQLite is a
  single FILE, so on a multi-node cluster the file must live on shared
  storage; each task opens it read-only (`mode=ro`, immutable) — safe
  concurrent readers.
- `read_sql` runs an arbitrary query in one task (aggregation/pushdown
  queries are small by construction); for bulk table pulls use the
  partitioned reader.
- `write_sqlite_table` honors SQLite's single-writer constraint with a
  zero-CPU writer actor: blocks stream in, the actor appends — the Ray
  pipeline stays streaming and the serialization point is the DB engine's
  own constraint, not a driver funnel.
- duckdb variants use duckdb's native Arrow integration (zero-copy out).
"""

from __future__ import annotations

import re

import pyarrow as pa

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*\Z")


def _check_ident(name: str, what: str = "identifier") -> str:
    """Validate an identifier before f-string interpolation into SQL.

    Table/column names arrive as code-level arguments, but a caller
    passing untrusted input through would otherwise get SQL injection, and
    exotic identifiers (spaces, quotes, reserved words) would break
    unquoted. Dotted schema-qualified names are allowed."""
    if not isinstance(name, str) or not _IDENT.fullmatch(name):
        raise ValueError(
            f"{what} {name!r} is not a valid SQL identifier "
            "(dot-separated [A-Za-z_][A-Za-z0-9_]* segments)"
        )
    return name


def _sqlite_to_arrow(rows: list[tuple], description) -> pa.Table:
    cols = [d[0] for d in description]
    arrays = list(zip(*rows)) if rows else [[] for _ in cols]
    return pa.table({c: pa.array(list(v)) for c, v in zip(cols, arrays)})


def read_sql(db_path: str, query: str, *, backend: str = "sqlite"):
    """Run `query` against an in-process DB, return a Dataset (one block).

    For whole-table pulls prefer `read_sqlite_table` (partitioned)."""
    import ray.data as rd

    def task(_: pa.Table) -> pa.Table:
        if backend == "duckdb":
            import duckdb

            con = duckdb.connect(db_path, read_only=True)
            try:
                return con.execute(query).arrow()
            finally:
                con.close()
        import sqlite3

        con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
        try:
            cur = con.execute(query)
            return _sqlite_to_arrow(cur.fetchall(), cur.description)
        finally:
            con.close()

    return rd.from_items([0], override_num_blocks=1).map_batches(
        task, batch_format="pyarrow", batch_size=None
    )


def read_sqlite_table(
    db_path: str,
    table: str,
    *,
    columns: list[str] | None = None,
    num_partitions: int = 16,
):
    """Parallel partitioned read of a SQLite table: rowid ranges are computed
    once (two tiny queries), then one Ray task per range scans
    `WHERE rowid BETWEEN lo AND hi` — the same split a server connector
    would push down on a key column."""
    import sqlite3

    import ray.data as rd

    _check_ident(table, "table")
    for c in columns or []:
        _check_ident(c, "column")
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(f"SELECT MIN(rowid), MAX(rowid) FROM {table}").fetchone()
    finally:
        con.close()
    if lo is None:
        return read_sql(db_path, f"SELECT * FROM {table} LIMIT 0")
    n = min(num_partitions, hi - lo + 1)
    step = (hi - lo + 1 + n - 1) // n
    ranges = [(lo + i * step, min(hi, lo + (i + 1) * step - 1)) for i in range(n)]
    sel = ", ".join(columns) if columns else "*"

    def task(batch: pa.Table) -> pa.Table:
        import sqlite3 as _sq

        outs = []
        for a, b in zip(batch["lo"].to_pylist(), batch["hi"].to_pylist()):
            c = _sq.connect(f"file:{db_path}?mode=ro", uri=True)
            try:
                cur = c.execute(
                    f"SELECT {sel} FROM {table} WHERE rowid BETWEEN ? AND ?", (a, b)
                )
                outs.append(_sqlite_to_arrow(cur.fetchall(), cur.description))
            finally:
                c.close()
        return pa.concat_tables(outs)

    parts = rd.from_items(
        [{"lo": a, "hi": b} for a, b in ranges], override_num_blocks=len(ranges)
    )
    return parts.map_batches(task, batch_format="pyarrow", batch_size=None)


def read_db_table(
    connect_fn,
    table: str,
    *,
    key_col: str,
    columns: list[str] | None = None,
    num_partitions: int = 16,
):
    """Generic range-partitioned parallel read over any DB-API connection
    factory — the server-side twin of `read_sqlite_table` and the shape the
    reference's network connectors use (`src/engine/src/database/Postgres.cpp`,
    `MySQL.cpp`: sniff + iterate; here the split is pushed down as
    `WHERE key_col BETWEEN lo AND hi`, one Ray task per range, so a large
    table is pulled by N parallel server cursors and never funnels through
    the driver).

    `connect_fn` must be a picklable zero-arg callable returning a DB-API
    connection (each task opens its own connection — connections never
    cross process boundaries). `key_col` must be an indexed integer column
    (primary key / serial): two tiny MIN/MAX queries plan the ranges."""
    import ray.data as rd

    _check_ident(table, "table")
    _check_ident(key_col, "key_col")
    for c in columns or []:
        _check_ident(c, "column")
    con = connect_fn()
    try:
        cur = con.cursor()
        cur.execute(f"SELECT MIN({key_col}), MAX({key_col}) FROM {table}")
        lo, hi = cur.fetchone()
    finally:
        con.close()
    if lo is None:
        return read_db_query(connect_fn, f"SELECT * FROM {table} WHERE 1=0")
    lo, hi = int(lo), int(hi)
    n = max(1, min(num_partitions, hi - lo + 1))
    step = (hi - lo + 1 + n - 1) // n
    ranges = [(lo + i * step, min(hi, lo + (i + 1) * step - 1)) for i in range(n)]
    sel = ", ".join(columns) if columns else "*"

    def task(batch: pa.Table) -> pa.Table:
        outs = []
        for a, b in zip(batch["lo"].to_pylist(), batch["hi"].to_pylist()):
            c = connect_fn()
            try:
                cur = c.cursor()
                # literal integer bounds: identical SQL on every paramstyle
                cur.execute(
                    f"SELECT {sel} FROM {table} "
                    f"WHERE {key_col} BETWEEN {int(a)} AND {int(b)}"
                )
                outs.append(_sqlite_to_arrow(cur.fetchall(), cur.description))
            finally:
                c.close()
        return pa.concat_tables(outs)

    parts = rd.from_items(
        [{"lo": a, "hi": b} for a, b in ranges], override_num_blocks=len(ranges)
    )
    return parts.map_batches(task, batch_format="pyarrow", batch_size=None)


def read_db_query(connect_fn, query: str):
    """Run one query through a DB-API connection factory in a single Ray
    task (for aggregation/pushdown queries that return small results)."""
    import ray.data as rd

    def task(_: pa.Table) -> pa.Table:
        c = connect_fn()
        try:
            cur = c.cursor()
            cur.execute(query)
            return _sqlite_to_arrow(cur.fetchall(), cur.description)
        finally:
            c.close()

    return rd.from_items([0], override_num_blocks=1).map_batches(
        task, batch_format="pyarrow", batch_size=None
    )


class SqliteConnect:
    """Picklable DB-API connection factory over a read-only SQLite file —
    the sandbox stand-in that lets the generic range-partitioned reader
    (`read_db_table`, the exact code path the Postgres/MySQL wrappers use)
    run and be oracle-checked where network drivers are absent."""

    def __init__(self, db_path: str):
        self.db_path = db_path

    def __call__(self):
        import sqlite3

        return sqlite3.connect(f"file:{self.db_path}?mode=ro", uri=True)


class _PostgresConnect:
    """Picklable connection factory for `read_postgres_table`."""

    def __init__(self, dsn: str):
        self.dsn = dsn

    def __call__(self):
        try:
            import psycopg2  # type: ignore[import-not-found]
        except ImportError as e:  # sandbox has no network DB drivers
            raise NotImplementedError(
                "read_postgres_table needs psycopg2 (not available in this "
                "environment); the partitioned-read logic itself is "
                "exercised through read_db_table with a DB-API stand-in — "
                "see tests/test_text_quality_db.py"
            ) from e
        return psycopg2.connect(self.dsn)


class _MySQLConnect:
    """Picklable connection factory for `read_mysql_table`."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self):
        try:
            import pymysql  # type: ignore[import-not-found]
        except ImportError as e:
            raise NotImplementedError(
                "read_mysql_table needs pymysql (not available in this "
                "environment); the partitioned-read logic itself is "
                "exercised through read_db_table with a DB-API stand-in — "
                "see tests/test_text_quality_db.py"
            ) from e
        return pymysql.connect(**self.kwargs)


def read_postgres_table(
    dsn: str,
    table: str,
    *,
    key_col: str,
    columns: list[str] | None = None,
    num_partitions: int = 16,
):
    """Range-partitioned parallel Postgres/Greenplum read behind a
    connection-string API (reference `database/Postgres.cpp`). Import-guarded:
    raises NotImplementedError at connect time when psycopg2 is absent."""
    return read_db_table(
        _PostgresConnect(dsn), table, key_col=key_col,
        columns=columns, num_partitions=num_partitions,
    )


def read_mysql_table(
    table: str,
    *,
    key_col: str,
    columns: list[str] | None = None,
    num_partitions: int = 16,
    **connect_kwargs,
):
    """Range-partitioned parallel MySQL/MariaDB read (reference
    `database/MySQL.cpp`). Import-guarded like the Postgres reader."""
    return read_db_table(
        _MySQLConnect(**connect_kwargs), table, key_col=key_col,
        columns=columns, num_partitions=num_partitions,
    )


def write_sqlite_table(ds, db_path: str, table: str, *, if_exists: str = "replace"):
    """Stream a Dataset into a SQLite table through a single writer actor
    (SQLite's own single-writer constraint); blocks arrive in pipeline order
    of completion — unordered appends, like any bulk load."""
    import ray

    _check_ident(table, "table")

    @ray.remote(num_cpus=0)
    class Writer:
        def __init__(self):
            import sqlite3

            self.con = sqlite3.connect(db_path)
            self.created = False

        def append(self, tbl: pa.Table) -> int:
            cols = tbl.column_names
            if not self.created:
                if if_exists == "replace":
                    self.con.execute(f"DROP TABLE IF EXISTS {table}")
                decl = ", ".join(f'"{c}"' for c in cols)
                self.con.execute(f"CREATE TABLE IF NOT EXISTS {table} ({decl})")
                self.created = True
            ph = ", ".join("?" for _ in cols)
            rows = zip(*(tbl[c].to_pylist() for c in cols))
            self.con.executemany(f"INSERT INTO {table} VALUES ({ph})", rows)
            self.con.commit()
            return len(tbl)

    w = Writer.remote()
    total = 0
    # iter over block refs so payload goes actor-to-actor via the object
    # store, not through the driver heap
    for ref in ds.to_arrow_refs():
        total += ray.get(w.append.remote(ref))
    ray.kill(w)
    return total


def write_duckdb_table(ds, db_path: str, table: str, *, if_exists: str = "replace"):
    """Same contract against a duckdb file (native Arrow ingest)."""
    import duckdb

    _check_ident(table, "table")

    import ray

    con = duckdb.connect(db_path)
    try:
        first = True
        for ref in ds.to_arrow_refs():
            tbl = ray.get(ref)  # noqa: F841 — registered by name below
            if first:
                if if_exists == "replace":
                    con.execute(f"DROP TABLE IF EXISTS {table}")
                con.execute(f"CREATE TABLE {table} AS SELECT * FROM tbl")
                first = False
            else:
                con.execute(f"INSERT INTO {table} SELECT * FROM tbl")
        return con.execute(f"SELECT COUNT(*) FROM {table}").fetchone()[0] if not first else 0
    finally:
        con.close()
