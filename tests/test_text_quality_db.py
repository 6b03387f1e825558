"""Tests for the quality-filter text ops, PII scrub, the Arrow broadcast
join, and the in-process DB connectors."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "aa aa aa aa aa aa",
                    "### ## # 12 34",
                    "",
                ],
            }
        )
    )


def test_gopher_quality_rules(ray_session):
    from getml_community_ray.stages.text import gopher_quality

    out = (
        gopher_quality(_docs_ds(), text_col="text", id_col="doc_id")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "keep"] == 1
    assert out.loc[1, "n_words"] == 9
    # doc 2: repeated 2-char words -> mean word length 2.0, alpha ok
    assert out.loc[2, "mean_word_len"] == 2.0
    # doc 3: symbol-heavy, no alpha words -> filtered
    assert out.loc[3, "keep"] == 0
    assert out.loc[3, "alpha_word_frac"] == 0.0
    assert out.loc[4, "keep"] == 0


def test_distinct_word_fraction(ray_session):
    from getml_community_ray.stages.text import distinct_word_fraction

    out = (
        distinct_word_fraction(_docs_ds(), text_col="text", id_col="doc_id")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # "the" repeats -> 8 distinct / 9
    assert out.loc[1, "n_distinct_words"] == 8
    assert out.loc[1, "distinct_frac"] == round(8 / 9 * 1e6) / 1e6
    assert out.loc[2, "n_distinct_words"] == 1


def test_pii_scrub(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.text import pii_scrub

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": [
                    "mail a.b+c@x.co or d@y.org now",
                    "call 555-0100 and 555-0199 no mail",
                ],
            }
        )
    )
    out = pii_scrub(ds, text_col="text", id_col="doc_id").to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[1, "n_emails"] == 2
    assert out.loc[1, "scrubbed"] == "mail <EMAIL> or <EMAIL> now"
    assert out.loc[2, "n_phones"] == 2
    assert out.loc[2, "scrubbed"] == "call <PHONE> and <PHONE> no mail"


def test_broadcast_join_arrow_left_nullfill(ray_session):
    import pandas as pd

    import ray.data as rd

    from getml_community_ray.stages.joins import broadcast_join

    left = rd.from_arrow(
        pa.table({"k": [1, 2, 3, 2, 9], "v": [10, 20, 30, 40, 50]})
    )
    right = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    out = broadcast_join(left, right, on="k").to_pandas()
    # left order preserved, no-match NULL-filled
    assert list(out["v"]) == [10, 20, 30, 40, 50]
    assert list(out["name"][:4]) == ["a", "b", "c", "b"]
    assert out["name"].isna().iloc[4]

    inner = broadcast_join(left, right, on="k", how="inner").to_pandas()
    assert len(inner) == 4

    dup = pd.DataFrame({"k": [1, 1], "name": ["a", "b"]})
    with pytest.raises(ValueError):
        broadcast_join(left, dup, on="k")


def test_sqlite_roundtrip_partitioned(ray_session, tmp_path):
    import ray.data as rd

    from getml_community_ray.sources.db import (
        read_sql,
        read_sqlite_table,
        write_sqlite_table,
    )

    db = str(tmp_path / "t.db")
    n = 10_000
    ds = rd.from_arrow(
        pa.table(
            {
                "id": np.arange(n, dtype=np.int64),
                "val": (np.arange(n, dtype=np.int64) * 7) % 1000,
                "name": [f"r{i}" for i in range(n)],
            }
        )
    )
    assert write_sqlite_table(ds, db, "t") == n

    back = read_sqlite_table(db, "t", num_partitions=7).to_pandas()
    assert len(back) == n
    back = back.sort_values("id").reset_index(drop=True)
    assert list(back["id"]) == list(range(n))
    assert back.loc[5, "name"] == "r5"

    agg = read_sql(db, "SELECT COUNT(*) AS n, SUM(val) AS s FROM t").to_pandas()
    assert agg.loc[0, "n"] == n
    assert agg.loc[0, "s"] == int((((np.arange(n) * 7) % 1000)).sum())

    # column pruning
    two = read_sqlite_table(db, "t", columns=["id", "val"], num_partitions=3)
    assert set(two.schema().names) == {"id", "val"}


def test_read_db_table_generic(ray_session, tmp_path):
    """Generic DB-API range-partitioned reader (the Postgres/MySQL code
    path) against the SQLite stand-in, plus the import-guard contracts of
    the network connection factories."""
    import pytest
    import ray.data as rd

    from getml_community_ray.sources.db import (
        SqliteConnect,
        _MySQLConnect,
        _PostgresConnect,
        read_db_table,
        write_sqlite_table,
    )

    db = str(tmp_path / "g.db")
    n = 5_000
    ds = rd.from_arrow(
        pa.table(
            {
                "pk": np.arange(100, 100 + n, dtype=np.int64),
                "v": (np.arange(n, dtype=np.int64) * 13) % 997,
            }
        )
    )
    assert write_sqlite_table(ds, db, "g") == n

    back = read_db_table(
        SqliteConnect(db), "g", key_col="pk", num_partitions=9
    ).to_pandas().sort_values("pk").reset_index(drop=True)
    assert len(back) == n
    assert list(back["pk"]) == list(range(100, 100 + n))
    assert int(back["v"].sum()) == int(((np.arange(n) * 13) % 997).sum())

    # column pruning through the generic reader
    one = read_db_table(
        SqliteConnect(db), "g", key_col="pk", columns=["v"], num_partitions=3
    )
    assert set(one.schema().names) == {"v"}

    # network factories: clear NotImplementedError when drivers are absent
    for factory in (_PostgresConnect("dbname=x"), _MySQLConnect(host="x")):
        try:
            import psycopg2  # noqa: F401
            import pymysql  # noqa: F401
            pytest.skip("network DB drivers present — guard not exercised")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError, match="partitioned-read"):
            factory()


def test_csv_sniffer_dialects(ray_session, tmp_path):
    """CSVSniffer analog: delimiter/header/type detection + sniffed read."""
    from getml_community_ray.sources.csv import read_csv_sniffed, sniff_csv

    # tab-delimited with header, mixed types incl. ISO timestamps + nulls
    p1 = tmp_path / "a.tsv"
    p1.write_text(
        "id\tname\tval\tts\n"
        "1\talice\t2.5\t2024-01-01 10:00:00\n"
        "2\tbob\tNULL\t2024-01-02 11:30:00\n"
        "3\tcarol\t-7\t2024-01-03\n"
    )
    d = sniff_csv(str(p1))
    assert d["delimiter"] == "\t" and d["has_header"]
    assert d["column_names"] == ["id", "name", "val", "ts"]
    import pyarrow as _pa

    assert d["column_types"]["id"] == _pa.float64()
    assert d["column_types"]["name"] == _pa.string()
    assert d["column_types"]["val"] == _pa.float64()
    assert d["column_types"]["ts"] == _pa.timestamp("us")

    out = read_csv_sniffed(str(p1)).to_pandas()
    assert len(out) == 3
    assert out["val"].isna().sum() == 1  # NULL token honored
    assert str(out["ts"].dtype).startswith("datetime64")

    # headerless semicolon file -> synthetic column_NN names
    p2 = tmp_path / "b.csv"
    p2.write_text("1;2.5;x\n2;3.5;y\n3;4.5;z\n")
    d2 = sniff_csv(str(p2))
    assert d2["delimiter"] == ";" and not d2["has_header"]
    assert d2["column_names"] == ["column_00", "column_01", "column_02"]
    out2 = read_csv_sniffed(str(p2)).to_pandas()
    assert len(out2) == 3 and list(out2.columns) == d2["column_names"]
    assert out2["column_01"].sum() == 10.5

    # quoted delimiter inside a field must not break the sniff
    p3 = tmp_path / "c.csv"
    p3.write_text('id,desc\n1,"a,b"\n2,"c,d"\n')
    d3 = sniff_csv(str(p3))
    assert d3["delimiter"] == "," and d3["has_header"]
    assert d3["column_names"] == ["id", "desc"]
    assert d3["quote_char"] == '"'

    # single-quote dialect actually detected (ADVICE r4: probe was dead code)
    p4 = tmp_path / "d.csv"
    p4.write_text("id,desc\n1,'a,b'\n2,'c,d'\n")
    d4 = sniff_csv(str(p4))
    assert d4["quote_char"] == "'"
    assert d4["column_names"] == ["id", "desc"]

    # incidental paired apostrophes in UNQUOTED data must NOT flip the
    # quote char (field-bounded rule): "'Lil' Bob" pairs up but never
    # bounds a whole field
    p5 = tmp_path / "e.csv"
    p5.write_text("id,nick\n1,'Lil' Bob\n2,'Big' Al\n")
    d5 = sniff_csv(str(p5))
    assert d5["quote_char"] == '"'


def test_read_csv_dialect_headerless_requires_names(tmp_path):
    """ADVICE r4: has_header=False without column_names used to silently
    consume the first data row as a header — must raise instead."""
    import pytest

    from getml_community_ray.sources.csv import read_csv_dialect

    p = tmp_path / "h.csv"
    p.write_text("1,2\n3,4\n")
    with pytest.raises(ValueError, match="column_names"):
        read_csv_dialect(str(p), has_header=False)


def test_db_identifier_validation(tmp_path):
    """ADVICE r4: identifiers are validated before SQL interpolation."""
    import pytest

    from getml_community_ray.sources.db import read_sqlite_table

    with pytest.raises(ValueError, match="identifier"):
        read_sqlite_table(str(tmp_path / "x.db"), "t; DROP TABLE users")
    with pytest.raises(ValueError, match="identifier"):
        read_sqlite_table(str(tmp_path / "x.db"), "t", columns=["a", "b c"])


def test_duckdb_roundtrip(ray_session, tmp_path):
    import duckdb

    import ray.data as rd

    from getml_community_ray.sources.db import read_sql, write_duckdb_table

    db = str(tmp_path / "d.duckdb")
    ds = rd.from_arrow(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    assert write_duckdb_table(ds, db, "t") == 3
    out = read_sql(db, "SELECT * FROM t ORDER BY a", backend="duckdb").to_pandas()
    assert list(out["a"]) == [1, 2, 3]
    assert list(out["b"]) == ["x", "y", "z"]


def test_quantize_embeddings_int8(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.similarity import quantize_embeddings_int8

    vecs = [[1.0, -2.0, 0.5], [0.0, 0.0, 0.0], [3.0, 3.0, 3.0]]
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": [1, 2, 3],
                "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            }
        )
    )
    out = (
        quantize_embeddings_int8(ds, vec_col="embedding", id_col="vec_id")
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    # v=[1,-2,.5], max=2 -> q=[64,-127,32] (floor(x*127/2+0.5))
    assert out.loc[1, "sum_q"] == 64 - 127 + 32
    assert out.loc[1, "l1_q"] == 64 + 127 + 32
    assert out.loc[2, "sum_q"] == 0 and out.loc[2, "max_abs"] == 0.0
    assert out.loc[3, "sum_q"] == 3 * 127


def test_auto_partitions(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.partitioning import auto_partitions

    # cluster floor: at least 32, at least 2 per CPU
    n = auto_partitions(None)
    assert n >= 32
    # file-backed dataset: grows with input bytes, capped
    ds = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert 32 <= auto_partitions(ds) <= 4096


def test_ngram_decontaminate(ray_session):
    """Brute-force substring-set oracle on a tiny corpus; short-doc clamp."""
    import ray.data as rd

    from getml_community_ray.stages.text import ngram_decontaminate

    docs = [
        "the quick brown fox jumps over the lazy dog",   # shares grams w/ bench
        "completely unrelated text about nothing at all",
        "the quick brown cat sits under the lazy dog",   # partial overlap
        "tiny",                                          # shorter than gram
        "the quick brown fox jumps over the lazy dog",   # exact copy of bench
    ]
    bench_txt = ["the quick brown fox jumps over the lazy dog", "tiny"]
    g = 13
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": docs,
    }))
    bench = rd.from_arrow(pa.table({"text": bench_txt}))
    out = (
        ngram_decontaminate(ds, bench, text_col="text", id_col="doc_id",
                            gram=g, min_overlap=1)
        .to_pandas().set_index("doc_id").sort_index()
    )

    def grams(t):
        return ({t[i:i + g] for i in range(len(t) - g + 1)} if len(t) >= g
                else {t})

    bset = set().union(*(grams(t) for t in bench_txt))
    for i, t in enumerate(docs):
        want = len(grams(t) & bset)
        assert int(out.loc[i, "n_overlap"]) == want, (i, t)
        assert int(out.loc[i, "contaminated"]) == int(want >= 1)
    assert int(out.loc[3, "contaminated"]) == 1  # whole-short-doc gram hit
