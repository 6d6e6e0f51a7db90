"""SQLite source tests — mirrors the reference's connector cases
(tests/unit/connectors/test_sqlite.py in /root/reference: connect success
/failure, tables list shape, PRAGMA table_info conversion, FK list) plus
the Ray-side read path (typed ranges, deletes, columns pruning, WITHOUT
ROWID fallback, registry dispatch)."""

from __future__ import annotations

import sqlite3

import pytest


@pytest.fixture(scope="module")
def db(ray_session, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("sqlite") / "shop.db")
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE customer (
            c_custkey INTEGER PRIMARY KEY,
            c_name TEXT NOT NULL,
            c_acctbal REAL DEFAULT 0.0,
            c_avatar BLOB
        );
        CREATE TABLE orders (
            o_orderkey INTEGER PRIMARY KEY,
            o_custkey INTEGER REFERENCES customer(c_custkey),
            o_comment TEXT
        );
        CREATE TABLE kv (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID;
        CREATE TABLE empty_t (a INTEGER, b TEXT);
        """
    )
    conn.executemany(
        "INSERT INTO customer VALUES (?, ?, ?, ?)",
        [(i, f"Customer#{i:05d}", i * 1.5, bytes([i % 251])) for i in range(1, 1001)],
    )
    conn.executemany(
        "INSERT INTO orders VALUES (?, ?, ?)",
        [(i, 1 + i % 1000, None if i % 7 == 0 else f"note {i}") for i in range(1, 3001)],
    )
    conn.executemany("INSERT INTO kv VALUES (?, ?)", [(f"k{i}", i) for i in range(50)])
    # rowid gaps: deletes must shrink ranges, not corrupt them
    conn.execute("DELETE FROM customer WHERE c_custkey % 10 = 3")
    conn.commit()
    conn.close()
    return path


def test_connect_success_and_failure(db, tmp_path):
    from rayquality import sqlite_source as sq

    conn = sq.connect(db)
    assert conn.execute("SELECT 1").fetchone() == (1,)
    conn.close()
    with pytest.raises(RuntimeError, match="Failed to connect to SQLite"):
        sq.connect(str(tmp_path / "missing" / "nope.db"))


def test_list_tables_shape(db):
    from rayquality import sqlite_source as sq

    tabs = sq.list_tables(db)
    assert [t["table_name"] for t in tabs] == ["customer", "empty_t", "kv", "orders"]
    assert all(
        t["table_schema"] == "main" and t["table_type"] == "BASE TABLE" for t in tabs
    )


def test_table_info_standard_fields(db):
    from rayquality import sqlite_source as sq

    info = {c["column_name"]: c for c in sq.table_info(db, "customer")}
    assert info["c_name"]["is_nullable"] == "NO"
    assert info["c_acctbal"]["is_nullable"] == "YES"
    assert info["c_acctbal"]["column_default"] == "0.0"
    assert info["c_custkey"]["data_type"].upper() == "INTEGER"
    assert info["c_avatar"]["character_maximum_length"] is None
    with pytest.raises(ValueError, match="no such table"):
        sq.table_info(db, "ghost")


def test_foreign_keys(db):
    from rayquality import sqlite_source as sq

    assert sq.foreign_keys(db, "orders") == [
        {
            "column_name": "o_custkey",
            "referenced_table": "customer",
            "referenced_column": "c_custkey",
        }
    ]
    assert sq.foreign_keys(db, "customer") == []


def test_read_distributed_ranges_and_types(db):
    from rayquality import sqlite_source as sq

    ds = sq.read_sqlite(db, table="customer", batch_rows=100)
    t = ds.take_all()
    assert ds.count() == 900  # 1000 - 100 deleted
    sch = ds.schema()
    got = dict(zip(sch.names, [str(x) for x in sch.types]))
    assert got["c_custkey"] == "int64"
    assert got["c_name"] == "string"
    assert got["c_acctbal"] == "double"
    assert got["c_avatar"] == "binary"
    rows = sorted(t, key=lambda r: r["c_custkey"])
    assert rows[0]["c_custkey"] == 1 and rows[0]["c_name"] == "Customer#00001"
    assert rows[0]["c_avatar"] == bytes([1])
    assert all(r["c_custkey"] % 10 != 3 for r in rows)


def test_read_columns_pruning_and_nulls(db):
    from rayquality import sqlite_source as sq

    ds = sq.read_sqlite(db, table="orders", columns=["o_orderkey", "o_comment"])
    assert ds.schema().names == ["o_orderkey", "o_comment"]
    n_null = sum(1 for r in ds.take_all() if r["o_comment"] is None)
    assert n_null == 3000 // 7
    with pytest.raises(ValueError, match="columns not in"):
        sq.read_sqlite(db, table="orders", columns=["nope"])


def test_without_rowid_and_empty_table(db):
    from rayquality import sqlite_source as sq

    kv = sq.read_sqlite(db, table="kv")
    assert kv.count() == 50
    assert sorted(r["k"] for r in kv.take_all())[0] == "k0"
    empty = sq.read_sqlite(db, table="empty_t")
    assert empty.count() == 0
    assert empty.schema().names == ["a", "b"]


def test_registry_dispatch_and_row_count(db):
    from rayquality import sources, sqlite_source as sq

    ds = sources.read_table(db, "sqlite", table="customer", columns=["c_custkey"])
    assert ds.count() == 900
    assert sq.row_count(db, "orders") == 3000


def test_cli_list_and_describe(db, capsys):
    from rayquality import cli

    assert cli.main(["list-tables", db]) == 0
    out = capsys.readouterr().out
    lines = [l.split() for l in out.strip().splitlines()]
    assert [l[0] for l in lines] == ["orders", "customer", "kv", "empty_t"]
    assert lines[0][1] == "3,000"

    assert cli.main(["describe-table", db, "--table", "orders"]) == 0
    out = capsys.readouterr().out
    assert "rows: 3,000" in out
    assert "FK o_custkey -> customer.c_custkey" in out
    with pytest.raises(SystemExit):
        cli.main(["describe-table", db])
