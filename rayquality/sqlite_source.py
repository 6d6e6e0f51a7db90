"""SQLite source: stdlib ``sqlite3`` -> parallel Arrow batches -> Dataset.

Implements the reference's SQLite connector surface
(``src/data_quality/connectors/sqlite.py:13-115`` in /root/reference:
connect/test_connection, PRAGMA table_info -> standard column dicts,
PRAGMA foreign_key_list -> standard FK dicts, sqlite_master tables list)
re-expressed Ray-Data-first: instead of SQLAlchemy + driver-side pandas,
``read_sqlite`` splits the table into rowid ranges and each Ray task opens
its own read-only connection and decodes one range into a typed Arrow
table, so scan throughput scales with the cluster when the .db file sits
on shared storage. Column types come from the declared-type affinity rules
(https://www.sqlite.org/datatype3.html §3.1) so every range task emits the
same schema — including all-NULL ranges.

No live server exists in this sandbox, so SQLite doubles as the test
vehicle for the S2/S3 connector-registry surface (SURVEY.md §2.1).
"""

from __future__ import annotations

import sqlite3
from typing import Any

import pyarrow as pa
import ray.data as rd

DEFAULT_BATCH_ROWS = 100_000


def connect(path: str) -> sqlite3.Connection:
    """Open a read-only connection; RuntimeError on failure (the
    reference's connect() contract — connectors/sqlite.py:14-20)."""
    try:
        conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        conn.execute("SELECT 1").fetchone()
        return conn
    except sqlite3.Error as exc:
        raise RuntimeError(f"Failed to connect to SQLite: {exc}") from exc


def list_tables(path: str) -> list[dict[str, Any]]:
    """Tables list in the reference's standard shape
    (connectors/sqlite.py:103-115): name-sorted, sqlite_% excluded."""
    with connect(path) as conn:
        names = [
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type = 'table' "
                "AND name NOT LIKE 'sqlite_%' ORDER BY name"
            )
        ]
    return [
        {"table_name": n, "table_schema": "main", "table_type": "BASE TABLE"}
        for n in names
    ]


def table_info(path: str, table: str) -> list[dict[str, Any]]:
    """PRAGMA table_info -> the reference's standard column dicts
    (connectors/sqlite.py:52-77)."""
    with connect(path) as conn:
        rows = conn.execute(f"PRAGMA table_info({_quote(table)})").fetchall()
    if not rows:
        raise ValueError(f"no such table: {table!r}")
    return [
        {
            "column_name": name,
            "data_type": decl or "",
            "is_nullable": "YES" if notnull == 0 else "NO",
            "column_default": dflt,
            "character_maximum_length": None,
            "numeric_precision": None,
            "numeric_scale": None,
        }
        for _cid, name, decl, notnull, dflt, _pk in rows
    ]


def foreign_keys(path: str, table: str) -> list[dict[str, Any]]:
    """PRAGMA foreign_key_list -> standard FK dicts
    (connectors/sqlite.py:79-101)."""
    with connect(path) as conn:
        rows = conn.execute(f"PRAGMA foreign_key_list({_quote(table)})").fetchall()
    # pragma columns: id, seq, table, from, to, on_update, on_delete, match
    return [
        {"column_name": r[3], "referenced_table": r[2], "referenced_column": r[4]}
        for r in rows
    ]


def row_count(path: str, table: str) -> int:
    with connect(path) as conn:
        return int(conn.execute(f"SELECT COUNT(*) FROM {_quote(table)}").fetchone()[0])


def _quote(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


def _affinity_type(decl: str) -> pa.DataType:
    """SQLite declared-type -> Arrow type via the documented affinity
    rules (datatype3.html §3.1, in rule order)."""
    d = (decl or "").upper()
    if "INT" in d:
        return pa.int64()
    if "CHAR" in d or "CLOB" in d or "TEXT" in d:
        return pa.string()
    if not d or "BLOB" in d:
        return pa.binary()
    # REAL/FLOA/DOUB and the NUMERIC catch-all: float64 keeps range tasks
    # schema-identical even when a range happens to hold only integers
    return pa.float64()


def arrow_schema(path: str, table: str, columns: list[str] | None = None) -> pa.Schema:
    info = table_info(path, table)
    by_name = {c["column_name"]: c for c in info}
    names = columns or [c["column_name"] for c in info]
    missing = [c for c in names if c not in by_name]
    if missing:
        raise ValueError(f"columns not in {table!r}: {missing}")
    return pa.schema(
        [(n, _affinity_type(by_name[n]["data_type"])) for n in names]
    )


def _fetch_range(
    path: str, table: str, schema: pa.Schema, lo: int, hi: int
) -> pa.Table:
    """One range task: SELECT the [lo, hi] rowid slice and build the typed
    Arrow table. Column-wise transpose + typed pa.array keeps all-NULL
    slices on the shared schema."""
    sel = ", ".join(_quote(f.name) for f in schema)
    with connect(path) as conn:
        rows = conn.execute(
            f"SELECT {sel} FROM {_quote(table)} "
            f"WHERE rowid BETWEEN ? AND ?",
            (lo, hi),
        ).fetchall()
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    arrays = []
    for field, vals in zip(schema, cols):
        if pa.types.is_floating(field.type):
            # NUMERIC affinity lets integers through; coerce for Arrow
            vals = [float(v) if v is not None else None for v in vals]
        arrays.append(pa.array(list(vals), type=field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def read_sqlite(
    path: str,
    *,
    table: str,
    columns: list[str] | None = None,
    batch_rows: int = DEFAULT_BATCH_ROWS,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Distributed table scan -> Dataset: rowid span split into
    ``batch_rows``-sized ranges, one Ray task per range (its own read-only
    connection — sqlite allows any number of concurrent readers). Rowid
    gaps (deletes) only make a range smaller, never wrong. WITHOUT ROWID
    tables (no rowid column) fall back to a single-task full scan — they
    are small lookup tables in practice; page large ones to parquet."""
    schema = arrow_schema(path, table, columns)
    with connect(path) as conn:
        try:
            lo_hi = conn.execute(
                f"SELECT MIN(rowid), MAX(rowid) FROM {_quote(table)}"
            ).fetchone()
        except sqlite3.OperationalError:
            lo_hi = None  # WITHOUT ROWID

    if lo_hi is None or lo_hi[0] is None:
        if lo_hi is None:
            sel = ", ".join(_quote(f.name) for f in schema)
            with connect(path) as conn:
                rows = conn.execute(f"SELECT {sel} FROM {_quote(table)}").fetchall()
            cols = list(zip(*rows)) if rows else [[] for _ in schema]
            arrays = [
                pa.array(list(v), type=f.type) for f, v in zip(schema, cols)
            ]
            return rd.from_arrow(pa.Table.from_arrays(arrays, schema=schema))
        return rd.from_arrow(schema.empty_table())  # empty table

    lo, hi = int(lo_hi[0]), int(lo_hi[1])
    ranges = [
        {"lo": a, "hi": min(a + batch_rows - 1, hi)}
        for a in range(lo, hi + 1, batch_rows)
    ]

    def fetch(batch: pa.Table) -> pa.Table:
        tabs = [
            _fetch_range(path, table, schema, int(a), int(b))
            for a, b in zip(
                batch["lo"].to_pylist(), batch["hi"].to_pylist()
            )
        ]
        return pa.concat_tables(tabs)

    return rd.from_items(ranges).map_batches(
        fetch,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
