"""Source/sink registry: format name -> reader, with an extension hook.

Replaces the reference's DB-connector factory
(``src/data_quality/connectors/factory.py:16-41`` in /root/reference:
driver-name -> connector class + ``register_connector``) with a columnar
format registry. Lance is the north-rule input format —
``ray.data.read_lance`` exists in this Ray build but imports the ``lance``
package at runtime, which is not installable offline (SURVEY.md §7.0), so
the entry is registered behind an import guard and Parquet is the
schema-identical fallback.
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data as rd

_READERS: dict[str, Callable[..., rd.Dataset]] = {}


def register_source(name: str, reader: Callable[..., rd.Dataset]) -> None:
    """Extension hook (factory.py:36-41 semantics)."""
    _READERS[name.lower()] = reader


def get_reader(name: str) -> Callable[..., rd.Dataset]:
    try:
        return _READERS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown source format {name!r}; registered: {sorted(_READERS)}"
        ) from None


def read_table(path: str, fmt: str = "parquet", **kwargs) -> rd.Dataset:
    return get_reader(fmt)(path, **kwargs)


def _read_lance(path: str, **kwargs) -> rd.Dataset:
    try:
        import lance  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "the 'lance' package is not available in this environment; "
            "use parquet (schema-identical) or install pylance"
        ) from exc
    return rd.read_lance(path, **kwargs)


def _read_orc(path: str, *, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Distributed ORC reader (this Ray build ships no ``read_orc``): Ray
    lists and ships file bytes — one block per file, the same per-file
    parallelism Ray's own file readers use — and each TASK decodes with
    ``pyarrow.orc``, so decode scales with the cluster. ``columns`` prunes
    at decode (whole files still leave storage — at real scale prefer
    parquet, whose reader prunes row groups at the IO layer; ORC support
    exists for ingest compatibility, not as the resident format)."""
    import pyarrow as pa

    files = rd.read_binary_files(path, **kwargs)

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.orc as po

        tabs = [
            po.ORCFile(pa.BufferReader(b.as_py())).read(columns=columns)
            for b in t["bytes"]
        ]
        return pa.concat_tables(tabs)

    return files.map_batches(decode, batch_format="pyarrow")


register_source("parquet", rd.read_parquet)
register_source("csv", rd.read_csv)
register_source("json", rd.read_json)
register_source("text", rd.read_text)
register_source("binary", rd.read_binary_files)
register_source("numpy", rd.read_numpy)
def _read_sqlite(path: str, **kwargs) -> rd.Dataset:
    # Live-DB member of the registry (reference S2/S3 parity): rowid-range
    # parallel scan via stdlib sqlite3 — see rayquality/sqlite_source.py.
    from .sqlite_source import read_sqlite

    return read_sqlite(path, **kwargs)


def _read_feather(
    path: str, *, columns: list[str] | None = None, **kwargs
) -> rd.Dataset:
    """Distributed Feather / Arrow-IPC reader (this Ray build ships no
    ``read_feather``): same shape as :func:`_read_orc` — Ray lists and
    ships file bytes, one block per file, and each TASK decodes with
    ``pyarrow.feather`` (handles both Feather V1 and V2 = Arrow IPC file
    format, any compression pyarrow was built with). ``columns`` prunes at
    decode; ingest compatibility, not the resident format."""
    import pyarrow as pa

    files = rd.read_binary_files(path, **kwargs)

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.feather as pf

        tabs = [
            pf.read_table(pa.BufferReader(b.as_py()), columns=columns)
            for b in t["bytes"]
        ]
        return pa.concat_tables(tabs)

    return files.map_batches(decode, batch_format="pyarrow")


register_source("orc", _read_orc)
register_source("lance", _read_lance)
register_source("sqlite", _read_sqlite)
register_source("feather", _read_feather)
register_source("arrow", _read_feather)  # .arrow = the IPC file extension
