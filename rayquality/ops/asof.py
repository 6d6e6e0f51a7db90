"""Distributed as-of (temporal) join and range (interval) join — custom
operators Ray Data lacks.

Semantics: for every left row, attach the single right row with the same
key and the greatest right-timestamp <= left-timestamp (ties broken by the
largest tiebreak column value — deterministic under any partitioning).

Execution (Ray-Data-first): both sides reduce to skinny columns, get a
``part = key % n_parts`` column and a side tag, and are UNIONed into one
dataset; a single ``groupby(part).map_groups`` then runs a vectorized
``pandas.merge_asof`` per partition. Partitioning assumption: all rows of
one join key land in one partition (guaranteed by the key hash); a single
key's history must fit one worker — the standard as-of contract.

No SQL engine is consulted; the DuckDB oracle for the driver gate is an
explicit ROW_NUMBER window (see __ray_entry__.oracle_sql) because DuckDB's
native ASOF JOIN leaves timestamp ties unspecified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str,
    n_parts: int = 32,
) -> rd.Dataset:
    """Inner as-of join -> lazy Dataset with ``left_cols + right_cols``.

    ``left_cols``/``right_cols`` are the payload columns to carry through
    (must include the key/ts columns you want in the output). ``tiebreak``
    is a right-side column; among right rows sharing the match timestamp
    the one with the LARGEST tiebreak value wins.
    """
    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def pack(side: int, key_col: str, ts_col: str, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            out: dict[str, pa.Array | pa.ChunkedArray] = {
                "part": pa.array((key % n_parts).astype(np.int64)),
                "side": pa.array(np.full(len(key), side, dtype=np.int8)),
                "__key": pa.array(key),
                "__ts": t[ts_col].combine_chunks().cast(pa.timestamp("us")),
            }
            for c in all_cols:
                out[c] = (
                    t[c].combine_chunks()
                    if c in cols
                    else pa.nulls(len(key), _ARROW_TYPES[c])
                )
            return pa.table(out)

        return fn

    # union needs one schema: probe both sides' column types once
    def _types_of(ds: rd.Dataset) -> dict[str, pa.DataType]:
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        # pandas-block datasets expose numpy dtypes instead of a pa.Schema
        return {
            n: pa.from_numpy_dtype(t) for n, t in zip(base.names, base.types)
        }

    _ARROW_TYPES = {**_types_of(right), **_types_of(left)}
    _ARROW_TYPES = {c: _ARROW_TYPES[c] for c in all_cols}

    packed_l = left.select_columns(
        list(dict.fromkeys([key_left, ts_left] + left_cols))
    ).map_batches(pack(0, key_left, ts_left, left_cols), batch_format="pyarrow")
    packed_r = right.select_columns(
        list(dict.fromkeys([key_right, ts_right] + right_cols))
    ).map_batches(pack(1, key_right, ts_right, right_cols), batch_format="pyarrow")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        L = g[g["side"] == 0]
        R = g[g["side"] == 1]
        if not len(L) or not len(R):
            return _typed_empty(all_cols, _ARROW_TYPES)
        L = L.sort_values("__ts", kind="stable")
        # ties: merge_asof keeps the LAST equal-ts right row in frame order,
        # so sorting by (ts, tiebreak) makes the largest tiebreak win
        R = R.sort_values(["__ts", tiebreak], kind="stable")
        merged = pd.merge_asof(
            L[["__key", "__ts"] + left_cols],
            R[["__key", "__ts"] + right_cols],
            on="__ts",
            by="__key",
            direction="backward",
        )
        out = merged.dropna(subset=[tiebreak])[all_cols]  # inner semantics
        # dtype restore runs INSIDE the partition task, so the operator can
        # return a lazy Dataset (no driver-side O(rows) post-pass)
        return _restore_dtypes(out, all_cols, _ARROW_TYPES)

    # lazy: the join output streams — collect only at the consumer
    return (
        packed_l.union(packed_r)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def _restore_dtypes(
    out: pd.DataFrame, all_cols: list[str], arrow_types: dict[str, pa.DataType]
) -> pd.DataFrame:
    """The side-tagged union carries nulls on the off-side columns, so
    pandas upcasts ints to float64 end-to-end; restore every column's
    source dtype (applied PER PARTITION, inside the map_groups task)."""
    out = out.reset_index(drop=True)
    for c in all_cols:
        t = arrow_types[c]
        if pa.types.is_timestamp(t):
            out[c] = out[c].astype(f"datetime64[{t.unit}]")
        else:
            out[c] = out[c].astype(t.to_pandas_dtype())
    return out[all_cols]


def collect(ds: rd.Dataset) -> pd.DataFrame:
    """``ds.to_pandas()`` that survives the all-empty case: Ray drops the
    column list when every block is empty, but ``ds.schema()`` still knows
    it — rebuild the typed empty frame from the schema."""
    out = ds.to_pandas()
    if out.empty and not len(out.columns):
        sch = ds.schema()
        names = list(sch.names)
        types = {n: t for n, t in zip(sch.names, sch.types)}
        return _restore_dtypes(
            pd.DataFrame({c: pd.Series([], dtype=object) for c in names}),
            names,
            types,
        )
    return out


def _typed_empty(all_cols: list[str], arrow_types: dict[str, pa.DataType]) -> pd.DataFrame:
    return _restore_dtypes(
        pd.DataFrame({c: pd.Series([], dtype=object) for c in all_cols}),
        all_cols,
        arrow_types,
    )


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    left_cols: list[str],
    right_cols: list[str],
    before: "pd.Timedelta",
    after: "pd.Timedelta",
    n_parts: int = 32,
) -> rd.Dataset:
    """Inner range (interval) join: every (left, right) pair with equal keys
    and ``right_ts`` in ``[left_ts - before, left_ts + after]``.

    Same partitioning contract as :func:`asof_join` — both sides reduce to
    skinny tagged rows, one ``key % n_parts`` hash co-locates each key, and
    every partition resolves its pairs with ONE vectorized pandas merge +
    window filter (no per-key Python loops). Skew caveat (standard for
    range joins): a single key's |L|x|R| equijoin fanout materializes
    inside its partition before the window filter; with real clocks and a
    narrow window the surviving fanout is small, but a pathological hot key
    is the caller's responsibility (pre-bucket the key with a time floor if
    needed).
    """
    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def _types_of(ds: rd.Dataset) -> dict[str, pa.DataType]:
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        return {n: pa.from_numpy_dtype(t) for n, t in zip(base.names, base.types)}

    _ARROW_TYPES = {**_types_of(right), **_types_of(left)}
    _ARROW_TYPES = {c: _ARROW_TYPES[c] for c in all_cols}

    def pack(side: int, key_col: str, ts_col: str, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            out: dict[str, pa.Array | pa.ChunkedArray] = {
                "part": pa.array((key % n_parts).astype(np.int64)),
                "side": pa.array(np.full(len(key), side, dtype=np.int8)),
                "__key": pa.array(key),
                "__ts": t[ts_col].combine_chunks().cast(pa.timestamp("us")),
            }
            for c in all_cols:
                out[c] = (
                    t[c].combine_chunks()
                    if c in cols
                    else pa.nulls(len(key), _ARROW_TYPES[c])
                )
            return pa.table(out)

        return fn

    packed_l = left.select_columns(
        list(dict.fromkeys([key_left, ts_left] + left_cols))
    ).map_batches(pack(0, key_left, ts_left, left_cols), batch_format="pyarrow")
    packed_r = right.select_columns(
        list(dict.fromkeys([key_right, ts_right] + right_cols))
    ).map_batches(pack(1, key_right, ts_right, right_cols), batch_format="pyarrow")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        L = g[g["side"] == 0]
        R = g[g["side"] == 1]
        if not len(L) or not len(R):
            return _typed_empty(all_cols, _ARROW_TYPES)
        merged = L[["__key", "__ts"] + left_cols].merge(
            R[["__key", "__ts"] + right_cols], on="__key", suffixes=("", "__r")
        )
        rt = merged["__ts__r"]
        lt = merged["__ts"]
        keep = (rt >= lt - before) & (rt <= lt + after)
        return _restore_dtypes(merged[keep][all_cols], all_cols, _ARROW_TYPES)

    # lazy: the join output streams — collect only at the consumer
    return (
        packed_l.union(packed_r)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )
