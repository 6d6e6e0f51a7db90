"""Hash-partitioned partial combining — the fast path for multi-key sums.

Ray Data's multi-key ``groupby(...).aggregate(Sum)`` runs a multi-column
sort shuffle that measures pathologically slow on many skinny partial
blocks (166 s for 1.3M rows in the round-2 profile). Combining partials
needs none of that ordering: hash the key tuple to ONE int, partition on
it (all rows of a key land together), and finish each partition with a
vectorized pandas groupby. Same exact result, seconds instead of minutes.

Used by events_hourly, sliding windows, multi-column duplicates and the
exact-Jaccard intersection combine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

DEFAULT_N_PARTS = 64


def combine_partials(
    ds: rd.Dataset,
    keys: list[str],
    sums: list[str],
    n_parts: int = DEFAULT_N_PARTS,
    mins: list[str] | None = None,
    maxs: list[str] | None = None,
) -> rd.Dataset:
    """Sum ``sums`` (min ``mins``, max ``maxs``) per distinct ``keys``
    tuple across all partial rows."""

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(n_parts)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a null key value is a real group (e.g. the
        # null-value row of a value-counts table)
        if not mins and not maxs:
            return g.groupby(keys, as_index=False, dropna=False)[sums].sum()
        agg = (
            {c: "sum" for c in sums}
            | {c: "min" for c in (mins or [])}
            | {c: "max" for c in (maxs or [])}
        )
        return g.groupby(keys, as_index=False, dropna=False).agg(agg)

    return (
        ds.map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
    )


def distinct_count(ds: rd.Dataset, keys: list[str], n_parts: int = DEFAULT_N_PARTS) -> int:
    """Count distinct key tuples: per-batch dedup (combiner) -> hash
    partition -> per-partition dedup -> count. No global sort."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[keys].drop_duplicates()

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(n_parts)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g[keys].drop_duplicates().shape[0])]})

    parts = (
        ds.select_columns(keys)
        .map_batches(partial, batch_format="pandas")
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return int(parts["n"].sum()) if len(parts) else 0
