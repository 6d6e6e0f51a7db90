"""Snapshot diff: added / removed / changed rows between two table
versions.

The regression check a data-quality engine runs between pipeline
releases or ingestion batches: key both snapshots, content-hash the
compared columns, and report every key whose row appeared, disappeared,
or changed — the temporal extension of the reference's single-snapshot
validators (``src/data_quality/validators/``), which can say a table is
bad but not WHAT moved since yesterday.

Plan: each side streams to skinny (key, md5-of-content, side-bit) rows —
the combiner hashes content in place so row bodies never shuffle — then
ONE key-hash partition exchange and a vectorized per-partition compare.
Output is diff-sized (unchanged rows are dropped in the partition, the
overwhelming majority at 100 TB), and the driver holds nothing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rayquality.pool import default_n_parts


def snapshot_diff(
    old: rd.Dataset,
    new: rd.Dataset,
    id_col: str,
    compare_cols: list[str],
    n_parts: int | None = None,
) -> rd.Dataset:
    """Diff two snapshots keyed by ``id_col`` -> lazy
    ``(id_col, status)`` with status in {'added', 'removed', 'changed'};
    unchanged keys are omitted. Keys must be unique per snapshot (it is a
    primary-key diff, not a multiset diff).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def tag(side: int):
        def per_batch(df: pd.DataFrame) -> pd.DataFrame:
            joined = df[compare_cols[0]].fillna("").astype(str)
            for c in compare_cols[1:]:
                joined = joined + "\x1f" + df[c].fillna("").astype(str)
            hs = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in joined.tolist()]
            out = pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    "h": hs,
                    "side": np.full(len(df), side, np.int64),
                }
            )
            hv = pd.util.hash_pandas_object(out[id_col], index=False).to_numpy(
                np.uint64
            )
            out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
            return out

        return per_batch

    cols = [id_col, *compare_cols]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][[id_col, "h"]]
        n = g[g["side"] == 1][[id_col, "h"]]
        m = o.merge(n, on=id_col, how="outer", suffixes=("_o", "_n"))
        status = np.where(
            m["h_o"].isna(),
            "added",
            np.where(m["h_n"].isna(), "removed", "changed"),
        )
        keep = m["h_o"].isna() | m["h_n"].isna() | (m["h_o"] != m["h_n"])
        return pd.DataFrame(
            {id_col: m.loc[keep, id_col].to_numpy(), "status": status[keep]}
        )

    tagged = old.select_columns(cols).map_batches(
        tag(0), batch_format="pandas"
    ).union(new.select_columns(cols).map_batches(tag(1), batch_format="pandas"))
    return tagged.groupby("pkey").map_groups(per_part, batch_format="pandas")
