"""Range-partitioned sorted Parquet sink.

The brief's "resumable output" contract (and the reference's report-file
sink, ``src/data_quality/reports/manager.py`` in /root/reference — one
directory of independently re-creatable artifacts) generalized to data:
produce GLOBALLY ordered output without ever running a global all-to-all
sort.

Plan (three narrow stages, one shuffle):

1. CUTPOINTS — a deterministic keyed-hash sample of the key column
   (``(key * 2654435761) % 2^32 % mod == 0``, the same replicable-sample
   arithmetic the sampling ops use; never ``limit()``, whose first-blocks
   bias round 1 flagged) is collected once — O(sample) on the driver —
   and its quantiles become ``n_ranges - 1`` cutpoints, broadcast via the
   closure.
2. TAG — each batch ``np.searchsorted``s its keys into a range id.
3. SORT + WRITE — ``groupby(range).map_groups``: each range sorts ITS
   rows (ranges are disjoint by construction, so per-range sort = global
   sort) and writes ``range=NNNNN/part-<md5-of-key-bytes>.parquet``. The
   filename is a pure function of the shard's key content, so a retried
   task overwrites its own file instead of duplicating rows (the
   flagship's idempotence rule, pipeline.py).

Reading the range dirs in lexical order yields a fully sorted corpus; a
resumed run can skip every range dir already present in the returned
manifest. Skew: a hot key makes one range large — callers raise
``n_ranges`` (cutpoints repeat around hot keys and searchsorted's
side='left'/'right' split spreads ties across adjacent ranges only when
values differ; byte-identical keys stay together, which sorted output
requires anyway).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

_KNUTH = np.uint64(2654435761)
_H32 = np.uint64(1 << 32)


def write_range_sorted(
    ds: rd.Dataset,
    key_col: str,
    path: str,
    n_ranges: int = 32,
    sample_mod: int = 64,
) -> pd.DataFrame:
    """Write ``ds`` as sorted, disjoint ``range=NNNNN/`` Parquet dirs.

    Returns the manifest (range_id, n_rows, min_key, max_key) sorted by
    range_id — O(n_ranges) rows. ``sample_mod`` keeps every ~1/mod key as
    a cutpoint candidate; at 100 TB raise it so the driver sample stays
    small (the sample only shapes range SIZES, never correctness).
    """

    def keep_sample(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k.view(np.uint64) * _KNUTH) % _H32 % np.uint64(sample_mod)
        return pa.table({key_col: pa.array(k[h == 0])})

    sample = (
        ds.select_columns([key_col])
        .map_batches(keep_sample, batch_format="pyarrow")
        .to_pandas()[key_col]
        .to_numpy(np.int64)
    )
    if len(sample):
        qs = np.linspace(0, 1, n_ranges + 1)[1:-1]
        cuts = np.unique(np.quantile(sample, qs).astype(np.int64))
    else:  # degenerate sample -> single range; output is still sorted
        cuts = np.array([], np.int64)

    def tag(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("range_id", pa.array(np.searchsorted(cuts, k, side="right")))

    os.makedirs(path, exist_ok=True)

    def sort_write(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="stable")
        rid = int(g["range_id"].iloc[0])
        keys = g[key_col].to_numpy(np.int64)
        fname = hashlib.md5(keys.tobytes()).hexdigest()[:20]
        d = os.path.join(path, f"range={rid:05d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g.drop(columns=["range_id"]), preserve_index=False),
            os.path.join(d, f"part-{fname}.parquet"),
        )
        return pd.DataFrame(
            {
                "range_id": [rid],
                "n_rows": [len(g)],
                "min_key": [int(keys[0])],
                "max_key": [int(keys[-1])],
            }
        )

    manifest = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(sort_write, batch_format="pandas")
        .to_pandas()
        .sort_values("range_id")
        .reset_index(drop=True)
    )
    return manifest
