"""Stream-shaped operators over the events log.

Ray Data has no event-time windows; per the streaming recast (SURVEY.md
§2.9 + ray guide), the log is treated as a partitioned ordered stream:
``groupby(key).map_groups`` sorts each key's events by timestamp and applies
the window logic in pandas. Ordering is per-key, never global.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def sessionize(events: rd.Dataset, gap_minutes: int = 30) -> pd.DataFrame:
    """Session counts per user: a session break is a gap > ``gap_minutes``.

    -> (user_id, n_sessions, n_events), sorted by user_id.
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values().to_numpy()
        breaks = int((np.diff(ts) > gap).sum()) if len(ts) > 1 else 0
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [breaks + 1],
                "n_events": [len(ts)],
            }
        )

    out = (
        events.select_columns(["user_id", "ts"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    out["n_sessions"] = out["n_sessions"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def systematic_sample(ds: rd.Dataset, key: str, modulus: int, remainder: int = 0) -> rd.Dataset:
    """Deterministic systematic sample: rows where key % modulus == remainder.

    The reference samples with ``ORDER BY RAND() LIMIT n``
    (core/orchestrator.py:183-199 in /root/reference); a keyed systematic
    sample gives the same scale control with a SQL-checkable result
    (``ds.random_sample(frac, seed)`` remains available for true random).
    """
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key], pa.int64())
        mask = pc.equal(pc.subtract(k, pc.multiply(pc.divide(k, modulus), modulus)), remainder)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")
