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

from . import quant

from rayquality.pool import default_n_parts


def sessionize(
    events: rd.Dataset, gap_minutes: int = 30, n_parts: int | None = None
) -> rd.Dataset:
    """Session counts per user: a session break is a gap > ``gap_minutes``.

    Hash-partitioned by user then VECTORIZED per partition (one sort +
    bincount per partition, never one Python call per user — at 10^8 users
    per-group ``map_groups`` would mean 10^8 pandas calls).

    -> lazy Dataset (user_id, n_sessions, n_events): the output is O(users)
    — the dataset at scale — so it streams; consumers collect/sort only
    what they need.
    """
    if n_parts is None:
        n_parts = default_n_parts()
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((uid % n_parts).astype(np.int64)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        if not len(uid):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_sessions": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                }
            )
        same = uid[1:] == uid[:-1]
        brk = same & (np.diff(ts) > gap)
        new = np.empty(len(uid), dtype=bool)
        new[0] = True
        new[1:] = ~same
        gi = np.cumsum(new) - 1  # per-row group index
        n_users = gi[-1] + 1
        n_events = np.bincount(gi, minlength=n_users)
        breaks_per = np.bincount(gi[1:][brk], minlength=n_users)
        return pd.DataFrame(
            {
                "user_id": uid[new],
                "n_sessions": (breaks_per + 1).astype(np.int64),
                "n_events": n_events.astype(np.int64),
            }
        )

    return (
        events.select_columns(["user_id", "ts"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def sliding_window_counts(
    events: rd.Dataset, window_minutes: int = 60, slide_minutes: int = 15
) -> rd.Dataset:
    """Sliding-window event counts per user: windows of ``window_minutes``
    starting every ``slide_minutes`` (an event lands in window/slide
    consecutive windows).

    Streaming recast: each batch EXPLODES its events into their member
    windows (flat map, window/slide rows per event) and pre-aggregates
    (combiner), then one skinny global groupby sums the partials — the
    shuffle moves (user, window, count) triples, never events.

    -> lazy Dataset (user_id, w_start, n_events): O(users x windows) output
    streams; the w_start datetime64[us] pin happens inside the combine's
    final map task, never on the driver.
    """
    if window_minutes % slide_minutes:
        raise ValueError("window_minutes must be a multiple of slide_minutes")
    k = window_minutes // slide_minutes
    offsets = (np.arange(k) * np.timedelta64(slide_minutes * 60, "s")).astype(
        "timedelta64[us]"
    )

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        base = pc.floor_temporal(
            t["ts"].combine_chunks().cast(pa.timestamp("us")),
            multiple=slide_minutes,
            unit="minute",
        ).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        w_start = (base[None, :] - offsets[:, None]).reshape(-1)
        g = (
            pa.table(
                {
                    "user_id": pa.array(np.tile(uid, k)),
                    "w_start": pa.array(w_start),
                }
            )
            .group_by(["user_id", "w_start"])
            .aggregate([("w_start", "count")])
        )
        return g.rename_columns(["user_id", "w_start", "n_events"])

    from .combine import combine_partials

    def pin_ts(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("w_start"),
            "w_start",
            t["w_start"].cast(pa.timestamp("us")),
        ).select(["user_id", "w_start", "n_events"])

    return combine_partials(
        events.select_columns(["user_id", "ts"]).map_batches(explode, batch_format="pyarrow"),
        keys=["user_id", "w_start"],
        sums=["n_events"],
    ).map_batches(pin_ts, batch_format="pyarrow")


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


_KNUTH = np.uint64(2654435761)  # multiplicative hash constant (Knuth TAOCP v3 §6.4)
_H32 = np.uint64(1 << 32)


def stratified_sample(
    ds: rd.Dataset, group_col: str, key_col: str, n: int, n_parts: int | None = None
) -> pd.DataFrame:
    """Deterministic stratified sample: exactly ``n`` rows per stratum
    (fewer if the stratum is smaller), chosen by a keyed pseudo-random
    order so the sample is reproducible AND SQL-verifiable.

    Rank key is the Knuth multiplicative hash ``(key * 2654435761) mod 2^32``
    (ties broken by the key itself) — expressible identically in SQL as
    ``ROW_NUMBER() OVER (PARTITION BY grp ORDER BY (key*2654435761)%4294967296,
    key)``, unlike an RNG. Replaces the reference's driver-side
    ``ORDER BY RAND() LIMIT n`` (core/orchestrator.py:183-199 in
    /root/reference) with a per-stratum distributed top-n:

    - per-batch combiner: local n smallest hashes per stratum (block top-n,
      so at most ``n * strata_in_batch`` rows leave any block);
    - hash-partition on the stratum (each stratum fully co-located);
    - per-partition vectorized top-n = the final answer (no driver merge
      beyond concatenating partition outputs).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def block_topn(df: pd.DataFrame) -> pd.DataFrame:
        # pkey is fused into the combiner (VERDICT r4 item 8): the top-n
        # survivors are already in hand, so hashing them here saves a whole
        # Arrow->pandas stage on the shuffle input
        k = df[key_col].to_numpy(np.int64).astype(np.uint64)
        out = df[[group_col, key_col]].copy()
        out["hkey"] = ((k * _KNUTH) % _H32).astype(np.int64)
        out = out.sort_values(["hkey", key_col], kind="stable")
        out = out.groupby(group_col, as_index=False, sort=False).head(n)
        hv = pd.util.hash_pandas_object(out[group_col], index=False).to_numpy(np.uint64)
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hkey", key_col], kind="stable")
        g = g.groupby(group_col, as_index=False, sort=False).head(n)
        g = g.copy()
        g["rank"] = (g.groupby(group_col).cumcount() + 1).astype(np.int64)
        return g[[group_col, key_col, "rank"]]

    out = (
        ds.select_columns([group_col, key_col])
        .map_batches(block_topn, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values([group_col, "rank"]).reset_index(drop=True)


def weighted_mixture(
    ds: rd.Dataset,
    strat_col: str,
    key_col: str,
    weights: dict[str, float],
    default: float = 1.0,
) -> rd.Dataset:
    """Deterministic weighted mixture sampling — the data-mixing primitive
    of a training pipeline (e.g. keep 100% of English, 25% of zh docs).

    A row survives iff ``knuth_hash(key) % 10000 < weight(stratum) * 10000``:
    a pure per-row function of (key, stratum), so the mix is reproducible,
    embarrassingly parallel (one vectorized filter pass, no shuffle), and
    SQL-checkable — unlike RNG-based sampling. The tiny weight table ships
    in the task closure.
    """
    thresholds = {k: float(w) * 10000.0 for k, w in weights.items()}
    dflt = float(default) * 10000.0

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key_col].to_numpy(np.int64).astype(np.uint64)
        h = ((k * _KNUTH) % _H32 % np.uint64(10000)).astype(np.float64)
        thr = df[strat_col].map(thresholds).fillna(dflt).to_numpy(np.float64)
        return df[h < thr]

    return ds.map_batches(fn, batch_format="pandas")


def running_total(
    ds: rd.Dataset,
    group_col: str,
    order_col: str,
    value_col: str,
    id_col: str,
    n_parts: int | None = None,
) -> rd.Dataset:
    """Per-group running total — ``SUM(cents) OVER (PARTITION BY group
    ORDER BY order_col, id ROWS UNBOUNDED PRECEDING)`` without a global
    sort: group-hash partitions co-locate each window, one vectorized sort
    + ``groupby.cumsum`` per partition. Values are summed in integer cents
    so the cumulative sum is exact and order-independent across reruns.

    Output: (id_col, group_col, cum_cents).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        hv = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy(np.uint64)
        out = df[[group_col, order_col, id_col]].copy()
        out["cents"] = quant.cents_np(df[value_col].to_numpy(np.float64))
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, order_col, id_col], kind="stable")
        out = g[[id_col, group_col]].copy()
        out["cum_cents"] = g.groupby(group_col)["cents"].cumsum().to_numpy(np.int64)
        return out

    return (
        ds.select_columns([group_col, order_col, value_col, id_col])
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
    )


def lag_delta(
    ds: rd.Dataset,
    group_col: str,
    order_col: str,
    value_col: str,
    id_col: str,
    n_parts: int | None = None,
) -> rd.Dataset:
    """Per-group first difference — ``cents - COALESCE(LAG(cents), cents)``
    over (PARTITION BY group ORDER BY order, id): group-hash partitions,
    one vectorized sort + ``groupby.shift`` per partition. The first row
    of each group gets delta 0 (COALESCE with itself) so the output stays
    non-nullable int64 (a nullable LAG would surface as float64 in pandas
    and flip the driver's dtype-sensitive hash).

    Output: (id_col, group_col, delta_cents).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        hv = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy(np.uint64)
        out = df[[group_col, order_col, id_col]].copy()
        out["cents"] = quant.cents_np(df[value_col].to_numpy(np.float64))
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, order_col, id_col], kind="stable")
        prev = g.groupby(group_col)["cents"].shift(1)
        out = g[[id_col, group_col]].copy()
        out["delta_cents"] = (
            g["cents"] - prev.fillna(g["cents"])
        ).to_numpy(np.int64)
        return out

    return (
        ds.select_columns([group_col, order_col, value_col, id_col])
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
    )


def dataset_split(
    ds: rd.Dataset, key_col: str, fractions: dict[str, float]
) -> rd.Dataset:
    """Deterministic train/val/test split: each row gets a split label from
    its key's hash position in [0, 1) against the cumulative fraction
    ranges. A pure per-row function — reproducible, partitioning-
    independent, no shuffle, and SQL-checkable (CASE over hash ranges);
    the standard replacement for RNG splits in a resumable pipeline.

    ``fractions`` preserve insertion order; they must sum to <= 1.0 and
    any remainder falls into the LAST label's range.
    """
    labels = list(fractions)
    cuts = np.cumsum([fractions[k] for k in labels]) * 10000.0
    cuts[-1] = 10000.0  # remainder to the last label

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key_col].to_numpy(np.int64).astype(np.uint64)
        h = ((k * _KNUTH) % _H32 % np.uint64(10000)).astype(np.float64)
        idx = np.searchsorted(cuts, h, side="right")
        out = df.copy()
        out["split"] = np.asarray(labels, object)[np.minimum(idx, len(labels) - 1)]
        return out

    return ds.map_batches(fn, batch_format="pandas")


def grouped_rank(
    ds: rd.Dataset,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    ascending: bool = False,
    n_parts: int | None = None,
) -> rd.Dataset:
    """Window-function analog of ``ROW_NUMBER() OVER (PARTITION BY group
    ORDER BY order_col [DESC], tiebreak)`` without a global sort: hash
    partition on the group (co-locates each window), one vectorized sort +
    cumcount per partition.

    Output: (tiebreak_col, group_col, rank). The tiebreak makes the rank
    total and deterministic even with duplicate order values.
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        hv = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy(np.uint64)
        df = df[[group_col, order_col, tiebreak_col]].copy()
        df["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [group_col, order_col, tiebreak_col],
            ascending=[True, ascending, True],
            kind="stable",
        )
        out = g[[tiebreak_col, group_col]].copy()
        out["rank"] = (g.groupby(group_col).cumcount() + 1).astype(np.int64)
        return out

    return (
        ds.select_columns([group_col, order_col, tiebreak_col])
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
    )


_US_PER_DAY = 86_400_000_000


def cohort_retention(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Weekly cohort retention: users grouped by their FIRST active week
    (Monday-start), counted distinctly at each week offset they return.

    Week indexes are pure integer arithmetic (``(us // day - 4) // 7``) so
    the engine and the SQL oracle can never disagree on a boundary.

    Fully distributed in ONE shuffle and ONE pass over the events (no
    O(users) driver map — VERDICT r2 #3): each batch emits its distinct
    (user, week) pairs (combiner), a user-hash partition co-locates every
    user's weeks, and the partition derives the cohort (min week per user)
    and its (cohort, offset) counts locally — a user lives wholly in one
    partition, so per-partition distinct-user counts sum exactly. Only the
    tiny (cohort, offset, n) partials reach the driver.

    Output: (cohort_week, offset_weeks, n_users).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def week_of(ts: pd.Series) -> np.ndarray:
        us = ts.astype("datetime64[us]").to_numpy().view(np.int64)
        return (us // _US_PER_DAY - 4) // 7

    def user_weeks(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {user_col: df[user_col], "wk": week_of(df[ts_col])}
        ).drop_duplicates()
        hv = pd.util.hash_pandas_object(out[user_col], index=False).to_numpy(np.uint64)
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part_count(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[user_col, "wk"]].drop_duplicates()  # re-batched partials
        cohort = g.groupby(user_col)["wk"].transform("min").to_numpy(np.int64)
        u = pd.DataFrame(
            {
                "cohort_week": cohort,
                "offset_weeks": g["wk"].to_numpy(np.int64) - cohort,
                user_col: g[user_col].to_numpy(),
            }
        ).drop_duplicates()
        c = u.groupby(["cohort_week", "offset_weeks"], as_index=False).size()
        return c.rename(columns={"size": "n_users"})

    parts = (
        events.select_columns([user_col, ts_col])
        .map_batches(user_weeks, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part_count, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["cohort_week", "offset_weeks"], as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["cohort_week", "offset_weeks"]).reset_index(drop=True)


def rolling_sum(
    ds: rd.Dataset,
    group_col: str,
    order_col: str,
    value_col: str,
    id_col: str,
    preceding: int = 3,
    n_parts: int | None = None,
) -> rd.Dataset:
    """Per-group rolling sum over the last ``preceding``+1 rows —
    ``SUM(cents) OVER (PARTITION BY g ORDER BY o, id ROWS BETWEEN p
    PRECEDING AND CURRENT ROW)``. Group-hash partitions; inside each
    partition the window is a cumsum difference (one vectorized pass, any
    window width), reset at group boundaries. Integer cents keep it exact.

    Output: (id_col, group_col, win_cents).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        hv = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy(np.uint64)
        out = df[[group_col, order_col, id_col]].copy()
        out["cents"] = quant.cents_np(df[value_col].to_numpy(np.float64))
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, order_col, id_col], kind="stable")
        c = g["cents"].to_numpy(np.int64)
        grp = g[group_col].to_numpy()
        cum = np.cumsum(c)
        # win[i] = cum[i] - cum[i - p - 1], clamped at each group's start
        n = len(c)
        pos = np.arange(n)
        # index of each group's first row, propagated to every row
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = grp[1:] != grp[:-1]
        start = np.maximum.accumulate(np.where(new, pos, 0))
        lo = np.maximum(pos - preceding, start)  # first row inside the window
        base = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        base[lo == 0] = 0
        out = g[[id_col, group_col]].copy()
        out["win_cents"] = (cum - base).astype(np.int64)
        return out

    return (
        ds.select_columns([group_col, order_col, value_col, id_col])
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
    )


def funnel_counts(
    events: rd.Dataset,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Ordered funnel conversion: how many users performed step k at or
    after their (recursively defined) completion time of step k-1.

    Each user's step events co-locate via the user hash; a partition then
    resolves ALL its users together with one ``np.minimum.at`` segment-min
    per step (k vectorized passes, no per-user Python work): t_k[user] =
    min ts of step-k events with ts >= t_{k-1}[user]. Partition counts sum
    exactly because every user lives in exactly one partition.

    Output: (step_idx, step, n_users).
    """
    if n_parts is None:
        n_parts = default_n_parts()
    steps = list(steps)
    int_max = np.iinfo(np.int64).max

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df[type_col].isin(steps)][[user_col, type_col, ts_col]].copy()
        hv = pd.util.hash_pandas_object(out[user_col], index=False).to_numpy(np.uint64)
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        uid = g[user_col].to_numpy()
        ts = g[ts_col].astype("datetime64[us]").to_numpy().view(np.int64)
        typ = g[type_col].to_numpy(object)
        _uniq, inv = np.unique(uid, return_inverse=True)
        t_prev = np.full(len(_uniq), np.iinfo(np.int64).min, np.int64)
        rows = []
        for i, step in enumerate(steps):
            mask = (typ == step) & (ts >= t_prev[inv])
            t_cur = np.full(len(_uniq), int_max, np.int64)
            np.minimum.at(t_cur, inv[mask], ts[mask])
            rows.append((i + 1, step, int((t_cur < int_max).sum())))
            t_prev = t_cur
        return pd.DataFrame(rows, columns=["step_idx", "step", "n_users"])

    parts = (
        events.select_columns([user_col, type_col, ts_col])
        .map_batches(pack, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["step_idx", "step"], as_index=False)["n_users"].sum()
    out["step_idx"] = out["step_idx"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("step_idx").reset_index(drop=True)


def first_per_key_window(
    ds: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> rd.Dataset:
    """Windowed dedup: keep only the FIRST event per (key, calendar day)
    -> lazy Dataset (id, key, ts). "First" is the lexicographic
    (ts, id) min, so ties at the same timestamp are deterministic.

    This is the collapse step for event feeds that double-fire (retries,
    at-least-once ingestion): one representative per key-day survives.
    The per-batch kernel keeps one row per (key, day) (combiner), then
    one skinny hash-partition combine on the pair key finishes the min —
    full event rows never shuffle and only winners leave each partition.
    """
    from .combine import DEFAULT_N_PARTS

    def best(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                key_col: df[key_col].to_numpy(np.int64),
                ts_col: df[ts_col].to_numpy(),
                "_day": df[ts_col].to_numpy(dtype="datetime64[D]").astype(np.int64),
            }
        )
        out = out.sort_values([ts_col, id_col])
        out = out.drop_duplicates(subset=[key_col, "_day"], keep="first")
        # pkey fused into the combiner (one stage, one conversion)
        h = pd.util.hash_pandas_object(
            out[[key_col, "_day"]], index=False
        ).to_numpy(np.uint64)
        out = out.copy()
        out["pkey"] = (h % np.uint64(DEFAULT_N_PARTS)).astype(np.int64)
        return out

    partials = ds.select_columns([id_col, key_col, ts_col]).map_batches(
        best, batch_format="pandas"
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        g = g.drop_duplicates(subset=[key_col, "_day"], keep="first")
        return g[[id_col, key_col, ts_col]]

    return partials.groupby("pkey").map_groups(finish, batch_format="pandas")


def grouped_hash_sample(
    ds: rd.Dataset, group_col: str, key_col: str, k: int = 10
) -> rd.Dataset:
    """Deterministic uniform k-sample per group: within each group keep
    the ``k`` rows with the smallest Knuth hash of ``key_col`` -> lazy
    Dataset (group, key, rk).

    The per-group version of the reference's 10k-row sampling cap
    (reference: core/orchestrator.py sample collection): reproducible
    (pure function of the keys, no RNG state), SQL-checkable, and
    combiner-bounded — each block survives at most k rows per group, so
    the shuffle carries O(k x groups) rows. Hash ties (h collisions)
    break by key asc, mirroring ``ORDER BY hash, key``.
    """

    n_parts = default_n_parts()

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        key = df[key_col].to_numpy(np.int64).astype(np.uint64)
        out = pd.DataFrame(
            {
                group_col: df[group_col].to_numpy(),
                key_col: df[key_col].to_numpy(np.int64),
                "hkey": ((key * _KNUTH) % _H32).astype(np.int64),
            }
        )
        out = out.sort_values(["hkey", key_col])
        out = out.groupby(group_col, sort=False).head(k)
        # pkey fused into the combiner: one fewer conversion stage, and the
        # partition count is cluster-derived (was a stray fixed 64)
        h = pd.util.hash_pandas_object(out[group_col], index=False).to_numpy(np.uint64)
        out = out.copy()
        out["pkey"] = (h % np.uint64(n_parts)).astype(np.int64)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hkey", key_col])
        g = g.groupby(group_col, sort=False).head(k).copy()
        g["rk"] = g.groupby(group_col, sort=False).cumcount().to_numpy(np.int64) + 1
        return g[[group_col, key_col, "rk"]]

    return (
        ds.select_columns([group_col, key_col])
        .map_batches(block_top, batch_format="pandas")
        .groupby("pkey")
        .map_groups(finish, batch_format="pandas")
    )


def event_paths(
    events: rd.Dataset, max_events: int = 50, n_parts: int | None = None
) -> rd.Dataset:
    """Per-user ordered event-type path (``a>b>c``), the journey-mining
    primitive behind funnel discovery / markov-chain attribution.

    Hash-partitioned by user; each partition sorts once by
    (user, ts, event_id — a total order, so ties are deterministic) and
    builds every path with ONE pandas groupby-join (the join is per user,
    but it only concatenates the user's own, ``max_events``-capped
    tokens — the output string is the work product, not overhead).
    ``max_events`` bounds the path length so one hyperactive user cannot
    produce an unbounded row (skew guard; count is still exact).

    -> lazy Dataset (user_id, n_events, path), O(users) rows.
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((uid % n_parts).astype(np.int64)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "path": pd.Series([], dtype=object),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        counts = g.groupby("user_id", sort=True)["event_type"].size()
        capped = g.groupby("user_id", sort=True, as_index=False).head(max_events)
        paths = capped.groupby("user_id", sort=True)["event_type"].agg(">".join)
        return pd.DataFrame(
            {
                "user_id": counts.index.to_numpy(np.int64),
                "n_events": counts.to_numpy(np.int64),
                "path": paths.to_numpy(object),
            }
        )

    return (
        events.select_columns(["user_id", "ts", "event_type", "event_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def event_transitions(events: rd.Dataset, n_parts: int | None = None) -> pd.DataFrame:
    """First-order Markov transition counts between consecutive event
    types per user — the matrix behind journey attribution / next-event
    prediction baselines.

    Same partitioning as :func:`event_paths` (a user lives wholly in one
    user-hash partition): each partition sorts once by (user, ts,
    event_id), shifts the type column, masks the first row of every user,
    and counts (from, to) pairs vectorized. Partitions emit O(|types|²)
    partials that sum on the driver — the output is a transition matrix,
    aggregate-sized by construction.

    Output: (from_type, to_type, n), int64-exact.
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((uid % n_parts).astype(np.int64)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "from_type": pd.Series([], dtype=object),
                    "to_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(object)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        pairs = pd.DataFrame(
            {"from_type": np.roll(et, 1)[same], "to_type": et[same]}
        )
        out = pairs.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": np.int64})

    parts = (
        events.select_columns(["user_id", "ts", "event_type", "event_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return parts
    out = parts.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


def inter_event_gaps(events: rd.Dataset, n_parts: int | None = None) -> rd.Dataset:
    """Seconds between consecutive SAME-TYPE events of the SAME user ->
    lazy Dataset (event_type, gap_s) — the raw material for cadence
    profiling (feed :func:`rayquality.ops.sketch.grouped_quantiles` for
    per-type median/p90 gaps).

    User-hash partitions sort once by (user, type, ts, event_id) and diff
    consecutive rows that share (user, type) — exactly SQL's ``LAG(ts)
    OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)``.
    Gaps quantize to whole seconds (floor), which both keeps the
    downstream value-counts quantile contract bounded and is exact
    integer arithmetic on both engine and oracle sides. Null event types
    are excluded (the resample/freshness convention).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t["event_type"]))
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((uid % n_parts).astype(np.int64)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "gap_s": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(object)
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        gap_us = ts - np.roll(ts, 1)
        return pd.DataFrame(
            {"event_type": et[same], "gap_s": gap_us[same] // 1_000_000}
        )

    return (
        events.select_columns(["user_id", "ts", "event_type", "event_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def grouped_mode(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    n_parts: int | None = None,
) -> rd.Dataset:
    """Most frequent ``val_col`` per ``key_col`` (the per-key argmax /
    MODE() primitive) with deterministic ties: count desc, value asc.

    ONE shuffle with a map-side combiner: every batch pre-counts its
    (key, value) pairs (the only rows that travel), partitions hash on the
    KEY alone so a key's partials co-locate, and each partition does a
    vectorized sum + sort + ``drop_duplicates(key)`` argmax. Output is
    O(distinct keys) rows: (key, val, cnt).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            t.select([key_col, val_col])
            .group_by([key_col, val_col])
            .aggregate([([], "count_all")])
        )
        df = g.to_pandas().rename(columns={"count_all": "cnt"})
        hv = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy(np.uint64)
        df["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=np.int64),
                    val_col: pd.Series([], dtype=object),
                    "cnt": pd.Series([], dtype=np.int64),
                }
            )
        c = g.groupby([key_col, val_col], as_index=False)["cnt"].sum()
        c = c.sort_values([key_col, "cnt", val_col], ascending=[True, False, True])
        top = c.drop_duplicates(key_col)
        return top.reset_index(drop=True)

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
    )


def out_of_order_stats(
    events: rd.Dataset,
    group_col: str = "user_id",
    arrival_col: str = "event_id",
    ts_col: str = "ts",
    n_parts: int | None = None,
) -> rd.Dataset:
    """Late-data accounting per key — the watermark-sizing question of a
    streaming ingest: in arrival order (``arrival_col``), how many events
    carry a timestamp EARLIER than one already seen, and how far behind
    the running max do they lag at worst?

    -> lazy Dataset (key, n_events, n_late, max_lateness_us). Group-hash
    partition, ONE vectorized sort + ``np.maximum.accumulate`` per
    partition; output is O(keys).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        hv = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy(np.uint64)
        out = df[[group_col, arrival_col, ts_col]].copy()
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    group_col: pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "n_late": pd.Series([], dtype=np.int64),
                    "max_lateness_us": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([group_col, arrival_col], kind="stable").copy()
        ts = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        keys = g[group_col].to_numpy()
        g["_ts"] = ts
        gb = g.groupby(group_col, sort=False)["_ts"]
        # running max of everything seen BEFORE each event, per key
        # (grouped cummax then shift; first event of a key is never late)
        prevmax = gb.cummax().groupby(keys, sort=False).shift(1).to_numpy()
        valid = ~np.isnan(prevmax)
        late = np.zeros(len(ts), dtype=bool)
        late[valid] = ts[valid] < prevmax[valid]
        lateness = np.zeros(len(ts), np.int64)
        lateness[late] = (prevmax[late] - ts[late]).astype(np.int64)
        out = pd.DataFrame(
            {group_col: keys, "late": late.astype(np.int64), "lateness": lateness}
        )
        agg = out.groupby(group_col, as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"), max_lateness_us=("lateness", "max")
        )
        for c in ("n_events", "n_late", "max_lateness_us"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    return (
        events.select_columns([group_col, arrival_col, ts_col])
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
    )


def debounce_events(
    events: rd.Dataset,
    min_gap_us: int,
    group_cols: tuple[str, str] = ("user_id", "event_type"),
    order_col: str = "ts",
    id_col: str = "event_id",
    n_parts: int | None = None,
) -> rd.Dataset:
    """Near-duplicate event suppression (debounce): an event is kept iff
    it arrives at least ``min_gap_us`` microseconds after the PREVIOUS
    event of the same (user, type) in (ts, id) order — LAG semantics
    (gap measured to the previous row, kept or not), i.e.
    ``prev IS NULL OR ts - LAG(ts) >= gap``, so the decision is a pure
    per-row window function, deterministic and SQL-checkable (a
    relative-to-last-KEPT chain would be iterative and order-fragile).
    The first event of each (user, type) is always kept.

    Group-hash partitions move only (ids, group keys, int64 ts) — the
    event payload (props) never shuffles; callers semi-join kept ids back
    if they need full rows. One vectorized sort + ``groupby.shift`` per
    partition.

    Output: lazy (id_col, kept:bool).
    """
    if n_parts is None:
        n_parts = default_n_parts()
    g1, g2 = group_cols

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        hv = pd.util.hash_pandas_object(
            df[g1].astype(str) + "\x1f" + df[g2].astype(str), index=False
        ).to_numpy(np.uint64)
        out = df[[id_col, g1, g2]].copy()
        out["ts_us"] = df[order_col].to_numpy("datetime64[us]").astype(np.int64)
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([g1, g2, "ts_us", id_col], kind="stable")
        prev = g.groupby([g1, g2])["ts_us"].shift(1)
        gap_ok = (g["ts_us"] - prev) >= min_gap_us
        kept = prev.isna() | gap_ok
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(), "kept": kept.to_numpy(bool)}
        )

    return (
        events.select_columns([id_col, g1, g2, order_col])
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
    )
