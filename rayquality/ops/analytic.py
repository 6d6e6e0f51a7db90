"""Analytic operators: ROLLUP aggregates, per-group mode, gaps-and-islands,
latest-record-per-key, exact Pearson correlation, and global NTILE
bucketing.

These extend the reference's summary layer (aggregate counts in
``src/data_quality/validators/duplicates.py`` and the report summaries in
``core/report_manager.py``) with the standard profiling/curation analytics
a large-scale pipeline runs next: multi-level subtotals, dominant-category
detection, activity-streak profiling, dedup-to-latest, cross-column
correlation, and quantile bucketing for stratified splits. Every op is a
per-batch combiner followed by one skinny hash-partition combine — the
shuffle carries aggregates, never data rows (NTILE's assignment pass is
the one full-data map, and it is a stateless broadcast-compare) — and
every output column is integer/string-exact so the dtype-strict hash gate
can verify it against DuckDB.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from . import combine as _combine
from . import quant

from rayquality.pool import default_n_parts


def rollup_revenue(orders: rd.Dataset) -> pd.DataFrame:
    """ROLLUP(year, status) revenue subtotals -> DataFrame
    (yr, status, lvl, n, sum_cents), lvl 0=finest 1=per-year 2=grand.

    The distributed work is ONE finest-level combiner pass (per-batch
    groupby -> skinny combine, one row per (year,status) per block); the
    coarser rollup levels are derived on the driver from that tiny finest
    table (|years| x |statuses| rows), never from a second scan. Rolled-up
    key slots use sentinels (-1 / 'ALL') instead of NULL so the column
    dtypes stay int64/string on both engines.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "yr": df["o_orderdate"].dt.year.to_numpy(np.int64),
                "status": df["o_orderstatus"].to_numpy(),
                "cents": quant.cents_np(df["o_totalprice"].to_numpy(np.float64)),
            }
        )
        out = g.groupby(["yr", "status"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    finest = (
        _combine.combine_partials(
            orders.select_columns(
                ["o_orderdate", "o_orderstatus", "o_totalprice"]
            ).map_batches(partial, batch_format="pandas"),
            keys=["yr", "status"],
            sums=["n", "sum_cents"],
        )
        .to_pandas()
        .sort_values(["yr", "status"])
        .reset_index(drop=True)
    )
    finest["lvl"] = np.int64(0)
    per_year = finest.groupby("yr", as_index=False)[["n", "sum_cents"]].sum()
    per_year["status"] = "ALL"
    per_year["lvl"] = np.int64(1)
    grand = pd.DataFrame(
        {
            "yr": [np.int64(-1)],
            "status": ["ALL"],
            "lvl": [np.int64(2)],
            "n": [finest["n"].sum()],
            "sum_cents": [finest["sum_cents"].sum()],
        }
    )
    cols = ["yr", "status", "lvl", "n", "sum_cents"]
    out = pd.concat([finest[cols], per_year[cols], grand[cols]], ignore_index=True)
    for c in ("yr", "lvl", "n", "sum_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["lvl", "yr", "status"]).reset_index(drop=True)


def mode_per_group(ds: rd.Dataset, group_col: str, value_col: str) -> pd.DataFrame:
    """Most frequent ``value_col`` per ``group_col`` -> DataFrame
    (group, mode_value, n); ties broken to the smallest value so the
    result is deterministic and SQL-reproducible.

    Per-batch (group, value) counts are the combiner; the combine shuffle
    carries one row per distinct pair per block, and the argmax runs
    distributed per group (``groupby(group).map_groups``), so no
    value-frequency table ever lands whole on the driver.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, value_col], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return g

    pairs = _combine.combine_partials(
        ds.select_columns([group_col, value_col]).map_batches(
            partial, batch_format="pandas"
        ),
        keys=[group_col, value_col],
        sums=["n"],
    )

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", value_col], ascending=[False, True])
        top = g.iloc[:1]
        return pd.DataFrame(
            {
                group_col: top[group_col].to_numpy(),
                "mode_value": top[value_col].to_numpy(),
                "n": top["n"].to_numpy(np.int64),
            }
        )

    out = pairs.groupby(group_col).map_groups(argmax, batch_format="pandas").to_pandas()
    return out.sort_values(group_col).reset_index(drop=True)


def gaps_islands(
    ds: rd.Dataset, key_col: str = "user_id", ts_col: str = "ts"
) -> pd.DataFrame:
    """Consecutive-day activity streaks per key -> DataFrame
    (key, n_days, n_islands, max_island).

    An "island" is a maximal run of consecutive calendar days with >=1
    event. Per-batch distinct (key, day) pairs are the combiner (events
    collapse to at most one row per key-day per block), the combine
    shuffle moves only those skinny pairs, and the island walk runs
    per-key inside ``groupby(key).map_groups`` on integer day ordinals —
    sort, diff, count breaks — never on the driver.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        days = df[ts_col].to_numpy(dtype="datetime64[D]").astype(np.int64)
        g = pd.DataFrame({key_col: df[key_col].to_numpy(), "day": days})
        g = g.drop_duplicates()
        g["one"] = np.int64(1)
        return g

    pairs = _combine.combine_partials(
        ds.select_columns([key_col, ts_col]).map_batches(partial, batch_format="pandas"),
        keys=[key_col, "day"],
        sums=["one"],
    )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, grp in g.groupby(key_col):
            days = np.sort(grp["day"].to_numpy(np.int64))
            breaks = np.nonzero(np.diff(days) > 1)[0]
            starts = np.concatenate([[0], breaks + 1])
            ends = np.concatenate([breaks, [len(days) - 1]])
            lengths = ends - starts + 1
            out.append((key, len(days), len(lengths), int(lengths.max())))
        return pd.DataFrame(
            out, columns=[key_col, "n_days", "n_islands", "max_island"]
        ).astype({c: np.int64 for c in ("n_days", "n_islands", "max_island")})

    res = pairs.groupby(key_col).map_groups(walk, batch_format="pandas").to_pandas()
    return res.sort_values(key_col).reset_index(drop=True)


def latest_per_key(
    ds: rd.Dataset,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    id_col: str = "o_orderkey",
) -> pd.DataFrame:
    """Latest record per key -> DataFrame (key, last_ts, last_id), the
    lexicographic (ts, id) max so ties on the timestamp are deterministic.

    This is the "keep newest" dedup step of a CDC/snapshot feed. Per-batch
    argmax is the combiner (one row per key per block survives), then one
    skinny hash-partition combine finishes the lexicographic max per key
    — full rows never shuffle, and nothing materializes driver-side until
    the one-row-per-key result.
    """

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], ascending=False)
        top = df.drop_duplicates(subset=[key_col], keep="first")
        return pd.DataFrame(
            {
                key_col: top[key_col].to_numpy(),
                "last_ts": top[ts_col].to_numpy(),
                "last_id": top[id_col].to_numpy(np.int64),
            }
        )

    partials = ds.select_columns([key_col, ts_col, id_col]).map_batches(
        best, batch_format="pandas"
    )

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(_combine.DEFAULT_N_PARTS)).astype(np.int64)
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["last_ts", "last_id"], ascending=False)
        g = g.drop_duplicates(subset=[key_col], keep="first")
        return g[[key_col, "last_ts", "last_id"]]

    out = (
        partials.map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col).reset_index(drop=True)


def corr_exact(
    ds: rd.Dataset, x_col: str, y_col: str, unit: float = 100.0
) -> pd.DataFrame:
    """Exact Pearson correlation between two money columns -> one-row
    DataFrame (n, sum_x_cents, sum_y_cents, corr_micro).

    Both columns quantize to integer cents first; per-batch partials carry
    the six moment sums (n, Sx, Sy, Sxx, Syy, Sxy) EXACTLY at any
    magnitude: products accumulate in int64 over chunks sized so no
    partial can overflow (falling back to object-int math only when a
    single product exceeds int64), and the sums travel as decimal strings
    so the partial schema itself can't overflow. The driver finishes the
    reduction in Python ints (arbitrary precision). The final correlation
    is computed as
    ``(n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))`` with
    each integer cast to IEEE double exactly once — the oracle evaluates
    the SAME expression over HUGEINT sums, so the doubles are
    bit-identical and the micro-quantized hash matches. Rows where either
    column is null are excluded on both sides.
    """

    def _exact_prod_sum(a: np.ndarray, b: np.ndarray) -> int:
        """sum(a*b) exactly: vectorized int64 chunks, object-int fallback."""
        if not len(a):
            return 0
        ma = int(np.abs(a).max())
        mb = int(np.abs(b).max())
        if ma * mb >= 1 << 62:  # a single product could overflow int64
            return int((a.astype(object) * b.astype(object)).sum())
        prod = a * b
        chunk = max(1, (1 << 62) // max(1, ma * mb))
        if chunk >= len(prod):
            return int(prod.sum())
        return sum(
            int(prod[i : i + chunk].sum()) for i in range(0, len(prod), chunk)
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[x_col].notna().to_numpy() & df[y_col].notna().to_numpy()
        x = quant.quantize_i64(df[x_col].to_numpy(np.float64)[m], unit)
        y = quant.quantize_i64(df[y_col].to_numpy(np.float64)[m], unit)
        ones = np.ones(len(x), np.int64)
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))],
                "sx": [str(_exact_prod_sum(x, ones))],
                "sy": [str(_exact_prod_sum(y, ones))],
                "sxx": [str(_exact_prod_sum(x, x))],
                "syy": [str(_exact_prod_sum(y, y))],
                "sxy": [str(_exact_prod_sum(x, y))],
            }
        )

    parts = (
        ds.select_columns([x_col, y_col])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    sx, sy, sxx, syy, sxy = (
        sum(int(v) for v in parts[c]) for c in ("sx", "sy", "sxx", "syy", "sxy")
    )
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    corr = num / den if den else 0.0
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "sum_x_cents": [np.int64(sx)],
            "sum_y_cents": [np.int64(sy)],
            "corr_micro": [quant.quantize_i64(np.array([corr]), 1e6)[0]],
        }
    )


def ntile_boundaries(
    ds: rd.Dataset,
    value_col: str,
    key_col: str,
    n_buckets: int,
    unit: float = 100.0,
) -> tuple[np.ndarray, np.ndarray]:
    """The boundary (cents, key) pairs of a global NTILE(n) over
    ``ORDER BY cents(value), key`` -> (bc, bk) arrays of length n-1.
    Shared by :func:`ntile_bucketize` and :func:`rfm_segmentation`; see
    the former for the three-pass contract."""
    import pyarrow.compute as pc

    def counts_partial(t: pa.Table) -> pa.Table:
        c = quant.cents_pa(t[value_col].combine_chunks(), unit)
        vc = pc.value_counts(pc.drop_null(c))
        return pa.table(
            {"cents": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    counts = (
        _combine.combine_partials(
            ds.select_columns([value_col]).map_batches(
                counts_partial, batch_format="pyarrow"
            ),
            keys=["cents"],
            sums=["cnt"],
        )
        .to_pandas()
        .sort_values("cents")
        .reset_index(drop=True)
    )
    cum = counts["cnt"].cumsum().to_numpy(np.int64)
    total = int(cum[-1]) if len(cum) else 0
    base, rem = divmod(total, n_buckets)
    # boundary ranks: last row (1-based) of buckets 1..n-1
    bounds: list[int] = []
    r = 0
    for b in range(1, n_buckets):
        r += base + (1 if b <= rem else 0)
        bounds.append(r)

    vals = counts["cents"].to_numpy(np.int64)
    need_keys: dict[int, list[int]] = {}  # cents value -> boundary ranks inside it
    for r in bounds:
        pos = int(np.searchsorted(cum, r, side="left"))
        v = int(vals[pos])
        before = int(cum[pos - 1]) if pos else 0
        if r != int(cum[pos]):
            need_keys.setdefault(v, []).append(r - before)  # k-th smallest key at v
    if need_keys:
        split_vals = np.array(sorted(need_keys), np.int64)

        def fetch_keys(t: pa.Table) -> pa.Table:
            c = quant.cents_pa(t[value_col].combine_chunks(), unit)
            mask = pc.is_in(c, value_set=pa.array(split_vals, pa.int64()))
            kept = t.filter(mask)
            return pa.table(
                {
                    "cents": pc.cast(quant.cents_pa(kept[value_col].combine_chunks(), unit), pa.int64()),
                    "key": pc.cast(kept[key_col].combine_chunks(), pa.int64()),
                }
            )

        keys_at = (
            ds.select_columns([value_col, key_col])
            .map_batches(fetch_keys, batch_format="pyarrow")
            .to_pandas()
        )
        key_threshold: dict[tuple[int, int], int] = {}
        for v, grp in keys_at.groupby("cents"):
            ks = np.sort(grp["key"].to_numpy(np.int64))
            for kth in need_keys[int(v)]:
                key_threshold[(int(v), kth)] = int(ks[kth - 1])
    # materialize the boundary (cents, key) pairs in rank order
    final_bounds: list[tuple[int, int]] = []
    for r in bounds:
        pos = int(np.searchsorted(cum, r, side="left"))
        v = int(vals[pos])
        before = int(cum[pos - 1]) if pos else 0
        if r == int(cum[pos]):
            final_bounds.append((v, np.iinfo(np.int64).max))
        else:
            final_bounds.append((v, key_threshold[(v, r - before)]))
    bc = np.array([p[0] for p in final_bounds], np.int64)
    bk = np.array([p[1] for p in final_bounds], np.int64)
    return bc, bk


def _ntile_assign(
    cents: np.ndarray, keys: np.ndarray, bc: np.ndarray, bk: np.ndarray
) -> np.ndarray:
    """Bucket per row from the boundary pairs: <= n-1 vectorized compares."""
    bucket = np.ones(len(cents), np.int64)
    for i in range(len(bc)):
        past = (cents > bc[i]) | ((cents == bc[i]) & (keys > bk[i]))
        bucket += past.astype(np.int64)
    return bucket


def ntile_bucketize(
    ds: rd.Dataset,
    value_col: str,
    key_col: str,
    n_buckets: int,
    unit: float = 100.0,
) -> rd.Dataset:
    """Global NTILE(n) over (value, key) -> lazy Dataset (key, bucket),
    exactly matching SQL ``NTILE(n) OVER (ORDER BY cents(value), key)``.

    Quantile bucketing for stratified splits / difficulty tiers. Three
    passes, none of which shuffles data rows:

    1. distributed value counts of the quantized value (same combiner +
       bounded-cardinality contract as :func:`sketch.exact_quantiles`);
       the driver walks cumulative counts to place the n-1 boundary RANKS
       (NTILE: the first N%n buckets get one extra row).
    2. only when a boundary rank lands strictly inside a tie run does a
       second pruned pass fetch the keys AT that value (a filter-read of
       one value per split boundary) to pick the exact key threshold.
    3. a stateless broadcast-compare map assigns each row its bucket from
       the <=n-1 (cents, key) boundary pairs riding the task closure.
    """
    bc, bk = ntile_boundaries(ds, value_col, key_col, n_buckets, unit)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = quant.quantize_i64(df[value_col].to_numpy(np.float64), unit)
        k = df[key_col].to_numpy(np.int64)
        return pd.DataFrame({key_col: k, "bucket": _ntile_assign(c, k, bc, bk)})

    return ds.select_columns([value_col, key_col]).map_batches(
        assign, batch_format="pandas"
    )


def rfm_segmentation(orders: rd.Dataset, n_buckets: int = 5) -> rd.Dataset:
    """RFM customer segmentation -> lazy Dataset (c_custkey, recency_days,
    frequency, monetary_cents, r_bucket, f_bucket, m_bucket), each bucket
    an exact ``NTILE(n) OVER (ORDER BY metric, c_custkey)``.

    One combiner pass builds the per-customer (last order, count, sum
    cents) table — the only O(customers) state, kept distributed and
    materialized once because four consumers read it (three boundary
    scans + the assign). Each NTILE reuses :func:`ntile_boundaries`
    (value-count combine, no row shuffle) and ONE stateless map assigns
    all three buckets — no joins anywhere.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "c_custkey": t["o_custkey"],
                    "last_order": t["o_orderdate"],
                    "monetary_cents": quant.cents_pa(t["o_totalprice"].combine_chunks()),
                    "frequency": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by("c_custkey")
            .aggregate([("last_order", "max"), ("monetary_cents", "sum"), ("frequency", "sum")])
        )
        return g.rename_columns(["c_custkey", "last_order", "monetary_cents", "frequency"])

    per_cust = _combine.combine_partials(
        orders.select_columns(["o_custkey", "o_orderdate", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=["c_custkey"],
        sums=["monetary_cents", "frequency"],
        maxs=["last_order"],
    ).materialize()

    ref_parts = per_cust.map_batches(
        lambda t: pa.table({"m": [pc.max(t["last_order"]).as_py()]}),
        batch_format="pyarrow",
    ).to_pandas()
    ref = None if "m" not in ref_parts.columns else ref_parts["m"].max()
    if ref is None or pd.isna(ref):
        # Empty orders: skip the recency/ntile passes (pc.max returned null)
        # and return the explicit typed empty schema.
        empty = pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "recency_days": pa.array([], pa.int64()),
                "frequency": pa.array([], pa.int64()),
                "monetary_cents": pa.array([], pa.int64()),
                "r_bucket": pa.array([], pa.int64()),
                "f_bucket": pa.array([], pa.int64()),
                "m_bucket": pa.array([], pa.int64()),
            }
        )
        return rd.from_arrow(empty)

    def add_recency(t: pa.Table) -> pa.Table:
        last = t["last_order"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        days = ((np.datetime64(ref, "us") - last) // np.timedelta64(1, "D")).astype(
            np.int64
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "recency_days": pa.array(days),
                "frequency": t["frequency"],
                "monetary_cents": t["monetary_cents"],
            }
        )

    derived = per_cust.map_batches(add_recency, batch_format="pyarrow").materialize()
    bounds = {
        m: ntile_boundaries(derived, m, "c_custkey", n_buckets, unit=1.0)
        for m in ("recency_days", "frequency", "monetary_cents")
    }

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(np.int64)
        out = df[["c_custkey", "recency_days", "frequency", "monetary_cents"]].copy()
        for m, short in (
            ("recency_days", "r_bucket"),
            ("frequency", "f_bucket"),
            ("monetary_cents", "m_bucket"),
        ):
            bc, bk = bounds[m]
            out[short] = _ntile_assign(df[m].to_numpy(np.int64), k, bc, bk)
        return out

    return derived.map_batches(assign, batch_format="pandas")


def grouped_topk(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> rd.Dataset:
    """Top-``k`` records per group by (value desc, id asc) -> lazy Dataset
    (group, id, value_cents, rk) matching
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY value DESC, id) <= k``.

    The per-group generalization of the reference's top-issues ordering
    (reference: src/data_quality/reports/generator.py top-N sections).
    Per-batch per-group top-k is the combiner — at most k rows per group
    survive each block, so the shuffle carries O(k x groups) rows, never
    the table — then one hash-partition pass finishes the exact top-k and
    assigns ranks. Values quantize to integer cents (shared half-up rule)
    so the oracle gate compares exactly.
    """

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                group_col: df[group_col].to_numpy(),
                id_col: df[id_col].to_numpy(np.int64),
                "value_cents": quant.quantize_i64(
                    df[value_col].to_numpy(np.float64), 100.0
                ),
            }
        )
        df = df.sort_values(
            ["value_cents", id_col], ascending=[False, True]
        )
        df = df.groupby(group_col, sort=False).head(k)
        # pkey fused into the combiner (one fewer stage/conversion)
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(_combine.DEFAULT_N_PARTS)).astype(np.int64)
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value_cents", id_col], ascending=[False, True])
        g = g.groupby(group_col, sort=False).head(k).copy()
        g["rk"] = g.groupby(group_col, sort=False).cumcount().to_numpy(np.int64) + 1
        return g[[group_col, id_col, "value_cents", "rk"]]

    return (
        ds.select_columns([group_col, value_col, id_col])
        .map_batches(block_topk, batch_format="pandas")
        .groupby("pkey")
        .map_groups(finish, batch_format="pandas")
    )


def basket_pairs(
    ds: rd.Dataset,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_baskets: int = 1,
) -> pd.DataFrame:
    """Item co-occurrence counts: for every unordered pair of distinct
    ``item_col`` values, the number of ``basket_col`` values containing
    both -> DataFrame (item_a, item_b, n_baskets), item_a < item_b.

    The market-basket / co-engagement profile over an event log. Plan:
    per-batch distinct (basket, item) combiner -> hash-partition by
    basket (every basket's items land together) -> per-partition
    vectorized pair expansion through the shared offset-sweep kernel
    (items factorized to codes; per-basket item sets are small) ->
    per-partition pair-count partials -> one skinny combine. The shuffle
    carries distinct (basket, item) rows and then (pair, cnt) partials —
    never event rows.
    """
    from .. import dedup

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[basket_col, item_col]].drop_duplicates()

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[basket_col], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(_combine.DEFAULT_N_PARTS)).astype(np.int64)
        return df

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # partition-local distinct: the same (basket, item) row may arrive
        # from several blocks' partials
        g = g[[basket_col, item_col]].drop_duplicates()
        codes, uniq = pd.factorize(g[item_col].to_numpy())
        baskets = g[basket_col].to_numpy(np.int64)
        ii, jj = dedup.keyed_pair_indices(baskets, codes.astype(np.int64), 64)
        if not len(ii):
            return pd.DataFrame(
                {"item_a": [], "item_b": [], "n_baskets": np.empty(0, np.int64)}
            )
        a = uniq[codes[ii]]
        b = uniq[codes[jj]]
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        out = (
            pd.DataFrame({"item_a": a, "item_b": b})
            .groupby(["item_a", "item_b"], as_index=False)
            .size()
            .rename(columns={"size": "n_baskets"})
        )
        out["n_baskets"] = out["n_baskets"].astype(np.int64)
        return out

    parts = (
        ds.select_columns([basket_col, item_col])
        .map_batches(distinct_partial, batch_format="pandas")
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(part_pairs, batch_format="pandas")
    )
    out = _combine.combine_partials(
        parts, keys=["item_a", "item_b"], sums=["n_baskets"]
    ).to_pandas()
    out = out[out["n_baskets"] >= min_baskets]
    return out.sort_values(["item_a", "item_b"]).reset_index(drop=True)


def grouped_slope(
    ds: rd.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    y_unit: float = 100.0,
) -> pd.DataFrame:
    """Per-group OLS regression slope (y-units per x, micro-quantized) ->
    DataFrame (group, slope_micro, n) for groups with x-variance > 0.

    The trend profile ("is `value` drifting with hour-of-day per event
    type?"). ``x`` must be integer-valued and small (hour, day index);
    ``y`` quantizes to integer units — then every sufficient statistic
    (n, Sx, Sy, Sxy, Sxx) is an INTEGER sum, combined exactly through the
    shared combiner, and the driver computes
    ``slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)`` with arbitrary-
    precision integer numerators (no int64 overflow at corpus scale)
    before one float division — bit-identical to the oracle's HUGEINT
    arithmetic. No float accumulates anywhere.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[x_col, y_col])
        x = df[x_col].to_numpy(np.int64)
        y = quant.quantize_i64(df[y_col].to_numpy(np.float64), y_unit)
        g = pd.DataFrame(
            {
                group_col: df[group_col].to_numpy(),
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return g.groupby(group_col, as_index=False).sum()

    sums = _combine.combine_partials(
        ds.select_columns([group_col, x_col, y_col]).map_batches(
            partial, batch_format="pandas"
        ),
        keys=[group_col],
        sums=["n", "sx", "sy", "sxy", "sxx"],
    ).to_pandas()
    out = []
    for _, r in sums.iterrows():
        n, sx, sy, sxy, sxx = (int(r[c]) for c in ["n", "sx", "sy", "sxy", "sxx"])
        den = n * sxx - sx * sx
        if den == 0:
            continue
        num = n * sxy - sx * sy
        slope = float(num) / float(den)
        out.append((r[group_col], np.int64(np.floor(slope * 1e6 + 0.5)), np.int64(n)))
    res = pd.DataFrame(out, columns=[group_col, "slope_micro", "n"])
    return res.sort_values(group_col).reset_index(drop=True)


def growth_accounting(
    ds: rd.Dataset, user_col: str = "user_id", ts_col: str = "ts"
) -> pd.DataFrame:
    """New vs cumulative users per day -> DataFrame
    (day, new_users, cum_users): a user is NEW on the day of their first
    event; ``cum_users`` is the running distinct-user count.

    The growth-accounting profile of an event log. Per-batch min-date per
    user (combiner) -> one skinny hash combine finishes the exact first
    day per user -> per-day counts (second combiner over one-row-per-user
    partials) -> the driver cumsums the tiny per-day table (days are
    bounded by the calendar, not the corpus). Days serialize as
    'YYYY-MM-DD' strings so the oracle's DATE casts compare exactly.
    """

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(user_col, as_index=False)[ts_col].min()
        return g.rename(columns={ts_col: "d0"})

    firsts = _combine.combine_partials(
        ds.select_columns([user_col, ts_col]).map_batches(
            first_partial, batch_format="pandas"
        ),
        keys=[user_col],
        sums=[],
        mins=["d0"],
    )

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        days = pd.to_datetime(df["d0"]).dt.strftime("%Y-%m-%d")
        g = days.value_counts().rename_axis("day").reset_index(name="new_users")
        g["new_users"] = g["new_users"].astype(np.int64)
        return g

    per_day = _combine.combine_partials(
        firsts.map_batches(day_partial, batch_format="pandas"),
        keys=["day"],
        sums=["new_users"],
    ).to_pandas()
    per_day = per_day.sort_values("day").reset_index(drop=True)
    per_day["cum_users"] = per_day["new_users"].cumsum().astype(np.int64)
    return per_day


def percent_rank_global(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    n_parts: int | None = None,
) -> rd.Dataset:
    """Global percent-rank of a money column without a global sort — the
    rank-normalization feature transform (percent_rank is the first step
    of rank-gaussian scaling) as two streaming passes.

    1. cents-quantized value-counts per batch (combiner) -> one skinny
       hash combine -> the distinct-value histogram lands on the driver.
       Same bounded-cardinality contract as exact_quantiles: the histogram
       is O(distinct cents values), not O(rows) — raise the quantization
       unit if a column is pathologically high-cardinality.
    2. the sorted values + strictly-less cumulative counts broadcast via
       ``ray.put``; each batch ``searchsorted``s its values and emits
       pct = less/(n-1) — exactly DuckDB's PERCENT_RANK arithmetic
       ((rank-1)/(n-1) with rank = 1 + |strictly less|) over exactly the
       same integers, so the micro-quantized result is hash-identical.

    -> lazy Dataset (key, value_cents, pct_micro); O(rows) output streams.
    """
    if n_parts is None:
        n_parts = default_n_parts()
    from . import quant
    from .combine import combine_partials

    def vc_partial(t: pa.Table) -> pd.DataFrame:
        v = quant.quantize_i64(t[value_col].to_numpy(zero_copy_only=False), 100.0)
        vc = pd.Series(v).value_counts()
        return pd.DataFrame(
            {"v": vc.index.to_numpy(np.int64), "cnt": vc.to_numpy(np.int64)}
        )

    hist = combine_partials(
        ds.select_columns([value_col]).map_batches(vc_partial, batch_format="pyarrow"),
        keys=["v"],
        sums=["cnt"],
        n_parts=n_parts,
    ).to_pandas().sort_values("v")

    values = hist["v"].to_numpy(np.int64)
    cnts = hist["cnt"].to_numpy(np.int64)
    less = np.concatenate([[0], np.cumsum(cnts)[:-1]])  # rows strictly below v
    n_total = int(cnts.sum())
    model_ref = ray.put((values, less, n_total))

    def score(t: pa.Table) -> pa.Table:
        vals, lt, n = ray.get(model_ref)
        v = quant.quantize_i64(t[value_col].to_numpy(zero_copy_only=False), 100.0)
        idx = np.searchsorted(vals, v)
        pct = lt[idx].astype(np.float64) / float(n - 1) if n > 1 else np.zeros(len(v))
        return pa.table(
            {
                key_col: t[key_col],
                "value_cents": pa.array(v),
                "pct_micro": pa.array(np.floor(pct * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return ds.select_columns([key_col, value_col]).map_batches(score, batch_format="pyarrow")


def revenue_concentration(orders: rd.Dataset, top_frac: float = 0.1) -> pd.DataFrame:
    """Pareto concentration: the revenue share of the top ``top_frac``
    customers -> one row (top_customers, total_customers,
    top_revenue_cents, total_revenue_cents, share_micro).

    One combiner pass builds the per-customer revenue table (distributed,
    materialized once — two consumers). Totals are a two-level sum. The
    exact top-k revenue sum needs the k-th largest value: a value-count
    combine over the quantized revenues (same bounded-cardinality contract
    as :func:`ntile_boundaries` / ``sketch.exact_quantiles``) lets the
    driver walk cumulative counts from the top; ties at the threshold
    contribute ``remaining x threshold`` exactly, so the sum is tie-order
    invariant and matches any ROW_NUMBER oracle.
    """
    import math

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "c_custkey": t["o_custkey"],
                    "rev": quant.cents_pa(t["o_totalprice"].combine_chunks()),
                }
            )
            .group_by("c_custkey")
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["c_custkey", "rev"])

    per_cust = _combine.combine_partials(
        orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=["c_custkey"],
        sums=["rev"],
    ).materialize()

    def vc_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["rev"].combine_chunks())
        return pa.table(
            {"rev": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    counts = _combine.combine_partials(
        per_cust.map_batches(vc_partial, batch_format="pyarrow"),
        keys=["rev"],
        sums=["cnt"],
    ).to_pandas()
    # Empty orders yield a zero-column frame (no batches ever flowed), so
    # test before touching the "rev"/"cnt" columns.
    n = 0 if counts.empty else int(counts["cnt"].sum())
    if n == 0:
        # Empty-result trap: emit the explicit typed zero row instead of
        # letting pos=0 index an empty counts frame below.
        return pd.DataFrame(
            {
                "top_customers": [np.int64(0)],
                "total_customers": [np.int64(0)],
                "top_revenue_cents": [np.int64(0)],
                "total_revenue_cents": [np.int64(0)],
                "share_micro": [np.int64(0)],
            }
        )
    counts = counts.sort_values("rev", ascending=False).reset_index(drop=True)
    total = int((counts["rev"].to_numpy(np.int64) * counts["cnt"].to_numpy(np.int64)).sum())
    k = int(math.ceil(top_frac * n))
    cum = counts["cnt"].cumsum().to_numpy(np.int64)
    pos = int(np.searchsorted(cum, k, side="left"))
    before = int(cum[pos - 1]) if pos else 0
    full = int(
        (
            counts["rev"].to_numpy(np.int64)[:pos] * counts["cnt"].to_numpy(np.int64)[:pos]
        ).sum()
    )
    top_rev = full + (k - before) * int(counts["rev"].iat[pos])
    share = int(np.floor(1_000_000.0 * top_rev / total + 0.5)) if total else 0
    return pd.DataFrame(
        {
            "top_customers": [np.int64(k)],
            "total_customers": [np.int64(n)],
            "top_revenue_cents": [np.int64(top_rev)],
            "total_revenue_cents": [np.int64(total)],
            "share_micro": [np.int64(share)],
        }
    )
