"""Relational operators: grouped aggregates, windowed event rollups,
broadcast-join top-k — the wide-operation patterns of SURVEY.md §2.5/§2.6.

All money aggregates are integer cents (exact, order-independent) so Ray's
block-order-dependent double summation can never diverge from the DuckDB
oracle (see rayquality.ops docstring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from rayquality.pool import default_n_parts


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    from .quant import cents_pa

    return cents_pa(col)


def q1_pricing_summary(lineitem: rd.Dataset, cutoff: str = "1998-09-02") -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary: pre-aggregated per batch, then a
    tiny groupby over the partials (pre-agg pattern — SURVEY.md §4.2)."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64(cutoff, "us"))))
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "sum_qty": pa.array([], pa.int64()),
                    "sum_base_cents": pa.array([], pa.int64()),
                    "sum_disc_cents": pa.array([], pa.int64()),
                    "count_order": pa.array([], pa.int64()),
                }
            )
        qty = pc.cast(t["l_quantity"], pa.int64())
        base_c = _cents(t["l_extendedprice"])
        disc_pct = _cents(t["l_discount"])
        # cents * (100 - disc%) stays integral; /100 applied at the end
        disc_c = pc.multiply(base_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        g = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "base": base_c,
                "disc": disc_c,
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents", "sum_disc_cents", "count_order"]
        )

    partials = lineitem.select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(partial, batch_format="pyarrow")
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    # sum_disc_cents carried a x100 factor from (100 - disc%); normalize
    out["sum_disc_cents"] = out["sum_disc_cents"] // 100
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents", "sum_disc_cents", "avg_qty", "count_order"]
    ]


def events_hourly(events: rd.Dataset) -> pd.DataFrame:
    """Tumbling-window rollup (streaming-shaped op over the events log):
    hour = floor(ts); per-batch partial groupby, then a small global one."""

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        cents = _cents(t["value"])
        g = pa.table(
            {"user_id": t["user_id"], "hour": hour, "cents": cents}
        ).group_by(["user_id", "hour"]).aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["user_id", "hour", "sum_value_cents", "n_events"])

    from .combine import combine_partials

    out = combine_partials(
        events.select_columns(["user_id", "ts", "value"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=["user_id", "hour"],
        sums=["sum_value_cents", "n_events"],
    ).to_pandas()
    # pin the timestamp unit: DuckDB date_trunc('hour') yields µs precision
    # while Arrow floor_temporal preserves the source unit — a dtype-sensitive
    # value hash (the driver's) treats [s] vs [us] as a mismatch
    out["hour"] = out["hour"].astype("datetime64[us]")
    return out.sort_values(["user_id", "hour"]).reset_index(drop=True)[
        ["user_id", "hour", "n_events", "sum_value_cents"]
    ]


def top_customers_by_revenue(
    orders: rd.Dataset, customer: rd.Dataset, limit: int = 10
) -> pd.DataFrame:
    """Broadcast hash join (small side via ray.put) + grouped sum + top-k.

    The reference has no join beyond FK membership; this is the general
    small-side join pattern the guide mandates instead of a shuffle join.
    """
    cust = customer.select_columns(["c_custkey", "c_name"]).to_pandas()
    name_map_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"c_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
        ).group_by("c_custkey").aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["c_custkey", "revenue_cents", "n_orders"])

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        # block-local top-k before the driver merge: no global sort needed
        return df.sort_values(
            ["revenue_cents", "c_custkey"], ascending=[False, True]
        ).head(limit)

    from .combine import combine_partials

    agg = (
        combine_partials(
            orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            keys=["c_custkey"],
            sums=["revenue_cents", "n_orders"],
        )
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["revenue_cents", "c_custkey"], ascending=[False, True])
        .head(limit)
        .reset_index(drop=True)
    )
    name_map = ray.get(name_map_ref)
    agg["c_name"] = agg["c_custkey"].map(name_map)
    return agg[["c_custkey", "c_name", "revenue_cents", "n_orders"]]


def top_customers_per_segment(
    orders: rd.Dataset, customer: rd.Dataset, k: int = 3
) -> pd.DataFrame:
    """Grouped top-k: the k highest-revenue customers per market segment.

    Broadcast custkey->segment lookup, per-batch partial revenue sums,
    hash-partitioned combine (ops.combine), then block-local top-k per
    segment before a tiny driver merge — no global sort. Deterministic
    ordering (revenue desc, custkey asc).
    """
    seg = customer.select_columns(["c_custkey", "c_mktsegment"]).to_pandas()
    _ck = seg["c_custkey"].to_numpy(np.int64)
    _order = np.argsort(_ck, kind="stable")
    # sorted (key, segment) ndarrays: per-batch lookup is one
    # np.searchsorted, not a per-element PyObject dict hash per order row
    seg_ref = ray.put((_ck[_order], seg["c_mktsegment"].to_numpy(object)[_order]))

    def partial(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(seg_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        pos = np.minimum(np.searchsorted(keys, ck), max(len(keys) - 1, 0))
        # inner-join semantics: orders with an orphan custkey drop out
        ok = (keys[pos] == ck) if len(keys) else np.zeros(len(ck), bool)
        g = pa.table(
            {
                "c_mktsegment": pa.array(vals[pos[ok]], pa.string()),
                "c_custkey": t["o_custkey"].filter(pa.array(ok)),
                "cents": _cents(t["o_totalprice"].filter(pa.array(ok))),
            }
        ).group_by(["c_mktsegment", "c_custkey"]).aggregate([("cents", "sum")])
        return g.rename_columns(["c_mktsegment", "c_custkey", "revenue_cents"])

    from .combine import combine_partials

    combined = combine_partials(
        orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=["c_mktsegment", "c_custkey"],
        sums=["revenue_cents"],
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["c_mktsegment", "revenue_cents", "c_custkey"],
            ascending=[True, False, True],
        )
        return df.groupby("c_mktsegment", as_index=False).head(k)

    out = (
        combined.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(
            ["c_mktsegment", "revenue_cents", "c_custkey"], ascending=[True, False, True]
        )
        .groupby("c_mktsegment", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = (out.groupby("c_mktsegment").cumcount() + 1).astype(np.int64)
    return out[["c_mktsegment", "c_custkey", "revenue_cents", "rank"]]


def revenue_by_segment(
    orders: rd.Dataset, customer: rd.Dataset, num_partitions: int = 8
) -> pd.DataFrame:
    """Distributed hash join (``Dataset.join``, hash-partitioned on the key)
    + grouped aggregate — the both-sides-large join path, in contrast to the
    broadcast join in :func:`top_customers_by_revenue`."""
    j = orders.select_columns(["o_custkey", "o_totalprice"]).join(
        customer.select_columns(["c_custkey", "c_mktsegment"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"c_mktsegment": t["c_mktsegment"], "cents": _cents(t["o_totalprice"])}
        ).group_by("c_mktsegment").aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["c_mktsegment", "revenue_cents", "n_orders"])

    out = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    return out.sort_values("c_mktsegment").reset_index(drop=True)[
        ["c_mktsegment", "revenue_cents", "n_orders"]
    ]


def json_field_sum(
    events: rd.Dataset,
    json_col: str = "props",
    field: str = "k",
    group_col: str = "user_id",
) -> rd.Dataset:
    """Semi-structured extraction + rollup: pull an integer field out of a
    JSON-string column and sum it per group.

    Extraction is ONE vectorized RE2 scan per batch
    (``pc.extract_regex`` — no per-row json.loads), the per-batch partial
    sums make the shuffle carry one row per (group, batch), and the final
    combine is a hash-partitioned skinny groupby. Returns a lazy Dataset
    (one row per group — at corpus scale the group count itself is big, so
    the result stays distributed for downstream write/join).
    Missing/unparsable fields count as 0 toward the sum but are tallied in
    n_missing.

    Contract: the field must be a FLAT TOP-LEVEL INTEGER (the regex does
    not parse nesting, quoted numbers, or floats — on such payloads it
    diverges from a true json_extract; use an actor-pool json.loads stage
    when the payloads need full JSON semantics). For flat integer fields
    the SQL equivalent is CAST(json_extract_string(col,'$.field') AS
    BIGINT).
    """

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            t[json_col], f'"{field}":\\s*(?P<v>-?\\d+)'
        )  # struct<v: string> or null per row
        vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        missing = pc.is_null(vals)
        g = pa.table(
            {
                group_col: t[group_col],
                "sum_k": pc.fill_null(vals, 0),
                "n_missing": pc.cast(missing, pa.int64()),
            }
        ).group_by(group_col).aggregate([("sum_k", "sum"), ("n_missing", "sum")])
        return g.rename_columns([group_col, "sum_k", "n_missing"])

    from .combine import combine_partials

    return combine_partials(
        events.select_columns([group_col, json_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=[group_col],
        sums=["sum_k", "n_missing"],
    )


def value_histogram(
    ds: rd.Dataset, column: str, bin_width: float
) -> pd.DataFrame:
    """Fixed-width histogram: bin = floor(value / width), exact counts.

    Per-batch value-counts combiner (each batch emits one row per occupied
    bin) then a skinny groupby — the shuffled table is O(bins), never
    O(rows). Matches ``GROUP BY FLOOR(value / w)`` bit-for-bit because both
    sides do the same float64 divide-then-floor.
    """

    def partial(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.floor(pc.divide(pc.cast(t[column], pa.float64()), bin_width)),
            pa.int64(),
        )
        vc = pc.value_counts(pc.drop_null(b))
        return pa.table(
            {"bin": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    from .combine import combine_partials

    out = combine_partials(
        ds.select_columns([column]).map_batches(partial, batch_format="pyarrow"),
        keys=["bin"],
        sums=["n"],
    ).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("bin").reset_index(drop=True)


def distinct_per_group(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """COUNT(DISTINCT value) per group without a wide shuffle.

    Two-level combine: each batch dedups its (group, value) pairs (the
    combiner — repeated pairs never leave the block), pairs are
    hash-partitioned on (group, value) so each surviving pair lands exactly
    once per partition after a second dedup, and per-partition group counts
    sum to the exact answer because a (group, value) pair can only be
    counted in its own hash partition. Shuffled volume is O(distinct
    pairs), never O(rows); the final groupby is O(groups x n_parts).
    """
    if n_parts is None:
        n_parts = default_n_parts()

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, value_col]].dropna(subset=[value_col]).drop_duplicates()
        hv = pd.util.hash_pandas_object(out, index=False).to_numpy(np.uint64)
        out = out.copy()
        out["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g[[group_col, value_col]].drop_duplicates()
        c = u.groupby(group_col, as_index=False, dropna=False).size()
        return c.rename(columns={"size": "n_distinct"})

    parts = (
        ds.select_columns([group_col, value_col])
        .map_batches(dedup_pairs, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(group_col, as_index=False, dropna=False)["n_distinct"].sum()
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out.sort_values(group_col).reset_index(drop=True)


def broadcast_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    how: str = "inner",
) -> rd.Dataset:
    """Generic broadcast (map-side) hash join: the small RIGHT side is
    collected once, ``ray.put`` into the object store, and every left batch
    resolves its matches with one vectorized pandas merge — the big side
    never shuffles. ``how`` is 'inner' or 'left'.

    This is the public form of the pattern the bespoke queries use
    (top_customers_by_revenue, integrity); use it when the right side fits
    comfortably in worker memory (dimension tables, lookup maps). For two
    big sides use ``Dataset.join`` (hash shuffle) as in revenue_by_segment.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    small = (
        right.select_columns(list(dict.fromkeys([right_on] + right_cols)))
        .to_pandas()
        .drop_duplicates(subset=[right_on])
    )
    # a LEFT join makes every right column nullable; pre-deciding the
    # float64 upcast for integer right columns keeps ALL blocks on one
    # schema (otherwise a block whose keys all match stays int64 while a
    # block with a miss upcasts, and the Dataset's blocks disagree)
    float_cols = (
        [c for c in small.columns if pd.api.types.is_integer_dtype(small[c])]
        if how == "left"
        else []
    )
    small_ref = ray.put(small)

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(small_ref)
        merged = df.merge(
            s, left_on=left_on, right_on=right_on, how=how, suffixes=("", "__r")
        )
        for c in float_cols:
            cc = c if c in merged.columns and c not in df.columns else c + "__r"
            if cc in merged.columns:
                merged[cc] = merged[cc].astype(np.float64)
        return merged

    return left.map_batches(per_batch, batch_format="pandas")


def pivot_counts(
    ds: rd.Dataset,
    group_col: str,
    pivot_col: str,
    categories: list[str],
    n_parts: int | None = None,
) -> rd.Dataset:
    """Pivot long->wide: one row per group with a count column per
    category (the one-hot/crosstab feature builder for ML tables).

    Categories are EXPLICIT (fixed output schema — at corpus scale you
    never want a schema inferred from a full distinct scan); values outside
    the list land in ``other``. Per-batch crosstab partials combine through
    the hash-partition kernel, so the shuffle carries one row per (group,
    batch) at most. SQL: SUM(CASE WHEN pivot = c THEN 1 ELSE 0 END) per c.
    """
    if n_parts is None:
        n_parts = default_n_parts()
    cats = list(categories)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pv = df[pivot_col].to_numpy(object)
        out = pd.DataFrame({group_col: df[group_col]})
        known = np.zeros(len(df), dtype=bool)
        for c in cats:
            m = pv == c
            out[c] = m.astype(np.int64)
            known |= m
        out["other"] = (~known).astype(np.int64)
        return out.groupby(group_col, as_index=False).sum()

    from .combine import combine_partials

    return combine_partials(
        ds.select_columns([group_col, pivot_col]).map_batches(
            partial, batch_format="pandas"
        ),
        keys=[group_col],
        sums=cats + ["other"],
    )


def broadcast_anti_join(
    left: rd.Dataset, right: rd.Dataset, left_on: str, right_on: str
) -> rd.Dataset:
    """Anti-join with a broadcast key set: keep left rows whose key has NO
    match on the right (``NOT EXISTS``). The right side reduces to its
    distinct keys (``ray.put`` once); every left batch filters with one
    vectorized ``isin`` — nothing shuffles. The complement of the
    membership test inside ``ops.validators.integrity``, exposed as a
    first-class relational operator (e.g. "customers with no orders")."""
    keys = right.select_columns([right_on]).unique(right_on)
    keys_ref = ray.put(np.asarray(keys))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        return df[~df[left_on].isin(ks)]

    return left.map_batches(fn, batch_format="pandas")


def resample_hourly_counts(
    events: rd.Dataset, type_col: str = "event_type", ts_col: str = "ts"
) -> pd.DataFrame:
    """Gap-filled hourly resample: per (event type, hour) event counts
    over the FULL dense hour grid [min hour, max hour] -> DataFrame
    (event_type, hour, n_events), zero rows included.

    Monitoring/trend pipelines need the missing buckets (a silent hour is
    the signal); a plain groupby only emits observed pairs. The
    distributed part is the same combiner + skinny combine as
    :func:`events_hourly` (plus a per-batch min/max hour partial); the
    dense grid is built driver-side from |types| x |hours| — two tiny
    dimensions — and left-joined against the combined counts.
    """

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[type_col]))  # null types stay out of the grid
        hour = pc.floor_temporal(t[ts_col], unit="hour")
        g = (
            pa.table({type_col: t[type_col], "hour": hour})
            .group_by([type_col, "hour"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([type_col, "hour", "n_events"])

    from .combine import combine_partials

    counts = combine_partials(
        events.select_columns([type_col, ts_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=[type_col, "hour"],
        sums=["n_events"],
    ).to_pandas()
    counts["hour"] = counts["hour"].astype("datetime64[us]")

    hours = pd.date_range(
        counts["hour"].min(), counts["hour"].max(), freq="h"
    ).astype("datetime64[us]")
    types = np.sort(counts[type_col].unique())
    grid = pd.MultiIndex.from_product(
        [types, hours], names=[type_col, "hour"]
    ).to_frame(index=False)
    out = grid.merge(counts, on=[type_col, "hour"], how="left")
    out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
    return out.sort_values([type_col, "hour"]).reset_index(drop=True)


def skew_aware_join(
    big: rd.Dataset,
    big_key: str,
    small: rd.Dataset,
    small_key: str,
    small_cols: list[str],
    hot_fraction: float = 0.001,
    sample_batches: int = 8,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Inner join that routes HOT keys around the shuffle -> lazy Dataset
    (big columns + ``small_cols``).

    A hash-shuffle join collapses when a handful of keys own most of the
    probe side (every row of a hot key lands on one partition). This op
    plans per key: it estimates key frequencies from a bounded sample of
    the big side, marks keys above ``hot_fraction`` of sampled rows as
    hot, broadcasts ONLY the hot keys' small-side rows (a dict bounded by
    |hot| — the skew set is small by definition), and maps them in place;
    the cold remainder goes through the ordinary hash-partitioned
    ``Dataset.join``. Exact regardless of the sample: a mis-sampled hot
    key just takes the (correct) shuffle path.
    """
    import pandas as pd

    # --- plan: sampled hot-key estimate (bounded: sample_batches blocks) --
    sample = big.select_columns([big_key]).limit(sample_batches * 4096).to_pandas()
    if big_key in sample.columns and len(sample):
        vc = sample[big_key].value_counts()
        hot_keys = frozenset(vc[vc >= max(2, hot_fraction * len(sample))].index.tolist())
    else:
        hot_keys = frozenset()

    sm = small.select_columns([small_key, *small_cols])
    if hot_keys:
        _hk = ray.put(np.sort(np.asarray(list(hot_keys))))

        def _hot_mask(df: pd.DataFrame) -> pd.DataFrame:
            # vectorized membership against the broadcast sorted key array —
            # not a per-row Python lambda (Dataset.filter(fn) is row-at-a-time)
            return df.loc[np.isin(df[small_key].to_numpy(), ray.get(_hk))]

        hot_rows = sm.map_batches(_hot_mask, batch_format="pandas").to_pandas()
    else:
        hot_rows = pd.DataFrame()
    hot_map = (
        {
            k: tuple(v)
            for k, *v in hot_rows[[small_key, *small_cols]].itertuples(index=False)
        }
        if small_key in hot_rows.columns
        else {}
    )
    # hot keys ABSENT from the small side fall through to the cold join
    # (which drops them) — inner semantics hold without special cases
    col_dtypes = (
        {c: hot_rows[c].dtype for c in small_cols}
        if small_key in hot_rows.columns
        else {}
    )
    hot_ref = ray.put((frozenset(hot_map), hot_map))

    def split_hot(df: pd.DataFrame) -> pd.DataFrame:
        keys, mapping = ray.get(hot_ref)
        m = df[big_key].isin(keys).to_numpy()
        out = df.loc[m].copy()
        for i, c in enumerate(small_cols):
            vals = pd.Series([mapping[k][i] for k in out[big_key]], index=out.index)
            out[c] = vals.astype(col_dtypes[c]) if c in col_dtypes else vals
        return out

    def split_cold(t: pa.Table) -> pa.Table:
        # SQL inner-join semantics: NULL keys never match, so drop them
        # here rather than trusting the join's null handling
        keys, _ = ray.get(hot_ref)
        vals = t[big_key].to_numpy(zero_copy_only=False)
        m = ~pd.Series(vals).isin(keys).to_numpy() & t[big_key].is_valid().to_numpy(
            zero_copy_only=False
        )
        out = t.filter(pa.array(m))
        if out.num_rows:
            return out
        # An all-hot batch filters to EMPTY; a fully-empty cold side
        # arrives column-less at the shuffle aggregator and Acero dies on
        # the missing key field. Emit ONE all-null sentinel row instead —
        # the null key never matches, so the inner join drops it.
        return pa.Table.from_arrays(
            [pa.nulls(1, f.type) for f in t.schema], schema=t.schema
        )

    hot_joined = big.map_batches(split_hot, batch_format="pandas")
    cold = big.map_batches(split_cold, batch_format="pyarrow")
    sm_cold = sm.map_batches(
        lambda t: t.filter(t[small_key].is_valid()), batch_format="pyarrow"
    )
    cold_joined = cold.join(
        sm_cold,
        join_type="inner",
        num_partitions=num_partitions,
        on=(big_key,),
        right_on=(small_key,),
    )
    if small_key != big_key:
        cold_joined = cold_joined.drop_columns([small_key])
    out_cols = [c for c in big.schema().names] + list(small_cols)
    return hot_joined.select_columns(out_cols).union(
        cold_joined.select_columns(out_cols)
    )


def new_users_daily(events: rd.Dataset) -> pd.DataFrame:
    """Growth curve: first-seen day per user -> (day, new_users, cum_users).

    Two combiner stages, both map-side reduced: MIN(day) per user (the only
    per-user state, one int per key), then COUNT per first-day. The
    cumulative sum runs on the driver over O(calendar days) rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = (
            pa.table({"user_id": t["user_id"], "day": day})
            .group_by("user_id")
            .aggregate([("day", "min")])
        )
        return g.rename_columns(["user_id", "day"])

    from .combine import combine_partials

    first = combine_partials(
        events.select_columns(["user_id", "ts"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=["user_id"],
        sums=[],
        mins=["day"],
    )

    def day_counts(t: pa.Table) -> pa.Table:
        g = t.select(["day"]).group_by("day").aggregate([([], "count_all")])
        return g.rename_columns(["day", "new_users"])

    per_day = combine_partials(
        first.map_batches(day_counts, batch_format="pyarrow"),
        keys=["day"],
        sums=["new_users"],
    ).to_pandas()
    per_day["day"] = per_day["day"].astype("datetime64[us]")
    per_day = per_day.sort_values("day").reset_index(drop=True)
    per_day["cum_users"] = per_day["new_users"].cumsum().astype(np.int64)
    return per_day[["day", "new_users", "cum_users"]]


def dau_wau_stickiness(events: rd.Dataset, window_days: int = 7) -> pd.DataFrame:
    """DAU / trailing-``window_days`` WAU per observed day ->
    (day, dau, wau, stickiness_micro), the engagement-stickiness metric.

    Distinct (user, day) pairs come out of one combiner; DAU is a per-day
    count of those pairs. WAU explodes each pair to the ``window_days``
    trailing days it contributes to (bounded x7 fan-out of O(distinct
    pairs) skinny rows), re-distincts (a user active twice in a window
    must count once), and counts per day. Only O(calendar days) rows ever
    reach the driver; stickiness is micro-quantized with the same half-up
    floor the oracle uses.
    """

    def pair_partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = (
            pa.table({"user_id": t["user_id"], "day": day})
            .group_by(["user_id", "day"])
            .aggregate([([], "count_all")])
        )
        return g.select(["user_id", "day"]).append_column(
            "one", pa.array(np.ones(g.num_rows, np.int64))
        )

    from .combine import combine_partials

    pairs = combine_partials(
        events.select_columns(["user_id", "ts"]).map_batches(
            pair_partial, batch_format="pyarrow"
        ),
        keys=["user_id", "day"],
        sums=["one"],
    )

    def dau_partial(t: pa.Table) -> pa.Table:
        g = t.select(["day"]).group_by("day").aggregate([([], "count_all")])
        return g.rename_columns(["day", "dau"])

    dau = combine_partials(
        pairs.map_batches(dau_partial, batch_format="pyarrow"),
        keys=["day"],
        sums=["dau"],
    ).to_pandas()

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.timestamp("us")),
                    "one": pa.array([], pa.int64()),
                }
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        outs_u = np.tile(uid, window_days)
        outs_d = np.concatenate(
            [day + np.timedelta64(k, "D") for k in range(window_days)]
        )
        return pa.table(
            {
                "user_id": pa.array(outs_u),
                "day": pa.array(outs_d),
                "one": pa.array(np.ones(len(outs_u), np.int64)),
            }
        )

    win_pairs = combine_partials(
        pairs.map_batches(explode, batch_format="pyarrow"),
        keys=["user_id", "day"],
        sums=["one"],
    )
    wau = combine_partials(
        win_pairs.map_batches(dau_partial, batch_format="pyarrow"),
        keys=["day"],
        sums=["dau"],
    ).to_pandas()
    wau = wau.rename(columns={"dau": "wau"})

    dau["day"] = dau["day"].astype("datetime64[us]")
    wau["day"] = wau["day"].astype("datetime64[us]")
    # observed days only: the explode manufactures up to window_days-1
    # phantom trailing days past each user's last activity
    out = dau.merge(wau, on="day", how="inner").sort_values("day").reset_index(drop=True)
    out["stickiness_micro"] = np.floor(
        1_000_000.0 * out["dau"].to_numpy(np.float64) / out["wau"].to_numpy(np.float64)
        + 0.5
    ).astype(np.int64)
    return out[["day", "dau", "wau", "stickiness_micro"]]
