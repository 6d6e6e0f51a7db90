"""Multi-table join pipelines (TPC-H Q3/Q5/Q14-shaped).

The reference joins nothing beyond FK membership probes
(``src/data_quality/validators/integrity.py``); these pipelines exercise
the composed join planning a warehouse-grade engine needs: broadcast the
dimension tables that stay small at any scale (region, nation, supplier
lookup maps via ``ray.put``), hash-shuffle ``Dataset.join`` for the
fact-to-fact edges (orders-lineitem, customer-orders) where both sides
grow with the corpus, and per-batch combiners so only (key, partial)
rows reach each shuffle. Money stays in integer cents x 100 — revenue
``extendedprice * (1 - discount)`` is exactly ``cents * (100 - disc_pct)``
with no division anywhere — so every output hash-matches DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from . import combine as _combine
from .quant import cents_pa


def _rev_c100(t: pa.Table) -> pa.Array:
    """revenue in cents*100: cents(extendedprice) * (100 - disc_pct)."""
    base = cents_pa(t["l_extendedprice"])
    disc = cents_pa(t["l_discount"])
    return pc.multiply(base, pc.subtract(pa.scalar(100, pa.int64()), disc))


def q3_shipping_priority(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    k: int = 10,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Q3: top-k undelivered orders by revenue for one market segment ->
    DataFrame (l_orderkey, o_orderdate, revenue_c100).

    Plan: the segment's custkeys broadcast once (a fixed fraction of one
    dimension table); orders filter to pre-cutoff members and keep only
    (orderkey, orderdate); lineitem filters to post-cutoff ships and
    pre-aggregates revenue per orderkey (combiner + skinny combine); ONE
    hash-shuffle ``Dataset.join`` attaches the order date; block-local
    top-k then a driver merge — no global sort.
    """
    def _seg_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["c_mktsegment"], segment)).select(["c_custkey"])

    seg_keys = (
        customer.select_columns(["c_custkey", "c_mktsegment"])
        .map_batches(_seg_only, batch_format="pyarrow")
        .to_pandas()
    )
    # sorted-ndarray broadcast + searchsorted membership (the q5 pattern):
    # stays zero-copy Arrow->numpy per batch, no per-batch set/dict probe
    keys_ref = ray.put(
        np.sort(seg_keys["c_custkey"].to_numpy(np.int64))
        if "c_custkey" in seg_keys
        else np.empty(0, np.int64)
    )
    cut = np.datetime64(cutoff, "us")

    def ord_filter(t: pa.Table) -> pa.Table:
        members = ray.get(keys_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        pos = np.searchsorted(members, ck)
        pos[pos == len(members)] = 0
        m = (od < cut) & (members[pos] == ck) if len(members) else np.zeros(len(ck), bool)
        return t.select(["o_orderkey", "o_orderdate"]).filter(pa.array(m))

    odates = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(ord_filter, batch_format="pyarrow")

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        g = (
            pa.table({"l_orderkey": t["l_orderkey"], "rev": _rev_c100(t)})
            .group_by("l_orderkey")
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["l_orderkey", "revenue_c100"])

    li_rev = _combine.combine_partials(
        lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(li_partial, batch_format="pyarrow"),
        keys=["l_orderkey"],
        sums=["revenue_c100"],
    )

    j = li_rev.join(
        odates,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def block_topk(t: pa.Table) -> pa.Table:
        # (rev desc, key asc) top-k via one lexsort on zero-copy views —
        # the widest post-join stream stays Arrow end to end
        rev = t["revenue_c100"].to_numpy(zero_copy_only=False)
        key = t["l_orderkey"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((key, -rev))[:k]
        return t.take(pa.array(idx))

    out = j.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    out = (
        out.sort_values(["revenue_c100", "l_orderkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return out[["l_orderkey", "o_orderdate", "revenue_c100"]]


def q5_local_supplier_volume(
    region: rd.Dataset,
    nation: rd.Dataset,
    supplier: rd.Dataset,
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    region_name: str = "ASIA",
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Q5: revenue per nation where customer AND supplier share the
    nation, within one region and order-date year -> DataFrame
    (n_name, revenue_c100), revenue desc.

    Plan: region/nation/supplier collapse to broadcast lookup maps (the
    genuinely small side at any scale — supplier carries ONE int per
    key); the two big edges are hash-shuffle ``Dataset.join``s:
    orders(filtered) ⋈ customer on custkey, then lineitem ⋈ that on
    orderkey. The same-nation filter and per-nation revenue combiner run
    inside the post-join map, so the only wide shuffles move skinny
    pre-filtered keys.
    """
    rdf = region.to_pandas()
    ndf = nation.to_pandas()
    rkey = int(rdf.loc[rdf["r_name"] == region_name, "r_regionkey"].iloc[0])
    nat_in_region = ndf[ndf["n_regionkey"] == rkey]
    nat_names = dict(zip(nat_in_region["n_nationkey"].astype(int), nat_in_region["n_name"]))
    nat_ref = ray.put(nat_names)
    sdf = supplier.select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    _sk = sdf["s_suppkey"].to_numpy(np.int64)
    _sv = sdf["s_nationkey"].to_numpy(np.int64)
    _ord = np.argsort(_sk, kind="stable")
    # sorted (keys, values) ndarray pair: per-batch lookup is one
    # np.searchsorted instead of a per-element PyObject dict hash
    supp_ref = ray.put((_sk[_ord], _sv[_ord]))
    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")

    def ord_filter(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy()
        m = (d >= lo) & (d < hi)
        return df.loc[m, ["o_orderkey", "o_custkey"]]

    ords = orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ord_filter, batch_format="pandas"
    )

    def cust_nat(df: pd.DataFrame) -> pd.DataFrame:
        nats = ray.get(nat_ref)
        m = df["c_nationkey"].isin(nats).to_numpy()
        out = df.loc[m, ["c_custkey", "c_nationkey"]].copy()
        out["c_nationkey"] = out["c_nationkey"].astype(np.int64)
        return out

    cust = customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        cust_nat, batch_format="pandas"
    )

    oc = ords.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    j = li.join(
        oc,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def per_nation(t: pa.Table) -> pd.DataFrame:
        keys, vals = ray.get(supp_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        pos = np.minimum(np.searchsorted(keys, sk), len(keys) - 1)
        found = keys[pos] == sk
        c_nat = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        keep = found & (vals[pos] == c_nat)
        rev = _rev_c100(t).to_numpy(zero_copy_only=False)[keep]
        nk = c_nat[keep]
        g = pd.DataFrame({"nk": nk, "revenue_c100": rev}).groupby("nk", as_index=False).sum()
        g["revenue_c100"] = g["revenue_c100"].astype(np.int64)
        return g

    agg = (
        _combine.combine_partials(
            j.map_batches(per_nation, batch_format="pyarrow"),
            keys=["nk"],
            sums=["revenue_c100"],
        )
        .to_pandas()
    )
    agg["n_name"] = agg["nk"].map(nat_names)
    agg = agg.sort_values(["revenue_c100", "n_name"], ascending=[False, True])
    return agg[["n_name", "revenue_c100"]].reset_index(drop=True)


def q14_promo_revenue_share(
    lineitem: rd.Dataset,
    part: rd.Dataset,
    promo_type: str = "PROMO",
    month_lo: str = "1998-09-01",
    month_hi: str = "1998-10-01",
) -> pd.DataFrame:
    """Q14: the promo class's share of one month's revenue -> one-row
    DataFrame (promo_c100, total_c100, share_micro).

    The part side collapses to ONE boolean per partkey, broadcast as a
    dense numpy bitmap (partkeys are contiguous; a bool per part is the
    minimal possible payload). Lineitem filters the ship month and sums
    promo/total revenue per batch — a shuffle-free two-counter reduce.
    The share is the micro-quantized double of two exact integers with
    the division written identically in the oracle, so the hash matches
    bit-for-bit.
    """
    pdf = part.select_columns(["p_partkey", "p_type"]).to_pandas()
    size = int(pdf["p_partkey"].max()) + 1
    bitmap = np.zeros(size, bool)
    bitmap[pdf.loc[pdf["p_type"] == promo_type, "p_partkey"].to_numpy(np.int64)] = True
    bm_ref = ray.put(bitmap)
    lo, hi = np.datetime64(month_lo, "us"), np.datetime64(month_hi, "us")

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t["l_shipdate"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        rev = _rev_c100(t).to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        bm = ray.get(bm_ref)
        in_range = pk < len(bm)
        promo = np.zeros(len(pk), bool)
        promo[in_range] = bm[pk[in_range]]
        return pd.DataFrame(
            {
                "promo_c100": [np.int64(rev[promo].sum())],
                "total_c100": [np.int64(rev.sum())],
            }
        )

    parts = (
        lineitem.select_columns(
            ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    promo_c, total_c = int(parts["promo_c100"].sum()), int(parts["total_c100"].sum())
    share = 1000000.0 * promo_c / total_c if total_c else 0.0
    from .quant import quantize_i64

    return pd.DataFrame(
        {
            "promo_c100": [np.int64(promo_c)],
            "total_c100": [np.int64(total_c)],
            "share_micro": [quantize_i64(np.array([share]), 1.0)[0]],
        }
    )


def q10_returned_item_revenue(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    nation: rd.Dataset,
    date_lo: str = "1996-04-01",
    date_hi: str = "1996-07-01",
    k: int = 20,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Q10: top-k customers by revenue lost to returned items in one
    quarter -> DataFrame (c_custkey, c_name, revenue_c100, acctbal_c100,
    n_name), revenue desc.

    Plan: orders prune to the quarter's (orderkey, custkey) skinny pair;
    lineitem prunes to returnflag='R' and pre-aggregates revenue per
    orderkey (combiner); ONE hash-shuffle ``Dataset.join`` attaches the
    custkey; a second combiner collapses to per-customer revenue (at most
    one row per window customer); block-local top-k + driver merge picks
    the k winners — and only THEN do customer/nation attributes enter,
    fetched for exactly k keys. Customer is never broadcast and nothing
    wider than (key, partial) crosses a shuffle.
    """
    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")

    def ord_filter(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy()
        return df.loc[(d >= lo) & (d < hi), ["o_orderkey", "o_custkey"]]

    owin = orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ord_filter, batch_format="pandas"
    )

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        g = (
            pa.table({"l_orderkey": t["l_orderkey"], "rev": _rev_c100(t)})
            .group_by("l_orderkey")
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["l_orderkey", "revenue_c100"])

    li_rev = _combine.combine_partials(
        lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
        ).map_batches(li_partial, batch_format="pyarrow"),
        keys=["l_orderkey"],
        sums=["revenue_c100"],
    )

    j = li_rev.join(
        owin,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = _combine.combine_partials(
        j.select_columns(["o_custkey", "revenue_c100"]),
        keys=["o_custkey"],
        sums=["revenue_c100"],
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_c100", "o_custkey"], ascending=[False, True]
        ).head(k)

    top = (
        per_cust.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["revenue_c100", "o_custkey"], ascending=[False, True])
        .head(k)
    )
    win_keys = set(top["o_custkey"].tolist())

    def only_winners(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["c_custkey"].isin(win_keys)]

    cattrs = (
        customer.select_columns(["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
        .map_batches(only_winners, batch_format="pandas")
        .to_pandas()
    )
    ndf = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cattrs, left_on="o_custkey", right_on="c_custkey").merge(
        ndf, left_on="c_nationkey", right_on="n_nationkey"
    )
    out["acctbal_c100"] = (
        np.floor(out["c_acctbal"].to_numpy(np.float64) * 100 + 0.5)
    ).astype(np.int64)
    out = out.sort_values(
        ["revenue_c100", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    return out[["c_custkey", "c_name", "revenue_c100", "acctbal_c100", "n_name"]]


def q18_large_volume_customers(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    qty_threshold: int = 180,
    k: int = 100,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Q18: orders whose total line quantity exceeds a threshold, with
    their customers -> DataFrame (c_name, o_custkey, o_orderkey,
    o_orderdate, totalprice_c100, total_qty_c100), totalprice desc.

    Plan: quantity pre-aggregates per orderkey inside every block
    (combiner) so the HAVING filter runs on (key, sum) rows — ~1% of
    orders survive; the survivors hash-join orders once; block-local
    top-k + driver merge bound the result; customer names are fetched for
    the winner custkeys only. The full-table groupby never materializes
    row-level quantities and the big tables shuffle only skinny columns.
    """
    thr_c100 = int(qty_threshold) * 100

    def qty_partial(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(pc.multiply(pc.cast(t["l_quantity"], pa.float64()),
                                         pa.scalar(100.0))), pa.int64())
        g = (
            pa.table({"l_orderkey": t["l_orderkey"], "q": q})
            .group_by("l_orderkey")
            .aggregate([("q", "sum")])
        )
        return g.rename_columns(["l_orderkey", "total_qty_c100"])

    qty = _combine.combine_partials(
        lineitem.select_columns(["l_orderkey", "l_quantity"]).map_batches(
            qty_partial, batch_format="pyarrow"
        ),
        keys=["l_orderkey"],
        sums=["total_qty_c100"],
    ).map_batches(
        lambda t: t.filter(pc.greater(t["total_qty_c100"], thr_c100)),
        batch_format="pyarrow",
    )

    def ord_skinny(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "totalprice_c100": cents_pa(t["o_totalprice"]),
            }
        )

    osk = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(ord_skinny, batch_format="pyarrow")

    j = qty.join(
        osk,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["totalprice_c100", "l_orderkey"], ascending=[False, True]
        ).head(k)

    top = (
        j.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["totalprice_c100", "l_orderkey"], ascending=[False, True])
        .head(k)
    )
    win_keys = set(top["o_custkey"].tolist())
    cnames = (
        customer.select_columns(["c_custkey", "c_name"])
        .map_batches(
            lambda df: df.loc[df["c_custkey"].isin(win_keys)], batch_format="pandas"
        )
        .to_pandas()
    )
    out = top.merge(cnames, left_on="o_custkey", right_on="c_custkey")
    out = out.rename(columns={"l_orderkey": "o_orderkey"})
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    out = out.sort_values(
        ["totalprice_c100", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)
    return out[
        ["c_name", "o_custkey", "o_orderkey", "o_orderdate", "totalprice_c100", "total_qty_c100"]
    ]
