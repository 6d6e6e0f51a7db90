"""Mergeable sketches: HyperLogLog approximate distinct counts.

The reference's distinct counts are exact (``nunique``,
``validators/duplicates.py:263-285`` in /root/reference) and stay exact here
(:func:`rayquality.ops.validators.duplicates`); SURVEY.md §2.5 A2 documents
HLL as the 10^12-scale option. Sketches are the canonical mergeable partial:
one 2^p-register sketch per batch, elementwise-max merge, tiny driver
combine — no shuffle at all, O(2^p) memory per column regardless of
cardinality.

Standard HLL (public algorithm, Flajolet et al.): register j = max rank of
the (64-p)-bit suffix among hashes routed to j; estimate = alpha_m * m^2 /
sum(2^-M) with linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rayquality.pool import default_n_parts

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraparound arithmetic)."""
    with np.errstate(over="ignore"):
        x = (x + _C1).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * _C2).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * _C3).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def _hash_values(values) -> np.ndarray:
    """Column values -> uint64 hashes (stable across processes)."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return _splitmix64(arr.astype(np.uint64))
    if arr.dtype.kind == "f":
        return _splitmix64(arr.astype(np.float64).view(np.uint64))
    # strings/objects: pandas' stable 64-bit hash, then finalize
    return _splitmix64(pd.util.hash_array(arr.astype(object)).astype(np.uint64))


class HllSketch:
    """One HLL sketch; merge with ``|=``; estimate with ``.estimate()``."""

    def __init__(self, precision: int = 12, registers: np.ndarray | None = None) -> None:
        if not 4 <= precision <= 18:
            raise ValueError("precision must be in [4, 18]")
        self.p = precision
        self.m = 1 << precision
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        p = np.uint64(self.p)
        idx = (h >> (np.uint64(64) - p)).astype(np.int64)
        w = (h << p).astype(np.uint64)  # suffix shifted to the top
        # rank = leading zeros of w + 1 (w == 0 -> max rank); bit length is
        # computed with exact integer binary search — float log2 rounds up
        # across power-of-two boundaries for w >= 2^53 and skews ranks
        bl = np.zeros(len(w), dtype=np.uint64)
        v = w.copy()
        for s_ in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(s_))
            bl[big] += np.uint64(s_)
            v[big] >>= np.uint64(s_)
        bl += v  # v is now 0 or 1
        nz = w != 0
        rank = np.where(nz, np.uint64(64) - bl + np.uint64(1), np.uint64(64) - p + np.uint64(1)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        self.add_hashes(_hash_values(values))

    def __ior__(self, other: "HllSketch") -> "HllSketch":
        if other.p != self.p:
            raise ValueError("precision mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)


def approx_distinct(ds: rd.Dataset, column: str, precision: int = 12) -> dict:
    """Approximate distinct count, shuffle-free: one sketch per batch, a
    distributed tree-merge stage (elementwise max over up to 1024 sketches
    per task), then a tiny driver merge — the driver sees
    ``n_batches / 1024`` register blobs, not one per batch. Returns
    estimate + metadata (``exact=False`` flag mirrors the exactness
    contract in SURVEY A2)."""

    def per_batch(t: pa.Table) -> pa.Table:
        sk = HllSketch(precision)
        col = t[column].drop_null()
        if len(col):
            sk.add(col.to_numpy(zero_copy_only=False))
        return pa.table({"registers": pa.array([sk.registers.tobytes()], pa.large_binary())})

    def merge_blobs(t: pa.Table) -> pa.Table:
        mats = np.stack(
            [np.frombuffer(b.as_py(), np.uint8) for b in t["registers"]]
        )
        return pa.table(
            {"registers": pa.array([mats.max(axis=0).tobytes()], pa.large_binary())}
        )

    parts = (
        ds.select_columns([column])
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(merge_blobs, batch_size=1024, batch_format="pyarrow")
        .to_pandas()
    )
    merged = HllSketch(precision)
    if len(parts):
        stacked = np.stack([np.frombuffer(b, np.uint8) for b in parts["registers"]])
        merged |= HllSketch(precision, stacked.max(axis=0).copy())
    return {
        "column": column,
        "estimate": merged.estimate(),
        "precision": precision,
        "exact": False,
    }


def hll_registers(
    ds: rd.Dataset, column: str, precision: int = 12
) -> pd.DataFrame:
    """The merged HLL sketch's REGISTER STATE as a DataFrame
    ``(bucket:int64, register:int64)``, non-zero registers only, sorted by
    bucket.

    The estimate (:func:`approx_distinct`) is float math and stays
    rows-only in the correctness gate; the registers are pure integer
    state — ``register[j] = max over values hashed to bucket j of
    (leading zeros of the 52-bit suffix + 1)`` — and elementwise-max is
    order-independent, so this output is bit-exact across runs, batch
    splits, and engines. splitmix64 is public arithmetic (add/xor/shift/
    multiply mod 2^64), so DuckDB reproduces it exactly with HUGEINT
    32-bit-split multiplication; see ``hll_registers_orders`` in
    ``__ray_entry__.py`` for the oracle. Certifying the sketch state
    certifies every downstream estimate.

    Same shuffle-free plan as :func:`approx_distinct`: one sketch per
    batch, tree-merged 1024-at-a-time, registers decoded on the driver
    (O(2^p), not O(rows)). Int64-typed columns only — the string path
    hashes via pandas' hash_array, which SQL cannot reproduce.
    """

    def per_batch(t: pa.Table) -> pa.Table:
        sk = HllSketch(precision)
        col = t[column].drop_null()
        if len(col):
            sk.add(col.to_numpy(zero_copy_only=False))
        return pa.table(
            {"registers": pa.array([sk.registers.tobytes()], pa.large_binary())}
        )

    def merge_blobs(t: pa.Table) -> pa.Table:
        mats = np.stack(
            [np.frombuffer(b.as_py(), np.uint8) for b in t["registers"]]
        )
        return pa.table(
            {"registers": pa.array([mats.max(axis=0).tobytes()], pa.large_binary())}
        )

    parts = (
        ds.select_columns([column])
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(merge_blobs, batch_size=1024, batch_format="pyarrow")
        .to_pandas()
    )
    regs = np.zeros(1 << precision, dtype=np.uint8)
    if len(parts):
        stacked = np.stack([np.frombuffer(b, np.uint8) for b in parts["registers"]])
        regs = stacked.max(axis=0)
    nz = np.nonzero(regs)[0]
    return pd.DataFrame(
        {"bucket": nz.astype(np.int64), "register": regs[nz].astype(np.int64)}
    )


def minhash_int_signatures(
    ds: rd.Dataset, key_col: str, item_col: str, n_perm: int = 8
) -> rd.Dataset:
    """MinHash signatures over INTEGER item sets -> lazy Dataset
    ``(key_col, perm:int64, sig:int64)``, one row per (key, permutation).

    Certifies the minhash math itself with an exact SQL oracle
    (``minhash_sets_orders`` in ``__ray_entry__.py``): permutation p hashes
    item i as ``splitmix64((i + p * GOLDEN) mod 2^64)`` and the signature
    is the UNSIGNED min — min is order- and batch-split-independent, so the
    result is bit-exact. ``sig`` is reported bias-shifted (``h - 2^63`` as
    signed int64): the shift is monotonic in unsigned order, which lets the
    distributed combine take plain signed int64 mins, and SQL reproduces it
    as ``MIN(h) - 2^63`` over HUGEINT hashes.

    The document minhash (``ops/textdedup.py``) hashes STRING shingles via
    pandas' hash_array and stays rows-only; this op is the oracle-able
    counterpart for integer item sets (e.g. per-customer order-key sets,
    per-user item ids). Combiner shape: per-batch min per (key, perm)
    before one skinny (key, perm) shuffle — the moved table is
    O(keys x n_perm), never O(items).
    """
    GOLDEN = _C1  # splitmix64's golden-ratio increment, shared constant
    TOP = np.uint64(1) << np.uint64(63)

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        items = t[item_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        if not len(keys):
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "perm": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.int64()),
                }
            )
        uniq, inv = np.unique(keys, return_inverse=True)
        out_k, out_p, out_s = [], [], []
        for p in range(n_perm):
            with np.errstate(over="ignore"):
                h = _splitmix64(items + np.uint64(p) * GOLDEN)
            biased = (h ^ TOP).view(np.int64)
            mins = np.full(len(uniq), np.iinfo(np.int64).max)
            np.minimum.at(mins, inv, biased)
            out_k.append(uniq)
            out_p.append(np.full(len(uniq), p, np.int64))
            out_s.append(mins)
        return pa.table(
            {
                key_col: pa.array(np.concatenate(out_k)),
                "perm": pa.array(np.concatenate(out_p)),
                "sig": pa.array(np.concatenate(out_s)),
            }
        )

    from .combine import combine_partials

    return combine_partials(
        ds.select_columns([key_col, item_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=[key_col, "perm"],
        sums=[],
        mins=["sig"],
    )


def simhash_int_signatures(
    ds: rd.Dataset, key_col: str, item_col: str
) -> rd.Dataset:
    """64-bit SimHash per INTEGER item set -> lazy Dataset
    ``(key_col, sig:int64)``: bit b of the signature is 1 iff the sum over
    the key's items of ``(bit b of splitmix64(item)) ? +1 : -1`` is
    strictly positive (Charikar 2002, with hash-derived instead of
    feature-weighted contributions).

    Bit-exact by construction — integer sums commute — so it carries an
    exact SQL oracle (``simhash_sets_orders`` in ``__ray_entry__.py``); the
    STRING simhash (``ops/textdedup.py``) hashes words via blake2b and
    stays rows-only. Combiner shape: each batch reduces to one
    (key x 64) int64 bit-sum row per key, the shuffle moves O(keys) wide
    rows, and a final vectorized pass packs signs into the signature.
    """
    BITS = np.arange(64, dtype=np.uint64)
    bcols = [f"b{i}" for i in range(64)]

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(keys):
            return pa.table(
                {key_col: pa.array([], pa.int64())}
                | {c: pa.array([], pa.int64()) for c in bcols}
            )
        items = t[item_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(items)
        contrib = (((h[:, None] >> BITS) & np.uint64(1)).astype(np.int64) * 2) - 1
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros((len(uniq), 64), np.int64)
        np.add.at(sums, inv, contrib)
        return pa.table(
            {key_col: pa.array(uniq)}
            | {c: pa.array(sums[:, i]) for i, c in enumerate(bcols)}
        )

    from .combine import combine_partials

    combined = combine_partials(
        ds.select_columns([key_col, item_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=[key_col],
        sums=bcols,
    )

    def pack(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {key_col: pa.array([], pa.int64()), "sig": pa.array([], pa.int64())}
            )
        sums = np.stack(
            [t[c].to_numpy(zero_copy_only=False) for c in bcols], axis=1
        )
        sig = ((sums > 0).astype(np.uint64) << BITS).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                key_col: t[key_col],
                "sig": pa.array(sig.view(np.int64)),
            }
        )

    return combined.map_batches(pack, batch_format="pyarrow")


def exact_quantiles(
    ds: rd.Dataset, column: str, qs: list[float]
) -> pd.DataFrame:
    """EXACT discrete quantiles via distributed value counts.

    Each batch pre-aggregates ``value_counts`` (combiner), one skinny
    ``groupby(value)`` sums the partials, and the driver walks the sorted
    cumulative counts. Matches DuckDB ``quantile_disc``:
    ``idx = max(0, ceil(q*n) - 1)`` into the sorted multiset.

    Scale contract: the shuffled/collected table is one row per DISTINCT
    value — exact quantiles this way need bounded cardinality (measure-like
    columns: quantities, ratings, bucketed sizes). For unbounded columns
    use a mergeable sketch (KLL/t-digest) instead; this op is the exact
    counterpart the oracle can verify.
    """
    import math

    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.drop_null(t[column].combine_chunks()))
        return pa.table(
            {
                "value": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    from .combine import combine_partials

    counts = combine_partials(
        ds.select_columns([column]).map_batches(partial, batch_format="pyarrow"),
        keys=["value"],
        sums=["cnt"],
    ).to_pandas()
    if not len(counts):  # empty/all-null column (arrives column-less): no
        # quantiles, not a crash
        return pd.DataFrame({"q": pd.Series([], dtype=np.float64), "value": []})
    counts = counts.sort_values("value").reset_index(drop=True)
    cum = counts["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        out_q.append(q)
        out_v.append(counts["value"].iloc[min(pos, len(counts) - 1)])
    return pd.DataFrame({"q": np.asarray(out_q, np.float64), "value": out_v})


def heavy_hitters(
    ds: rd.Dataset, column: str, k: int = 32, top: int = 10
) -> pd.DataFrame:
    """Approximate heavy hitters (Misra-Gries summaries, mergeable).

    Each batch compresses its exact value counts to k counters with the
    canonical Misra-Gries reduction (subtract the (k+1)-th largest count,
    drop non-positive); the driver merges by counter addition and a final
    reduction. Summaries are O(k) per batch and NOTHING shuffles.
    Guarantee (mergeable-summaries result): any value with true frequency
    > 2n/k survives; reported counts underestimate true frequency.

    Returns the ``top`` surviving (value, min_count) rows, count desc —
    the scale-path analog of the exact
    :func:`rayquality.ops.validators.duplicate_values`.
    """

    def _compress(vals: list, cnts: np.ndarray, kk: int):
        if len(vals) <= kk:
            return vals, cnts
        order = np.argsort(-cnts, kind="stable")
        cut = cnts[order[kk]]
        keep = order[:kk]
        newc = cnts[keep] - cut
        pos = newc > 0
        return [vals[i] for i in keep[pos]], newc[pos]

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(pc.drop_null(t[column].combine_chunks()))
        vals, cnts = _compress(
            vc.field("values").to_pylist(),
            np.asarray(vc.field("counts").to_pylist(), np.int64),
            k,
        )
        return pa.table({"value": pa.array(vals), "cnt": pa.array(cnts, pa.int64())})

    parts = ds.select_columns([column]).map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({column: [], "min_count": []})
    merged = parts.groupby("value", as_index=False)["cnt"].sum()
    vals, cnts = _compress(
        merged["value"].tolist(), merged["cnt"].to_numpy(np.int64), k
    )
    out = pd.DataFrame({column: vals, "min_count": cnts.astype(np.int64)})
    return (
        out.sort_values(["min_count", column], ascending=[False, True])
        .head(top)
        .reset_index(drop=True)
    )


def heavy_hitters_exact(ds: rd.Dataset, column: str, k: int = 16) -> pd.DataFrame:
    """EXACT heavy hitters: every value with true frequency > n/k, with
    its exact count (n = non-null rows).

    Two streaming passes, nothing shuffles:

    1. Misra-Gries summaries with k counters (:func:`heavy_hitters`). The
       classic guarantee — per-counter undercount <= n/k — means every
       value with true frequency > n/k SURVIVES the merge, so the <=k
       survivors are a superset of the answer.
    2. Exact verification: broadcast the candidate set (``ray.put`` once),
       each batch emits exact counts for candidate values only plus its
       non-null row count (<= k+1 skinny rows per batch), the driver sums
       the partials and keeps candidates with ``count * k > n``.

    This is the scale path for the reference's exact
    ``duplicate_values``-style report (``validators/duplicates.py`` in
    /root/reference collects full value counts): per-batch state is O(k)
    regardless of column cardinality, and the result is SQL-verifiable
    (``GROUP BY .. HAVING COUNT(*) * k > n``), unlike the raw sketch.
    """
    import pyarrow.compute as pc

    import ray

    cands = heavy_hitters(ds, column, k=k, top=k)
    if not len(cands):
        return pd.DataFrame(
            {"value": pd.Series([], dtype=object), "cnt": pd.Series([], dtype=np.int64)}
        )
    cand_arr = pa.array(cands[column].tolist())
    cand_ref = ray.put(cand_arr)

    def exact_partial(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        col = pc.drop_null(t[column].combine_chunks())
        vc = pc.value_counts(col.filter(pc.is_in(col, value_set=cand)))
        # null sentinel row carries this batch's non-null total
        return pa.table(
            {
                "value": pa.concat_arrays(
                    [vc.field("values").cast(cand.type), pa.array([None], cand.type)]
                ),
                "cnt": pa.array(
                    vc.field("counts").cast(pa.int64()).to_pylist() + [len(col)],
                    pa.int64(),
                ),
            }
        )

    from .combine import combine_partials

    # distributed partial merge: the collected table is <= k+1 rows no
    # matter how many batches the corpus has
    parts = combine_partials(
        ds.select_columns([column]).map_batches(exact_partial, batch_format="pyarrow"),
        keys=["value"],
        sums=["cnt"],
    ).to_pandas()
    total = int(parts.loc[parts["value"].isna(), "cnt"].sum())
    counts = parts.dropna(subset=["value"])[["value", "cnt"]]
    out = counts[counts["cnt"] * k > total].copy()
    out.columns = ["value", "cnt"]
    out["cnt"] = out["cnt"].astype(np.int64)
    return out.sort_values(["cnt", "value"], ascending=[False, True]).reset_index(
        drop=True
    )


def _rank_compact(vals: np.ndarray, wts: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Compact a weighted value multiset to <= m points at evenly spaced
    cumulative-weight boundaries; kept points are REAL data values (like
    quantile_disc) carrying their span's weight."""
    if len(vals) <= m:
        return vals, wts
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cw = np.cumsum(wts)
    total = cw[-1]
    bounds = total * (np.arange(1, m + 1) / m)
    idx = np.clip(np.searchsorted(cw, bounds, side="left"), 0, len(vals) - 1)
    idx = np.unique(idx)
    cb = cw[idx]
    w = np.diff(np.concatenate([[0.0], cb]))
    keep = w > 0
    return vals[idx][keep], w[keep]


def approx_quantiles(
    ds: rd.Dataset, column: str, qs: list[float], m: int = 1024
) -> pd.DataFrame:
    """Approximate quantiles for UNBOUNDED-cardinality columns — the
    mergeable-sketch counterpart :func:`exact_quantiles`'s docstring points
    to: each batch compacts its values to <= m rank-spaced points, a
    tree-merge stage re-compacts groups of sketches, and the driver
    resolves quantiles from one final <= m-point sketch. State is O(m)
    everywhere regardless of row count or distinct values; returned values
    are real data points. Rank error grows with merge depth
    (~depth/m of total rank) — m=1024 over two levels keeps it well under
    1% (test-asserted); use exact_quantiles when cardinality is bounded.
    """

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.drop_null(t[column].combine_chunks())
        vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
        v, w = _rank_compact(vals, np.ones(len(vals)), m)
        return pa.table({"value": pa.array(v), "weight": pa.array(w)})

    def merge(t: pa.Table) -> pa.Table:
        v, w = _rank_compact(
            t["value"].to_numpy(zero_copy_only=False),
            t["weight"].to_numpy(zero_copy_only=False),
            m,
        )
        return pa.table({"value": pa.array(v), "weight": pa.array(w)})

    parts = (
        ds.select_columns([column])
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(merge, batch_size=64 * m, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(parts):  # empty/all-null column
        return pd.DataFrame({"q": pd.Series([], dtype=np.float64), "value": []})
    v, w = _rank_compact(
        parts["value"].to_numpy(np.float64), parts["weight"].to_numpy(np.float64), m
    )
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1] if len(cw) else 0.0
    out_v = []
    for q in qs:
        pos = int(np.clip(np.searchsorted(cw, q * total, side="left"), 0, len(v) - 1))
        out_v.append(v[pos])
    return pd.DataFrame({"q": np.asarray(qs, np.float64), "value": out_v})


def grouped_quantiles(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    qs: list[float],
    n_parts: int | None = None,
) -> pd.DataFrame:
    """EXACT discrete quantiles PER GROUP (the grouped analog of
    :func:`exact_quantiles`): per-batch (group, value) value-counts
    combiner -> group-hash partitions (each group's full distribution
    co-locates) -> per-partition vectorized cumulative-count walk. Matches
    DuckDB ``quantile_disc(v, qs) GROUP BY g``: idx = ceil(q*n) - 1 into
    each group's sorted multiset.

    Same bounded-cardinality contract as exact_quantiles, per group.
    Output: (group_col, q, value).
    """
    if n_parts is None:
        n_parts = default_n_parts()
    import math

    qs = list(qs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df[[group_col, value_col]]
            .dropna(subset=[value_col])
            .groupby([group_col, value_col], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        hv = pd.util.hash_pandas_object(g[group_col], index=False).to_numpy(np.uint64)
        g["pkey"] = (hv % np.uint64(n_parts)).astype(np.int64)
        return g

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby([group_col, value_col], as_index=False)["cnt"]
            .sum()
            .sort_values([group_col, value_col], kind="stable")
        )
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            cum = grp["cnt"].cumsum().to_numpy()
            n = int(cum[-1])
            vals = grp[value_col].to_numpy()
            for q in qs:
                idx = max(0, math.ceil(q * n) - 1)
                pos = int(np.searchsorted(cum, idx + 1, side="left"))
                rows.append((key, q, vals[min(pos, len(vals) - 1)]))
        return pd.DataFrame(rows, columns=[group_col, "q", "value"])

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    out["q"] = out["q"].astype(np.float64)
    return out.sort_values([group_col, "q"]).reset_index(drop=True)


def grouped_approx_distinct(
    ds: rd.Dataset, group_col: str, value_col: str, precision: int = 12
) -> pd.DataFrame:
    """Approximate distinct ``value_col`` count PER ``group_col`` value via
    mergeable HLL sketches -> DataFrame (group, approx_distinct).

    The scale path for grouped cardinality when the exact
    ``distinct_per_group`` plan (one row per distinct pair) would shuffle
    too much — sketches make the shuffled payload O(groups x 2^precision
    bytes) regardless of value cardinality. Per-batch: one register blob
    per group present in the block (combiner); one hash-partition combine
    folds blobs with elementwise max (HLL union is exact over merges —
    re-batched rows cannot double-count).
    """

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        groups, blobs = [], []
        for g, sub in df.groupby(group_col, dropna=False, sort=False):
            sk = HllSketch(precision)
            vals = sub[value_col].dropna()
            if len(vals):
                sk.add(vals.to_numpy())
            groups.append(g)
            blobs.append(sk.registers.tobytes())
        return pd.DataFrame({group_col: groups, "registers": blobs})

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(64)).astype(np.int64)
        return df

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for gv, sub in g.groupby(group_col, dropna=False, sort=False):
            mats = np.stack([np.frombuffer(b, np.uint8) for b in sub["registers"]])
            sk = HllSketch(precision, mats.max(axis=0).copy())
            out_g.append(gv)
            out_n.append(np.int64(round(sk.estimate())))
        return pd.DataFrame({group_col: out_g, "approx_distinct": out_n})

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(per_batch, batch_format="pandas")
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(merge_part, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(group_col).reset_index(drop=True)
