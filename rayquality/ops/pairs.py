"""Distributed candidate-pair generation over banded signatures.

This generalizes the image near-dup big path (rayquality/pipeline.py
``compute_near_losers``) to ANY (id, 64-bit signature) dataset, so simhash
text dedup, sign-LSH embedding dedup and minhash bucket pairing all share
one scale-shaped kernel instead of driver-side banding:

  signatures -> band explode (map_batches, vectorized)
             -> band-key count prefilter (combiner + skinny groupby; only
                multi-member band groups survive)
             -> hash-partition by band key -> per-PARTITION vectorized
                offset-sweep pair kernel (dedup.keyed_pair_indices) — one
                pandas call per partition, never per bucket
             -> distinct (id_a, id_b) pairs

Nothing driver-side ever holds the full signature table; the only driver
materialization is the verified pair set itself (the operator's output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from .. import dedup
from ..phash import band_keys

# hash partitions for the pair-kernel stage; each partition runs one
# vectorized sweep over all its band groups
DEFAULT_N_PARTS = 64


def _explode_bands_generic(id_col: str, sig_col: str, n_bands: int):
    def fn(t: pa.Table) -> pa.Table:
        sig = t[sig_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = band_keys(sig, n_bands)  # (n, B)
        ids = t[id_col].combine_chunks()
        n = len(sig)
        idx = pa.array(np.tile(np.arange(n), n_bands))
        return pa.table(
            {
                "bkey": pa.array(keys.T.reshape(-1)),
                "sig": pa.array(np.tile(sig, n_bands)),
                id_col: ids.take(idx),
            }
        )

    return fn


def banded_hamming_pairs(
    sig_ds: rd.Dataset,
    id_col: str,
    sig_col: str,
    max_hamming: int,
    n_bands: int,
    n_parts: int = DEFAULT_N_PARTS,
    group_cap: int = dedup.GROUP_CAP,
) -> pd.DataFrame:
    """All distinct (id_a, id_b), id_a < id_b, with hamming(sig) <=
    ``max_hamming`` among rows sharing at least one of ``n_bands`` bands.

    Exact for hamming <= n_bands - 1 (pigeonhole) PROVIDED no band bucket
    exceeds ``group_cap`` members; approximate above. Buckets larger than
    ``group_cap`` are dropped EXPLICITLY (the offset-sweep kernel would
    otherwise silently truncate pairs at offsets >= cap): the dropped-key
    count is logged and returned via ``result.attrs['dropped_band_keys']``
    so callers can detect skew instead of silently losing recall. A bucket
    that big means >cap rows share a band value — quadratic pair output
    with no signal; pre-collapse identical signatures upstream if that is
    expected. ``max_hamming=0, n_bands=1`` degenerates to exact-signature
    pairing.
    """
    # the offset-sweep kernel truncates at dedup.GROUP_CAP internally, so a
    # larger requested cap could not be honored exactly — clamp it
    group_cap = min(group_cap, dedup.GROUP_CAP)
    # materialize: the banded table is consumed twice (count prefilter +
    # pair pass); without it the upstream signature computation re-executes.
    # The table is skinny (16 bytes x n_bands per row) so the object store
    # holds (or spills) it cheaply at any scale.
    banded = sig_ds.map_batches(
        _explode_bands_generic(id_col, sig_col, n_bands), batch_format="pyarrow"
    ).materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("bkey").aggregate([("bkey", "count")])
        return g.rename_columns(["bkey", "cnt"])

    from .combine import combine_partials

    # hash-partition combine, not the sort-based Dataset.groupby aggregate
    # (measured pathologically slow on skinny partials — combine.py docstring)
    kc = combine_partials(
        banded.map_batches(count_partial, batch_format="pyarrow"),
        keys=["bkey"],
        sums=["cnt"],
    )
    kdf = kc.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], 1)),
        batch_format="pyarrow",
    ).to_pandas()
    n_dropped = int((kdf["cnt"] > group_cap).sum()) if len(kdf) else 0
    if n_dropped:
        import logging

        logging.getLogger(__name__).warning(
            "banded_hamming_pairs: dropping %d band buckets larger than "
            "group_cap=%d (pairs in them are NOT emitted)",
            n_dropped,
            group_cap,
        )
        kdf = kdf[kdf["cnt"] <= group_cap]
    hot_keys = kdf[["bkey"]]
    if not len(hot_keys):
        out = pd.DataFrame({"id_a": [], "id_b": []})
        out.attrs["dropped_band_keys"] = n_dropped
        return out
    hot_ref = ray.put(hot_keys["bkey"].to_numpy(np.int64))

    def only_hot_with_part(t: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        bk = t["bkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(bk, hs)))
        bk = t["bkey"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((bk % n_parts).astype(np.int64)))

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ii, jj = dedup.keyed_pair_indices(
            g["bkey"].to_numpy(np.int64), g["sig"].to_numpy(np.int64), max_hamming
        )
        ids = g[id_col].to_numpy()
        a, b = ids[ii], ids[jj]
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        return pd.DataFrame({"id_a": a, "id_b": b})

    pdf = (
        banded.map_batches(only_hot_with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
        .to_pandas()  # verified pairs only: the small output side
    )
    if not len(pdf):
        out = pd.DataFrame({"id_a": [], "id_b": []})
        out.attrs["dropped_band_keys"] = n_dropped
        return out
    out = (
        pdf.drop_duplicates()  # a pair can match in several bands
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    out.attrs["dropped_band_keys"] = n_dropped
    return out


def equal_key_pair_ds(
    keyed_ds: rd.Dataset,
    id_col: str,
    key_col: str,
    n_parts: int = DEFAULT_N_PARTS,
    group_cap: int = dedup.GROUP_CAP,
    with_counts: bool = False,
) -> rd.Dataset:
    """Dataset of (id_a, id_b), id_a < id_b, one row per (shared key, pair)
    — a pair sharing M keys appears M times, so a downstream
    ``groupby(id_a, id_b).count()`` yields intersection sizes (the
    inverted-index join used for exact Jaccard). Count prefilter -> hash
    partition -> vectorized within-group sweep; ``group_cap`` skips
    degenerate keys larger than the cap (quadratic cost, no signal).

    ``with_counts=True`` COMBINES pair multiplicities inside each partition
    first and emits (id_a, id_b, cnt) partials — every key lives wholly in
    one partition, so summing partials downstream gives exact intersection
    sizes while the shuffled row count drops from (pair, key) occurrences
    to distinct pairs per partition (the map-side-combiner rule).

    The keyed table is materialized (consumed by the count prefilter AND
    the pair pass — recomputing the upstream explode twice costs more than
    object-store residency, which spills if needed)."""
    keyed_ds = keyed_ds.materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(key_col).aggregate([(key_col, "count")])
        return g.rename_columns([key_col, "cnt"])

    from .combine import combine_partials

    kc = combine_partials(
        keyed_ds.map_batches(count_partial, batch_format="pyarrow"),
        keys=[key_col],
        sums=["cnt"],
    )
    hot_keys = kc.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["cnt"], 1), pc.less_equal(t["cnt"], group_cap))
        ).select([key_col]),
        batch_format="pyarrow",
    ).to_pandas()
    if not len(hot_keys):
        id_type = keyed_ds.schema().base_schema.field(id_col).type
        cols = {"id_a": pa.array([], id_type), "id_b": pa.array([], id_type)}
        if with_counts:
            cols["cnt"] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(cols))
    hot_ref = ray.put(hot_keys[key_col].to_numpy(np.int64))

    def only_hot_with_part(t: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        bk = t[key_col].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(bk, hs)))
        bk = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((bk % n_parts).astype(np.int64)))

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[key_col].to_numpy(np.int64)
        # max_hamming=64 disables the distance filter: all within-key pairs
        ii, jj = dedup.keyed_pair_indices(keys, keys, 64)
        ids = g[id_col].to_numpy()
        a, b = ids[ii], ids[jj]
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        if not with_counts:
            return pd.DataFrame({"id_a": a, "id_b": b})
        if not len(a):
            return pd.DataFrame(
                {"id_a": a, "id_b": b, "cnt": np.empty(0, np.int64)}
            )
        # partition-local combine: run-length count of sorted pairs
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.empty(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(first)[0]
        cnt = np.diff(np.concatenate((starts, [len(a)])))
        return pd.DataFrame({"id_a": a[first], "id_b": b[first], "cnt": cnt.astype(np.int64)})

    return (
        keyed_ds.map_batches(only_hot_with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
    )


def equal_key_pairs(
    keyed_ds: rd.Dataset,
    id_col: str,
    key_col: str,
    n_parts: int = DEFAULT_N_PARTS,
    group_cap: int = dedup.GROUP_CAP,
) -> pd.DataFrame:
    """DISTINCT (id_a, id_b), id_a < id_b, for rows sharing an exact key
    (e.g. a minhash LSH bucket id)."""
    pdf = equal_key_pair_ds(keyed_ds, id_col, key_col, n_parts, group_cap).to_pandas()
    if not len(pdf):
        return pd.DataFrame({"id_a": [], "id_b": []})
    return pdf.drop_duplicates().sort_values(["id_a", "id_b"]).reset_index(drop=True)
