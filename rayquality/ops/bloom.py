"""Bloom-filtered distributed semi-join.

The reference's integrity validator ships the full reference keyset to
every check (``src/data_quality/validators/integrity.py:184-188``), which
is the broadcast-join pattern ``ops/validators.py`` already implements.
That breaks when BOTH sides are big: the keyset no longer fits in a
broadcast. The scale path is the classic two-step:

1. a Bloom filter of the right-side keys (a few MiB regardless of row
   count) is OR-reduced from per-batch partials and broadcast via
   ``ray.put`` — the left side drops every definite non-match in a
   stateless ``map_batches`` pass, so only matches + a tunable
   false-positive sliver ever shuffle;
2. the surviving left rows and the right keys co-shuffle on
   ``hash(key) % n_parts`` and an exact per-partition membership test
   removes the false positives.

The result is exactly ``LEFT SEMI JOIN`` — the Bloom stage only prunes
shuffle volume, it never changes the answer — so the op carries a plain
``IN (subquery)`` SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from . import combine as _combine

_N_HASHES = 4


def _mix(x: np.ndarray, salt: np.uint64) -> np.ndarray:
    """splitmix64 finalizer over uint64 keys + salt."""
    z = x + salt
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bit_positions(keys: np.ndarray, m_bits: int) -> list[np.ndarray]:
    """k double-hashed bit positions per key (h1 + i*h2 mod m)."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _mix(u, np.uint64(0x9E3779B97F4A7C15))
    h2 = _mix(u, np.uint64(0xD1B54A32D192ED03)) | np.uint64(1)
    m = np.uint64(m_bits)
    return [(h1 + np.uint64(i) * h2) % m for i in range(_N_HASHES)]


def build_bloom(ds: rd.Dataset, key_col: str, m_bits: int = 1 << 23) -> "ray.ObjectRef":
    """OR-reduce a Bloom filter of ``ds[key_col]`` -> ObjectRef of a packed
    uint8 bit array (m_bits/8 bytes, 1 MiB at the default).

    Each batch sets its keys' bits into a fresh local array and emits the
    packed bytes as ONE row. The partials then OR-reduce in a distributed
    fan-in stage (``repartition(16)`` + per-block OR) so the driver pulls
    at most 16 x m/8 bytes regardless of input block count — at cluster
    scale the naive plan (every block's 1 MiB partial to the driver) is
    an O(blocks x m) driver hotspot. The final array ships once via
    ``ray.put`` for every downstream task to share.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits >> 3, np.uint8)
        for pos in _bit_positions(df[key_col].to_numpy(np.int64), m_bits):
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def or_block(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits >> 3, np.uint8)
        for blob in df["bits"]:
            acc |= np.frombuffer(blob, np.uint8)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    parts = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pandas", batch_size=65536)
        .repartition(16)
        .map_batches(or_block, batch_format="pandas", batch_size=None)
    )
    acc = np.zeros(m_bits >> 3, np.uint8)
    for batch in parts.iter_batches(batch_format="pandas"):
        for blob in batch["bits"]:
            acc |= np.frombuffer(blob, np.uint8)
    return ray.put(acc)


def _bloom_test(keys: np.ndarray, bits: np.ndarray, m_bits: int) -> np.ndarray:
    mask = np.ones(len(keys), bool)
    for pos in _bit_positions(keys, m_bits):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        mask &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
    return mask


def bloom_semi_join(
    left: rd.Dataset,
    left_key: str,
    right: rd.Dataset,
    right_key: str,
    keep_cols: list[str],
    m_bits: int = 1 << 23,
    n_parts: int = _combine.DEFAULT_N_PARTS,
) -> rd.Dataset:
    """``left`` rows whose ``left_key`` appears in ``right[right_key]``
    (LEFT SEMI JOIN) -> lazy Dataset of ``keep_cols``.

    Stage 1 Bloom-prunes the left side (definite non-matches never leave
    the scan task); stage 2 co-shuffles survivors + right keys on
    ``hash(key) % n_parts`` and keeps survivors whose key is present in
    the same partition's right keys — exact, because every equal key
    hashes to the same partition.
    """
    bloom_ref = build_bloom(right, right_key, m_bits)
    import pyarrow as pa

    lsch = left.schema()
    _types = dict(zip(lsch.names, lsch.types))

    def _pa_type(t) -> pa.DataType:
        # pandas-block datasets report numpy dtypes here, arrow ones DataTypes
        return t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t)

    pad_types = {c: _pa_type(_types[c]) for c in keep_cols}

    def prune(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        jk = t[left_key].combine_chunks().to_numpy(zero_copy_only=False)
        keep = _bloom_test(jk.astype(np.int64), bits, m_bits)
        kept = t.filter(pa.array(keep))
        cols = {c: kept[c] for c in keep_cols}
        n = kept.num_rows
        cols["_side"] = pa.array(np.zeros(n, np.int64))
        cols["_jk"] = kept[left_key].combine_chunks().cast(pa.int64())
        return pa.table(cols)

    survivors = left.select_columns(keep_cols).map_batches(prune, batch_format="pyarrow")

    def _pad(t: pa.DataType, n: int) -> pa.Array:
        """non-null filler of the left schema's type (null int pads would
        flip the column to float64 in later pandas hops)"""
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.array([""] * n, t)
        return pa.array(np.full(n, -1, np.int64)).cast(t)

    def right_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        jk = pc.unique(t[right_key].combine_chunks()).cast(pa.int64())
        n = len(jk)
        cols = {c: _pad(pad_types[c], n) for c in keep_cols}
        cols["_side"] = pa.array(np.ones(n, np.int64))
        cols["_jk"] = jk
        return pa.table(cols)

    right_keys = right.select_columns([right_key]).map_batches(
        right_rows, batch_format="pyarrow"
    )

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df["_jk"], index=False).to_numpy(np.uint64)
        df["pkey"] = (h % np.uint64(n_parts)).astype(np.int64)
        return df

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        present = g.loc[g["_side"] == 1, "_jk"].to_numpy(np.int64)
        lhs = g[g["_side"] == 0]
        keep = np.isin(lhs["_jk"].to_numpy(np.int64), present)
        return lhs.loc[keep, keep_cols]

    both = survivors.union(right_keys).map_batches(add_pkey, batch_format="pandas")
    return both.groupby("pkey").map_groups(verify, batch_format="pandas")
