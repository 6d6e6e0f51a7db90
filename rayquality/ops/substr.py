"""Cross-document shared-substring detection via sampled Karp-Rabin
fingerprints — the scalable stand-in for suffix-array substring dedup
(Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022; sampling scheme after Schleimer et al.'s MOSS winnowing, with
hash-mod selection instead of per-window minima so the whole batch
vectorizes as ONE numpy pass).

Plan (all batch-vectorized, no per-row Python in the hot path):

  documents -> per batch: concatenate texts into one byte buffer, compute
               the k-gram rolling hash over the WHOLE buffer in O(n)
               vectorized uint64 ops, keep positions where
               ``hash % sample_mod == 0`` and the k-gram does not cross a
               document boundary (combiner: distinct (doc, fingerprint))
            -> shared pair kernel: ops.pairs.equal_key_pair_ds
               (count prefilter -> hash partition -> offset sweep), which
               emits (id_a, id_b, cnt) partials
            -> combine partials, filter cnt >= min_shared

A shared substring of length L >= k contains L-k+1 k-grams; each selected
independently with rate 1/sample_mod, so the miss probability is
(1-1/sample_mod)^(L-k+1) — for the defaults (k=32, sample_mod=8) a 100-char
shared passage is missed with p ~ 1e-4. Precision is exact up to 64-bit
hash collisions: a shared fingerprint IS a shared k-byte substring.

Scale: the shuffled table is (doc_id, fingerprint) at ~bytes/sample_mod
rows per doc — a constant-factor compression of the corpus; no driver
structure ever holds per-doc state. Degenerate fingerprints (boilerplate
shared by more than ``group_cap`` docs) are dropped explicitly by the pair
kernel, mirroring reference validators' skip-column triage
(reference: core/validators.py duplicate triage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# odd base => invertible mod 2^64, so window hashes denormalize exactly
_BASE = np.uint64(1000003)


def _inv_u64(b: np.uint64) -> np.uint64:
    """Multiplicative inverse of odd b modulo 2**64 (Newton iteration)."""
    x = b  # correct to 3 bits
    with np.errstate(over="ignore"):
        for _ in range(5):  # doubles correct bits each round -> 64
            x = x * (np.uint64(2) - b * x)
    return x


def _kgram_hashes(buf: np.ndarray, k: int) -> np.ndarray:
    """Rolling Karp-Rabin hashes (mod 2**64) of every k-byte window of
    ``buf``: H[i] = sum_j buf[i+j] * BASE**(k-1-j).

    Computed without a sequential loop: with weights w_i = BASE**(n-1-i),
    prefix sums Q of buf*w give Q[i+k]-Q[i] = BASE**(n-i-k) * H[i], and the
    power denormalizes via the modular inverse — three vectorized passes.
    """
    n = len(buf)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pw = np.empty(n, dtype=np.uint64)  # pw[i] = BASE**i (mod 2**64)
        pw[0] = np.uint64(1)
        if n > 1:
            np.cumprod(np.full(n - 1, _BASE, dtype=np.uint64), out=pw[1:])
        w = pw[::-1]  # w[i] = BASE**(n-1-i)
        q = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(buf.astype(np.uint64) * w, out=q[1:])
        # Q[i+k]-Q[i] = BASE**(n-i-k) * H[i]; denormalize with
        # inv[i] = BASE**-(n-k) * BASE**i (odd powers are invertible)
        inv = _inv_u64(pw[n - k]) * pw[: n - k + 1]
        return (q[k:] - q[:-k]) * inv


def _fingerprint_batch(
    id_col: str, text_col: str, k: int, sample_mod: int
):
    import hashlib

    mod = np.uint64(sample_mod)

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        blobs = [s.encode("utf-8", "surrogatepass") if s else b"" for s in texts]
        lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
        empty = pa.table(
            {
                id_col: ids[:0],
                "ckey": np.empty(0, dtype=np.int64),
                "fkey": np.empty(0, dtype=np.int64),
            }
        )
        if not len(blobs):
            return empty
        # 8-byte content key for the exact-dup pre-collapse stage
        ckeys = np.fromiter(
            (
                int.from_bytes(hashlib.md5(b).digest()[:8], "little", signed=True)
                for b in blobs
            ),
            dtype=np.int64,
            count=len(blobs),
        )
        buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        h = _kgram_hashes(buf, k)
        if not len(h):
            return empty
        starts = np.concatenate(([0], np.cumsum(lens)))
        pos = np.nonzero(h % mod == 0)[0]
        # doc owning the window start; keep only windows fully inside it
        owner = np.searchsorted(starts, pos, side="right") - 1
        ok = pos + k <= starts[owner + 1]
        pos, owner = pos[ok], owner[ok]
        out = (
            pd.DataFrame(
                {
                    id_col: ids[owner],
                    "ckey": ckeys[owner],
                    "fkey": h[pos].view(np.int64),
                }
            )
            .groupby(["ckey", "fkey"], as_index=False)[id_col]
            .min()  # block-level collapse: one row per (content, fingerprint)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return fn


def shared_substring_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    sample_mod: int = 8,
    min_shared: int = 2,
) -> rd.Dataset:
    """Lazy Dataset of (id_a, id_b, n_shared): document pairs sharing at
    least ``min_shared`` sampled k-byte substrings — i.e. likely to share a
    long verbatim passage. See module docstring for guarantees.

    EXACT duplicates are pre-collapsed: byte-identical documents share ALL
    fingerprints, so pairing them here would cost O(replicas² x
    fingerprints) per duplicated content (measured 580 s on a 100-way-
    duplicated 500k-doc corpus) while telling us nothing ``exact_dedup``
    doesn't. One skinny hash-combine reduces the fingerprint table to one
    row per (content, fingerprint) keyed by the min-id representative;
    reported pairs are between representatives — join ``exact_dup_clusters``
    to expand a representative to its byte-identical members. Same
    pre-collapse contract as ``pairs.banded_hamming_pairs`` documents for
    identical signatures."""
    from .combine import combine_partials
    from .pairs import equal_key_pair_ds

    fps = ds.select_columns([id_col, text_col]).map_batches(
        _fingerprint_batch(id_col, text_col, k, sample_mod),
        batch_format="pyarrow",
    )
    # cross-block collapse: min representative id per (content, fingerprint)
    keyed = combine_partials(
        fps, keys=["ckey", "fkey"], sums=[], mins=[id_col]
    ).select_columns([id_col, "fkey"])
    pairs = equal_key_pair_ds(keyed, id_col, "fkey", with_counts=True)
    combined = combine_partials(pairs, keys=["id_a", "id_b"], sums=["cnt"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["cnt"] >= min_shared].rename(columns={"cnt": "n_shared"})
        return df[["id_a", "id_b", "n_shared"]]

    return combined.map_batches(finish, batch_format="pandas")
