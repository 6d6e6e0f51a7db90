"""Dedup semantics shared by the oracle and the distributed pipeline.

Exact dedup follows the reference's composite-key duplicate arithmetic
(``src/data_quality/validators/duplicates.py:341-429`` in /root/reference:
duplicates = total - len(drop_duplicates)) with key = ``phash``, recast
per-row: within a phash group the WINNER is ``min(image_id)`` (deterministic
under any partitioning/arrival order — SURVEY.md §2.9) and every other row
is an ``exact_dup`` loser.

Near-dup (north-rule extension, SURVEY.md §2.7): LSH banding of the 64-bit
phash (d < n_bands guarantees a shared band by pigeonhole), pairwise hamming
verification within band groups, connected components over verified pairs,
winner = min(image_id) per component.

The functions here are pure and single-process; the pipeline distributes
them (salted groupby for exact, band-key groupby for pair generation) but
calls THESE functions for the per-group logic, so oracle and pipeline agree
by construction while the shuffle mechanics are cross-checked by tests.
"""

from __future__ import annotations

import numpy as np

from .phash import band_keys, hamming_matrix, popcount64

# pairwise-verification cap per band group; larger groups are compared
# within a phash-sorted sliding window (skew guard for degenerate corpora)
GROUP_CAP = 4096
_WINDOW = 256


def exact_losers(phashes: np.ndarray, image_ids: np.ndarray) -> set[str]:
    """Loser ids: everything except min(image_id) per phash group."""
    ph = np.asarray(phashes, dtype=np.int64)
    ids = np.asarray(image_ids, dtype=object)
    order = np.lexsort((ids, ph))
    ph_s, ids_s = ph[order], ids[order]
    first = np.empty(len(ph_s), dtype=bool)
    if len(ph_s):
        first[0] = True
        first[1:] = ph_s[1:] != ph_s[:-1]
    return set(ids_s[~first])


def verified_pairs(
    phashes: np.ndarray, image_ids: np.ndarray, max_hamming: int
) -> list[tuple[str, str]]:
    """All (id_a, id_b) pairs with hamming(phash) <= max_hamming, id_a < id_b.

    O(g^2) up to GROUP_CAP rows; beyond that, a phash-sorted sliding window
    bounds the comparisons (documented skew guard; exact dedup has already
    collapsed identical-phash groups so giant bands are adversarial corpora).
    """
    ph = np.asarray(phashes, dtype=np.int64)
    ids = np.asarray(image_ids, dtype=object)
    n = len(ph)
    pairs: list[tuple[str, str]] = []
    if n < 2:
        return pairs
    if n <= GROUP_CAP:
        d = hamming_matrix(ph, ph)
        ii, jj = np.nonzero(np.triu(d <= max_hamming, k=1))
        for i, j in zip(ii.tolist(), jj.tolist()):
            a, b = ids[i], ids[j]
            pairs.append((a, b) if a < b else (b, a))
        return pairs
    order = np.argsort(ph, kind="stable")
    ph_s, ids_s = ph[order], ids[order]
    for i in range(n - 1):
        j_end = min(i + 1 + _WINDOW, n)
        d = hamming_matrix(ph_s[i : i + 1], ph_s[i + 1 : j_end])[0]
        for off in np.nonzero(d <= max_hamming)[0].tolist():
            a, b = ids_s[i], ids_s[i + 1 + off]
            pairs.append((a, b) if a < b else (b, a))
    return pairs


def near_pairs_banded(
    phashes: np.ndarray,
    image_ids: np.ndarray,
    max_hamming: int,
    n_bands: int,
) -> set[tuple[str, str]]:
    """Single-process banded near-dup pair generation (the oracle path).

    Produces exactly the pair set the distributed band-key groupby produces:
    group by each of the ``n_bands`` band keys, verify pairs within groups.
    """
    phs = np.asarray(phashes, dtype=np.int64)
    n = len(phs)
    if n < 2:
        return set()
    ids = np.asarray(image_ids, dtype=object)
    parts = [band_pair_indices(phs, b, n_bands, max_hamming) for b in range(n_bands)]
    return pairs_from_indices(parts, ids, n)


def band_pair_indices(
    phashes: np.ndarray, band: int, n_bands: int, max_hamming: int
) -> tuple[np.ndarray, np.ndarray]:
    """Verified near-dup index pairs for ONE band — pure numpy, so the
    pipeline can fan the bands out as parallel Ray tasks while the oracle
    runs them in a loop (identical results either way)."""
    phs = np.asarray(phashes, dtype=np.int64)
    col = band_keys(phs, n_bands)[:, band]
    return keyed_pair_indices(col, phs, max_hamming)


def keyed_pair_indices(
    keys: np.ndarray, phashes: np.ndarray, max_hamming: int
) -> tuple[np.ndarray, np.ndarray]:
    """Verified pairs among rows sharing a key — the vectorized offset-sweep
    kernel shared by the driver path (key = one band) and the distributed
    path (key = bkey within a hash partition)."""
    phs = np.asarray(phashes, dtype=np.int64)
    n = len(phs)
    phu = phs.view(np.uint64)
    col = np.asarray(keys, dtype=np.int64)
    order = np.argsort(col, kind="stable")
    col_s = col[order]
    bounds = np.nonzero(np.diff(col_s))[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))
    sizes = ends - starts
    # fully vectorized all-pairs-within-group: for offset k, pair every
    # sorted position p with p+k while both lie in the same group. The
    # active set shrinks with k, so total work is ~the candidate-pair count.
    grp_end = np.repeat(ends, sizes)  # group end for each sorted position
    max_k = int(min(sizes.max(), GROUP_CAP)) if n else 0
    active = np.nonzero(grp_end - np.arange(n) > 1)[0]
    all_i: list[np.ndarray] = []
    all_j: list[np.ndarray] = []
    for k in range(1, max_k):
        active = active[grp_end[active] - active > k]
        if len(active) == 0:
            break
        i_idx = order[active]
        j_idx = order[active + k]
        d = popcount64(phu[i_idx] ^ phu[j_idx])
        ok = d <= max_hamming
        if ok.any():
            all_i.append(i_idx[ok])
            all_j.append(j_idx[ok])
    if not all_i:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(all_i), np.concatenate(all_j)


def pairs_from_indices(
    parts: list[tuple[np.ndarray, np.ndarray]], ids: np.ndarray, n: int
) -> set[tuple[str, str]]:
    """Merge per-band index pairs -> deduped (id_a, id_b) set, a < b."""
    nz = [(i, j) for i, j in parts if len(i)]
    if not nz:
        return set()
    ii = np.concatenate([i for i, _ in nz])
    jj = np.concatenate([j for _, j in nz])
    # dedupe across bands on index pairs, then order each pair by id string
    key = np.minimum(ii, jj).astype(np.int64) * n + np.maximum(ii, jj)
    _, first = np.unique(key, return_index=True)
    ii, jj = ii[first], jj[first]
    a, b_ = ids[ii], ids[jj]
    swap = a > b_
    a[swap], b_[swap] = b_[swap], a[swap]
    return set(zip(a.tolist(), b_.tolist()))


def component_losers(pairs: "set[tuple[str, str]] | list[tuple[str, str]]") -> set[str]:
    """Union-find over verified pairs; losers = members except min id.

    Runs on the driver over the (small) verified-pair set. Scale note: at
    10^12 rows swap in :func:`rayquality.ops.graph.connected_components`
    (distributed min-label propagation; same min-id-wins labels); the
    pair set here stays small because exact dedup runs first.
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by id order so the root is always the min id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    losers: set[str] = set()
    for x in list(parent):
        if find(x) != x:
            losers.add(x)
    return losers


def near_losers(
    phashes: np.ndarray,
    image_ids: np.ndarray,
    max_hamming: int,
    n_bands: int,
) -> set[str]:
    """Oracle convenience: banded pairs -> components -> losers."""
    return component_losers(near_pairs_banded(phashes, image_ids, max_hamming, n_bands))
