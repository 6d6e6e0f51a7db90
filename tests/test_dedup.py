import numpy as np

from rayquality import dedup
from rayquality.phash import hamming_matrix


def test_exact_losers():
    ph = np.array([1, 1, 2, 3, 3, 3], dtype=np.int64)
    ids = np.array(["b", "a", "c", "z", "x", "y"], dtype=object)
    losers = dedup.exact_losers(ph, ids)
    assert losers == {"b", "z", "y"}  # winners: a (min of {a,b}), c, x


def test_verified_pairs_matches_bruteforce():
    rng = np.random.default_rng(7)
    ph = rng.integers(-(2**62), 2**62, size=80).astype(np.int64)
    # plant a close pair: flip 2 bits
    ph[10] = ph[3] ^ np.int64((1 << 7) | (1 << 40))
    ids = np.array([f"i{k:03d}" for k in range(80)], dtype=object)
    got = set(dedup.verified_pairs(ph, ids, max_hamming=4))
    d = hamming_matrix(ph, ph)
    want = set()
    for i in range(80):
        for j in range(i + 1, 80):
            if d[i, j] <= 4:
                want.add((ids[i], ids[j]))
    assert got == want and ("i003", "i010") in got


def test_banded_pairs_guarantee():
    # distance 3 < 4 bands -> banding must find the pair
    base = np.int64(0x0F0F0F0F0F0F0F0F)
    close = np.int64(base ^ np.int64((1 << 2) | (1 << 33) | (1 << 50)))
    rng = np.random.default_rng(8)
    ph = np.concatenate([[base, close], rng.integers(-(2**62), 2**62, 50).astype(np.int64)])
    ids = np.array([f"x{k:02d}" for k in range(len(ph))], dtype=object)
    pairs = dedup.near_pairs_banded(ph, ids, max_hamming=4, n_bands=4)
    assert ("x00", "x01") in pairs


def test_component_losers_union_find():
    pairs = {("a", "b"), ("b", "c"), ("x", "y")}
    losers = dedup.component_losers(pairs)
    assert losers == {"b", "c", "y"}  # winners a (component abc) and x (xy)
