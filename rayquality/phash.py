"""64-bit DCT perceptual hash + hamming utilities, pure numpy.

Standard pHash construction (public algorithm, as in the `imagehash`
library's `phash`): grayscale -> resize 32x32 -> 2-D DCT-II -> keep the
top-left 8x8 low-frequency block -> threshold each coefficient against the
median of the block (excluding the DC term from the median) -> 64 bits.

The reference engine has no perceptual hashing (near-dup is a north-rule
extension; SURVEY.md §2.7); exact-dup semantics mirror the reference's
composite-key duplicate counting (`validators/duplicates.py:341-429`) with
key = phash.
"""

from __future__ import annotations

import numpy as np

_HASH_DIM = 32
_LOW = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    mat = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    mat[0] /= np.sqrt(2.0)
    return mat


_DCT32 = _dct_matrix(_HASH_DIM)


def to_gray(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma from an (h, w, 3) uint8 image -> float64 (h, w)."""
    f = img.astype(np.float64)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


from functools import lru_cache


@lru_cache(maxsize=8192)
def _resize_plan(
    h: int, w: int, out_h: int, out_w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bilinear index/weight arrays for one (h, w) -> (out_h, out_w) map.

    Cached: a corpus has few distinct image sizes relative to its row
    count, and recomputing these per IMAGE was ~half the resize cost in
    the scorer profile. Pure function of the shapes — identical values to
    computing inline, so hashes are unchanged."""
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    return y0, y1, x0, x1, wy, wx


def resize_bilinear(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = gray.shape
    y0, y1, x0, x1, wy, wx = _resize_plan(h, w, out_h, out_w)
    # gray[y[:, None], x[None, :]] == gray[np.ix_(y, x)], minus ix_ overhead
    tl = gray[y0[:, None], x0[None, :]]
    tr = gray[y0[:, None], x1[None, :]]
    bl = gray[y1[:, None], x0[None, :]]
    br = gray[y1[:, None], x1[None, :]]
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    return top * (1 - wy) + bot * wy


_BIT_SHIFTS = np.arange(63, -1, -1, dtype=np.uint64)


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w, 3) uint8 image, as SIGNED int64.

    Signed so it round-trips an Arrow/Parquet int64 column losslessly
    (input_hint schema: ``phash:int64``).
    """
    small = resize_bilinear(to_gray(img), _HASH_DIM, _HASH_DIM)
    coeffs = _DCT32 @ small @ _DCT32.T
    low = coeffs[:_LOW, :_LOW]
    flat = low.flatten()
    # median of the 63 AC coefficients (odd count -> the exact middle
    # order statistic; np.partition returns the same value np.median would,
    # without its generic-dispatch overhead in a per-image hot loop)
    med = np.partition(flat[1:], 31)[31]
    # epsilon guard: flat images have ~1e-13 numerical noise in the AC
    # coefficients; without it the bits would be arbitrary per input size
    bits = ((flat - med) > 1e-8).astype(np.uint64)
    # disjoint bit positions -> OR-reduce of shifted bits == the shift loop
    val = np.bitwise_or.reduce(bits << _BIT_SHIFTS)
    return int(val.astype(np.int64))


def hamming64(a: np.ndarray, b: int | np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between int64 hashes (array vs array/scalar)."""
    au = np.asarray(a, dtype=np.int64).view(np.uint64)
    if isinstance(b, np.ndarray):
        bu = np.asarray(b, dtype=np.int64).view(np.uint64)
    else:
        bu = np.uint64(int(b) & 0xFFFFFFFFFFFFFFFF)
    return popcount64(au ^ bu)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Popcount of a uint64 array (SWAR bit trick, fully vectorized)."""
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)


def hamming_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise hamming distances between two int64 hash vectors -> (|a|, |b|)."""
    au = np.asarray(a, dtype=np.int64).view(np.uint64)
    bu = np.asarray(b, dtype=np.int64).view(np.uint64)
    x = au[:, None] ^ bu[None, :]
    return popcount64(x)


def band_keys(phashes: np.ndarray, n_bands: int = 4) -> np.ndarray:
    """Split each 64-bit hash into ``n_bands`` bit-bands (LSH keys).

    Bands cover ALL 64 bits: when 64 % n_bands != 0 the first bands are one
    bit wider (for 64 % n_bands == 0 this is identical to equal bands).
    Hashes within hamming distance d < n_bands are guaranteed to share at
    least one exact band (pigeonhole — unequal widths don't weaken it), so
    banding finds all near-dups with d <= n_bands - 1 and most with
    slightly larger d.

    Returns an (n, n_bands) int64 array; key i encodes (band_index, bits).
    """
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    starts = np.cumsum([0] + widths[:-1])
    u = np.asarray(phashes, dtype=np.int64).view(np.uint64)
    out = np.empty((len(u), n_bands), dtype=np.uint64)
    for i in range(n_bands):
        mask = np.uint64((1 << widths[i]) - 1)
        band = (u >> np.uint64(starts[i])) & mask
        out[:, i] = (np.uint64(i) << np.uint64(58)) | band
    return out.view(np.int64)
