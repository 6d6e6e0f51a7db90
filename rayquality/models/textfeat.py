"""Vectorized char-trigram featurization shared by langid and perplexity.

Texts -> utf-8 bytes -> 32-class LUT -> trigram codes (base-32 positional)
-> per-text segment sums via ``np.add.reduceat``. One numpy pass per batch;
no Python loop over rows (hot-path rule — SURVEY.md §2.8).

Class alphabet (32 classes, 5 bits):
  0      space / tab / newline
  1..26  a..z (case-folded)
  27     digits
  28     ascii punctuation & symbols
  29     non-ascii bytes (accents, CJK, emoji continuation bytes)
  30     other control bytes
  31     SEPARATOR (never produced by real text; joins texts in a batch)
"""

from __future__ import annotations

import numpy as np

N_CLASSES = 32
SEP_CLASS = 31
N_TRIGRAMS = N_CLASSES**3  # 32768


def _build_class_lut() -> np.ndarray:
    lut = np.full(256, 30, dtype=np.uint8)
    for b in b" \t\n\r":
        lut[b] = 0
    for i in range(26):
        lut[ord("a") + i] = 1 + i
        lut[ord("A") + i] = 1 + i
    for b in b"0123456789":
        lut[b] = 27
    for b in b"!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~":
        lut[b] = 28
    lut[128:] = 29
    return lut


CLASS_LUT = _build_class_lut()


def encode_classes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate texts (2-byte separator) into one class array.

    Returns (classes, starts) where ``starts[i]`` is the byte offset of
    text i in ``classes``. Empty/None texts contribute zero bytes.
    """
    sep = bytes([0xFF, 0xFF])  # maps to class 29? no: use explicit marker below
    bufs = []
    starts = np.empty(len(texts), dtype=np.int64)
    pos = 0
    for i, t in enumerate(texts):
        starts[i] = pos
        b = (t or "").encode("utf-8", "replace")
        bufs.append(b)
        pos += len(b) + 2
        bufs.append(sep)
    if not bufs:
        return np.empty(0, dtype=np.uint8), starts
    blob = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    classes = CLASS_LUT[blob].copy()
    # rewrite the separator bytes to SEP_CLASS (0xFF would alias class 29)
    off = 0
    for i, t in enumerate(texts):
        off += len((t or "").encode("utf-8", "replace"))
        classes[off] = SEP_CLASS
        classes[off + 1] = SEP_CLASS
        off += 2
    return classes, starts


def trigram_codes(classes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes, valid) for every position; valid=False where a SEP intrudes."""
    if len(classes) < 3:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=bool)
    c0 = classes[:-2].astype(np.int64)
    c1 = classes[1:-1].astype(np.int64)
    c2 = classes[2:].astype(np.int64)
    codes = c0 * (N_CLASSES * N_CLASSES) + c1 * N_CLASSES + c2
    valid = (c0 != SEP_CLASS) & (c1 != SEP_CLASS) & (c2 != SEP_CLASS)
    return codes, valid


def segment_scores(texts: list[str], luts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sum LUT values over each text's trigrams, for K LUTs at once.

    ``luts``: (K, 32768) float array. Returns (scores (n, K), n_trigrams (n,)).
    """
    n = len(texts)
    k = luts.shape[0]
    scores = np.zeros((n, k), dtype=np.float64)
    counts = np.zeros(n, dtype=np.int64)
    classes, starts = encode_classes(texts)
    codes, valid = trigram_codes(classes)
    if len(codes) == 0:
        return scores, counts
    vals = luts[:, codes] * valid  # (K, len(codes)); invalid positions -> 0
    # reduceat needs strictly in-range indices; starts are <= len(codes)+2
    idx = np.minimum(starts, len(codes) - 1)
    seg = np.add.reduceat(vals, idx, axis=1).T  # (n, K)
    segc = np.add.reduceat(valid.astype(np.int64), idx)
    # texts whose start is past the end (trailing empties) got garbage; zero them
    past = starts >= len(codes)
    seg[past] = 0.0
    segc[past] = 0
    scores[:] = seg
    counts[:] = segc
    return scores, counts


def trigram_count_table(texts: list[str]) -> np.ndarray:
    """Aggregate trigram counts over a corpus -> (32768,) int64 (training)."""
    classes, _ = encode_classes(texts)
    codes, valid = trigram_codes(classes)
    out = np.zeros(N_TRIGRAMS, dtype=np.int64)
    if len(codes):
        np.add.at(out, codes[valid], 1)
    return out


def bigram_count_table(texts: list[str]) -> np.ndarray:
    """Aggregate bigram counts -> (1024,) int64 (LM context normalizer)."""
    classes, _ = encode_classes(texts)
    out = np.zeros(N_CLASSES * N_CLASSES, dtype=np.int64)
    if len(classes) >= 2:
        c0 = classes[:-1].astype(np.int64)
        c1 = classes[1:].astype(np.int64)
        valid = (c0 != SEP_CLASS) & (c1 != SEP_CLASS)
        codes = c0[valid] * N_CLASSES + c1[valid]
        np.add.at(out, codes, 1)
    return out
