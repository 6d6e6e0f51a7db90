"""Caption-quality heuristic kernels: length, symbol ratio, repeated n-grams,
stopword density — fully vectorized (numpy segment ops; no per-row Python).

These are north-rule additions with no reference counterpart (SURVEY.md
§2.2 "new-engine per-batch heuristics"); they reuse the reference's
rule -> mask -> tally shape. The word-level metrics tokenize the whole batch
in one pass: byte-class encoding (rayquality.models.textfeat), word = maximal
run of letter classes, polynomial word hashes, trigram hashes, and
per-text reductions via ``np.bincount`` / ``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np

from ..models import textfeat

# Standard English function words (public knowledge); used for density only.
STOPWORDS = (
    "the a an and or but of to in on at by for with from as is are was were be "
    "been has have had he she it they we you i this that these those not no so "
    "if then than there here when where who which what all any some will can"
).split()

_POW = (np.uint64(31) ** np.arange(16, dtype=np.uint64)).astype(np.uint64)
_TRI_A = np.uint64(1000003)
_TRI_B = np.uint64(10007)


def _hash_word(word: str) -> np.uint64:
    cls = textfeat.CLASS_LUT[np.frombuffer(word.encode("utf-8", "replace"), dtype=np.uint8)]
    letters = (cls >= 1) & (cls <= 26)
    cls = cls[letters][:16]
    h = np.uint64(0)
    for i, c in enumerate(cls):
        h = h + np.uint64(c) * _POW[min(i, 15)]
    return h


STOP_HASHES = np.unique(np.array([_hash_word(w) for w in STOPWORDS], dtype=np.uint64))


def char_stats(texts: list[str]) -> dict[str, np.ndarray]:
    """Per-text byte length, symbol ratio, digit ratio (one numpy pass)."""
    n = len(texts)
    classes, starts = textfeat.encode_classes(texts)
    total = len(classes)
    out = {
        "n_chars": np.zeros(n, dtype=np.int64),
        "symbol_ratio": np.zeros(n, dtype=np.float64),
        "digit_ratio": np.zeros(n, dtype=np.float64),
    }
    if total == 0:
        return out
    ends = np.empty(n, dtype=np.int64)
    ends[:-1] = starts[1:]
    ends[-1] = total
    lengths = ends - starts - 2  # minus the 2 separator bytes
    idx = np.minimum(starts, total - 1)
    punct = (classes == 28).astype(np.int64)
    digit = (classes == 27).astype(np.int64)
    p = np.add.reduceat(punct, idx)
    d = np.add.reduceat(digit, idx)
    safe = np.maximum(lengths, 1)
    out["n_chars"] = lengths
    out["symbol_ratio"] = p / safe
    out["digit_ratio"] = d / safe
    return out


def word_stats(texts: list[str]) -> dict[str, np.ndarray]:
    """Per-text word count, stopword fraction, repeated-word-trigram fraction."""
    n = len(texts)
    out = {
        "n_words": np.zeros(n, dtype=np.int64),
        "stopword_frac": np.zeros(n, dtype=np.float64),
        "rep3_frac": np.zeros(n, dtype=np.float64),
    }
    classes, starts = textfeat.encode_classes(texts)
    if len(classes) == 0:
        return out
    letters = (classes >= 1) & (classes <= 26)
    m = len(classes)
    idx = np.arange(m, dtype=np.int64)
    prev = np.empty(m, dtype=bool)
    prev[0] = False
    prev[1:] = letters[:-1]
    wstart = letters & ~prev
    wstart_pos = idx[wstart]
    if len(wstart_pos) == 0:
        return out
    # start-of-word index propagated to every letter position
    start_prop = np.maximum.accumulate(np.where(wstart, idx, -1))
    pos_in_word = idx - start_prop
    # truncate words at 16 letters: base-31 positional hash is injective for
    # coefficients < 31, so distinct (truncated) words never collide below
    # the uint64 wrap (~13 letters) and practically never above it
    lead = letters & (pos_in_word <= 15)
    contrib = np.zeros(m, dtype=np.uint64)
    contrib[lead] = classes[lead].astype(np.uint64) * _POW[pos_in_word[lead]]
    whash = np.add.reduceat(contrib, wstart_pos)  # polynomial hash per word
    text_of_word = np.searchsorted(starts, wstart_pos, side="right") - 1
    n_words = np.bincount(text_of_word, minlength=n).astype(np.int64)
    safe_w = np.maximum(n_words, 1)
    is_stop = np.isin(whash, STOP_HASHES)
    stop_counts = np.bincount(text_of_word[is_stop], minlength=n)
    out["n_words"] = n_words
    out["stopword_frac"] = stop_counts / safe_w
    # word-trigram repetition: fraction of trigrams that are duplicates
    if len(whash) >= 3:
        same_text = text_of_word[:-2] == text_of_word[2:]
        h3 = whash[:-2] * _TRI_A + whash[1:-1] * _TRI_B + whash[2:]
        tt = text_of_word[:-2][same_text]
        th = h3[same_text]
        if len(tt):
            order = np.lexsort((th, tt))
            tt_s, th_s = tt[order], th[order]
            new = np.empty(len(tt_s), dtype=bool)
            new[0] = True
            new[1:] = (tt_s[1:] != tt_s[:-1]) | (th_s[1:] != th_s[:-1])
            distinct = np.bincount(tt_s[new], minlength=n)
            total3 = np.bincount(tt_s, minlength=n)
            safe3 = np.maximum(total3, 1)
            out["rep3_frac"] = np.where(total3 > 0, 1.0 - distinct / safe3, 0.0)
    return out
