"""Regex PII / toxicity scrubber: rewrites captions in place.

Generalizes the reference's pattern-validity rules (match => count invalid,
``src/data_quality/validators/patterns.py:203-232`` in /root/reference) to
match => REWRITE semantics per the north rule: emails, BR-style phones,
SSN-like ids and a slur lexicon are replaced with placeholder tags.

Parity contract: the oracle and the pipeline import THIS module — one
pattern list, one engine (Python ``re`` via pandas), so scrubbed captions
match byte-for-byte (SURVEY.md §7.4). Order matters (SSN before bare
phone, or ``123-45-6789`` would half-match the phone pattern) and is fixed.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Invented placeholder lexicon — stands in for a real slur list (content-free
# by design; the machinery, not the vocabulary, is what the engine tests).
TOXIC_LEXICON = ("grumblefut", "snarkblat", "vexmuggle", "drekwort", "fizzlenut")

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_PAREN_RE = r"\(\d{2}\)\s?\d{4,5}-\d{4}"
PHONE_BARE_RE = r"\b\d{4,5}-\d{4}\b"
TOXIC_RE = r"\b(?:" + "|".join(TOXIC_LEXICON) + r")\b"

# (name, compiled pattern, replacement) — applied in this exact order.
PATTERNS: list[tuple[str, re.Pattern[str], str]] = [
    ("email", re.compile(EMAIL_RE), "<EMAIL>"),
    ("ssn", re.compile(SSN_RE), "<SSN>"),
    ("phone", re.compile(PHONE_PAREN_RE), "<PHONE>"),
    ("phone", re.compile(PHONE_BARE_RE), "<PHONE>"),
    ("toxic", re.compile(TOXIC_RE, re.IGNORECASE), "<CENSORED>"),
]


def scrub_text(text: str | None) -> tuple[str | None, int]:
    """Scrub one caption -> (scrubbed, total hit count). None passes through."""
    if text is None:
        return None, 0
    hits = 0
    for _, pat, repl in PATTERNS:
        text, n = pat.subn(repl, text)
        hits += n
    return text, hits


def scrub_series(captions: pd.Series) -> tuple[pd.Series, np.ndarray]:
    """Vectorized batch scrub -> (scrubbed series, per-row hit counts).

    Uses pandas' compiled-regex str.count/str.replace (same ``re`` engine as
    :func:`scrub_text`, so results are identical).
    """
    out = captions
    hits = np.zeros(len(captions), dtype=np.int64)
    for _, pat, repl in PATTERNS:
        cnt = out.str.count(pat).fillna(0).to_numpy(dtype=np.int64)
        hits += cnt
        if cnt.any():
            out = out.str.replace(pat, repl, regex=True)
    return out, hits
