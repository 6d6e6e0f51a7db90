"""Shared verdict vocabulary: rule names, reason ordering, result schema.

The reference models a check outcome as a ``ValidationResult`` with
``affected_rows``/``total_rows`` (``src/data_quality/validators/base.py:21-41``
in /root/reference). The north rule recasts this per row: each rule yields a
boolean hit mask; a row's ``drop_reasons`` is the ordered list of rules it
failed, and ``keep = len(drop_reasons) == 0``. The reference's
``affected_rows`` equals the cardinality of our per-row hit mask, which keeps
parity checkable (SURVEY.md §1.3).

Both the oracle (pandas, single-process) and the pipeline (Ray Data) emit
reasons in THIS canonical order, so lists compare byte-for-byte.
"""

from __future__ import annotations

import pyarrow as pa

# canonical rule order; drop_reasons lists follow it
REASONS = (
    "caption_missing",
    "caption_too_short",
    "caption_too_long",
    "too_few_words",
    "symbol_ratio",
    "digit_ratio",
    "repetition",
    "stopword_density",
    "lang",
    "perplexity",
    "fmt_invalid",
    "decode_error",
    "dims_mismatch",
    "phash_mismatch",
    "size_bounds",
    "exact_dup",
    "near_dup",
)

# verdict columns appended by the pipeline (SURVEY.md §1.3 result model)
VERDICT_FIELDS = [
    ("keep", pa.bool_()),
    ("drop_reasons", pa.list_(pa.string())),
    ("caption_scrubbed", pa.string()),
    ("scrub_hits", pa.int32()),
    ("lang", pa.string()),
    ("lang_conf", pa.float32()),
    ("ppl", pa.float32()),
]


def reasons_from_masks(masks: dict[str, "object"], n: int) -> list[list[str]]:
    """Assemble per-row ordered reason lists from {rule_name: bool array}."""
    cols = [(name, masks[name]) for name in REASONS if name in masks]
    out: list[list[str]] = []
    for i in range(n):
        out.append([name for name, m in cols if bool(m[i])])
    return out
