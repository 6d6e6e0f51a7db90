"""Declarative column-cleaning operator — the rewrite counterpart of the
validator suite (validators COUNT problems; this FIXES the mechanical ones
in one vectorized pass).

Mirrors the remediation a reference user performs after reading a
data-quality report (null fills, range clips, case/whitespace
normalization) as a single ``map_batches`` stage: every rule is a
``pyarrow.compute`` kernel, applied in a fixed order (fill -> clip ->
string-normalize), so the op is one streaming pass with no Python row
loops and an exact SQL equivalent (COALESCE / LEAST+GREATEST /
lower(trim())).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def clean_columns(
    ds: rd.Dataset,
    fills: dict[str, object] | None = None,
    clips: dict[str, tuple[float, float]] | None = None,
    str_norm: list[str] | None = None,
) -> rd.Dataset:
    """Apply fills, then clips, then lower+trim normalization; all other
    columns pass through untouched."""
    fills = fills or {}
    clips = clips or {}
    str_norm = str_norm or []

    def per_batch(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in t.column_names}
        for c, v in fills.items():
            cols[c] = pc.fill_null(cols[c], v)
        for c, (lo, hi) in clips.items():
            cols[c] = pc.min_element_wise(
                pc.max_element_wise(cols[c], lo), hi
            )
        for c in str_norm:
            cols[c] = pc.utf8_lower(pc.utf8_trim_whitespace(cols[c]))
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow")
