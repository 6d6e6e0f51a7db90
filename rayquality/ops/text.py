"""Text-analysis operators over a documents table (north-rule extensions:
token counting, quality scoring, fingerprinting, language-ID, perplexity).

Everything is a vectorized ``map_batches``; the model-backed ops use an
actor pool so the LUTs are built once per worker.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..models import langid, perplexity


def token_counts(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Whitespace token counts: one RE2 scan per batch (SQL: regexp_extract_all)."""

    def per_batch(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], r"\S+").cast(pa.int64())
        return pa.table({id_col: t[id_col], "n_tokens": n})

    return ds.select_columns([id_col, text_col]).map_batches(per_batch, batch_format="pyarrow")


def text_quality(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Length / alpha-ratio / token-count quality features, fully vectorized."""

    def per_batch(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_alpha = pc.count_substring_regex(txt, "[a-zA-Z]").cast(pa.int64())
        n_tokens = pc.count_substring_regex(txt, r"\S+").cast(pa.int64())
        ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())), pa.float64()),
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": n_chars,
                "n_alpha": n_alpha,
                "n_tokens": n_tokens,
                "alpha_ratio": ratio,
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(per_batch, batch_format="pyarrow")


def fingerprints(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Content fingerprint per document (md5 hex — SQL: md5(text))."""

    def per_batch(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t[text_col].to_pylist()]
        return pa.table({id_col: t[id_col], "fp": pa.array(fps, pa.string())})

    return ds.select_columns([id_col, text_col]).map_batches(per_batch, batch_format="pyarrow")


class _LangPpl:
    def __init__(self) -> None:
        self.lang = langid.get_model()
        self.ppl = perplexity.get_model()
        self.id_col = "doc_id"
        self.text_col = "text"

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = ["" if s is None else s for s in t[self.text_col].to_pylist()]
        langs, confs = self.lang.predict(texts)
        ppls = self.ppl.perplexity(texts)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "lang_pred": pa.array(langs.astype(str), pa.string()),
                "lang_conf": pa.array(confs, pa.float32()),
                "ppl": pa.array(ppls, pa.float32()),
            }
        )


def lang_ppl(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Language-ID + perplexity scoring (actor pool, warm models).

    Pool size scales with the session (rayquality.pool) instead of a
    hardcoded cap that would starve a large cluster."""
    from ..pool import actor_cpus, pool_size

    return ds.select_columns([id_col, text_col]).map_batches(
        _LangPpl, batch_format="pyarrow", concurrency=(1, pool_size()), num_cpus=actor_cpus()
    )
