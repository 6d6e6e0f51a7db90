"""The fused per-batch scoring stage: heuristics + models + scrub + decode.

One actor-pool ``map_batches`` stage computes every per-row rule in a single
pass over the batch (models warm in ``__init__``, per the stateful-stage
contract — SURVEY.md §2.3 T4): caption completeness/heuristics (vectorized
numpy kernels), langid + perplexity (LUT scoring), PII scrub (regex
rewrite), fmt/decode/dims validity (per-row codec calls — the one
legitimately per-row loop, image decoding), then assembles the verdict
columns (keep / drop_reasons / caption_scrubbed / lang / ppl) with Arrow
list-array construction — no Python loop for the reason lists.

Dedup reasons are finalized later by the global dedup stage
(:mod:`rayquality.pipeline`); this stage's ``keep`` is pre-dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import codecs
from .config import QualityConfig
from .models import langid, perplexity
from .rules import heuristics
from .scrub import scrub_series
from .verdict import REASONS

_PRE_REASONS = tuple(r for r in REASONS if r not in ("exact_dup", "near_dup"))


class Scorer:
    """Callable class for ``map_batches(Scorer, fn_constructor_args=(cfg,), ...)``."""

    def __init__(self, cfg: QualityConfig | None = None) -> None:
        self.cfg = cfg or QualityConfig()
        self.langid = langid.get_model()
        self.ppl = perplexity.get_model()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_batch(batch, self.cfg, self.langid, self.ppl)


def reasons_list_array(masks: dict[str, np.ndarray], n: int) -> tuple[pa.ListArray, np.ndarray]:
    """Vectorized drop_reasons construction -> (list<string> array, keep mask)."""
    names = [r for r in REASONS if r in masks]
    if not names:
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], pa.string())
        )
        return empty, np.ones(n, dtype=bool)
    mm = np.column_stack([np.asarray(masks[r], dtype=bool) for r in names])  # (n, k)
    rows, cols = np.nonzero(mm)
    values = np.asarray(names, dtype=object)[cols]
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(mm.sum(axis=1), out=offsets[1:])
    arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values, pa.string()))
    keep = ~mm.any(axis=1)
    return arr, keep


def score_batch(
    batch: pa.Table,
    cfg: QualityConfig,
    lang_model: "langid.LangIdModel",
    ppl_model: "perplexity.PerplexityModel",
) -> pa.Table:
    n = batch.num_rows
    cap_col = batch["caption"]

    trimmed = pc.utf8_trim_whitespace(pc.fill_null(cap_col, ""))
    nullish = pc.or_(pc.is_null(cap_col), pc.equal(trimmed, "")).to_numpy(
        zero_copy_only=False
    )
    caps = cap_col.to_pylist()
    texts = ["" if ns else c for c, ns in zip(caps, nullish)]

    cs = heuristics.char_stats(texts)
    ws = heuristics.word_stats(texts)
    langs, confs = lang_model.predict(texts)
    ppls = ppl_model.perplexity(texts)

    active = ~nullish
    masks: dict[str, np.ndarray] = {
        "caption_missing": nullish & cfg.require_caption,
        "caption_too_short": active & (cs["n_chars"] < cfg.min_caption_len),
        "caption_too_long": active & (cs["n_chars"] > cfg.max_caption_len),
        "too_few_words": active & (ws["n_words"] < cfg.min_words),
        "symbol_ratio": active & (cs["symbol_ratio"] > cfg.max_symbol_ratio),
        "digit_ratio": active & (cs["digit_ratio"] > cfg.max_digit_ratio),
        "repetition": active & (ws["rep3_frac"] > cfg.max_rep3_frac),
        "stopword_density": active & (ws["stopword_frac"] < cfg.min_stopword_frac),
        "lang": active
        & (~np.isin(langs.astype(str), cfg.allowed_langs) | (confs < cfg.min_lang_conf)),
        "perplexity": active & (ppls > cfg.max_ppl),
    }

    # image validity: fmt vectorized; decode per row (codecs are per-image)
    fmt_ok = pc.is_in(batch["fmt"], value_set=pa.array(cfg.allowed_fmts)).to_numpy(
        zero_copy_only=False
    )
    masks["fmt_invalid"] = ~fmt_ok
    w_meta = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    h_meta = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    masks["size_bounds"] = ~(
        (w_meta >= cfg.min_side)
        & (w_meta <= cfg.max_side)
        & (h_meta >= cfg.min_side)
        & (h_meta <= cfg.max_side)
    )
    decode_err = np.zeros(n, dtype=bool)
    dims_bad = np.zeros(n, dtype=bool)
    phash_bad = np.zeros(n, dtype=bool)
    if cfg.check_decode:
        from .phash import phash64

        blobs = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        stored_ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        for i in np.nonzero(fmt_ok)[0].tolist():
            try:
                img = codecs.decode(blobs[i].as_py(), fmts[i])
                if cfg.check_dims and img.shape[:2] != (h_meta[i], w_meta[i]):
                    dims_bad[i] = True
                elif cfg.verify_phash and fmts[i] in codecs.LOSSLESS:
                    # consistency: stored phash must match the decoded pixels
                    phash_bad[i] = phash64(img) != stored_ph[i]
            except codecs.CodecError:
                decode_err[i] = True
    masks["decode_error"] = decode_err
    masks["dims_mismatch"] = dims_bad
    masks["phash_mismatch"] = phash_bad

    # PII scrub (rewrite in place; nullish rows pass through untouched)
    if cfg.scrub:
        s = pd.Series(caps, dtype="object")
        scrub_mask = active
        out = s.copy()
        hits = np.zeros(n, dtype=np.int64)
        if scrub_mask.any():
            sub, sub_hits = scrub_series(s[scrub_mask])
            out[scrub_mask] = sub
            hits[scrub_mask] = sub_hits
        scrubbed = pa.array(out.tolist(), pa.string())
        scrub_hits = pa.array(hits.astype(np.int32))
    else:
        scrubbed = pa.array(caps, pa.string())
        scrub_hits = pa.array(np.zeros(n, dtype=np.int32))

    reasons_arr, keep = reasons_list_array(masks, n)
    return (
        batch.append_column("keep", pa.array(keep))
        .append_column("drop_reasons", reasons_arr)
        .append_column("caption_scrubbed", scrubbed)
        .append_column("scrub_hits", scrub_hits)
        .append_column("lang", pa.array(langs.astype(str), pa.string()))
        .append_column("lang_conf", pa.array(confs, pa.float32()))
        .append_column("ppl", pa.array(ppls, pa.float32()))
    )
