"""Golden-label oracle: naive single-process implementation of every rule.

Recasts the reference's decision arithmetic per row (threshold compare as in
``validators/completeness.py:113-120``, duplicate counting as in
``validators/duplicates.py:271-285``, regex/pattern semantics as in
``validators/patterns.py:203-232`` — /root/reference) plus the north-rule
caption heuristics and model thresholds, in plain per-row pandas/Python.

Deliberately NOT vectorized: this is the independent cross-check for the
pipeline's numpy/Arrow kernels (FIXTURES.md golden labels; pipeline must
match with F1 >= 0.99 — in practice exactly). The model artifacts
(langid/perplexity), the scrub regex list, and the dedup group semantics are
shared modules BY DESIGN (SURVEY.md §7.4: one lexicon, one model, one
winner rule); everything else is re-derived naively here.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from . import codecs, dedup
from .config import QualityConfig
from .models import langid, perplexity
from .rules.heuristics import STOPWORDS
from .scrub import scrub_text
from .verdict import REASONS

_PUNCT = set(b"!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
_DIGITS = set(b"0123456789")
_WORD_RE = re.compile(rb"[A-Za-z]+")
_STOP_PREFIX = {w.lower()[:16] for w in STOPWORDS}


def _caption_features(caption: str) -> dict:
    b = caption.encode("utf-8", "replace")
    n = len(b)
    words = [w.decode("ascii").lower()[:16] for w in _WORD_RE.findall(b)]
    tri = [tuple(words[i : i + 3]) for i in range(len(words) - 2)]
    return {
        "n_chars": n,
        "symbol_ratio": sum(1 for c in b if c in _PUNCT) / max(n, 1),
        "digit_ratio": sum(1 for c in b if c in _DIGITS) / max(n, 1),
        "n_words": len(words),
        "stopword_frac": (
            sum(1 for w in words if w in _STOP_PREFIX) / len(words) if words else 0.0
        ),
        "rep3_frac": (1.0 - len(set(tri)) / len(tri)) if tri else 0.0,
    }


def label(table: pa.Table | pd.DataFrame, cfg: QualityConfig | None = None) -> pd.DataFrame:
    """Golden verdicts for a corpus table -> one row per input row.

    Columns: image_id, keep, drop_reasons (list[str] in canonical order),
    caption_scrubbed, scrub_hits, lang, lang_conf, ppl.
    """
    cfg = cfg or QualityConfig()
    df = table.to_pandas() if isinstance(table, pa.Table) else table.reset_index(drop=True)
    n = len(df)

    lang_model = langid.get_model()
    ppl_model = perplexity.get_model()

    captions = [c if isinstance(c, str) else None for c in df["caption"]]
    nullish = [c is None or c.strip() == "" for c in captions]
    texts = [("" if ns else c) for c, ns in zip(captions, nullish)]
    langs, confs = lang_model.predict(texts)
    ppls = ppl_model.perplexity(texts)

    masks: dict[str, list[bool]] = {r: [False] * n for r in REASONS}
    scrubbed: list[str | None] = [None] * n
    scrub_hits = [0] * n

    for i in range(n):
        cap, ns = captions[i], nullish[i]
        if ns:
            masks["caption_missing"][i] = cfg.require_caption
            scrubbed[i] = cap
        else:
            f = _caption_features(cap)
            masks["caption_too_short"][i] = f["n_chars"] < cfg.min_caption_len
            masks["caption_too_long"][i] = f["n_chars"] > cfg.max_caption_len
            masks["too_few_words"][i] = f["n_words"] < cfg.min_words
            masks["symbol_ratio"][i] = f["symbol_ratio"] > cfg.max_symbol_ratio
            masks["digit_ratio"][i] = f["digit_ratio"] > cfg.max_digit_ratio
            masks["repetition"][i] = f["rep3_frac"] > cfg.max_rep3_frac
            masks["stopword_density"][i] = f["stopword_frac"] < cfg.min_stopword_frac
            masks["lang"][i] = (
                langs[i] not in cfg.allowed_langs or confs[i] < cfg.min_lang_conf
            )
            masks["perplexity"][i] = float(ppls[i]) > cfg.max_ppl
            if cfg.scrub:
                scrubbed[i], scrub_hits[i] = scrub_text(cap)
            else:
                scrubbed[i] = cap

        fmt = df["fmt"].iloc[i]
        fmt_ok = fmt in cfg.allowed_fmts
        masks["fmt_invalid"][i] = not fmt_ok
        w_meta, h_meta = int(df["w"].iloc[i]), int(df["h"].iloc[i])
        masks["size_bounds"][i] = not (
            cfg.min_side <= w_meta <= cfg.max_side and cfg.min_side <= h_meta <= cfg.max_side
        )
        if fmt_ok and cfg.check_decode:
            try:
                img = codecs.decode(df["bytes"].iloc[i], fmt)
                if cfg.check_dims and img.shape[:2] != (h_meta, w_meta):
                    masks["dims_mismatch"][i] = True
                elif cfg.verify_phash and fmt in codecs.LOSSLESS:
                    from .phash import phash64

                    masks["phash_mismatch"][i] = phash64(img) != int(df["phash"].iloc[i])
            except codecs.CodecError:
                masks["decode_error"][i] = True

    pre_rules = [r for r in REASONS if r not in ("exact_dup", "near_dup")]
    pass_pre = np.array(
        [not any(masks[r][i] for r in pre_rules) for i in range(n)], dtype=bool
    )

    ids = df["image_id"].to_numpy(dtype=object)
    phs = df["phash"].to_numpy(dtype=np.int64)
    if cfg.dedup_exact:
        ex = dedup.exact_losers(phs[pass_pre], ids[pass_pre])
        for i in range(n):
            if pass_pre[i] and ids[i] in ex:
                masks["exact_dup"][i] = True
    if cfg.near_dup:
        cand = pass_pre & ~np.array(masks["exact_dup"], dtype=bool)
        nd = dedup.near_losers(
            phs[cand], ids[cand], cfg.near_dup_max_hamming, cfg.near_dup_bands
        )
        for i in range(n):
            if cand[i] and ids[i] in nd:
                masks["near_dup"][i] = True

    reasons = [[r for r in REASONS if masks[r][i]] for i in range(n)]
    return pd.DataFrame(
        {
            "image_id": df["image_id"].to_numpy(),
            "keep": [not rs for rs in reasons],
            "drop_reasons": reasons,
            "caption_scrubbed": scrubbed,
            "scrub_hits": np.array(scrub_hits, dtype=np.int32),
            "lang": langs,
            "lang_conf": confs.astype(np.float32),
            "ppl": ppls,
        }
    )
