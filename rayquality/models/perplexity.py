"""KenLM-style perplexity scorer: char-trigram LM with additive smoothing.

log P(c2 | c0 c1) = log( (count(c0c1c2) + a) / (count(c0c1) + a*32) ),
perplexity = exp( -mean log P ) over a caption's trigrams. Trained on the
embedded English corpus; clean English scores low, gibberish and
foreign-alphabet text score high. Same deterministic-artifact contract as
:mod:`rayquality.models.langid`.
"""

from __future__ import annotations

import numpy as np

from . import corpus, textfeat

_ALPHA = 0.1
PPL_EMPTY = 1.0e6  # sentinel for texts with no trigrams


class PerplexityModel:
    def __init__(self, lang: str = "en") -> None:
        texts = corpus.training_corpus(lang)
        tri = textfeat.trigram_count_table(texts).astype(np.float64)
        bi = textfeat.bigram_count_table(texts).astype(np.float64)
        # broadcast bigram context counts over the trailing class dimension
        ctx = np.repeat(bi, textfeat.N_CLASSES)
        self.lut = (np.log(tri + _ALPHA) - np.log(ctx + _ALPHA * textfeat.N_CLASSES))[
            None, :
        ]  # (1, 32768) for segment_scores

    def perplexity(self, texts: list[str]) -> np.ndarray:
        """-> float32 perplexity per text; PPL_EMPTY when no trigrams."""
        scores, counts = textfeat.segment_scores(texts, self.lut)
        out = np.full(len(texts), PPL_EMPTY, dtype=np.float64)
        nz = counts > 0
        out[nz] = np.exp(-scores[nz, 0] / counts[nz])
        return np.minimum(out, PPL_EMPTY).astype(np.float32)


_MODEL: PerplexityModel | None = None


def get_model() -> PerplexityModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = PerplexityModel()
    return _MODEL
