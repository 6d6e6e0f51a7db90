"""fastText-style language identifier: char-trigram profiles + linear scoring.

Per-language log-probability lookup tables over the 32-class trigram space
(add-one smoothing), scored per caption as the sum of trigram log-probs —
exactly the hashed-char-n-gram linear-model shape of fastText's langid,
shrunk to a deterministic in-repo artifact (no network; SURVEY.md §7.0).

The model trains once per process from the embedded corpus (~milliseconds)
and is cached; actor pools build it in ``__init__`` so it is warm across
batches (reference has no counterpart — north-rule stateful stage T4,
SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

from . import corpus, textfeat

UNKNOWN = "und"
_SOFTMAX_TEMP = 4.0


class LangIdModel:
    """Char-trigram profile classifier over ``corpus.LANGS``."""

    def __init__(self) -> None:
        self.langs = list(corpus.LANGS)
        luts = np.empty((len(self.langs), textfeat.N_TRIGRAMS), dtype=np.float64)
        for i, lang in enumerate(self.langs):
            counts = textfeat.trigram_count_table(corpus.training_corpus(lang))
            total = counts.sum()
            luts[i] = np.log(counts + 1.0) - np.log(total + textfeat.N_TRIGRAMS)
        self.luts = luts

    def predict(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """-> (lang codes as object array of str, confidence float32 in [0,1])."""
        scores, counts = textfeat.segment_scores(texts, self.luts)
        safe = np.maximum(counts, 1)[:, None]
        mean = scores / safe  # mean log-prob per trigram, comparable across lengths
        best = np.argmax(mean, axis=1)
        # softmax over mean log-probs -> confidence of the argmax
        z = (mean - mean.max(axis=1, keepdims=True)) * _SOFTMAX_TEMP
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        conf = p[np.arange(len(texts)), best].astype(np.float32)
        langs = np.array([self.langs[i] for i in best], dtype=object)
        empty = counts == 0
        langs[empty] = UNKNOWN
        conf[empty] = 0.0
        return langs, conf


_MODEL: LangIdModel | None = None


def get_model() -> LangIdModel:
    """Process-cached singleton (deterministic: same artifact everywhere)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = LangIdModel()
    return _MODEL
