"""Embedded seed corpora for deterministic model training and caption synthesis.

Word inventories per language plus a seeded sentence generator. Everything
derives from these lists with fixed seeds, so langid/perplexity training and
the synthetic caption corpus are reproducible bit-for-bit across processes
(a hard determinism requirement — SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

# Frequent function + content words per language. These only need to induce
# distinct char-trigram distributions, not be linguistically exhaustive.
WORDS: dict[str, list[str]] = {
    "en": (
        "the of and to in is was for that with as his on at by he from they her "
        "she which this had not are but have an you were all we when there can "
        "more if out who will so said about up its into time year some could them "
        "people state only new work first may such where most house between city "
        "world water light great small every found under story night music white "
        "river mountain children morning different following without question"
    ).split(),
    "pt": (
        "o a de que e do da em um para com não uma os no se na por mais as dos "
        "como mas ao ele das seu sua ou quando muito nos já eu também pelo pela "
        "até isso ela entre depois sem mesmo aos seus quem nas me esse eles você "
        "essa num nem suas meu às minha numa pelos qual tempo casa água cidade "
        "mundo trabalho noite grande pequeno sempre coração criança história"
    ).split(),
    "es": (
        "el la de que y a en un ser se no haber por con su para como estar tener "
        "le lo todo pero más hacer o poder decir este ir otro ese si me ya ver "
        "porque dar cuando muy sin vez mucho saber qué sobre mi alguno mismo yo "
        "también hasta año dos querer entre así primero desde grande eso ni nos "
        "ciudad tiempo mundo agua noche casa trabajo corazón niño historia"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du elle au "
        "pour pas vouloir sur faire plus dire me on mon lui nous comme mais avec "
        "tout y aller voir bien où sans tu ou leur homme si deux mari moi vous "
        "temps très quand même notre autre après chose seulement maison eau "
        "ville monde nuit travail grand petit toujours cœur enfant histoire"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht ein "
        "eine als auch es an werden aus er hat dass sie nach wird bei einer um am "
        "sind noch wie einem über einen so zum war haben nur oder aber vor zur "
        "bis mehr durch man sein wurde sei stadt zeit wasser nacht haus arbeit "
        "welt groß klein immer herz kind geschichte straße jahr leben"
    ).split(),
}

LANGS = tuple(sorted(WORDS))


def sentences(lang: str, n: int, seed: int, min_words: int = 5, max_words: int = 14) -> list[str]:
    """Deterministic pseudo-sentences: seeded word draws from the inventory."""
    rng = np.random.default_rng(seed)
    words = WORDS[lang]
    out = []
    for _ in range(n):
        k = int(rng.integers(min_words, max_words + 1))
        idx = rng.integers(0, len(words), size=k)
        out.append(" ".join(words[i] for i in idx))
    return out


def training_corpus(lang: str, n: int = 400) -> list[str]:
    """The fixed training text for model building (seed differs from synth)."""
    return sentences(lang, n, seed=hash_seed(lang))


def hash_seed(lang: str) -> int:
    # stable across processes (no PYTHONHASHSEED dependence)
    return 1000003 + sum(ord(c) * 131**i for i, c in enumerate(lang)) % 999983
