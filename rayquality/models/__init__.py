"""Self-contained, deterministic model artifacts for the quality-filter stages.

No network and no third-party model libs exist in this environment
(SURVEY.md §7.0), so the "fastText-style" language-ID model and the
"KenLM-style" perplexity model are built in-repo from embedded seed corpora:

- :mod:`rayquality.models.langid` — char-trigram profile classifier over a
  32-class byte alphabet, scored via a per-language log-prob lookup table
  (the hashed-char-n-gram linear-model shape fastText uses).
- :mod:`rayquality.models.perplexity` — interpolated char-trigram backoff LM
  (the n-gram LM shape KenLM serves), perplexity per caption.

Both score a whole Arrow batch vectorized: texts are byte-encoded, mapped
through a 256-entry class LUT, turned into trigram codes with stride
arithmetic, and segment-summed with ``np.add.reduceat`` — no Python loop per
row. Training is deterministic (fixed seed, embedded corpus), so the oracle
and the pipeline share bit-identical models.
"""
