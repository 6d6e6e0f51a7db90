"""Declarative pipeline configuration.

Replaces the reference's env-var + ``ValidationRule`` mutable-registry
surface (``src/data_quality/config.py:10-106``,
``validators/base.py:77-107`` in /root/reference) with one immutable spec
compiled into the plan and shipped to every task (SURVEY.md §2.10, §2.3 T1).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class QualityConfig:
    """Thresholds for the image+caption quality-filter pipeline.

    Defaults mirror the reference's decision arithmetic where one exists
    (completeness threshold 0.95 @ WARNING — ``validators/completeness.py:29-35``;
    max_duplicates 0 @ ERROR — ``validators/duplicates.py:37-43``); the
    heuristic/model thresholds are north-rule additions.
    """

    # completeness (caption present & non-empty)
    require_caption: bool = True
    # caption length bounds (bytes, utf-8)
    min_caption_len: int = 10
    max_caption_len: int = 512
    # heuristic thresholds
    max_symbol_ratio: float = 0.30
    max_digit_ratio: float = 0.50
    max_rep3_frac: float = 0.50
    min_stopword_frac: float = 0.02
    min_words: int = 3
    # model thresholds
    allowed_langs: tuple[str, ...] = ("en",)
    min_lang_conf: float = 0.20
    max_ppl: float = 12.0
    # image validity
    allowed_fmts: tuple[str, ...] = ("raw", "ppm", "png", "lossy")
    check_decode: bool = True
    check_dims: bool = True
    # recompute the perceptual hash from decoded pixels and require equality
    # with the stored phash column (lossless formats only — lossy decode
    # perturbs low-order DCT coefficients)
    verify_phash: bool = True
    min_side: int = 8
    max_side: int = 8192
    # dedup
    dedup_exact: bool = True
    near_dup: bool = True
    # recall guarantee requires bands > max_hamming (pigeonhole: d differing
    # bits can break at most d bands); bands <= max_hamming silently misses
    # worst-case pairs. Default = (3, 4): guaranteed recall AND 16-bit
    # bands — 5 narrower bands (13-bit) would inflate candidate groups ~10x
    # at 10^6+ winners (measured: near-dedup 30 s vs 3 s at 1.46M winners).
    # Configs violating bands > max_hamming are allowed but approximate.
    near_dup_max_hamming: int = 3
    near_dup_bands: int = 4
    dedup_salt: int = 16  # salt buckets for skewed phash keys
    # scrub
    scrub: bool = True

    def digest(self) -> str:
        """Stable fingerprint of the config (lineage manifests)."""
        import hashlib
        import json
        from dataclasses import asdict

        payload = json.dumps(asdict(self), sort_keys=True, default=list)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


@dataclass(frozen=True)
class RunConfig:
    """Execution knobs for one pipeline run."""

    batch_size: int = 1024  # rows per batch; bytes column dominates memory
    scorer_concurrency: int = 4  # actor-pool size for the model stage
    output_dir: str | None = None
    resume: bool = True
    wave_size: int = 64  # input files per checkpoint wave (resume granularity)
    write_kept: bool = True  # materialize the filtered+scrubbed corpus
    # keep the image bytes in the verdict checkpoints; required for
    # write_kept (the kept pass re-reads them from the waves). Verdict-only
    # runs can drop them: the original corpus still holds bytes by image_id
    store_bytes: bool = True
    quality: QualityConfig = field(default_factory=QualityConfig)
