"""Deterministic synthetic image+caption corpus (FIXTURES.md F1).

One row per image+caption pair, exactly the BASELINE.json ``input_hint``
schema: ``image_id:string, bytes:large_binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64``.

Generation is sharded and seeded per (seed, shard) so the corpus is
bit-identical regardless of how many workers generate it, and scales by
adding shards. Defects are injected at fixed rates to exercise every rule:
null/empty captions (completeness), foreign-language / gibberish / short /
long / symbol-heavy / repetitive / stopword-poor captions (heuristics +
models), PII insertions (scrubber), bad fmt strings + corrupt payloads +
dimension mismatches (validity/consistency), exact-duplicate pixels and
near-duplicate perturbed copies plus one global constant "hot key" image
(dedup + skew salting).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs
from .models import corpus
from .phash import phash64
from .scrub import TOXIC_LEXICON

SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

ROWS_PER_SHARD = 2000  # tests/small corpora; large corpora pass rows_per_shard=20000
_FMTS = ("raw", "ppm", "png", "lossy")
_BAD_FMTS = ("webp", "gif", "bmp2")

# cumulative caption-type thresholds over U[0,1)
_TYPES = [
    ("clean", 0.62),
    ("pii", 0.70),
    ("foreign", 0.76),
    ("gibberish", 0.80),
    ("short", 0.83),
    ("long", 0.85),
    ("symbols", 0.88),
    ("repeat", 0.91),
    ("lowstop", 0.94),
    ("null", 0.97),
    ("empty", 1.01),
]


def _caption(rng: np.random.Generator, ctype: str) -> str | None:
    def sent(lang="en", lo=6, hi=14):
        words = corpus.WORDS[lang]
        k = int(rng.integers(lo, hi + 1))
        return " ".join(words[i] for i in rng.integers(0, len(words), size=k))

    if ctype == "null":
        return None
    if ctype == "empty":
        return "" if rng.random() < 0.5 else "   "
    if ctype == "clean":
        return sent().capitalize() + "."
    if ctype == "pii":
        base = sent().capitalize()
        kind = int(rng.integers(0, 4))
        if kind == 0:
            pii = f"contact {_word(rng)}@example.com"
        elif kind == 1:
            pii = f"call ({rng.integers(10, 99)}) 9{rng.integers(1000, 9999)}-{rng.integers(1000, 9999)}"
        elif kind == 2:
            pii = f"id {rng.integers(100, 999)}-{rng.integers(10, 99)}-{rng.integers(1000, 9999)}"
        else:
            pii = f"such a {TOXIC_LEXICON[int(rng.integers(0, len(TOXIC_LEXICON)))]} thing"
        return f"{base} {pii}."
    if ctype == "foreign":
        lang = ("pt", "es", "fr", "de")[int(rng.integers(0, 4))]
        return sent(lang).capitalize() + "."
    if ctype == "gibberish":
        n = int(rng.integers(30, 90))
        chars = np.array(list("abcdefghijklmnopqrstuvwxyzqxzjvkw"))
        return "".join(chars[rng.integers(0, len(chars), size=n)])
    if ctype == "short":
        return sent(lo=1, hi=1)[:8]
    if ctype == "long":
        return " ".join(sent() for _ in range(12))
    if ctype == "symbols":
        base = sent(lo=3, hi=5)
        syms = "".join("#$%&*!@^~"[int(i)] for i in rng.integers(0, 9, size=len(base)))
        return base + " " + syms
    if ctype == "repeat":
        phrase = sent(lo=3, hi=4)
        return " ".join([phrase] * 5)
    if ctype == "lowstop":
        # content words only, no function words -> low stopword density
        nouns = "widget gadget sprocket flange bracket gizmo doodad rotor stator spindle".split()
        k = int(rng.integers(6, 12))
        return " ".join(nouns[i] for i in rng.integers(0, len(nouns), size=k))
    raise ValueError(ctype)


def _word(rng: np.random.Generator) -> str:
    chars = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return "".join(chars[rng.integers(0, 26, size=int(rng.integers(4, 9)))])


def _gradient_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Gradient + low-frequency sinusoid texture + mild noise.

    The sinusoids give the image a non-degenerate DCT spectrum so the
    perceptual hash is stable under small pixel perturbations (a pure
    gradient's AC coefficients are ~0 and hash bits become noise).
    """
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.empty((h, w, 3), dtype=np.float64)
    for c in range(3):
        a, b = rng.uniform(-2, 2, size=2)
        base = rng.uniform(40, 215)
        chan = base + a * x + b * y
        for _ in range(3):
            fx, fy = rng.uniform(0.5, 3.5, size=2)
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(25, 60)
            chan = chan + amp * np.sin(2 * np.pi * (fx * x / w + fy * y / h) + phase)
        img[..., c] = chan
    img += rng.normal(0, 3, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_shard(
    shard: int, n_rows: int = ROWS_PER_SHARD, seed: int = 42, id_base: int | None = None
) -> pa.Table:
    """Deterministic shard -> Arrow table with the input_hint schema.

    ``id_base`` is the first global row index of this shard; it defaults to
    ``shard * n_rows`` which is ONLY correct when every shard has the same
    row count — a partial last shard must pass its true offset or its ids
    collide with the previous shard's range.
    """
    rng = np.random.default_rng((seed, shard))
    if id_base is None:
        id_base = shard * n_rows
    ids: list[str] = []
    blobs: list[bytes] = []
    ws: list[int] = []
    hs: list[int] = []
    fmts: list[str] = []
    caps: list[str | None] = []
    hashes: list[int] = []

    hot_img = np.full((32, 32, 3), 128, dtype=np.uint8)  # global constant image
    hot_hash = phash64(hot_img)
    base_pool: list[tuple[np.ndarray, int]] = []  # (pixels, phash) for dup/near-dup

    for i in range(n_rows):
        gid = id_base + i
        image_id = f"img-{gid:09d}"
        u = rng.random()
        ctype = next(name for name, thr in _TYPES if u < thr)
        caption = _caption(rng, ctype)

        r = rng.random()
        if r < 0.01:  # hot key: constant image (skew)
            img, ph = hot_img, hot_hash
        elif r < 0.04 and base_pool:  # exact duplicate pixels of an earlier row
            img, ph = base_pool[int(rng.integers(0, len(base_pool)))]
        elif r < 0.08 and base_pool:  # near-duplicate: lightly perturbed copy
            src, _ = base_pool[int(rng.integers(0, len(base_pool)))]
            noise = rng.integers(-2, 3, size=src.shape)
            img = np.clip(src.astype(np.int16) + noise, 0, 255).astype(np.uint8)
            ph = phash64(img)
        else:
            w = int(rng.integers(24, 49))
            h = int(rng.integers(24, 49))
            img = _gradient_image(rng, w, h)
            ph = phash64(img)
            if len(base_pool) < 32:
                base_pool.append((img, ph))

        h_px, w_px, _ = img.shape
        fmt = _FMTS[int(rng.integers(0, 4))]
        blob = codecs.encode(img, fmt)

        v = rng.random()
        if v < 0.02:  # invalid fmt string
            fmt = _BAD_FMTS[int(rng.integers(0, 3))]
        elif v < 0.03:  # corrupt payload (truncate)
            blob = blob[: max(4, len(blob) // 2)]
        elif v < 0.04:  # dimension metadata mismatch
            w_px += int(rng.integers(1, 5))
        elif v < 0.045:  # corrupted phash column (consistency defect)
            ph = int(np.int64(np.uint64(np.int64(ph)) ^ np.uint64(1 << int(rng.integers(0, 64)))))

        ids.append(image_id)
        blobs.append(blob)
        ws.append(w_px)
        hs.append(h_px)
        fmts.append(fmt)
        caps.append(caption)
        hashes.append(ph)

    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.large_binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        },
        schema=SCHEMA,
    )


def generate_parquet(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    rows_per_shard: int = ROWS_PER_SHARD,
    use_ray: bool = False,
) -> str:
    """Write the corpus as one parquet file per shard; returns ``out_dir``.

    Idempotent cache: if the directory already holds the expected shards
    (marker file matches), generation is skipped.
    """
    n_shards = max(1, (n_rows + rows_per_shard - 1) // rows_per_shard)
    marker = os.path.join(out_dir, "_SYNTH_OK")
    tag = f"{n_rows}:{seed}:{rows_per_shard}:v3"  # v3: unique ids on partial last shard
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # stale shards from a previous generation with different parameters
    # would silently inflate downstream globs — remove them first
    import glob as _glob

    for old in _glob.glob(os.path.join(out_dir, "shard-*.parquet")):
        os.remove(old)
    shards = list(range(n_shards))
    last_rows = n_rows - (n_shards - 1) * rows_per_shard

    def write_one(s: int) -> None:
        rows = last_rows if s == n_shards - 1 else rows_per_shard
        tbl = make_shard(s, rows, seed, id_base=s * rows_per_shard)
        pq.write_table(tbl, os.path.join(out_dir, f"shard-{s:05d}.parquet"))

    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _task(s: int) -> None:
            write_one(s)

        ray.get([_task.remote(s) for s in shards])
    else:
        for s in shards:
            write_one(s)
    with open(marker, "w") as f:
        f.write(tag)
    return out_dir


def default_corpus_dir(n_rows: int, seed: int = 42) -> str:
    return f"/tmp/rayquality_synth/n{n_rows}_s{seed}"


def ensure_corpus(n_rows: int, seed: int = 42, use_ray: bool = False) -> str:
    """Generate (or reuse cached) corpus; returns its directory."""
    return generate_parquet(default_corpus_dir(n_rows, seed), n_rows, seed, use_ray=use_ray)
