"""Document quality-filter pipeline — the text-corpus sibling of the image
flagship (``rayquality.pipeline``), with the SAME scale discipline:

  stage A (per wave of input files, checkpointed via lineage.Manifest):
    read_parquet(wave files)
      -> map_batches(_DocScorer actor pool)   # signals+models+scrub, fused;
                                              # emits the 16-byte content hash
      -> write_parquet(out/scored/wave-N)     # parquet checkpoint, resumable
    + one fused SKINNY re-read per wave: threshold-rule tallies for the
      manifest AND the exact-dedup combiner partials (hash, min_id, cnt)

  stage B (global, skinny columns only — document bodies never shuffle):
    exact dedup: combine the per-wave partials (adaptive driver /
      distributed, same DRIVER_COMBINE_MAX contract as the flagship); only
      DUP GROUPS (count > 1) broadcast as {content_hash: winner_id} — the
      loser map, O(duplicate groups), never an O(N) winner set
    near dedup: MinHash LSH over exact winners only (band explode -> count
      prefilter -> hash-partition pair kernel, ops/textdedup.py); loser =
      max(id) per verified pair
    finalize: ONE read of the scored waves rewrites keep / drop_reasons
      (list<string>, same schema as the flagship) and emits final/ + kept/
      — with write_kept the text column is read once and both sinks are
      fed from the same pass; without it the read PRUNES the text column.

Resume: wave fingerprints (input paths + sizes + config digest) — a killed
run re-scores only incomplete waves; final/ and kept/ are derived outputs,
always rebuilt. Decision arithmetic follows the reference's rule->report
contract (engine.py citations) with text-corpus rules instead of caption
rules.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .lineage import Manifest, input_fingerprint

# threshold reasons are wave-local (recorded in the manifest); dedup
# reasons are global (counted at finalize)
THRESHOLD_REASONS = ("too_few_tokens", "alpha_ratio", "perplexity")


@dataclass(frozen=True)
class DocRunConfig:
    output_dir: str
    min_tokens: int = 5
    min_alpha_ratio: float = 0.45
    max_ppl: float = 70.0
    near_dup_threshold: float = 0.5
    write_kept: bool = True
    scrub: bool = True
    use_models: bool = True  # False: heuristic rules only (SQL-expressible)
    near_dup: bool = True
    wave_size: int = 64
    resume: bool = True

    def digest(self) -> str:
        key = (
            f"{self.min_tokens}:{self.min_alpha_ratio}:{self.max_ppl}:"
            f"{self.near_dup_threshold}:{self.scrub}:{self.use_models}:"
            f"{self.near_dup}"
        )
        return hashlib.sha1(key.encode()).hexdigest()[:12]


class _DocScorer:
    """Fused per-batch scorer: one pass computes every per-document signal
    (models/LUTs built once per actor, vectorized kernels per batch)."""

    def __init__(self, scrub: bool = True, use_models: bool = True) -> None:
        self.scrub = scrub
        self.use_models = use_models
        if use_models:
            from .models import langid, perplexity

            self.lang = langid.get_model()
            self.ppl = perplexity.get_model()

    def __call__(self, t: pa.Table) -> pa.Table:
        from .scrub import scrub_series

        # null text counts as empty EVERYWHERE (a null would make every
        # scalar signal null, and NaN threshold comparisons are all False —
        # the document would silently bypass the filter)
        txt = pc.fill_null(t["text"].combine_chunks().cast(pa.string()), "")
        if self.scrub:
            scrubbed_s, hits = scrub_series(pd.Series(txt.to_pylist()))
            txt = pa.array(scrubbed_s.tolist(), pa.string())
            scrub_hits = pa.array(hits, pa.int64())
        else:
            scrub_hits = pa.array(np.zeros(len(txt), np.int64))
        n_tokens = pc.count_substring_regex(txt, r"\S+").cast(pa.int64())
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_alpha = pc.count_substring_regex(txt, "[a-zA-Z]").cast(pa.int64())
        alpha_ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())), pa.float64()),
        )
        # 16-byte content hash of the (scrubbed) text: stage B dedups on
        # this column so document bodies never shuffle or re-hash
        texts = txt.to_pylist()
        th = pa.array(
            [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts], pa.string()
        )
        cols: dict = {
            "doc_id": t["doc_id"],
            "text": txt,
            "text_h": th,
            "n_tokens": n_tokens,
            "alpha_ratio": alpha_ratio,
            "scrub_hits": scrub_hits,
        }
        if self.use_models:
            langs, _confs = self.lang.predict(texts)
            ppls = self.ppl.perplexity(texts)
            cols["lang_pred"] = pa.array(langs.astype(str), pa.string())
            cols["ppl"] = pa.array(ppls.astype(np.float64))
        return pa.table(cols)


def _threshold_masks(t: pa.Table, cfg: DocRunConfig) -> dict[str, np.ndarray]:
    """Per-rule boolean hit masks from the scored signal columns (shared by
    the wave tally and the finalize verdict — one definition)."""
    masks = {
        "too_few_tokens": pc.less(t["n_tokens"], cfg.min_tokens).to_numpy(
            zero_copy_only=False
        ),
        "alpha_ratio": pc.less(t["alpha_ratio"], cfg.min_alpha_ratio).to_numpy(
            zero_copy_only=False
        ),
    }
    if cfg.use_models:
        masks["perplexity"] = pc.greater(t["ppl"], cfg.max_ppl).to_numpy(
            zero_copy_only=False
        )
    return masks


def _wave_scan(files: list[str], cfg: DocRunConfig) -> tuple[dict, pa.Table]:
    """One skinny pass over a written wave -> (tally stats, dedup partials).

    Mirrors the flagship's fused wave scan (pipeline._wave_scan): the
    manifest tally and the exact-dedup combiner share one column-pruned
    read, so stage B's small path needs NO additional read."""
    cols = ["doc_id", "text_h", "n_tokens", "alpha_ratio"] + (
        ["ppl"] if cfg.use_models else []
    )

    def per_batch(t: pa.Table) -> pa.Table:
        masks = _threshold_masks(t, cfg)
        reasons = list(masks) + ["__total__"]
        counts = [int(m.sum()) for m in masks.values()] + [t.num_rows]
        g = t.select(["text_h", "doc_id"]).group_by("text_h").aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        n1, n2 = len(reasons), g.num_rows
        return pa.table(
            {
                "kind": pa.array(["t"] * n1 + ["p"] * n2),
                "reason": pa.array(reasons + [None] * n2, pa.string()),
                "count": pa.array(counts + [0] * n2, pa.int64()),
                "h": pa.concat_arrays(
                    [pa.array([""] * n1, pa.string()), g["text_h"].combine_chunks()]
                ),
                "win": pa.concat_arrays(
                    [
                        pa.array([0] * n1, pa.int64()),
                        g["doc_id_min"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "cnt": pa.concat_arrays(
                    [
                        pa.array([0] * n1, pa.int64()),
                        g["doc_id_count"].combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        )

    from .pipeline import _collect_arrow

    tbl = _collect_arrow(
        rd.read_parquet(files, columns=cols).map_batches(per_batch, batch_format="pyarrow")
    )
    is_t = pc.equal(tbl["kind"], "t")
    trows = tbl.filter(is_t)
    agg: dict[str, int] = {}
    for r, c in zip(trows["reason"].to_pylist(), trows["count"].to_pylist()):
        agg[r] = agg.get(r, 0) + c
    stats = {
        "total": int(agg.pop("__total__", 0)),
        "rule_hits": {r: int(agg.get(r, 0)) for r in THRESHOLD_REASONS if agg.get(r)},
    }
    partials = tbl.filter(pc.invert(is_t)).select(["h", "win", "cnt"])
    return stats, partials


def _combine_dup_map(
    partial_tables: list[pa.Table] | None, scored_files: list[str], approx_rows: int
) -> tuple[dict[str, int], int]:
    """({content_hash: winner_doc_id} for DUP GROUPS ONLY, exact-loser
    count). Adaptive driver/distributed combine, flagship contract."""
    from .ops.combine import combine_partials
    from .pipeline import DRIVER_COMBINE_MAX, _collect_arrow

    if partial_tables is not None and approx_rows <= DRIVER_COMBINE_MAX:
        ptbl = pa.concat_tables(partial_tables)
        g = ptbl.group_by("h").aggregate([("cnt", "sum"), ("win", "min")])
        g = g.rename_columns(["h", "cnt", "win"])
        dupg = g.filter(pc.greater(g["cnt"], 1))
        dup = dupg.to_pandas()
    else:
        # re-derive partials distributedly from the scored waves and combine
        # via the hash-partition kernel (never Dataset.groupby.aggregate on
        # skinny partials — measured pathologically slow)
        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by("text_h").aggregate([("doc_id", "min"), ("doc_id", "count")])
            return g.rename_columns(["h", "win", "cnt"])

        parts = rd.read_parquet(scored_files, columns=["doc_id", "text_h"]).map_batches(
            partial, batch_format="pyarrow"
        )
        comb = combine_partials(parts, keys=["h"], sums=["cnt"], mins=["win"])
        dup = (
            comb.map_batches(
                lambda t: t.filter(pc.greater(t["cnt"], 1)), batch_format="pyarrow"
            ).to_pandas()  # dup groups only — the small side
        )
    if not len(dup):
        return {}, 0
    losers = int((dup["cnt"] - 1).sum())
    return dict(zip(dup["h"], dup["win"].astype(np.int64))), losers


def run_documents(docs: rd.Dataset | str, cfg: DocRunConfig) -> dict:
    """Run the document quality filter; returns a summary dict (counts +
    rule hits + output dirs). ``docs`` is a parquet path (file or
    directory; waved + resumable) or a Dataset (single unwaved pass)."""
    from .ops import textdedup
    from .pipeline import DRIVER_COMBINE_MAX
    from .pool import actor_cpus, pool_size

    out = cfg.output_dir
    os.makedirs(out, exist_ok=True)
    manifest = Manifest(out)

    if isinstance(docs, str):
        paths = sorted(_glob.glob(os.path.join(docs, "*.parquet"))) or [docs]
        waves = [paths[i : i + cfg.wave_size] for i in range(0, len(paths), cfg.wave_size)]
    else:
        waves = [None]  # a Dataset input can't be fingerprinted -> no resume

    manifest.prune(len(waves))
    for stale in sorted(_glob.glob(os.path.join(out, "scored", "wave-*"))):
        if int(stale.rsplit("-", 1)[1]) >= len(waves):
            shutil.rmtree(stale)

    # ---- stage A: per-wave scoring, checkpointed ---------------------------
    wave_dirs: list[str] = []
    partial_tables: list[pa.Table] | None = []
    partial_rows = 0
    for wid, wfiles in enumerate(waves):
        wdir = os.path.join(out, "scored", f"wave-{wid:05d}")
        wave_dirs.append(wdir)
        fp = input_fingerprint(wfiles, cfg.digest()) if wfiles is not None else None
        done = cfg.resume and fp is not None and manifest.completed(wid, fp)
        if not done:
            if os.path.exists(wdir):
                shutil.rmtree(wdir)  # partial output from a killed run
            src = rd.read_parquet(wfiles) if wfiles is not None else docs
            src.select_columns(["doc_id", "text"]).map_batches(
                _DocScorer,
                fn_constructor_args=(cfg.scrub, cfg.use_models),
                batch_format="pyarrow",
                concurrency=(1, pool_size()),
                num_cpus=actor_cpus(),
            ).write_parquet(wdir, min_rows_per_file=16_384)
        stats, partials = _wave_scan(sorted(_glob.glob(os.path.join(wdir, "*.parquet"))), cfg)
        if not done and fp is not None:
            manifest.record(wid, fp, wfiles, wdir, stats)
        if partial_tables is not None:
            partial_tables.append(partials)
            partial_rows += partials.num_rows
            if partial_rows > DRIVER_COMBINE_MAX:
                partial_tables = None  # too big for a driver combine

    scored_files = sorted(
        f for w in wave_dirs for f in _glob.glob(os.path.join(w, "*.parquet"))
    )

    # ---- stage B: global dedup on the 16-byte content hash ------------------
    # only dup groups broadcast: {hash: winner}; a doc is an exact loser iff
    # its hash is in the map and it is not the group winner
    dup_map, exact_loser_count = _combine_dup_map(
        partial_tables, scored_files, partial_rows
    )
    dup_ref = ray.put(dup_map)

    near_losers: set[int] = set()
    if cfg.near_dup:
        # near-dup among exact winners ONLY: an m-copy content cluster would
        # otherwise bucket all m identical signatures together and verify
        # ~m^2/2 jaccard=1.0 pairs the winner filter throws away
        def only_winners(t: pa.Table) -> pa.Table:
            dm: dict[str, int] = ray.get(dup_ref)
            if not dm:
                return t.select(["doc_id", "text"])
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            wins = pd.Series(t["text_h"].to_pylist()).map(dm)
            mask = wins.isna().to_numpy() | (wins.to_numpy() == ids)
            return t.select(["doc_id", "text"]).filter(pa.array(mask))

        winner_docs = rd.read_parquet(
            scored_files, columns=["doc_id", "text", "text_h"]
        ).map_batches(only_winners, batch_format="pyarrow")
        pairs = textdedup.minhash_lsh_pairs(winner_docs, threshold=cfg.near_dup_threshold)
        if len(pairs):
            near_losers = set(
                np.maximum(pairs["id_a"], pairs["id_b"]).astype(int).tolist()
            )
    near_ref = ray.put(near_losers)

    # ---- finalize: verdicts + final/ + kept/ in one read ---------------------
    def verdict(t: pa.Table) -> pa.Table:
        dm: dict[str, int] = ray.get(dup_ref)
        d_near: set[int] = ray.get(near_ref)
        masks = _threshold_masks(t, cfg)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if dm:
            wins = pd.Series(t["text_h"].to_pylist()).map(dm)
            masks["exact_dup"] = wins.notna().to_numpy() & (wins.to_numpy() != ids)
        else:
            masks["exact_dup"] = np.zeros(len(ids), dtype=bool)
        masks["near_dup"] = (
            pd.Series(ids).isin(d_near).to_numpy()
            if d_near
            else np.zeros(len(ids), dtype=bool)
        )
        drop = np.zeros(len(ids), dtype=bool)
        reasons: list[list[str]] = [[] for _ in range(len(ids))]
        for r, m in masks.items():
            drop |= m
            for i in np.nonzero(m)[0].tolist():
                reasons[i].append(r)
        t = t.append_column("keep", pa.array(~drop))
        return t.append_column("drop_reasons", pa.array(reasons, pa.list_(pa.string())))

    final_dir = os.path.join(out, "final")
    kept_dir = os.path.join(out, "kept") if cfg.write_kept else None
    shutil.rmtree(final_dir, ignore_errors=True)  # derived output: rebuild

    if cfg.write_kept:
        shutil.rmtree(kept_dir, ignore_errors=True)
        os.makedirs(final_dir, exist_ok=True)

        def finalize_both(t: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            t = verdict(t)
            # content-hash filename: a retried task overwrites its own file
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            name = hashlib.md5(ids.tobytes()).hexdigest()[:20]
            pq.write_table(
                t.drop_columns(["text"]),
                os.path.join(final_dir, f"part-{name}.parquet"),
            )
            return t.filter(t["keep"]).select(["doc_id", "text"])

        rd.read_parquet(scored_files).map_batches(
            finalize_both, batch_format="pyarrow", batch_size=16_384
        ).write_parquet(kept_dir, min_rows_per_file=16_384)
    else:
        # no kept corpus -> the text column is never read back at all
        cols = [
            "doc_id",
            "text_h",
            "n_tokens",
            "alpha_ratio",
            "scrub_hits",
        ] + (["lang_pred", "ppl"] if cfg.use_models else [])
        rd.read_parquet(scored_files, columns=cols).map_batches(
            verdict, batch_format="pyarrow"
        ).write_parquet(final_dir, min_rows_per_file=16_384)

    # ---- summary: skinny tally over final/ (keep + drop_reasons only) -------
    def tally(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t["drop_reasons"])
        vc = flat.value_counts() if len(flat) else None
        reasons = vc.field("values").to_pylist() if vc is not None else []
        counts = [int(c) for c in (vc.field("counts").to_pylist() if vc is not None else [])]
        reasons += ["__total", "__kept"]
        counts += [t.num_rows, int(pc.sum(t["keep"]).as_py() or 0)]
        return pa.table({"key": pa.array(reasons, pa.string()), "n": pa.array(counts, pa.int64())})

    parts = (
        rd.read_parquet(
            sorted(_glob.glob(os.path.join(final_dir, "*.parquet"))),
            columns=["keep", "drop_reasons"],
        )
        .map_batches(tally, batch_format="pyarrow")
        .to_pandas()
        .groupby("key")["n"]
        .sum()
    )
    hits = {k: int(v) for k, v in parts.items() if not k.startswith("__")}
    assert hits.get("exact_dup", 0) == exact_loser_count  # lineage cross-check
    return {
        "total": int(parts.get("__total", 0)),
        "kept": int(parts.get("__kept", 0)),
        "rule_hits": hits,
        "final_dir": final_dir,
        "kept_dir": kept_dir,
        "waves": len(waves),
    }
