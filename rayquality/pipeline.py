"""The flagship Ray-Data pipeline: streaming quality-filter + scrub + dedup.

Topology (all stages stream with backpressure; nothing materializes the
wide path — SURVEY.md §7.3):

  stage A (per wave of input files, checkpointed via lineage.Manifest):
    read_parquet(wave files)
      -> map_batches(Scorer actor pool)     # rules+models+scrub+decode, fused
      -> write_parquet(out/verdict/wave-N)  # all columns + pre-dedup verdict

  stage B (global, skinny columns only — the bytes column NEVER shuffles):
    exact dedup: salted two-phase groupby().aggregate(Count, Min) over
      (phash, salt); only groups with count>1 (the dup groups) return to the
      driver and broadcast as {phash: winner_id} via ray.put
    near dedup: band-key explode -> Count prefilter (only multi-member band
      groups survive) -> map_groups pair verification -> driver union-find
      -> broadcast near-loser id set
    finalize: map_batches over the verdict waves rewrites keep/drop_reasons
      for dup losers; kept rows written to out/kept (caption = scrubbed)

Skew: a degenerate hot phash (constant images) spreads over ``dedup_salt``
buckets in phase 1 and collapses to <= salt rows per key in phase 2
(SURVEY.md §4.2). Determinism: winner = min(image_id), never arrival order.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from . import dedup
from .config import RunConfig
from .lineage import Manifest, input_fingerprint
from .phash import band_keys
from .scoring import Scorer
from .verdict import REASONS


def _add_salt(n_salt: int):
    def fn(t: pa.Table) -> pa.Table:
        salt = (
            pd.util.hash_array(np.asarray(t["image_id"].to_pylist(), dtype=object))
            % n_salt
        ).astype(np.int64)
        return t.append_column("salt", pa.array(salt))

    return fn


def _filter_keep_skinny(t: pa.Table) -> pa.Table:
    return t.filter(t["keep"]).select(["phash", "image_id"])


def verdict_stage(paths: list[str], run_cfg: RunConfig) -> rd.Dataset:
    """read -> fused scoring stage (pre-dedup verdict columns appended)."""
    ds = rd.read_parquet(paths)
    # autoscaling pool (1, n): a fixed pool of n could reserve every CPU of a
    # small session and starve the read/write tasks into a stall
    return ds.map_batches(
        Scorer,
        fn_constructor_args=(run_cfg.quality,),
        batch_format="pyarrow",
        batch_size=run_cfg.batch_size,
        concurrency=(1, run_cfg.scorer_concurrency),
        num_cpus=1,
    )


def _tally(vds: rd.Dataset) -> dict:
    """Small reduce: total/kept + per-reason hit counts (partial per batch,
    final combine on the driver — no shuffle)."""

    def per_batch(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t["drop_reasons"])
        vc = flat.value_counts() if len(flat) else None
        reasons = vc.field("values").to_pylist() if vc is not None else []
        counts = vc.field("counts").to_pylist() if vc is not None else []
        reasons += ["__total__", "__kept__"]
        counts += [t.num_rows, int(pc.sum(t["keep"]).as_py() or 0)]
        return pa.table({"reason": reasons, "count": counts})

    parts = vds.select_columns(["keep", "drop_reasons"]).map_batches(
        per_batch, batch_format="pyarrow"
    )
    pdf = parts.to_pandas()  # tiny: (#batches x #reasons) rows
    agg = pdf.groupby("reason")["count"].sum().to_dict()
    return {
        "total": int(agg.pop("__total__", 0)),
        "kept": int(agg.pop("__kept__", 0)),
        "rule_hits": {r: int(agg.get(r, 0)) for r in REASONS if agg.get(r)},
    }


def compute_exact_dup_map(cand: rd.Dataset, n_salt: int) -> dict[int, str]:
    """{phash: winner_image_id} for phash groups with >1 candidate row."""
    s1 = (
        cand.map_batches(_add_salt(n_salt), batch_format="pyarrow")
        .groupby(["phash", "salt"])
        .aggregate(Count(alias_name="cnt"), Min("image_id", alias_name="win"))
    )
    s2 = s1.groupby("phash").aggregate(
        Sum("cnt", alias_name="cnt"), Min("win", alias_name="win")
    )
    dup = s2.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], 1)).select(["phash", "win"]),
        batch_format="pyarrow",
    ).to_pandas()  # dup groups only — the small side
    return dict(zip(dup["phash"].astype(np.int64), dup["win"]))


def _explode_bands(n_bands: int):
    def fn(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.asarray(t["image_id"].to_pylist(), dtype=object)
        keys = band_keys(ph, n_bands)  # (n, B)
        n = len(ph)
        return pa.table(
            {
                "bkey": pa.array(keys.T.reshape(-1)),
                "phash": pa.array(np.tile(ph, n_bands)),
                "image_id": pa.array(np.tile(ids, n_bands), pa.string()),
            }
        )

    return fn


def compute_near_losers(
    winners: rd.Dataset, max_hamming: int, n_bands: int
) -> set[str]:
    """Banded near-dup over global winners -> loser id set (driver union-find)."""
    banded = winners.map_batches(_explode_bands(n_bands), batch_format="pyarrow")
    kc = banded.groupby("bkey").aggregate(Count(alias_name="cnt"))
    hot_keys = kc.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], 1)).select(["bkey"]),
        batch_format="pyarrow",
    ).to_pandas()
    hot = set(hot_keys["bkey"].astype(np.int64))
    if not hot:
        return set()
    hot_ref = ray.put(hot)

    def only_hot(t: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        mask = np.isin(t["bkey"].to_numpy(zero_copy_only=False), np.fromiter(hs, np.int64))
        return t.filter(pa.array(mask))

    def pairs_fn(g: pd.DataFrame) -> pa.Table:
        # within a group ids are unique post-exact-dedup; returning Arrow keeps
        # Ray's block-size accounting happy on empty results
        prs = dedup.verified_pairs(
            g["phash"].to_numpy(np.int64), g["image_id"].to_numpy(object), max_hamming
        )
        a, b = zip(*prs) if prs else ((), ())
        return pa.table({"a": pa.array(list(a), pa.string()), "b": pa.array(list(b), pa.string())})

    pairs_ds = (
        banded.map_batches(only_hot, batch_format="pyarrow")
        .groupby("bkey")
        .map_groups(pairs_fn, batch_format="pandas")
    )
    pdf = pairs_ds.to_pandas()  # verified pairs: small
    pairs = set(zip(pdf["a"], pdf["b"])) if len(pdf) else set()
    return dedup.component_losers(pairs)


class Finalizer:
    """Rewrites keep/drop_reasons for dup losers (broadcast lookups)."""

    def __init__(self, dup_map_ref, near_ref) -> None:
        self.dup_map: dict[int, str] = ray.get(dup_map_ref)
        self.near: set[str] = ray.get(near_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        keep = t["keep"].to_numpy(zero_copy_only=False).copy()
        ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.asarray(t["image_id"].to_pylist(), dtype=object)
        exact = np.zeros(len(t), dtype=bool)
        near = np.zeros(len(t), dtype=bool)
        if self.dup_map:
            for i in np.nonzero(keep)[0].tolist():
                win = self.dup_map.get(int(ph[i]))
                if win is not None and ids[i] != win:
                    exact[i] = True
        if self.near:
            for i in np.nonzero(keep & ~exact)[0].tolist():
                if ids[i] in self.near:
                    near[i] = True
        hit = exact | near
        if not hit.any():
            return t
        new_keep = keep & ~hit
        # rebuild drop_reasons only for hit rows (they were empty lists)
        reasons = t["drop_reasons"].to_pylist()
        for i in np.nonzero(exact)[0].tolist():
            reasons[i] = ["exact_dup"]
        for i in np.nonzero(near)[0].tolist():
            reasons[i] = ["near_dup"]
        # set_column in place preserves column order and list field naming
        ki = t.schema.get_field_index("keep")
        t = t.set_column(ki, t.schema.field(ki), pa.array(new_keep))
        ri = t.schema.get_field_index("drop_reasons")
        return t.set_column(
            ri, t.schema.field(ri), pa.array(reasons, t.schema.field(ri).type)
        )


def run(corpus_dir: str, run_cfg: RunConfig | None = None) -> dict:
    """Full pipeline over a directory of input parquet shards -> summary dict."""
    run_cfg = run_cfg or RunConfig()
    cfg = run_cfg.quality
    out = run_cfg.output_dir or f"/tmp/rayquality_out/{cfg.digest()}"
    os.makedirs(out, exist_ok=True)
    manifest = Manifest(out)

    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet shards under {corpus_dir}")
    waves = [
        files[i : i + run_cfg.wave_size] for i in range(0, len(files), run_cfg.wave_size)
    ]

    # ---- stage A: per-wave verdict + scrub, checkpointed --------------------
    wave_dirs = []
    for wid, wfiles in enumerate(waves):
        wdir = os.path.join(out, "verdict", f"wave-{wid:05d}")
        wave_dirs.append(wdir)
        fp = input_fingerprint(wfiles, cfg.digest())
        if run_cfg.resume and manifest.completed(wid, fp):
            continue
        if os.path.exists(wdir):
            shutil.rmtree(wdir)  # partial output from a killed run
        vds = verdict_stage(wfiles, run_cfg)
        vds.write_parquet(wdir)
        stats = _tally(rd.read_parquet(wdir, columns=["keep", "drop_reasons"]))
        manifest.record(wid, fp, wfiles, wdir, stats)

    # ---- stage B: global dedup over skinny columns --------------------------
    # read_parquet with a list treats entries as files — expand the wave dirs
    verdict_files = sorted(
        f for w in wave_dirs for f in glob.glob(os.path.join(w, "*.parquet"))
    )
    all_verdicts = rd.read_parquet(verdict_files, columns=["phash", "image_id", "keep"])
    cand = all_verdicts.map_batches(_filter_keep_skinny, batch_format="pyarrow")

    dup_map: dict[int, str] = (
        compute_exact_dup_map(cand, cfg.dedup_salt) if cfg.dedup_exact else {}
    )
    dup_map_ref = ray.put(dup_map)

    near_losers: set[str] = set()
    if cfg.near_dup:
        dm = dup_map

        def winners_only(t: pa.Table) -> pa.Table:
            t = _filter_keep_skinny(t)
            if not dm:
                return t
            ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = np.asarray(t["image_id"].to_pylist(), dtype=object)
            mask = np.ones(len(t), dtype=bool)
            for i in range(len(t)):
                win = dm.get(int(ph[i]))
                if win is not None and ids[i] != win:
                    mask[i] = False
            return t.filter(pa.array(mask))

        winners = rd.read_parquet(
            verdict_files, columns=["phash", "image_id", "keep"]
        ).map_batches(winners_only, batch_format="pyarrow")
        near_losers = compute_near_losers(
            winners, cfg.near_dup_max_hamming, cfg.near_dup_bands
        )
    near_ref = ray.put(near_losers)

    # ---- finalize: rewrite dup verdicts, write final verdicts + kept corpus --
    skinny_cols = [
        "image_id",
        "phash",
        "keep",
        "drop_reasons",
        "caption_scrubbed",
        "scrub_hits",
        "lang",
        "lang_conf",
        "ppl",
    ]
    final_dir = os.path.join(out, "final")
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    rd.read_parquet(verdict_files, columns=skinny_cols).map_batches(
        Finalizer,
        fn_constructor_args=(dup_map_ref, near_ref),
        batch_format="pyarrow",
        concurrency=2,
    ).write_parquet(final_dir)

    kept_dir = os.path.join(out, "kept")
    if run_cfg.write_kept:
        if os.path.exists(kept_dir):
            shutil.rmtree(kept_dir)

        def kept_rows(t: pa.Table) -> pa.Table:
            t = t.filter(t["keep"])
            # the product caption IS the scrubbed caption
            idx = t.schema.get_field_index("caption")
            return t.set_column(idx, "caption", t["caption_scrubbed"])

        rd.read_parquet(verdict_files).map_batches(
            Finalizer,
            fn_constructor_args=(dup_map_ref, near_ref),
            batch_format="pyarrow",
            batch_size=run_cfg.batch_size,
            concurrency=2,
        ).map_batches(kept_rows, batch_format="pyarrow").write_parquet(kept_dir)

    stats = _tally(
        rd.read_parquet(
            sorted(glob.glob(os.path.join(final_dir, "*.parquet"))),
            columns=["keep", "drop_reasons"],
        )
    )
    summary = {
        "output_dir": out,
        "final_dir": final_dir,
        "kept_dir": kept_dir if run_cfg.write_kept else None,
        "waves": len(waves),
        "exact_dup_groups": len(dup_map),
        "near_dup_losers": len(near_losers),
        **stats,
    }
    return summary


def final_verdicts(out_dir: str) -> rd.Dataset:
    """Re-derive final verdict rows (without bytes) from a completed run."""
    return rd.read_parquet(
        sorted(glob.glob(os.path.join(out_dir, "verdict", "wave-*", "*.parquet")))
    )
