"""Document quality-filter pipeline — the text-corpus sibling of the image
flagship (``rayquality.pipeline``), composing the generic text operators
into one end-to-end curation run:

  read -> FUSED scoring actor pool (quality features + language ID +
  perplexity + PII scrub, models built once per actor) -> exact dedup
  (content-hash shuffle, min-id wins) -> MinHash near-dup (banded pair
  kernel, min-id wins) -> verdict + kept-corpus write.

Scale shape mirrors the flagship: document bodies cross the cluster only
in the scoring pass and the final write; dedup shuffles 16-byte hashes and
band keys; drop maps broadcast via ``ray.put``. Decision arithmetic
follows the reference's rule->report contract (engine.py citations) with
text-corpus rules instead of caption rules.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


@dataclass(frozen=True)
class DocRunConfig:
    output_dir: str
    min_tokens: int = 5
    min_alpha_ratio: float = 0.45
    max_ppl: float = 70.0
    near_dup_threshold: float = 0.5
    write_kept: bool = True
    scrub: bool = True


class _DocScorer:
    """Fused per-batch scorer: one pass computes every per-document signal
    (models/LUTs built once per actor, vectorized kernels per batch)."""

    def __init__(self) -> None:
        from .models import langid, perplexity

        self.lang = langid.get_model()
        self.ppl = perplexity.get_model()

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .scrub import scrub_series

        texts = ["" if s is None else s for s in t["text"].to_pylist()]
        # null text counts as empty EVERYWHERE (a null would make every
        # scalar signal null, and NaN threshold comparisons are all False —
        # the document would silently bypass the filter)
        txt = pc.fill_null(t["text"].combine_chunks().cast(pa.string()), "")
        n_tokens = pc.count_substring_regex(txt, r"\S+").cast(pa.int64())
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_alpha = pc.count_substring_regex(txt, "[a-zA-Z]").cast(pa.int64())
        alpha_ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())), pa.float64()),
        )
        langs, _confs = self.lang.predict(texts)
        ppls = self.ppl.perplexity(texts)
        scrubbed, hits = scrub_series(pd.Series(texts))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array(scrubbed.tolist(), pa.string()),
                "n_tokens": n_tokens,
                "alpha_ratio": alpha_ratio,
                "lang_pred": pa.array(langs.astype(str), pa.string()),
                "ppl": pa.array(ppls.astype(np.float64)),
                "scrub_hits": pa.array(hits, pa.int64()),
            }
        )


def run_documents(docs: rd.Dataset | str, cfg: DocRunConfig) -> dict:
    """Run the document quality filter; returns a summary dict (counts +
    rule hits + output dirs). ``docs`` is a Dataset or a parquet path."""
    from .ops import textdedup
    from .pool import actor_cpus, pool_size

    if isinstance(docs, str):
        paths = sorted(_glob.glob(os.path.join(docs, "*.parquet"))) or [docs]
        docs = rd.read_parquet(paths)

    scored = docs.select_columns(["doc_id", "text"]).map_batches(
        _DocScorer,
        batch_format="pyarrow",
        concurrency=(1, pool_size()),
        num_cpus=actor_cpus(),
    )
    # one materialization: dedup consumes it twice (hash groupby + near-dup
    # banding) and the verdict pass reads it once more
    scored = scored.materialize()

    # exact dedup on the SCRUBBED text (hash shuffle, min-id wins). A doc
    # with unique content is its own group's winner, so exact-dup losers
    # are exactly the ids NOT in the winner set — no second full scan.
    winners = textdedup.exact_dedup(scored).to_pandas()["doc_id"].to_numpy()
    keep_w = set(winners.tolist())

    # near-dup among exact winners ONLY: an m-copy content cluster would
    # otherwise bucket all m identical signatures together and verify
    # ~m^2/2 jaccard=1.0 pairs that the winner filter throws away
    winners_pre = ray.put(keep_w)

    def only_winners(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"].isin(ray.get(winners_pre))]

    winner_docs = scored.map_batches(only_winners, batch_format="pandas")
    pairs = textdedup.minhash_lsh_pairs(winner_docs, threshold=cfg.near_dup_threshold)
    near_losers: set[int] = set()
    if len(pairs):
        near_losers = set(
            np.maximum(pairs["id_a"], pairs["id_b"]).astype(int).tolist()
        )
    # winner-id set broadcast once per node, same contract as the image
    # flagship's winner maps; at extreme scale swap for a skinny keep-flag
    # hash join on doc_id
    winners_ref = ray.put(keep_w)
    drop_near_ref = ray.put(near_losers)

    cfg_vals = (cfg.min_tokens, cfg.min_alpha_ratio, cfg.max_ppl)

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        min_tok, min_alpha, max_ppl = cfg_vals
        keepers = ray.get(winners_ref)
        d_near = ray.get(drop_near_ref)
        reasons = {
            "too_few_tokens": (df["n_tokens"] < min_tok).to_numpy(),
            "alpha_ratio": (df["alpha_ratio"] < min_alpha).to_numpy(),
            "perplexity": (df["ppl"] > max_ppl).to_numpy(),
            "exact_dup": (~df["doc_id"].isin(keepers)).to_numpy(),
            "near_dup": df["doc_id"].isin(d_near).to_numpy(),
        }
        drop = np.zeros(len(df), dtype=bool)
        rs = np.full(len(df), "", dtype=object)
        for r, m in reasons.items():
            drop |= m
            rs[m] = np.where(rs[m] == "", r, rs[m] + "," + r)
        out = df.copy()
        out["keep"] = ~drop
        out["drop_reasons"] = rs
        return out

    final = scored.map_batches(verdict, batch_format="pandas")
    shutil.rmtree(cfg.output_dir, ignore_errors=True)
    final_dir = os.path.join(cfg.output_dir, "final")
    final.drop_columns(["text"]).write_parquet(final_dir, min_rows_per_file=16_384)
    kept_dir = None
    if cfg.write_kept:
        kept_dir = os.path.join(cfg.output_dir, "kept")
        final.map_batches(
            lambda df: df[df["keep"]][["doc_id", "text"]], batch_format="pandas"
        ).write_parquet(kept_dir, min_rows_per_file=16_384)

    # summary via per-batch partial tallies (never the full table on the driver)
    def tally(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["drop_reasons"].str.split(",").explode()
        vc = ex[ex != ""].value_counts()
        rows = [("__total", len(df)), ("__kept", int(df["keep"].sum()))] + list(
            vc.items()
        )
        return pd.DataFrame(rows, columns=["key", "n"])

    parts = (
        rd.read_parquet(sorted(_glob.glob(os.path.join(final_dir, "*.parquet"))))
        .map_batches(tally, batch_format="pandas")
        .to_pandas()
        .groupby("key")["n"]
        .sum()
    )
    hits = {k: int(v) for k, v in parts.items() if not k.startswith("__")}
    return {
        "total": int(parts.get("__total", 0)),
        "kept": int(parts.get("__kept", 0)),
        "rule_hits": hits,
        "final_dir": final_dir,
        "kept_dir": kept_dir,
    }
