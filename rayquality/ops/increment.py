"""Incremental dedup against a persisted corpus hash index — the
continuous-ingestion workflow: a 100-TB corpus is curated once, then new
shards arrive daily and must dedup against EVERYTHING seen so far without
rescanning it.

Design (mirrors the persisted IVF index, ops/ann.py): the seen-corpus
index is hive-partitioned parquet of 16-byte content hashes bucketed by
hash prefix (``bucket=N/``). Checking a new shard reads ONLY the buckets
its own hashes touch (directory-level IO pruning): for a small increment
against a huge index, bytes read scale with the increment, not the corpus.
The new shard's hash set broadcasts once (``ray.put`` — increments are the
small side by definition); matches stream back as the (hash, seen) table.

Generalizes the reference's uniqueness validator
(``src/data_quality/validators/duplicates.py`` in /root/reference, which
recounts the full table every run) to an append-only corpus.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _hash_batch(t: pa.Table, id_col: str, text_col: str) -> tuple[np.ndarray, list[str]]:
    import pyarrow.compute as pc

    txt = pc.fill_null(t[text_col].combine_chunks().cast(pa.string()), "")
    hs = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in txt.to_pylist()]
    return t[id_col].to_numpy(zero_copy_only=False), hs


def build_hash_index(
    ds: rd.Dataset,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """One streaming pass: hash every document's content, bucket by the
    hash's leading byte(s) modulo ``n_buckets``, write hive-partitioned
    (hash, min_id) parquet. Per-batch combiner collapses duplicate hashes
    before the write; the partitioned write is resumable per-bucket output
    like every sink in this repo. At 10^12 docs raise n_buckets so one
    bucket's hash file stays a few GB (the hashes are 16 bytes/doc —
    ~0.02% of a text corpus)."""

    def tag(t: pa.Table) -> pa.Table:
        ids, hs = _hash_batch(t, id_col, text_col)
        df = (
            pd.DataFrame({"h": hs, id_col: ids})
            .groupby("h", as_index=False)[id_col]
            .min()
        )
        bucket = np.array(
            [int(h[:8], 16) % n_buckets for h in df["h"]], dtype=np.int64
        )
        return pa.table(
            {
                "h": pa.array(df["h"], pa.string()),
                id_col: pa.array(df[id_col].to_numpy()),
                "bucket": pa.array(bucket),
            }
        )

    ds.select_columns([id_col, text_col]).map_batches(
        tag, batch_format="pyarrow"
    ).write_parquet(path, partition_cols=["bucket"], mode="overwrite")
    meta = {"n_buckets": int(n_buckets), "id_col": id_col}
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(meta, f)
    return {"path": path, **meta}


def dedup_against_index(
    new_docs: rd.Dataset,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Flag each new document as novel or already-seen -> lazy
    (id, novel: bool).

    Plan: hash the increment (streaming), collect its DISTINCT hash set
    (small side — the increment), broadcast it, read ONLY the index
    buckets those hashes touch, and stream the membership verdict back
    over the increment. The index is never scanned in full.
    """
    meta = json.load(open(os.path.join(index_path, "_meta.json")))
    n_buckets = meta["n_buckets"]

    def hash_only(t: pa.Table) -> pa.Table:
        ids, hs = _hash_batch(t, id_col, text_col)
        return pa.table({id_col: pa.array(ids), "h": pa.array(hs, pa.string())})

    hashed = new_docs.select_columns([id_col, text_col]).map_batches(
        hash_only, batch_format="pyarrow"
    ).materialize()  # consumed twice: probe + verdict; 16-byte rows

    hash_cols = [
        t["h"].to_numpy(zero_copy_only=False)
        for t in ray.get(hashed.to_arrow_refs())
        if t.num_columns
    ]
    # an EMPTY increment (a day with zero new shards / a fully-filtered
    # shard) is a normal event in continuous ingestion, not an error
    new_hashes = (
        np.unique(np.concatenate(hash_cols)) if hash_cols else np.empty(0, object)
    )
    probe_ref = ray.put(new_hashes)
    touched = np.unique([int(h[:8], 16) % n_buckets for h in new_hashes.tolist()])
    files = [
        f
        for b in touched.tolist()
        for f in sorted(_glob.glob(os.path.join(index_path, f"bucket={b}", "*.parquet")))
    ]

    def match(t: pa.Table) -> pa.Table:
        probe = ray.get(probe_ref)
        hs = t["h"].to_numpy(zero_copy_only=False)
        return t.select(["h"]).filter(pa.array(np.isin(hs, probe)))

    seen_arr = np.empty(0, object)
    if files:
        seen = rd.read_parquet(files, columns=["h"]).map_batches(
            match, batch_format="pyarrow"
        ).to_pandas()  # bounded by the increment's distinct-hash count
        # an all-empty result arrives COLUMN-LESS from Ray — treat as no hits
        if "h" in seen.columns:
            seen_arr = seen["h"].to_numpy(object)
    seen_ref = ray.put(seen_arr)

    def verdict(t: pa.Table) -> pa.Table:
        seen_arr = ray.get(seen_ref)
        hs = t["h"].to_numpy(zero_copy_only=False)
        novel = pa.array(~np.isin(hs, seen_arr))
        return pa.table({id_col: t[id_col], "novel": novel})

    return hashed.map_batches(verdict, batch_format="pyarrow")


def apply_changelog(
    snapshot: rd.Dataset,
    changelog: rd.Dataset,
    key_col: str,
    value_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> rd.Dataset:
    """CDC merge: apply an upsert/delete changelog to a snapshot -> lazy
    Dataset of the new snapshot (key, value_cols..., version).

    The warehouse MERGE / compaction step of a continuously-ingested
    corpus: per key, the highest-``version`` record wins; at equal
    version a delete ('d') beats an upsert ('u'); keys whose winner is a
    delete disappear. The snapshot's rows are implicit upserts.

    Per-batch best-per-key is the combiner (one candidate row per key per
    block — lexicographic (version desc, op asc) via a sort +
    drop_duplicates, the ``latest_per_key`` kernel), one hash-partition
    pass finishes the global winner, and the delete filter runs in the
    same pass. Full rows shuffle only for keys present in the block —
    bounded by distinct keys per block, never by row count.
    """
    cols = [key_col, *value_cols, version_col, op_col]

    def tag_snapshot(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[op_col] = "u"
        return df[cols]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([version_col, op_col], ascending=[False, True])
        return df.drop_duplicates(subset=[key_col], keep="first")[cols]

    snap = snapshot.select_columns(
        [key_col, *value_cols, version_col]
    ).map_batches(tag_snapshot, batch_format="pandas")
    delta = changelog.select_columns(cols)
    both = snap.union(delta).map_batches(pick, batch_format="pandas")

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(64)).astype(np.int64)
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([version_col, op_col], ascending=[False, True])
        g = g.drop_duplicates(subset=[key_col], keep="first")
        g = g[g[op_col] == "u"]
        return g[[key_col, *value_cols, version_col]]

    return (
        both.map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(finish, batch_format="pandas")
    )
