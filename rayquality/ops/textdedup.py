"""Document deduplication suite: exact, MinHash+LSH, SimHash, exact n-gram
Jaccard via inverted shingles, embedding-cosine near-dup.

All operators shuffle only skinny derived columns (hashes, ids, signatures),
never the documents themselves (SURVEY.md §7.4 wide-row rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min

from .. import dedup as _dedup

_MERSENNE = np.uint64((1 << 61) - 1)


def _word_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-word shingle hashes (uint64) of a document."""
    words = text.lower().split()
    if len(words) < k:
        return np.array(
            [int.from_bytes(hashlib.blake2b(" ".join(words).encode(), digest_size=8).digest(), "big")],
            dtype=np.uint64,
        ) if words else np.empty(0, dtype=np.uint64)
    hs = {
        int.from_bytes(
            hashlib.blake2b(" ".join(words[i : i + k]).encode(), digest_size=8).digest(), "big"
        )
        for i in range(len(words) - k + 1)
    }
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def _shingle_table(t: pa.Table, id_col: str, text_col: str, k: int) -> pa.Table:
    """Explode a batch to (doc_id, shingle) rows + per-doc set sizes."""
    ids, shingles, sizes_id, sizes = [], [], [], []
    for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
        sh = _word_shingle_hashes(txt or "", k)
        ids.extend([did] * len(sh))
        shingles.append(sh)
        sizes_id.append(did)
        sizes.append(len(sh))
    flat = np.concatenate(shingles) if shingles else np.empty(0, dtype=np.uint64)
    return pa.table(
        {
            id_col: pa.array(ids),
            "shingle": pa.array(flat.view(np.int64)),
        }
    ), dict(zip(sizes_id, sizes))


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Keep min(id) per distinct content. Groups by a content hash computed
    in map_batches so the shuffle moves 16-byte keys, not document bodies
    (equivalent to GROUP BY text when md5 is collision-free)."""

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5((s or "").encode("utf-8")).hexdigest() for s in t[text_col].to_pylist()]
        return pa.table({id_col: t[id_col], "h": pa.array(hs, pa.string())})

    kept = (
        ds.select_columns([id_col, text_col])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )
    return kept.sort(id_col)


def minhash_signatures(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    k: int = 3,
    seed: int = 7,
) -> rd.Dataset:
    """MinHash signatures over word k-shingles: (id, sig list<int64>)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)

    def per_batch(t: pa.Table) -> pa.Table:
        sigs = []
        for txt in t[text_col].to_pylist():
            sh = _word_shingle_hashes(txt or "", k)
            if len(sh) == 0:
                sigs.append(np.zeros(num_perm, dtype=np.int64))
                continue
            # universal hashing mod Mersenne prime, vectorized (P x S)
            vals = (a[:, None] * (sh[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1).astype(np.int64))
        mat = np.stack(sigs) if sigs else np.empty((0, num_perm), dtype=np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "sig": pa.FixedSizeListArray.from_arrays(pa.array(mat.reshape(-1)), num_perm),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(per_batch, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    seed: int = 7,
) -> pd.DataFrame:
    """MinHash+LSH near-dup: sign -> band -> bucket groupby -> candidate
    pairs -> exact-Jaccard verification -> (id_a, id_b, jaccard)."""
    rows = bands and num_perm // bands
    sigs = minhash_signatures(ds, id_col, text_col, num_perm, k, seed)

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        mat = np.asarray(t["sig"].combine_chunks().flatten()).reshape(len(ids), num_perm)
        out_band, out_key, out_id = [], [], []
        for bi in range(bands):
            seg = mat[:, bi * rows : (bi + 1) * rows]
            keys = [hash((bi,) + tuple(r)) & 0x7FFFFFFFFFFFFFFF for r in seg.tolist()]
            out_band.extend([bi] * len(ids))
            out_key.extend(keys)
            out_id.extend(ids)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "bkey": pa.array(out_key, pa.int64()),
                id_col: pa.array(out_id),
            }
        )

    banded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
        ids = sorted(set(g[id_col]))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    cand = (
        banded.groupby(["band", "bkey"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if not len(cand):
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    # exact verification: fetch shingle sets of candidate docs only
    cand_ids = sorted(set(cand["id_a"]) | set(cand["id_b"]))
    cand_ref = ray.put(set(cand_ids))

    def only_cands(t: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        mask = pa.array([v in cs for v in t[id_col].to_pylist()])
        return t.filter(mask)

    docs = (
        ds.select_columns([id_col, text_col])
        .map_batches(only_cands, batch_format="pyarrow")
        .to_pandas()
    )
    sets = {r[id_col]: set(_word_shingle_hashes(r[text_col] or "", k).tolist()) for _, r in docs.iterrows()}
    out = []
    for _, r in cand.iterrows():
        sa, sb = sets.get(r["id_a"], set()), sets.get(r["id_b"], set())
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            out.append((r["id_a"], r["id_b"], jac))
    df = pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> pd.DataFrame:
    """SimHash near-dup: 64-bit weighted word-hash signature, then the same
    band-groupby machinery as phash near-dup (rayquality.dedup)."""

    def add_simhash(t: pa.Table) -> pa.Table:
        out = np.empty(t.num_rows, dtype=np.int64)
        for i, txt in enumerate(t[text_col].to_pylist()):
            words = (txt or "").lower().split()
            acc = np.zeros(64, dtype=np.int64)
            for w in words:
                h = np.uint64(
                    int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            val = 0
            for bit in np.nonzero(acc > 0)[0].tolist():
                val |= 1 << bit
            out[i] = np.uint64(val).astype(np.int64)
        return pa.table({id_col: t[id_col], "simhash": pa.array(out)})

    sk = ds.select_columns([id_col, text_col]).map_batches(add_simhash, batch_format="pyarrow").to_pandas()
    pairs = _dedup.near_pairs_banded(
        sk["simhash"].to_numpy(np.int64),
        sk[id_col].to_numpy(object),
        max_hamming,
        n_bands,
    )
    df = pd.DataFrame(sorted(pairs), columns=["id_a", "id_b"])
    return df


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    group_cap: int = 500,
) -> pd.DataFrame:
    """EXACT n-gram Jaccard via an inverted shingle index — fully
    distributed: explode (shingle, doc) -> groupby(shingle) -> co-occurrence
    pairs -> groupby(pair).count() = intersection size -> filter by
    jaccard = inter / (|A| + |B| - inter).

    ``group_cap`` guards quadratic blowup on stop-shingles (a shingle shared
    by more than cap docs is skipped — at scale those carry no dedup signal).
    """
    def sizes_batch(t: pa.Table) -> pa.Table:
        tbl, sizes = _shingle_table(t, id_col, text_col, k)
        return pa.table(
            {
                id_col: pa.array(list(sizes.keys())),
                "n_shingles": pa.array(list(sizes.values()), pa.int64()),
            }
        )

    src = ds.select_columns([id_col, text_col])
    sizes_df = src.map_batches(sizes_batch, batch_format="pyarrow").to_pandas()
    size_map = dict(zip(sizes_df[id_col], sizes_df["n_shingles"]))

    shingles = src.map_batches(lambda t: _shingle_table(t, id_col, text_col, k)[0], batch_format="pyarrow")

    # prefilter: only shingles appearing in >1 doc can produce a pair; this
    # avoids a per-singleton-group Python call in map_groups (combiner +
    # broadcast of the shared-shingle set)
    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("shingle").aggregate([("shingle", "count")])
        return g.rename_columns(["shingle", "cnt"])

    sc = (
        shingles.map_batches(count_partial, batch_format="pyarrow")
        .groupby("shingle")
        .aggregate(Max("cnt", alias_name="cmax"), Count(alias_name="nparts"))
    )
    shared = sc.map_batches(
        lambda t: t.filter(
            pc.or_(pc.greater(t["cmax"], 1), pc.greater(t["nparts"], 1))
        ).select(["shingle"]),
        batch_format="pyarrow",
    ).to_pandas()
    shared_set = shared["shingle"].to_numpy(np.int64)
    if not len(shared_set):
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    shared_ref = ray.put(shared_set)

    def only_shared(t: pa.Table) -> pa.Table:
        ss = ray.get(shared_ref)
        mask = np.isin(t["shingle"].to_numpy(zero_copy_only=False), ss)
        return t.filter(pa.array(mask))

    shingles = shingles.map_batches(only_shared, batch_format="pyarrow")

    def pairs_in_group(g: pd.DataFrame) -> pa.Table:
        ids = sorted(set(g[id_col]))
        if len(ids) < 2 or len(ids) > group_cap:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    inter = (
        shingles.groupby("shingle")
        .map_groups(pairs_in_group, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="inter"))
        .to_pandas()
    )
    if not len(inter):
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    na = inter["id_a"].map(size_map).to_numpy(np.int64)
    nb = inter["id_b"].map(size_map).to_numpy(np.int64)
    union = na + nb - inter["inter"].to_numpy(np.int64)
    inter["jaccard"] = inter["inter"] / np.maximum(union, 1)
    out = inter[inter["jaccard"] >= threshold][["id_a", "id_b", "jaccard"]]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_cosine_pairs(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> pd.DataFrame:
    """Embedding near-dup: pairs with cosine >= threshold. Brute force via a
    broadcast matrix per batch (numpy matmul); scale path = LSH bucketing by
    random-hyperplane signs (same banding machinery as simhash)."""
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = full[id_col].to_numpy()
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, mat))

    def per_batch(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = t[id_col].to_numpy(zero_copy_only=False)
        bmat = np.stack(t[vec_col].to_pandas().to_numpy()).astype(np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ all_mat.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = bids[ii] < all_ids[jj]
        return pa.table(
            {
                "id_a": pa.array(bids[ii][keep]),
                "id_b": pa.array(all_ids[jj][keep]),
            }
        )

    pdf = ds.select_columns([id_col, vec_col]).map_batches(per_batch, batch_format="pyarrow").to_pandas()
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
