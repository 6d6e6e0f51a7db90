"""Approximate-nearest-neighbor / similarity search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every batch does one numpy matmul against it, emitting its
local top-k; the driver merges the per-batch partials (classic distributed
top-k, no shuffle). Scale path: IVF-style pre-bucketing by coarse centroid
(or random-hyperplane LSH as in simhash) to prune the candidate set per
query — the per-batch kernel is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def cosine_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Top-k cosine neighbors (excluding self) for each query vector.

    Deterministic ordering: (similarity desc, neighbor_id asc); similarities
    are computed in float64 from the stored float32 vectors.
    Returns (query_id, neighbor_id, rank).
    """
    qset = set(query_ids)

    def is_query(t: pa.Table) -> pa.Table:
        mask = pa.array([v in qset for v in t[id_col].to_pylist()])
        return t.filter(mask)

    qdf = ds.select_columns([id_col, vec_col]).map_batches(is_query, batch_format="pyarrow").to_pandas()
    q_ids = qdf[id_col].to_numpy()
    q_mat = np.stack(qdf[vec_col].to_numpy()).astype(np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put((q_ids, q_mat))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        nids = t[id_col].to_numpy(zero_copy_only=False)
        nmat = np.stack(t[vec_col].to_pandas().to_numpy()).astype(np.float64)
        nmat /= np.maximum(np.linalg.norm(nmat, axis=1, keepdims=True), 1e-12)
        sims = qm @ nmat.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for r in range(sims.shape[0]):
            row = sims[r].copy()
            row[nids == qi[r]] = -np.inf  # exclude self
            idx = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else np.arange(len(row))
            out_q.extend([qi[r]] * len(idx))
            out_n.extend(nids[idx].tolist())
            out_s.extend(row[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = (
        ds.select_columns([id_col, vec_col])
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    parts = parts[np.isfinite(parts["sim"])]
    parts = parts.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    top = parts.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def _kmeans(vectors: np.ndarray, n_cells: int, seed: int, iters: int = 10) -> np.ndarray:
    """Small seeded k-means on unit vectors (IVF coarse quantizer)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(vectors), size=min(n_cells, len(vectors)), replace=False)
    cent = vectors[idx].copy()
    for _ in range(iters):
        assign = np.argmax(vectors @ cent.T, axis=1)
        for c in range(len(cent)):
            members = vectors[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 3,
) -> pd.DataFrame:
    """IVF-style approximate top-k: the scale path for similarity search.

    A coarse quantizer (seeded k-means over a driver-side sample) is
    broadcast; each batch assigns its vectors to cells and only vectors in a
    query's ``n_probe`` nearest cells are scored — the per-batch kernel is
    the same matmul as :func:`cosine_topk`, over a pruned candidate set.
    Approximate: recall vs brute force depends on the cell structure
    (tested in tests/test_ann.py).
    """
    sample = ds.select_columns([id_col, vec_col]).limit(4096).to_pandas()
    smat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    smat /= np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-12)
    centroids = _kmeans(smat, n_cells, seed)

    qset = set(query_ids)

    def is_query(t: pa.Table) -> pa.Table:
        mask = pa.array([v in qset for v in t[id_col].to_pylist()])
        return t.filter(mask)

    qdf = ds.select_columns([id_col, vec_col]).map_batches(is_query, batch_format="pyarrow").to_pandas()
    q_ids = qdf[id_col].to_numpy()
    q_mat = np.stack(qdf[vec_col].to_numpy()).astype(np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    # probe cells per query
    q_cells = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe]
    probe_sets = [set(r.tolist()) for r in q_cells]
    state = ray.put((q_ids, q_mat, centroids, probe_sets))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, qm, cent, probes = ray.get(state)
        nids = t[id_col].to_numpy(zero_copy_only=False)
        nmat = np.stack(t[vec_col].to_pandas().to_numpy()).astype(np.float64)
        nmat /= np.maximum(np.linalg.norm(nmat, axis=1, keepdims=True), 1e-12)
        cells = np.argmax(nmat @ cent.T, axis=1)
        sims = qm @ nmat.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for r in range(sims.shape[0]):
            row = sims[r].copy()
            row[nids == qi[r]] = -np.inf
            in_probe = np.isin(cells, np.fromiter(probes[r], np.int64))
            row[~in_probe] = -np.inf
            idx = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else np.arange(len(row))
            out_q.extend([qi[r]] * len(idx))
            out_n.extend(nids[idx].tolist())
            out_s.extend(row[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = ds.select_columns([id_col, vec_col]).map_batches(local_topk, batch_format="pyarrow").to_pandas()
    parts = parts[np.isfinite(parts["sim"])]
    parts = parts.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    top = parts.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
