"""Tests for snapshot_diff and embedding decontamination."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_snapshot_diff_statuses(rd):
    from rayquality.ops import snapshot

    old = pd.DataFrame(
        {
            "id": np.array([1, 2, 3, 4], np.int64),
            "text": ["a", "b", None, "d"],
        }
    )
    new = pd.DataFrame(
        {
            "id": np.array([1, 3, 4, 5], np.int64),
            "text": ["a", "", "D", "e"],  # 1 unchanged, 3 null->'' unchanged
        }
    )
    got = (
        snapshot.snapshot_diff(rd.from_pandas(old), rd.from_pandas(new), "id", ["text"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # 1 unchanged (omitted); 2 removed; 3: None vs '' -> same fillna('') hash
    # -> unchanged; 4 changed; 5 added
    assert dict(zip(got["id"], got["status"])) == {
        2: "removed",
        4: "changed",
        5: "added",
    }


def test_snapshot_diff_multicol(rd):
    from rayquality.ops import snapshot

    old = pd.DataFrame({"id": [1, 2], "a": ["x", "y"], "b": [10, 20]})
    new = pd.DataFrame({"id": [1, 2], "a": ["x", "y"], "b": [10, 99]})
    got = snapshot.snapshot_diff(
        rd.from_pandas(old), rd.from_pandas(new), "id", ["a", "b"]
    ).to_pandas()
    assert got["id"].tolist() == [2] and got["status"].tolist() == ["changed"]


def test_snapshot_diff_identical_is_empty(rd):
    from rayquality.ops import snapshot

    df = pd.DataFrame({"id": np.arange(50, dtype=np.int64), "t": ["x"] * 50})
    got = snapshot.snapshot_diff(
        rd.from_pandas(df), rd.from_pandas(df.copy()), "id", ["t"]
    ).to_pandas()
    assert len(got) == 0


def test_decontaminate_embedding_planted(rd):
    from rayquality.ops import curation

    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 8))
    vecs = base / np.linalg.norm(base, axis=1, keepdims=True)
    # vector 15 = probe 0 plus tiny noise -> contaminated; others random
    vecs[15] = vecs[0] + 0.01 * rng.normal(size=8)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(20, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
        }
    )
    got = (
        curation.decontaminate_embedding(
            rd.from_pandas(df), probe_ids=[0, 1], threshold=0.95
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    flagged = set(got.loc[got["contaminated"], "vec_id"])
    assert 15 in flagged
    assert 0 not in flagged and 1 not in flagged  # probes don't self-flag
    # random 8-d vectors essentially never hit cos >= 0.95
    assert flagged == {15}


def test_decontaminate_embedding_real_matches_naive(rd):
    from rayquality.ops import curation

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = (
        curation.decontaminate_embedding(emb, probe_ids=list(range(10)), threshold=0.30)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(ref["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids = ref["vec_id"].to_numpy(np.int64)
    pm = mat[np.isin(ids, np.arange(10))]
    pi = ids[np.isin(ids, np.arange(10))]
    sims = mat @ pm.T
    sims[ids[:, None] == pi[None, :]] = -np.inf
    want = (sims >= 0.30).any(axis=1)
    order = np.argsort(ids)
    assert got["contaminated"].to_numpy().tolist() == want[order].tolist()
    assert got["contaminated"].any()  # testdata plants near-dup embeddings
