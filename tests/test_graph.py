"""Tests for the distributed connected-components operator (ops/graph.py):
min-label propagation over a pair list, checked against a naive union-find
on synthetic graphs and against the real n-gram-Jaccard pair output."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _naive_components(node_ids, pairs):
    """Union-find reference: {node: min id of its component}."""
    parent = {int(n): int(n) for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(rd, node_ids, pairs, **kwargs):
    from rayquality.ops import graph

    nodes = rd.from_pandas(pd.DataFrame({"doc_id": np.asarray(node_ids, np.int64)}))
    edges = pd.DataFrame(
        {
            "id_a": np.asarray([p[0] for p in pairs], np.int64),
            "id_b": np.asarray([p[1] for p in pairs], np.int64),
        }
    )
    got = (
        graph.connected_components(edges, nodes, "doc_id", **kwargs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _naive_components(node_ids, pairs)
    assert got["doc_id"].dtype == np.int64 and got["comp"].dtype == np.int64
    assert len(got) == len(node_ids)
    got_map = dict(zip(got["doc_id"], got["comp"]))
    assert got_map == want
    return got


def test_components_basic(rd):
    # two triangles, one chain, isolated nodes
    nodes = list(range(12))
    pairs = [(0, 1), (1, 2), (0, 2), (5, 4), (4, 3), (7, 8), (9, 8)]
    _check(rd, nodes, pairs)


def test_components_no_edges(rd):
    got = _check(rd, [3, 1, 9], [])
    assert (got["doc_id"] == got["comp"]).all()


def test_components_chain_diameter(rd):
    # a 20-node chain needs ~diameter rounds; must converge under the cap
    nodes = list(range(20))
    pairs = [(i, i + 1) for i in range(19)]
    _check(rd, nodes, pairs)


def test_components_duplicate_and_reversed_edges(rd):
    nodes = list(range(6))
    pairs = [(1, 0), (0, 1), (4, 2), (2, 4), (4, 2)]
    _check(rd, nodes, pairs)


def test_components_random_graph(rd):
    rng = np.random.default_rng(7)
    n = 300
    nodes = list(range(n))
    a = rng.integers(0, n, 250)
    b = rng.integers(0, n, 250)
    pairs = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    _check(rd, nodes, pairs)


def test_components_dataset_edges_branch(rd):
    # edges supplied as a Dataset (the distributed input path)
    from rayquality.ops import graph

    pairs = pd.DataFrame(
        {"id_a": np.array([10, 11], np.int64), "id_b": np.array([11, 12], np.int64)}
    )
    nodes = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(10, 15, dtype=np.int64)}))
    got = (
        graph.connected_components(rd.from_pandas(pairs), nodes, "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["comp"].tolist() == [10, 10, 10, 13, 14]


def test_components_nonconvergence_raises(rd):
    from rayquality.ops import graph

    nodes = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(8, dtype=np.int64)}))
    edges = pd.DataFrame(
        {
            "id_a": np.arange(7, dtype=np.int64),
            "id_b": np.arange(1, 8, dtype=np.int64),
        }
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(edges, nodes, "doc_id", max_iters=2)


def test_components_on_real_jaccard_pairs(rd):
    # end-to-end: components over the real >=0.5 ngram-Jaccard pair list
    from rayquality.ops import graph, textdedup

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    pairs = textdedup.ngram_jaccard_pairs(docs, threshold=0.5)
    docs2 = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    got = (
        graph.connected_components(pairs[["id_a", "id_b"]], docs2, "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"]
    want = _naive_components(ids.to_numpy(np.int64), pairs[["id_a", "id_b"]].to_numpy())
    assert dict(zip(got["doc_id"], got["comp"])) == want
    # clusters exist in the testdata (documents have near-dup templates)
    assert (got["doc_id"] != got["comp"]).any()


def test_pagerank_fixed_point_naive_parity(rd):
    """Engine BSP == a direct numpy simulation of the integer recurrence on
    a random SYMMETRIC multigraph (the op's documented contract), and the
    result is bit-identical across two different partition counts."""
    from rayquality.ops.graph import pagerank_fixed_point

    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 300).astype(np.int64)
    b = rng.integers(0, 60, 300).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    edges = pd.DataFrame({"src": src, "dst": dst})

    got = (
        pagerank_fixed_point(edges, id_col="node_id", n_parts=8, iters=12)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )

    # naive reference: the exact int64 floor-division recurrence
    nodes = np.unique(src)
    pos = {int(n): i for i, n in enumerate(nodes)}
    n = len(nodes)
    si = np.fromiter((pos[int(s)] for s in src), np.int64, len(src))
    di = np.fromiter((pos[int(d)] for d in dst), np.int64, len(dst))
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    r0 = 10**12 // n
    base = (15 * r0) // 100
    r = np.full(n, r0, np.int64)
    for _ in range(12):
        share = r // np.maximum(outdeg, 1)
        contrib = (85 * share[si]) // 100
        new = np.full(n, base, np.int64)
        np.add.at(new, di, contrib)
        r = new

    assert got["node_id"].to_numpy().tolist() == nodes.tolist()
    assert got["rank_fp"].to_numpy().tolist() == r.tolist()

    again = (
        pagerank_fixed_point(edges, id_col="node_id", n_parts=3, iters=12)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    assert again["rank_fp"].to_numpy().tolist() == r.tolist()
