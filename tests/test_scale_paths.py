"""Round-2 scale-path tests: distributed pair kernels, exact embedding
block-pair join, sign-LSH embedding dedup, IVF pruning sample, pool sizing,
and validator sample collection."""

import hashlib

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _rand_vectors(n: int, dim: int = 16, seed: int = 5, dup_frac: float = 0.01):
    """Random unit-ish vectors with a few injected near-duplicates."""
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    n_dup = max(2, int(n * dup_frac))
    src = rng.choice(n - n_dup, size=n_dup, replace=False)
    for i, s in enumerate(src):
        mat[n - n_dup + i] = mat[s] + rng.standard_normal(dim).astype(np.float32) * 0.05
    return mat


def _brute_pairs(mat: np.ndarray, threshold: float) -> set[tuple[int, int]]:
    m = mat.astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = m @ m.T
    ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
    return set(zip(ii.tolist(), jj.tolist()))


def test_embedding_block_pairs_match_bruteforce_5k(rd):
    """Exact distributed block-pair join == driver brute force at 5k rows
    (multiple blocks, so cross-block and same-block kernels both exercised)."""
    from rayquality.ops import textdedup

    n = 5000
    mat = _rand_vectors(n)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)})
    ds = rd.from_pandas(df).repartition(8)
    got = textdedup.embedding_cosine_pairs(ds, threshold=0.9)
    want = _brute_pairs(mat, 0.9)
    assert len(want) > 0  # injected dups guarantee pairs exist
    assert set(zip(got["id_a"], got["id_b"])) == want


def test_embedding_lsh_recall(rd):
    """Sign-LSH scale path finds (nearly) all very-high-cosine pairs and
    emits no pair below threshold (verification is exact)."""
    from rayquality.ops import textdedup

    n = 2000
    mat = _rand_vectors(n, dim=16, seed=9, dup_frac=0.02)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)})
    ds = rd.from_pandas(df).repartition(4)
    got = textdedup.embedding_lsh_pairs(ds, threshold=0.95, n_bands=8, max_hamming=7)
    want = _brute_pairs(mat, 0.95)
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs <= want  # exact verification => perfect precision
    recall = len(got_pairs & want) / max(len(want), 1)
    assert recall >= 0.9, recall


def test_banded_hamming_pairs_matches_oracle_kernel(rd):
    """Distributed banded kernel == the single-process oracle banding."""
    from rayquality import dedup
    from rayquality.ops import pairs as pairops

    rng = np.random.default_rng(3)
    base = rng.integers(-(2**62), 2**62, size=400, dtype=np.int64)
    # append near copies (flip <= 2 bits)
    flips = base[:50] ^ (np.int64(1) << rng.integers(0, 64, size=50, dtype=np.int64))
    sigs = np.concatenate([base, flips])
    ids = np.arange(len(sigs), dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "sig": sigs})).repartition(4)
    got = pairops.banded_hamming_pairs(ds, "doc_id", "sig", max_hamming=3, n_bands=4)
    want = dedup.near_pairs_banded(sigs, ids.astype(object), 3, 4)
    want_norm = {(int(a), int(b)) for a, b in want}
    assert set(zip(got["id_a"], got["id_b"])) == want_norm


def test_simhash_signature_naive_parity(rd):
    """Vectorized SimHash == the naive per-word definition."""
    from rayquality.ops.textdedup import simhash_signatures

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "",
        "one one one repeated words words",
    ]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = dict(zip(*[simhash_signatures(ds).to_pandas()[c] for c in ("doc_id", "simhash")]))

    for i, txt in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for w in txt.lower().split():
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        want = 0
        for b in np.nonzero(acc > 0)[0].tolist():
            want |= 1 << b
        assert got[i] == np.uint64(want).astype(np.int64), i


def test_pool_size_scales_with_session(ray_session):
    import ray

    from rayquality.pool import actor_cpus, pool_size

    cpus = int(ray.cluster_resources().get("CPU", 0))
    assert pool_size() == max(1, cpus - 2)
    assert pool_size(cap=1) == 1
    assert actor_cpus() in (0, 1)


def test_pattern_and_integrity_samples(rd):
    """O4 parity: <= 10 deterministic sample invalid/orphan values."""
    from rayquality.ops import validators

    df = pd.DataFrame({"code": [f"A{i:03d}" for i in range(20)] + ["bad9", "zz", None, " "]})
    ds = rd.from_pandas(df)
    r = validators.pattern_validity(ds, "code", r"A[0-9]{3}", with_samples=True).to_pandas().iloc[0]
    assert int(r["invalid_count"]) == 2  # null/blank valid under allow_nulls
    assert list(r["invalid_samples"]) == ["bad9", "zz"]

    child = pd.DataFrame({"fk": [1, 2, 3, 99, 98, None]})
    parent = pd.DataFrame({"pk": [1, 2, 3]})
    r = (
        validators.integrity(rd.from_pandas(child), "fk", rd.from_pandas(parent), "pk", with_samples=True)
        .to_pandas()
        .iloc[0]
    )
    assert int(r["orphaned_count"]) == 2
    assert list(r["orphaned_samples"]) == ["98.0", "99.0"]  # float col (has null)


def test_ivf_hash_sample_unbiased(rd):
    """Quantizer sample is id-hash based, not the first rows."""
    from rayquality.ops.ann import _hash_sample

    n = 4000
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(np.ones((n, 4), np.float32))})
    s = _hash_sample(rd.from_pandas(df), "vec_id", "embedding", 500)
    assert 0 < len(s) <= 2 * 500
    # spread across the id range, not a prefix
    assert s["vec_id"].max() > n * 0.8 and s["vec_id"].min() < n * 0.2


def test_discover_relations_tpch():
    """FK auto-discovery sniffs the *key naming convention across tables."""
    from rayquality.engine import discover_relations

    rels = discover_relations("/root/testdata/sf0.001")
    assert ("o_custkey", "customer", "c_custkey") in rels["orders"]
    assert ("l_orderkey", "orders", "o_orderkey") in rels["lineitem"]
    assert ("l_partkey", "part", "p_partkey") in rels["lineitem"]
    assert ("c_nationkey", "nation", "n_nationkey") in rels["customer"]
    assert ("n_regionkey", "region", "r_regionkey") in rels["nation"]
    # PK columns never self-reference
    assert all(fk != "o_orderkey" for fk, _, _ in rels.get("orders", []))
    assert "documents" not in rels and "events" not in rels


def test_default_engine_validator_subset(rd):
    from rayquality.engine import default_engine

    ds = rd.read_parquet("/root/testdata/sf0.001/region.parquet")
    eng = default_engine(validators=["completeness"])
    assert list(eng.validators) == ["completeness"]
    results = eng.validate_data(ds, "region")
    assert results and all(r.validator == "completeness" for r in results)
    with pytest.raises(ValueError, match="unknown validators"):
        default_engine(validators=["nope"])


def test_cli_analyze_subset_and_describe_nullability(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable, "-m", "rayquality.cli", "--num-cpus", "4",
            "analyze", "/root/testdata/sf0.001/region.parquet",
            "--validators", "completeness",
            "--output-dir", str(tmp_path),
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "checks passed" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "rayquality.cli", "describe-table",
         "/root/testdata/sf0.001/region.parquet"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0
    assert "NULL" in out.stdout and "default=-" in out.stdout


def test_asof_join_naive_parity(rd):
    """Distributed as-of join == naive per-row scan, incl. tie-breaking."""
    from rayquality.ops.asof import asof_join

    left = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 8, 9, 7],
            "ts": pd.to_datetime(
                ["2024-01-02", "2024-01-05", "2024-01-03", "2024-01-01", "2023-12-31"]
            ).astype("datetime64[us]"),
        }
    )
    right = pd.DataFrame(
        {
            "o_custkey": [7, 7, 7, 8, 8],
            "o_orderkey": [10, 11, 12, 20, 21],
            # orderkeys 11 and 12 tie on the date: largest orderkey must win
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-04", "2024-01-04", "2024-01-03", "2024-01-02"]
            ).astype("datetime64[us]"),
        }
    )
    got = asof_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(2),
        key_left="user_id",
        key_right="o_custkey",
        ts_left="ts",
        ts_right="o_orderdate",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    # event 1: user 7 at 01-02 -> order 10; event 2: 01-05 -> tie date 01-04,
    # orderkey 12 wins; event 3: user 8 at 01-03 -> order 20 (same-day match);
    # event 4: user 9 -> no orders (dropped); event 5: before any order.
    assert got["event_id"].tolist() == [1, 2, 3]
    assert got["o_orderkey"].tolist() == [10, 12, 20]
    assert str(got["o_orderkey"].dtype) == "int64"


def test_sliding_window_counts_naive(rd):
    from rayquality.ops.windows import sliding_window_counts

    ts = pd.to_datetime(["2024-01-01 00:07", "2024-01-01 00:20", "2024-01-01 02:00"])
    ev = pd.DataFrame({"user_id": [1, 1, 1], "ts": ts.astype("datetime64[us]")})
    got = sliding_window_counts(
        rd.from_pandas(ev), window_minutes=60, slide_minutes=15
    ).to_pandas()
    # naive: every (user, w_start) with w_start multiple of 15min and
    # w_start <= ts < w_start + 60min
    want = {}
    for t in ts:
        base = t.floor("15min")
        for k in range(4):
            w = base - pd.Timedelta(minutes=15 * k)
            want[(1, w)] = want.get((1, w), 0) + 1
    got_map = {(u, w): n for u, w, n in zip(got["user_id"], got["w_start"], got["n_events"])}
    assert got_map == want


def test_combine_partials_null_groups_and_sums(rd):
    from rayquality.ops.combine import combine_partials, distinct_count

    df = pd.DataFrame(
        {
            "k1": ["a", "a", "b", None, None, "b"],
            "k2": [1, 1, 2, 3, 3, 2],
            "v": [10, 5, 1, 2, 4, 1],
        }
    )
    out = (
        combine_partials(rd.from_pandas(df).repartition(3), keys=["k1", "k2"], sums=["v"])
        .to_pandas()
        .sort_values(["k2"])
        .reset_index(drop=True)
    )
    got = {(r["k1"], r["k2"]): r["v"] for _, r in out.iterrows()}
    want = {("a", 1): 15, ("b", 2): 2, (None, 3): 6}
    assert len(got) == 3
    for (k1, k2), v in want.items():
        match = [vv for (g1, g2), vv in got.items() if (g1 == k1 or (k1 is None and pd.isna(g1))) and g2 == k2]
        assert match == [v], (k1, k2, match)

    assert distinct_count(rd.from_pandas(df).repartition(3), ["k1", "k2"]) == 3
