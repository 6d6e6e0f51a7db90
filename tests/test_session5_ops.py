"""Tests for the session-5 operator batch: FD profiling, grouped entropy,
grouped top-k, quantile filter, temperature mixture, shared-substring
fingerprint dedup, k-center diversity selection."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_fd_violations_naive_parity(rd):
    from rayquality.ops.profile import fd_violations

    od = rd.read_parquet(f"{SF}/orders.parquet")
    got = fd_violations(od, "o_custkey", "o_orderpriority")
    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    per = pdf.groupby("o_custkey").agg(
        n_b=("o_orderpriority", "nunique"), rows=("o_orderpriority", "size")
    )
    viol = per["n_b"] > 1
    assert int(got["n_det_values"].iloc[0]) == len(per)
    assert int(got["n_violating_keys"].iloc[0]) == int(viol.sum())
    assert int(got["n_violating_rows"].iloc[0]) == int(per.loc[viol, "rows"].sum())


def test_fd_holds_on_true_dependency(rd):
    # o_orderkey -> o_orderstatus trivially holds (orderkey is unique)
    from rayquality.ops.profile import fd_violations

    od = rd.read_parquet(f"{SF}/orders.parquet")
    got = fd_violations(od, "o_orderkey", "o_orderstatus")
    assert int(got["n_violating_keys"].iloc[0]) == 0
    assert int(got["n_violating_rows"].iloc[0]) == 0


def test_grouped_entropy_naive_parity(rd):
    from rayquality.ops.profile import grouped_entropy

    ev = rd.read_parquet(f"{SF}/events.parquet").select_columns(
        ["event_type", "user_id"]
    )
    got = grouped_entropy(ev, "event_type", "user_id")
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    for _, row in got.iterrows():
        sub = pdf[pdf["event_type"] == row["event_type"]]
        p = sub["user_id"].value_counts(normalize=True).to_numpy()
        want = float(-(p * np.log(p)).sum())
        assert abs(row["entropy_micro_nats"] - np.floor(want * 1e6 + 0.5)) <= 1
        assert row["n_rows"] == len(sub)


def test_grouped_entropy_constant_column_is_zero(rd):
    from rayquality.ops.profile import grouped_entropy

    df = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 3, "v": [1] * 5 + [2] * 3})
    got = grouped_entropy(rd.from_pandas(df), "g", "v")
    assert (got["entropy_micro_nats"] == 0).all()


def test_grouped_topk_naive_parity(rd):
    from rayquality.ops.analytic import grouped_topk

    od = rd.read_parquet(f"{SF}/orders.parquet")
    got = (
        grouped_topk(od, "o_orderpriority", "o_totalprice", "o_orderkey", k=4)
        .to_pandas()
        .sort_values(["o_orderpriority", "rk"])
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/orders.parquet").copy()
    v = pdf["o_totalprice"].to_numpy() * 100
    pdf["value_cents"] = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
    pdf = pdf.sort_values(
        ["value_cents", "o_orderkey"], ascending=[False, True]
    )
    want = pdf.groupby("o_orderpriority", sort=False).head(4).copy()
    want["rk"] = want.groupby("o_orderpriority", sort=False).cumcount() + 1
    want = (
        want[["o_orderpriority", "o_orderkey", "value_cents", "rk"]]
        .sort_values(["o_orderpriority", "rk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantile_filter(rd):
    from rayquality.ops.curation import quantile_filter

    docs = rd.read_parquet(f"{SF}/documents.parquet").select_columns(
        ["doc_id", "n_chars"]
    )
    kept, thr = quantile_filter(docs, "n_chars", 0.75)
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(pdf)
    # quantile_disc semantics: idx = ceil(q*n)-1 into the sorted multiset
    import math

    want_thr = int(
        np.sort(pdf["n_chars"].to_numpy())[max(0, math.ceil(0.75 * n) - 1)]
    )
    assert thr == want_thr
    got = kept.to_pandas()
    assert len(got) == int((pdf["n_chars"] >= want_thr).sum())
    assert (got["n_chars"] >= want_thr).all()


def test_temperature_mixture_rates(rd):
    from rayquality.ops.curation import temperature_mixture

    docs = rd.read_parquet(f"{SF}/documents.parquet").select_columns(
        ["doc_id", "source"]
    )
    out = temperature_mixture(docs, "source", "doc_id").to_pandas()
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = pdf["source"].value_counts()
    mn = float(cnt.min())
    kept = out["source"].value_counts()
    # the smallest stratum keeps everything; each stratum's empirical rate
    # tracks sqrt(mn/cnt) within keyed-hash binomial noise
    assert kept[cnt.idxmin()] == cnt.min()
    for s in cnt.index:
        want = np.sqrt(mn / float(cnt[s]))
        got_rate = kept.get(s, 0) / cnt[s]
        assert abs(got_rate - want) < 0.1
    # deterministic: same input -> identical selection
    out2 = temperature_mixture(docs, "source", "doc_id").to_pandas()
    assert set(out2["doc_id"]) == set(out["doc_id"])


def test_shared_substring_planted_passage(rd):
    from rayquality.ops.substr import shared_substring_pairs

    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    passage = "".join(rng.choice(alpha, 300))

    def rand_text(n):
        return "".join(rng.choice(alpha, n))

    texts = []
    for i in range(40):
        if i in (3, 17, 29):
            texts.append(rand_text(200) + passage + rand_text(200))
        else:
            texts.append(rand_text(700))
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    )
    pairs = (
        shared_substring_pairs(ds, k=24, sample_mod=4, min_shared=2)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert {(3, 17), (3, 29), (17, 29)} <= got
    # precision: every reported pair truly shares a k-gram
    for a, b in got:
        ga = {texts[a][i : i + 24] for i in range(len(texts[a]) - 23)}
        gb = {texts[b][i : i + 24] for i in range(len(texts[b]) - 23)}
        assert ga & gb, f"pair ({a},{b}) shares no 24-gram"


def test_shared_substring_batch_split_and_exact_collapse(rd):
    # docs sharing a passage land in different blocks and still pair up;
    # byte-identical docs collapse to their min-id representative
    from rayquality.ops.substr import shared_substring_pairs

    rng = np.random.default_rng(11)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    base = "".join(rng.choice(alpha, 400))
    texts = []
    for i in range(150):
        if i % 50 == 0:
            texts.append(base)  # 0, 50, 100: byte-identical triplet
        elif i == 70:
            texts.append(base + "unique tail for seventy")  # near-dup of the triplet
        else:
            texts.append("".join(rng.choice(alpha, 400)))
    import ray.data as rdm

    ds = rdm.from_pandas(
        pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64), "text": texts})
    ).repartition(6)
    pairs = shared_substring_pairs(ds, k=24, sample_mod=4, min_shared=2).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # the near-dup pairs with the triplet's REPRESENTATIVE (min id 0) only:
    assert (0, 70) in got
    for collapsed in [(0, 50), (0, 100), (50, 100), (50, 70), (70, 100)]:
        assert collapsed not in got


def test_kcenter_planted_clusters(rd):
    from rayquality.ops.cluster import kcenter_select

    rng = np.random.default_rng(3)
    centers = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, -10.0]])
    pts = np.concatenate(
        [c + rng.normal(0, 0.3, size=(50, 2)) for c in centers]
    )
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(pts), dtype=np.int64),
            "embedding": [list(map(float, p)) for p in pts],
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    picks = kcenter_select(ds, k=3, id_col="vec_id", vec_col="embedding")
    assert len(picks) == 3
    # one pick per planted cluster (farthest-point property)
    got_clusters = {int(i) // 50 for i in picks["id"]}
    assert got_clusters == {0, 1, 2}
    # radius monotonically non-increasing after the first (infinite) pick
    r = picks["radius_sq"].to_numpy()
    assert all(r[i] >= r[i + 1] for i in range(1, len(r) - 1))
    # deterministic first pick: min id
    assert int(picks["id"].iloc[0]) == 0


def test_mad_outliers_naive_parity(rd):
    from rayquality.ops.profile import mad_outliers

    li = rd.read_parquet(f"{SF}/lineitem.parquet")
    got = mad_outliers(li, "l_extendedprice")
    import math

    v = pd.read_parquet(f"{SF}/lineitem.parquet")["l_extendedprice"].dropna().to_numpy()
    c = np.sort((np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(np.int64))
    med = int(c[max(0, math.ceil(0.5 * len(c)) - 1)])
    d = np.sort(np.abs(c - med))
    mad = int(d[max(0, math.ceil(0.5 * len(d)) - 1)])
    assert int(got["median_cents"].iloc[0]) == med
    assert int(got["mad_cents"].iloc[0]) == mad
    assert int(got["n_outliers"].iloc[0]) == int((np.abs(c - med) > 3 * mad).sum())
    assert int(got["n_rows"].iloc[0]) == len(c)


def test_chi2_independence_naive_parity(rd):
    from rayquality.ops.profile import chi2_independence

    ev = rd.read_parquet(f"{SF}/events.parquet").select_columns(
        ["event_type", "user_id"]
    )
    got = chi2_independence(ev, "event_type", "user_id")
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    ct = pd.crosstab(pdf["event_type"], pdf["user_id"]).to_numpy(np.float64)
    n = ct.sum()
    e = ct.sum(axis=1)[:, None] * ct.sum(axis=0)[None, :] / n
    chi2 = float(((ct - e) ** 2 / e).sum())
    assert abs(int(got["chi2_micro"].iloc[0]) - np.floor(chi2 * 1e6 + 0.5)) <= 1
    assert int(got["dof"].iloc[0]) == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert int(got["n_rows"].iloc[0]) == int(n)


def test_basket_pairs_naive_parity(rd):
    from rayquality.ops.analytic import basket_pairs

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = basket_pairs(ev, "user_id", "event_type")
    pdf = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "event_type"]].drop_duplicates()
    m = pdf.merge(pdf, on="user_id")
    m = m[m["event_type_x"] < m["event_type_y"]]
    want = (
        m.groupby(["event_type_x", "event_type_y"], as_index=False)
        .size()
        .rename(
            columns={"event_type_x": "item_a", "event_type_y": "item_b", "size": "n_baskets"}
        )
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_hash_sample(rd):
    from rayquality.ops.windows import grouped_hash_sample

    od = rd.read_parquet(f"{SF}/orders.parquet")
    got = (
        grouped_hash_sample(od, "o_orderstatus", "o_orderkey", k=10)
        .to_pandas()
        .sort_values(["o_orderstatus", "rk"])
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/orders.parquet").copy()
    kk = pdf["o_orderkey"].to_numpy(np.int64).astype(np.uint64)
    pdf["hkey"] = ((kk * np.uint64(2654435761)) % np.uint64(1 << 32)).astype(np.int64)
    pdf = pdf.sort_values(["hkey", "o_orderkey"])
    want = pdf.groupby("o_orderstatus", sort=False).head(10).copy()
    want["rk"] = want.groupby("o_orderstatus", sort=False).cumcount() + 1
    want = (
        want[["o_orderstatus", "o_orderkey", "rk"]]
        .sort_values(["o_orderstatus", "rk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # deterministic across runs
    got2 = (
        grouped_hash_sample(od, "o_orderstatus", "o_orderkey", k=10)
        .to_pandas()
        .sort_values(["o_orderstatus", "rk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_grouped_slope_naive_parity(rd):
    from rayquality.ops.analytic import grouped_slope

    df = pd.DataFrame(
        {
            "g": ["a"] * 6 + ["b"] * 6 + ["c"] * 3,
            "x": [0, 1, 2, 3, 4, 5] * 2 + [2, 2, 2],  # c: zero variance
            "y": [1.0, 3.0, 5.0, 7.0, 9.0, 11.0]  # slope exactly 2.0
            + [10.0, 8.0, 6.0, 4.0, 2.0, 0.0]  # slope exactly -2.0
            + [1.0, 2.0, 3.0],
        }
    )
    import ray.data as rdm

    got = grouped_slope(rdm.from_pandas(df).repartition(3), "g", "x", "y")
    assert list(got["g"]) == ["a", "b"]  # zero-variance group dropped
    # y is in cents: slope 2.0 y-units/x = 200 cents/x = 2e8 micro
    assert int(got[got["g"] == "a"]["slope_micro"].iloc[0]) == 200_000_000
    assert int(got[got["g"] == "b"]["slope_micro"].iloc[0]) == -200_000_000


def test_pagerank_numpy_parity(rd):
    from rayquality.ops.graph import pagerank

    rng = np.random.default_rng(5)
    n = 200
    src = rng.integers(0, n, 800).astype(np.int64)
    dst = rng.integers(0, n, 800).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # make nodes 190..199 dangling (no out-edges)
    keep = src < 190
    src, dst = src[keep], dst[keep]
    edges = pd.DataFrame({"src": src, "dst": dst})
    nodes = rd.from_pandas(pd.DataFrame({"node_id": np.arange(n, dtype=np.int64)}))
    got = (
        pagerank(edges, nodes, id_col="node_id", n_parts=8, max_iters=50, tol=1e-12)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    # numpy reference: power iteration with dangling redistribution
    d = 0.85
    A = np.zeros((n, n))
    for s, t in zip(src, dst):
        A[s, t] += 1.0
    outdeg = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(50):
        contrib = np.zeros(n)
        nz = outdeg > 0
        contrib += (r[nz] / outdeg[nz]) @ A[nz]
        dmass = r[~nz].sum()
        r_new = (1 - d) / n + d * (contrib + dmass / n)
        if np.abs(r_new - r).sum() < 1e-12:
            r = r_new
            break
        r = r_new
    assert np.allclose(got["rank"].to_numpy(), r, atol=1e-9)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_star_hub_wins(rd):
    from rayquality.ops.graph import pagerank

    # every spoke links to the hub (node 0); hub links back to spoke 1
    edges = pd.DataFrame(
        {
            "src": np.array(list(range(1, 20)) + [0], dtype=np.int64),
            "dst": np.array([0] * 19 + [1], dtype=np.int64),
        }
    )
    nodes = rd.from_pandas(pd.DataFrame({"node_id": np.arange(20, dtype=np.int64)}))
    got = pagerank(edges, nodes, id_col="node_id", n_parts=4).to_pandas()
    top = got.sort_values("rank", ascending=False).iloc[0]
    assert int(top["node_id"]) == 0
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_growth_accounting_naive_parity(rd):
    from rayquality.ops.analytic import growth_accounting

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = growth_accounting(ev)
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    first = pdf.groupby("user_id")["ts"].min().dt.strftime("%Y-%m-%d")
    want = (
        first.value_counts().rename_axis("day").reset_index(name="new_users")
        .sort_values("day").reset_index(drop=True)
    )
    want["cum_users"] = want["new_users"].cumsum()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert int(got["cum_users"].iloc[-1]) == pdf["user_id"].nunique()


def test_grouped_approx_distinct_accuracy(rd):
    from rayquality.ops.sketch import grouped_approx_distinct

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = grouped_approx_distinct(ev, "event_type", "user_id")
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    exact = pdf.groupby("event_type")["user_id"].nunique()
    assert set(got["event_type"]) == set(exact.index)
    for _, row in got.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["approx_distinct"] - e) / max(e, 1) < 0.05, (
            row["event_type"], row["approx_distinct"], e
        )


def test_apply_changelog_semantics(rd):
    from rayquality.ops.increment import apply_changelog

    snap = rd.from_pandas(
        pd.DataFrame(
            {
                "k": np.array([1, 2, 3, 4], dtype=np.int64),
                "v": np.array([10, 20, 30, 40], dtype=np.int64),
                "version": np.int64(1),
            }
        )
    )
    # update k=2, delete k=3, insert k=5, update+delete tie on k=4 (delete wins)
    delta = rd.from_pandas(
        pd.DataFrame(
            {
                "k": np.array([2, 3, 5, 4, 4], dtype=np.int64),
                "v": np.array([21, 0, 50, 41, 0], dtype=np.int64),
                "version": np.array([2, 2, 2, 2, 2], dtype=np.int64),
                "op": ["u", "d", "u", "u", "d"],
            }
        )
    )
    got = (
        apply_changelog(snap, delta, "k", ["v"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "k": np.array([1, 2, 5], dtype=np.int64),
            "v": np.array([10, 21, 50], dtype=np.int64),
            "version": np.array([1, 2, 2], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_join_cardinality_naive_parity(rd):
    from rayquality.ops.profile import join_cardinality

    ev = rd.read_parquet(f"{SF}/events.parquet")
    od = rd.read_parquet(f"{SF}/orders.parquet")
    got = join_cardinality(ev, "user_id", od, "o_custkey")
    e = pd.read_parquet(f"{SF}/events.parquet")["user_id"].value_counts()
    o = pd.read_parquet(f"{SF}/orders.parquet")["o_custkey"].value_counts()
    common = e.index.intersection(o.index)
    want = int((e[common] * o[common]).sum())
    assert int(got["join_rows"].iloc[0]) == want
    assert int(got["n_keys_common"].iloc[0]) == len(common)
    # parity with the actual join
    real = pd.read_parquet(f"{SF}/events.parquet")[["user_id"]].merge(
        pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey"]],
        left_on="user_id",
        right_on="o_custkey",
    )
    assert int(got["join_rows"].iloc[0]) == len(real)


def test_pq_recall_vs_brute(rd):
    from rayquality.ops.ann import cosine_topk, pq_encode, pq_search, pq_train

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    books = pq_train(emb, m=8, sample=2048)
    codes = pq_encode(emb, books)
    qids = [0, 7, 19, 41, 77]
    qdf = (
        pd.read_parquet(f"{SF}/embeddings.parquet")
        .query("vec_id in @qids")[["vec_id", "embedding"]]
        .reset_index(drop=True)
    )
    approx = pq_search(codes, books, qdf, k=10)
    exact = cosine_topk(emb, qids, k=10)
    recall = []
    for q in qids:
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        recall.append(len(a & e) / len(e))
    assert np.mean(recall) >= 0.5, recall  # 32x compression, clustered data
    # determinism
    approx2 = pq_search(codes, books, qdf, k=10)
    pd.testing.assert_frame_equal(approx, approx2)


def test_pq_codes_shape_and_compression(rd):
    from rayquality.ops.ann import pq_encode, pq_train

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    books = pq_train(emb, m=8, sample=1024)
    assert books.shape[0] == 8
    out = pq_encode(emb, books).to_pandas()
    assert len(out) == pd.read_parquet(f"{SF}/embeddings.parquet").shape[0]
    assert all(len(b) == 8 for b in out["codes"].head(50))  # 8 bytes/vector


def test_ivfpq_index_recall(rd, tmp_path):
    from rayquality.ops.ann import cosine_topk, ivfpq_build_index, ivfpq_search_index

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    meta = ivfpq_build_index(emb, path, n_cells=8, m=8)
    assert meta["n_cells"] == 8
    qids = [0, 7, 19, 41, 77]
    qdf = (
        pd.read_parquet(f"{SF}/embeddings.parquet")
        .query("vec_id in @qids")
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got = ivfpq_search_index(
        path,
        qdf["vec_id"].to_numpy(),
        np.stack(qdf["embedding"].to_numpy()),
        k=10,
        n_probe=4,
    )
    exact = cosine_topk(emb, qids, k=10)
    recall = []
    for q in qids:
        a = set(got[got["query_id"] == q]["neighbor_id"])
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        recall.append(len(a & e) / len(e))
    assert np.mean(recall) >= 0.4, recall  # cell recall x 32x quantization
    # determinism
    got2 = ivfpq_search_index(
        path,
        qdf["vec_id"].to_numpy(),
        np.stack(qdf["embedding"].to_numpy()),
        k=10,
        n_probe=4,
    )
    pd.testing.assert_frame_equal(got, got2)


def test_kcenter_fixed_point_naive_parity(rd):
    """Engine == a direct numpy replay of the integer greedy recurrence,
    including the min-id first pick, max-mind/min-id tie-breaks, and the
    -1 radius sentinel; duplicated vectors stay pickable at radius 0."""
    from rayquality.ops.cluster import kcenter_fixed_point

    rng = np.random.default_rng(3)
    n, dim, k = 40, 6, 7
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[5] = vecs[9]  # planted exact duplicate
    ids = np.arange(100, 100 + n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    got = kcenter_fixed_point(
        rd.from_pandas(df).repartition(5), k=k, id_col="vec_id"
    )

    q = np.floor(vecs.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    mind = np.full(n, np.iinfo(np.int64).max)
    picks = [(1, int(ids[0]), -1)]
    chosen = 0
    for rank in range(2, k + 1):
        d = ((q - q[chosen]) ** 2).sum(axis=1)
        mind = np.minimum(mind, d)
        mind[chosen] = -1
        order = np.lexsort((ids, -mind))
        chosen = order[0]
        picks.append((rank, int(ids[chosen]), int(mind[chosen])))
    want = pd.DataFrame(picks, columns=["rank", "vec_id", "radius_q"])
    assert got.astype("int64").values.tolist() == want.values.tolist()
    # radii are non-increasing after the sentinel
    r = got["radius_q"].to_numpy()[1:]
    assert (np.diff(r) <= 0).all()
