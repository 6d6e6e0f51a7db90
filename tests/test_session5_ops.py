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


def test_shared_substring_exact_dups_batch_split(rd):
    # identical docs land in different batches and still pair up
    from rayquality.ops.substr import shared_substring_pairs

    rng = np.random.default_rng(11)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    base = "".join(rng.choice(alpha, 400))
    texts = [base if i % 50 == 0 else "".join(rng.choice(alpha, 400)) for i in range(150)]
    import ray.data as rdm

    ds = rdm.from_pandas(
        pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64), "text": texts})
    ).repartition(6)
    pairs = shared_substring_pairs(ds, k=24, sample_mod=4, min_shared=2).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert {(0, 50), (0, 100), (50, 100)} <= got


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
