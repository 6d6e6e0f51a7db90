"""Tests for the round-5 session-2 curation operators: quality-aware
dedup winners, event debounce, overlap-fraction decontamination and
intra-class centroid outliers. Each checks the distributed op against a
naive pandas/numpy reference, including tie and boundary semantics the
DuckDB oracles rely on."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_quality_dedup_winner_semantics(rd):
    from rayquality.ops.textdedup import quality_dedup

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "text": ["aa", "aa", "aa", "bb", "bb", "cc", None],
            "n_chars": [5, 9, 9, 3, 1, 4, 0],
        }
    )
    got = sorted(
        quality_dedup(rd.from_pandas(df).repartition(3)).to_pandas()["doc_id"]
    )
    # 'aa': max score 9 held by ids 2 and 3 -> tie broken by min id = 2
    # 'bb': id 4 (score 3) beats id 5; 'cc': id 6; None-text cluster: id 7
    assert got == [2, 4, 6, 7]


def test_quality_dedup_matches_naive_on_real_docs(rd):
    from rayquality.ops.textdedup import quality_dedup

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = sorted(quality_dedup(docs).to_pandas()["doc_id"])
    pdf = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text", "n_chars"]]
    pdf["text"] = pdf["text"].fillna("")
    want = sorted(
        pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .drop_duplicates("text", keep="first")["doc_id"]
    )
    assert got == want


def test_debounce_gap_and_tie_semantics(rd):
    from rayquality.ops.windows import debounce_events

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = 1_000_000  # one second in us
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [7, 7, 7, 7, 8, 7],
            "event_type": ["c", "c", "c", "c", "c", "d"],
            # gaps within (7,'c'): 5s, 10s, 0s (equal ts tie on id)
            "ts": pd.to_datetime(
                [base, base + 5 * s, base + 15 * s, base + 15 * s, base, base]
            ),
        }
    )
    got = (
        debounce_events(rd.from_pandas(df).repartition(2), min_gap_us=10 * s)
        .to_pandas()
        .sort_values("event_id")
    )
    # id1 first->kept; id2 gap 5s<10 -> dropped; id3 gap 10s>=10 -> kept
    # (boundary is INCLUSIVE); id4 equal-ts tie after id3 (gap 0) -> dropped;
    # id5/id6 are firsts of their own (user,type) groups -> kept
    assert got["kept"].tolist() == [True, False, True, False, True, True]


def test_debounce_matches_naive_lag_on_real_events(rd):
    from rayquality.ops.windows import debounce_events

    gap = 21_600_000_000
    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        debounce_events(ev, min_gap_us=gap)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.sort_values(["user_id", "event_type", "ts", "event_id"], kind="stable")
    prev = pdf.groupby(["user_id", "event_type"])["ts"].shift(1)
    us = (pdf["ts"] - prev).dt.total_seconds() * 1e6
    want = (
        pd.DataFrame(
            {"event_id": pdf["event_id"], "kept": prev.isna() | (us >= gap)}
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["kept"].sum() < len(got)  # the threshold actually drops some


def test_decontaminate_overlap_counts_and_boundary(rd):
    from rayquality.ops.curation import decontaminate_overlap

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c d e",          # grams: abc bcd cde
                "a b c x y",          # grams: abc bcx cxy -> 1/3 hit
                "p q r s t",          # disjoint -> 0 hits
                "a b",                # < 3 words -> 0 grams, never flagged
                None,                 # null -> 0 grams
            ],
        }
    )
    bench = pd.DataFrame({"doc_id": [100], "text": ["a b c d e"]})
    got = (
        decontaminate_overlap(
            rd.from_pandas(docs).repartition(2),
            rd.from_pandas(bench),
            k=3,
            max_frac_micro=333_333,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_grams"].tolist() == [3, 3, 3, 0, 0]
    assert got["n_hit"].tolist() == [3, 1, 0, 0, 0]
    # 1/3 = 333333.33 micro > 333333 -> doc 2 IS contaminated (strict >)
    assert got["contaminated"].tolist() == [True, True, False, False, False]
    # at exactly the fraction the compare is strict: tau = 1/3 in micro
    # units times 3 grams == 1_000_000 * 1 hit fails only when equal
    got2 = (
        decontaminate_overlap(
            rd.from_pandas(docs),
            rd.from_pandas(bench),
            k=3,
            max_frac_micro=500_000,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got2["contaminated"].tolist() == [True, False, False, False, False]


def test_decontaminate_overlap_distinct_grams(rd):
    from rayquality.ops.curation import decontaminate_overlap

    # repeated gram counts once (distinct semantics, matching the oracle's
    # list_distinct)
    docs = pd.DataFrame({"doc_id": [1], "text": ["a b c a b c a b c"]})
    bench = pd.DataFrame({"doc_id": [2], "text": ["c a b x y z"]})
    got = decontaminate_overlap(
        rd.from_pandas(docs), rd.from_pandas(bench), k=3
    ).to_pandas()
    # distinct grams of doc 1: {a b c, b c a, c a b} -> 3, of which
    # bench {c a b, a b x, b x y, x y z} hits exactly 1
    assert got["n_grams"].tolist() == [3]
    assert got["n_hit"].tolist() == [1]


def test_centroid_outliers_planted(rd):
    from rayquality.ops.cluster import centroid_outliers

    rng = np.random.default_rng(7)
    tight = rng.normal(0.0, 0.01, size=(20, 4)).astype(np.float32)
    far = np.full((1, 4), 5.0, np.float32)  # planted outlier in label 0
    other = rng.normal(1.0, 0.01, size=(10, 4)).astype(np.float32)
    emb = np.concatenate([tight, far, other])
    labels = np.array([0] * 21 + [1] * 10, np.int32)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(31, dtype=np.int64),
            "embedding": [[float(v) for v in row] for row in emb],
            "label": labels,
        }
    )
    got = (
        centroid_outliers(rd.from_pandas(df).repartition(3), tau_micro=2_000_000)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got.loc[20, "outlier"]  # the planted far point
    assert got["outlier"].sum() == 1
    # integer-exact parity vs naive: dist = sum |q*n - S| per own label
    q = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    for lab in (0, 1):
        m = labels == lab
        s = q[m].sum(axis=0)
        n = int(m.sum())
        want = np.abs(q[m] * n - s).sum(axis=1)
        assert (got.loc[m, "dist1_scaled"].to_numpy() == want).all()


def test_centroid_outliers_block_order_independent(rd):
    from rayquality.ops.cluster import centroid_outliers

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb["embedding"] = emb["embedding"].map(list)
    a = (
        centroid_outliers(rd.from_pandas(emb).repartition(2), tau_micro=6_700_000)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        centroid_outliers(
            rd.from_pandas(emb.iloc[::-1]).repartition(7), tau_micro=6_700_000
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a["dist1_scaled"].dtype == np.int64
