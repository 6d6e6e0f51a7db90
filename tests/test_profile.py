"""Tests for the profiling trio (Benford, grouped completeness, IQR
outliers) and the curation extras (per-key cap, normalized dedup) —
each checked against a naive pandas reference, plus synthetic edge
cases (nulls, ties, empty groups) the testdata may not contain."""

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _quantize(v, unit):
    v = np.asarray(v, np.float64) * unit
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def test_benford_orders(rd):
    from rayquality.ops import profile

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    got = profile.benford_first_digit(orders, "o_totalprice")

    cents = _quantize(
        pd.read_parquet(f"{SF}/orders.parquet")["o_totalprice"].dropna(), 100.0
    )
    cents = cents[cents > 0]
    digits = np.array([int(str(c)[0]) for c in cents])
    want = pd.Series(digits).value_counts().sort_index()
    assert got["digit"].tolist() == want.index.tolist()
    assert got["n"].tolist() == want.tolist()
    assert got["n"].dtype == np.int64 and got["digit"].dtype == np.int64


def test_benford_negative_and_null(rd):
    from rayquality.ops import profile

    df = pd.DataFrame({"x": [123.0, -456.0, None, 0.0, 0.004, 7.77, 91.0]})
    got = profile.benford_first_digit(rd.from_pandas(df), "x")
    # cents: 12300, (neg excluded), (null excluded), 0 excluded, 0 excluded
    # (0.004 -> 0 cents), 777, 9100 -> digits 1, 7, 9
    assert dict(zip(got["digit"], got["n"])) == {1: 1, 7: 1, 9: 1}


def test_grouped_completeness(rd):
    from rayquality.ops import profile

    df = pd.DataFrame(
        {
            "g": ["a", "a", "b", "b", "b", "c"],
            "x": [1.0, None, 3.0, None, None, None],
            "y": ["p", "q", None, "r", None, None],
        }
    )
    got = profile.grouped_completeness(rd.from_pandas(df), "g", ["x", "y"])
    want = pd.DataFrame(
        {
            "g": ["a", "b", "c"],
            "n_rows": [2, 3, 1],
            "n_x": [1, 1, 0],
            "n_y": [2, 1, 0],
        }
    )
    pd.testing.assert_frame_equal(
        got.astype({c: np.int64 for c in ["n_rows", "n_x", "n_y"]}), want
    )


def test_iqr_outliers(rd):
    from rayquality.ops import profile

    li = rd.read_parquet(f"{SF}/lineitem.parquet")
    got = profile.iqr_outlier_counts(li, "l_returnflag", "l_extendedprice", unit=1.0)

    ref = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_returnflag", "l_extendedprice"]]
    ref = ref.dropna(subset=["l_extendedprice"])
    ref["v"] = _quantize(ref["l_extendedprice"], 1.0)
    rows = []
    for g, grp in ref.groupby("l_returnflag"):
        vs = np.sort(grp["v"].to_numpy())
        n = len(vs)
        q1 = vs[max(0, math.ceil(0.25 * n) - 1)]
        q3 = vs[max(0, math.ceil(0.75 * n) - 1)]
        lo10, hi10 = 10 * q1 - 15 * (q3 - q1), 10 * q3 + 15 * (q3 - q1)
        n_out = int(((10 * vs < lo10) | (10 * vs > hi10)).sum())
        rows.append((g, q1, q3, n_out, n))
    want = pd.DataFrame(
        rows, columns=["l_returnflag", "q1_units", "q3_units", "n_outliers", "n_rows"]
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_iqr_outliers_fire_on_planted(rd):
    # bounded uniform-ish real prices have no Tukey outliers; plant some
    from rayquality.ops import profile

    rng = np.random.default_rng(3)
    base = rng.normal(100.0, 5.0, 500)
    df = pd.DataFrame(
        {
            "g": ["a"] * 503,
            "v": np.concatenate([base, [1000.0, -500.0, None]]),
        }
    )
    got = profile.iqr_outlier_counts(rd.from_pandas(df), "g", "v", unit=1.0)
    assert got["n_rows"].iloc[0] == 502  # null excluded
    assert got["n_outliers"].iloc[0] >= 2  # both planted extremes flagged


def test_per_key_cap(rd):
    from rayquality.ops import curation

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = (
        curation.per_key_cap(docs, "source", "doc_id", cap=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "source"]]
    ref = ref.sort_values(["source", "doc_id"])
    ref["rank"] = ref.groupby("source").cumcount() + 1
    want = (
        ref[ref["rank"] <= 3]
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "source", "rank"]]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.groupby("source").size().max() <= 3


def test_per_key_cap_skewed_key(rd):
    # a single hot key with many rows per block: combiner must still keep
    # exactly cap rows, the global minimum ids
    from rayquality.ops import curation

    n = 5000
    df = pd.DataFrame({"k": ["hot"] * n + ["cold"], "id": list(range(n)) + [99999]})
    ds = rd.from_pandas(df).repartition(16)
    got = (
        curation.per_key_cap(ds, "k", "id", cap=5)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    assert got[got["k"] == "hot"]["id"].tolist() == [0, 1, 2, 3, 4]
    assert got[got["k"] == "cold"]["id"].tolist() == [99999]
    assert got[got["k"] == "hot"]["rank"].tolist() == [1, 2, 3, 4, 5]


def test_normalized_dedup(rd):
    from rayquality.ops import textdedup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "Hello, World!",
                "hello   world",
                "HELLO WORLD.",
                "goodbye world",
                None,
                "?!",  # normalizes to '' like the null row
            ],
        }
    )
    got = textdedup.normalized_dedup(rd.from_pandas(df)).to_pandas()
    # cluster {0,1,2} -> 0; 3 unique; {4 (null), 5 (punct-only)} -> 4
    # (survivor set is deterministic; output order is not — no global sort)
    assert sorted(got["doc_id"].tolist()) == [0, 3, 4]


def test_normalized_dedup_real_corpus(rd):
    from rayquality.ops import textdedup

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = textdedup.normalized_dedup(docs).to_pandas()

    ref = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    norm = (
        ref["text"]
        .fillna("")
        .str.lower()
        .str.replace(r"[^a-z0-9]+", " ", regex=True)
        .str.strip()
    )
    want = ref.assign(n=norm).groupby("n")["doc_id"].min().sort_values()
    assert sorted(got["doc_id"].tolist()) == want.tolist()
