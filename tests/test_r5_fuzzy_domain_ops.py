"""Tests for the round-5 session-3 operators: exact edit-distance near-dup
pairs (length-banded + char-frequency-bounded + vectorized-DP Levenshtein)
and the per-domain URL frequency profile."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _naive_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_lev_kernel_matches_naive_dp():
    from rayquality.ops.textdedup import _lev_band_distance

    rng = np.random.default_rng(11)
    alpha = "abcde"
    for _ in range(300):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        want = _naive_lev(a, b)
        ea = np.frombuffer(a.encode(), np.uint8)
        eb = np.frombuffer(b.encode(), np.uint8)
        d = 12
        got = _lev_band_distance(ea, eb, d)
        assert got == min(want, d + 1), (a, b)
        # tight-threshold early exit must stay EXACT at the boundary
        if want > 0:
            assert _lev_band_distance(ea, eb, want) == want
            assert _lev_band_distance(ea, eb, want - 1) == want  # == d+1


def test_edit_distance_dups_planted(rd):
    from rayquality.ops.textdedup import edit_distance_dups

    base = "the quick brown fox jumps over the lazy dog " * 4
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                base,
                base.replace("quick", "quock", 1),  # 1 substitution from 1
                base + " extra tail words here!!",  # 24 insertions from 1
                "completely different content altogether",  # far
                base,  # exact dup of 1 -> dist 0
            ],
        }
    )
    got = (
        edit_distance_dups(rd.from_pandas(df).repartition(3), max_dist=24)
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    pairs = {(r.i, r.j): r.dist for r in got.itertuples()}
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 5)] == 0
    assert pairs[(2, 5)] == 1
    assert pairs[(1, 3)] == 24  # exactly at the threshold boundary
    assert (4 not in got["i"].values) and (4 not in got["j"].values)


def test_edit_distance_dups_matches_naive_on_real_docs(rd):
    from rayquality.ops.textdedup import edit_distance_dups

    d = 24
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = (
        edit_distance_dups(docs, max_dist=d)
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    # reference = the UNBLOCKED quadratic definition via DuckDB's
    # levenshtein (the pure-Python DP takes minutes at 500 docs; the
    # kernel itself is naive-verified in test_lev_kernel_matches_naive_dp)
    import duckdb

    want_df = (
        duckdb.sql(
            f"""
            WITH d AS (SELECT doc_id, COALESCE(text,'') t
                       FROM '{SF}/documents.parquet')
            SELECT a.doc_id AS i, c.doc_id AS j,
                   CAST(levenshtein(a.t, c.t) AS BIGINT) AS dist
            FROM d a JOIN d c ON a.doc_id < c.doc_id
              AND abs(length(a.t) - length(c.t)) <= {d}
            WHERE levenshtein(a.t, c.t) <= {d} ORDER BY i, j
            """
        )
        .df()
        .astype(np.int64)
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    assert len(want_df) > 0  # the corpus actually plants near-dups
    pd.testing.assert_frame_equal(got, want_df)


def test_edit_distance_cross_band_pairs_counted_once(rd):
    from rayquality.ops.textdedup import edit_distance_dups

    # lengths 30 and 34 straddle the width-32 band edge: the pair must be
    # found exactly once (ownership = the longer member's native band)
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a" * 30, "a" * 34],
        }
    )
    got = edit_distance_dups(rd.from_pandas(df).repartition(2), max_dist=24).to_pandas()
    assert len(got) == 1
    assert got.iloc[0].tolist() == [1, 2, 4]


def test_domain_profile_counts(rd):
    from rayquality.ops.text import domain_profile

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "see http://a.example.com/x and http://a.example.com/y",
                "see https://a.example.com/z plus http://b.example.net/",
                "no urls at all",
                None,
            ],
        }
    )
    got = (
        domain_profile(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    assert got["domain"].tolist() == ["a.example.com", "b.example.net"]
    assert got["n_urls"].tolist() == [3, 1]  # doc 1 mentions a.example.com twice
    assert got["n_docs"].tolist() == [2, 1]  # but counts once for n_docs
    assert got["n_urls"].dtype == np.int64 and got["n_docs"].dtype == np.int64


def test_domain_profile_empty_input(rd):
    from rayquality.ops.text import domain_profile

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["plain", "words"]})
    got = domain_profile(rd.from_pandas(df)).to_pandas()
    assert len(got) == 0
