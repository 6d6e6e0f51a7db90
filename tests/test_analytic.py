"""Tests for the analytic operators (rollup, mode, gaps-and-islands,
latest-per-key, exact correlation, NTILE bucketing) and the
bloom-filtered semi-join — each checked against a naive pandas
reference, plus synthetic edge cases (ties at bucket boundaries, bloom
false positives, single-island users) the testdata may not contain."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _cents(v):
    v = np.asarray(v, np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def test_rollup_revenue(rd):
    from rayquality.ops import analytic

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    got = analytic.rollup_revenue(orders)

    df = pd.read_parquet(f"{SF}/orders.parquet")
    df["yr"] = df["o_orderdate"].dt.year
    df["cents"] = _cents(df["o_totalprice"])
    fine = df.groupby(["yr", "o_orderstatus"]).agg(
        n=("cents", "size"), sum_cents=("cents", "sum")
    )
    # level 0 rows reproduce the finest grouping exactly
    lvl0 = got[got["lvl"] == 0].set_index(["yr", "status"])
    assert len(lvl0) == len(fine)
    for (yr, st), row in fine.iterrows():
        assert lvl0.loc[(yr, st), "n"] == row["n"]
        assert lvl0.loc[(yr, st), "sum_cents"] == row["sum_cents"]
    # level 1 sums per year; level 2 grand total
    lvl1 = got[got["lvl"] == 1]
    assert (lvl1["status"] == "ALL").all()
    per_year = df.groupby("yr")["cents"].sum()
    assert dict(zip(lvl1["yr"], lvl1["sum_cents"])) == per_year.to_dict()
    lvl2 = got[got["lvl"] == 2]
    assert len(lvl2) == 1
    assert lvl2["sum_cents"].iloc[0] == df["cents"].sum()
    assert lvl2["n"].iloc[0] == len(df)


def test_mode_per_group_tiebreak(rd):
    from rayquality.ops import analytic

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "a", "b", "b"],
            "v": ["x", "x", "y", "y", "q", "p"],  # a: tie x/y -> x; b: tie p/q -> p
        }
    )
    got = analytic.mode_per_group(rd.from_pandas(df), "g", "v")
    assert got["g"].tolist() == ["a", "b"]
    assert got["mode_value"].tolist() == ["x", "p"]
    assert got["n"].tolist() == [2, 1]


def test_gaps_islands_synthetic(rd):
    from rayquality.ops import analytic

    # user 1: days 0,1,2, 5,6, 9 -> islands of len 3,2,1
    # user 2: one day -> one island of len 1
    days1 = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-06", "2024-01-07", "2024-01-10"]
    df = pd.DataFrame(
        {
            "user_id": [1] * 7 + [2],
            # a second event on an existing day must not split islands
            "ts": pd.to_datetime(
                days1 + ["2024-01-01 23:59:00", "2024-02-01"], format="mixed"
            ),
        }
    )
    got = analytic.gaps_islands(rd.from_pandas(df))
    assert got.loc[got.user_id == 1].iloc[0].tolist() == [1, 6, 3, 3]
    assert got.loc[got.user_id == 2].iloc[0].tolist() == [2, 1, 1, 1]


def test_gaps_islands_events(rd):
    from rayquality.ops import analytic

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = analytic.gaps_islands(ev)

    df = pd.read_parquet(f"{SF}/events.parquet")
    days = (
        pd.DataFrame(
            {
                "u": df["user_id"].to_numpy(),
                "d": df["ts"].to_numpy(dtype="datetime64[D]").astype(np.int64),
            }
        )
        .drop_duplicates()
        .sort_values(["u", "d"])
    )
    for u, grp in days.groupby("u"):
        d = grp["d"].to_numpy()
        row = got[got["user_id"] == u].iloc[0]
        assert row["n_days"] == len(d)
        assert row["n_islands"] == 1 + int((np.diff(d) > 1).sum())


def test_latest_per_key(rd):
    from rayquality.ops import analytic

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    got = analytic.latest_per_key(orders)
    df = pd.read_parquet(f"{SF}/orders.parquet")
    want = (
        df.sort_values(["o_orderdate", "o_orderkey"], ascending=False)
        .drop_duplicates("o_custkey")
        .sort_values("o_custkey")
    )
    assert got["o_custkey"].tolist() == want["o_custkey"].tolist()
    assert got["last_id"].tolist() == want["o_orderkey"].tolist()
    assert (got["last_ts"].to_numpy() == want["o_orderdate"].to_numpy()).all()


def test_corr_exact_matches_numpy(rd):
    from rayquality.ops import analytic

    li = rd.read_parquet(f"{SF}/lineitem.parquet")
    got = analytic.corr_exact(li, "l_quantity", "l_extendedprice")
    df = pd.read_parquet(f"{SF}/lineitem.parquet")
    x = _cents(df["l_quantity"]).astype(np.float64)
    y = _cents(df["l_extendedprice"]).astype(np.float64)
    ref = np.corrcoef(x, y)[0, 1]
    assert got["n"].iloc[0] == len(df)
    assert abs(got["corr_micro"].iloc[0] / 1e6 - ref) < 1e-4


def test_ntile_sizes_and_order(rd):
    from rayquality.ops import analytic

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    got = analytic.ntile_bucketize(orders, "o_totalprice", "o_orderkey", 7).to_pandas()
    df = pd.read_parquet(f"{SF}/orders.parquet")
    n = len(df)
    sizes = got["bucket"].value_counts().sort_index()
    base, rem = divmod(n, 7)
    assert sizes.tolist() == [base + 1] * rem + [base] * (7 - rem)
    # ordering: every row in bucket b sorts <= every row in bucket b+1
    key = pd.DataFrame(
        {"k": df["o_orderkey"], "c": _cents(df["o_totalprice"])}
    ).merge(got, left_on="k", right_on="o_orderkey")
    key = key.sort_values(["c", "k"]).reset_index(drop=True)
    assert (np.diff(key["bucket"].to_numpy()) >= 0).all()


def test_ntile_tie_run_split(rd):
    from rayquality.ops import analytic

    # 9 rows all the SAME value: NTILE(3) must split the tie run by key
    df = pd.DataFrame({"v": [5.0] * 9, "k": np.arange(100, 109, dtype=np.int64)})
    got = (
        analytic.ntile_bucketize(rd.from_pandas(df), "v", "k", 3)
        .to_pandas()
        .sort_values("k")
    )
    assert got["bucket"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_bloom_semi_join_exact(rd):
    from rayquality.ops import bloom

    li = rd.read_parquet(f"{SF}/lineitem.parquet")
    orders = rd.read_parquet(f"{SF}/orders.parquet")
    urgent = orders.filter(lambda r: r["o_orderpriority"] == "1-URGENT")
    got = (
        bloom.bloom_semi_join(
            li, "l_orderkey", urgent, "o_orderkey", ["l_orderkey", "l_linenumber"]
        )
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    ldf = pd.read_parquet(f"{SF}/lineitem.parquet")
    odf = pd.read_parquet(f"{SF}/orders.parquet")
    keys = set(odf.loc[odf["o_orderpriority"] == "1-URGENT", "o_orderkey"])
    want = (
        ldf[ldf["l_orderkey"].isin(keys)][["l_orderkey", "l_linenumber"]]
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert got["l_linenumber"].dtype == want["l_linenumber"].dtype  # int32 survives


def test_bloom_false_positives_removed(rd):
    from rayquality.ops import bloom

    # a TINY filter (64 bits) over 40 right keys forces false positives;
    # the verify stage must still return the exact semi-join
    left = pd.DataFrame({"k": np.arange(0, 2000, dtype=np.int64), "p": np.arange(2000)})
    right = pd.DataFrame({"rk": np.arange(0, 2000, 50, dtype=np.int64)})
    got = (
        bloom.bloom_semi_join(
            rd.from_pandas(left), "k", rd.from_pandas(right), "rk", ["k", "p"],
            m_bits=64,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == list(range(0, 2000, 50))

    # sanity: the raw bloom pass at 64 bits really does admit extras
    import ray

    bits = ray.get(bloom.build_bloom(rd.from_pandas(right), "rk", m_bits=64))
    admitted = bloom._bloom_test(left["k"].to_numpy(), bits, 64).sum()
    assert admitted > len(right)


def test_char_stats_multibyte_and_empty(rd):
    from rayquality.ops import text as text_ops

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["aab€€€", "", None, "xxxx"],
        }
    )
    got = (
        text_ops.char_stats(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_cp"].tolist() == [6, 0, 0, 4]  # € is ONE codepoint
    assert got["n_distinct"].tolist() == [3, 0, 0, 1]
    assert got["max_char_n"].tolist() == [3, 0, 0, 4]


def test_char_stats_documents(rd):
    from rayquality.ops import text as text_ops

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = (
        text_ops.char_stats(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    df = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    for _, row in df.head(50).iterrows():
        s = row["text"] or ""
        want = got[got["doc_id"] == row["doc_id"]].iloc[0]
        assert want["n_cp"] == len(s)
        assert want["n_distinct"] == len(set(s))
        assert want["max_char_n"] == (max(s.count(c) for c in set(s)) if s else 0)


def test_first_per_key_window_ties(rd):
    from rayquality.ops import windows

    ts = pd.to_datetime(
        [
            "2024-01-01 09:00",  # u1 day1 winner (tie on ts -> min event_id)
            "2024-01-01 09:00",
            "2024-01-01 17:00",
            "2024-01-02 00:00",  # u1 day2 winner
            "2024-01-01 12:00",  # u2 day1 winner
        ]
    )
    df = pd.DataFrame(
        {
            "event_id": [11, 10, 12, 13, 20],
            "user_id": [1, 1, 1, 1, 2],
            "ts": ts,
        }
    )
    got = (
        windows.first_per_key_window(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == [10, 13, 20]


def test_distribution_drift_negative_bins(rd):
    from rayquality.ops import profile

    old = pd.DataFrame({"v": [-25.0, -5.0, 5.0, 15.0, None]})
    new = pd.DataFrame({"v": [-25.0, 35.0]})
    got = profile.distribution_drift(
        rd.from_pandas(old), rd.from_pandas(new), "v", bin_units=1000
    )
    # cents: -2500,-500,500,1500 -> bins floor(c/1000): -3,-1,0,1
    assert got["bin"].tolist() == [-3, -1, 0, 1, 3]
    assert got["n_old"].tolist() == [1, 1, 1, 1, 0]
    assert got["n_new"].tolist() == [1, 0, 0, 0, 1]


def test_conditional_rule_violations(rd):
    from rayquality.ops import validators

    df = pd.DataFrame(
        {
            "t": ["a", "a", "a", "b", None],
            "p": ["has-key", "nope", None, "irrelevant", "x"],
        }
    )
    got = validators.conditional_rule(rd.from_pandas(df), "t", "a", "p", "key")
    assert got["n_applicable"].iloc[0] == 3
    assert got["n_violations"].iloc[0] == 2  # 'nope' and the null
    assert got["n_null_then"].iloc[0] == 1


def test_temporal_consistency_violations_and_orphans(rd):
    from rayquality.ops import validators

    child = pd.DataFrame(
        {
            "ck": [1, 1, 2, 9],
            "cts": pd.to_datetime(
                ["2024-01-05", "2023-12-31", "2024-02-02", "2024-03-03"]
            ),
        }
    )
    parent = pd.DataFrame(
        {"pk": [1, 2], "pts": pd.to_datetime(["2024-01-01", "2024-02-01"])}
    )
    got = validators.temporal_consistency(
        rd.from_pandas(child), rd.from_pandas(parent), "ck", "pk", "cts", "pts"
    )
    assert got["n_checked"].iloc[0] == 4
    assert got["n_violations"].iloc[0] == 1  # 2023-12-31 before 2024-01-01
    assert got["n_orphans"].iloc[0] == 1  # ck=9 has no parent


def test_remove_boilerplate_lines(rd):
    from rayquality.ops import curation

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "COOKIE BANNER\nunique prose one",
                "COOKIE BANNER\nunique prose two",
                "COOKIE BANNER\nCOOKIE BANNER\nunique prose three",
                "COOKIE BANNER",  # all-boilerplate doc survives, empty
            ],
        }
    )
    got = (
        curation.remove_boilerplate_lines(
            rd.from_pandas(df), max_doc_freq=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # the banner is in 4 > 2 distinct docs -> removed everywhere,
    # including BOTH occurrences inside doc 3
    assert got["text_clean"].tolist() == [
        "unique prose one",
        "unique prose two",
        "unique prose three",
        "",
    ]
    assert got["n_removed"].tolist() == [1, 1, 2, 1]


def test_remove_boilerplate_under_threshold(rd):
    from rayquality.ops import curation

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["shared\na", "shared\nb"]}
    )
    got = (
        curation.remove_boilerplate_lines(rd.from_pandas(df), max_doc_freq=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    # 'shared' is in exactly 2 docs = threshold -> kept
    assert got["n_removed"].tolist() == [0, 0]


def test_resample_hourly_gap_fill(rd):
    from rayquality.ops import relational

    df = pd.DataFrame(
        {
            "event_type": ["a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:10", "2024-01-01 03:20", "2024-01-01 01:05"]
            ),
        }
    )
    got = relational.resample_hourly_counts(rd.from_pandas(df))
    # grid: 2 types x 4 hours (00..03), zeros filled
    assert len(got) == 8
    a = got[got["event_type"] == "a"]["n_events"].tolist()
    b = got[got["event_type"] == "b"]["n_events"].tolist()
    assert a == [1, 0, 0, 1]
    assert b == [0, 1, 0, 0]
    assert str(got["hour"].dtype) == "datetime64[us]"


def _naive_rev_c100(df):
    ext = _cents(df["l_extendedprice"])
    disc = _cents(df["l_discount"])
    return ext * (100 - disc)


def test_q3_shipping_priority(rd):
    from rayquality.ops import multijoin

    cust = rd.read_parquet(f"{SF}/customer.parquet")
    orders = rd.read_parquet(f"{SF}/orders.parquet")
    li = rd.read_parquet(f"{SF}/lineitem.parquet")
    got = multijoin.q3_shipping_priority(cust, orders, li)

    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    l = pd.read_parquet(f"{SF}/lineitem.parquet")
    cut = pd.Timestamp("1998-03-15")
    keys = set(c.loc[c["c_mktsegment"] == "BUILDING", "c_custkey"])
    o = o[(o["o_orderdate"] < cut) & o["o_custkey"].isin(keys)]
    l = l[l["l_shipdate"] > cut].copy()
    l["rev"] = _naive_rev_c100(l)
    rev = l.groupby("l_orderkey", as_index=False)["rev"].sum()
    m = rev.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    want = m.sort_values(["rev", "l_orderkey"], ascending=[False, True]).head(10)
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert got["revenue_c100"].tolist() == want["rev"].tolist()


def test_q5_local_supplier_volume(rd):
    from rayquality.ops import multijoin

    tabs = [
        rd.read_parquet(f"{SF}/{t}.parquet")
        for t in ["region", "nation", "supplier", "customer", "orders", "lineitem"]
    ]
    got = multijoin.q5_local_supplier_volume(*tabs)

    r = pd.read_parquet(f"{SF}/region.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    l = pd.read_parquet(f"{SF}/lineitem.parquet")
    rk = r.loc[r["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    nat = n[n["n_regionkey"] == rk]
    o = o[(o["o_orderdate"] >= "1997-01-01") & (o["o_orderdate"] < "1998-01-01")]
    m = (
        l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    m = m[m["c_nationkey"] == m["s_nationkey"]]
    m = m.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    m["rev"] = _naive_rev_c100(m)
    want = (
        m.groupby("n_name", as_index=False)["rev"]
        .sum()
        .sort_values(["rev", "n_name"], ascending=[False, True])
    )
    assert got["n_name"].tolist() == want["n_name"].tolist()
    assert got["revenue_c100"].tolist() == want["rev"].tolist()


def test_q14_promo_share(rd):
    from rayquality.ops import multijoin

    li = rd.read_parquet(f"{SF}/lineitem.parquet")
    part = rd.read_parquet(f"{SF}/part.parquet")
    got = multijoin.q14_promo_revenue_share(li, part)

    l = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    l = l[(l["l_shipdate"] >= "1998-09-01") & (l["l_shipdate"] < "1998-10-01")].copy()
    l["rev"] = _naive_rev_c100(l)
    m = l.merge(p, left_on="l_partkey", right_on="p_partkey", how="left")
    promo = m.loc[m["p_type"] == "PROMO", "rev"].sum()
    total = m["rev"].sum()
    assert got["promo_c100"].iloc[0] == promo
    assert got["total_c100"].iloc[0] == total
    assert got["share_micro"].iloc[0] == np.floor(
        np.abs(1e6 * promo / total) + 0.5
    ) * np.sign(promo)


def test_skew_aware_join_hot_and_cold(rd):
    from rayquality.ops import relational

    # key "hot" owns 90% of the big side -> takes the broadcast path;
    # the long tail of cold keys goes through the shuffle join; one big
    # key is absent from the dim side (inner drop) and one has a NULL key
    big = pd.DataFrame(
        {
            "k": ["hot"] * 900 + [f"c{i}" for i in range(90)] + ["missing"] * 9 + [None],
            "v": np.arange(1000, dtype=np.int64),
        }
    )
    dim = pd.DataFrame(
        {
            "k": ["hot"] + [f"c{i}" for i in range(90)],
            "lab": ["HOT"] + [f"C{i}" for i in range(90)],
        }
    )
    out = (
        relational.skew_aware_join(
            rd.from_pandas(big), "k", rd.from_pandas(dim), "k", ["lab"]
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    want = (
        big.merge(dim, on="k", how="inner").sort_values("v").reset_index(drop=True)
    )
    assert len(out) == 990
    pd.testing.assert_frame_equal(out[["k", "v", "lab"]], want[["k", "v", "lab"]])


def test_skew_aware_join_all_hot_empty_cold(rd):
    from rayquality.ops import relational

    # every key is hot -> the cold side is COMPLETELY empty; the sentinel
    # row must keep the shuffle join alive and contribute no output rows
    big = pd.DataFrame({"k": ["a", "b"] * 50, "v": np.arange(100, dtype=np.int64)})
    dim = pd.DataFrame({"k": ["a", "b"], "lab": ["A", "B"]})
    out = (
        relational.skew_aware_join(
            rd.from_pandas(big), "k", rd.from_pandas(dim), "k", ["lab"], hot_fraction=0.001
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert len(out) == 100
    assert (out["lab"] == out["k"].str.upper()).all()


def test_budget_select_prefix_semantics(rd):
    from rayquality.ops import curation

    # scores with heavy ties so the boundary tie-break matters
    n = 200
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "score": (np.arange(n, dtype=np.int64) % 5),  # 5 score groups
            "cost": np.full(n, 7, dtype=np.int64),
        }
    )
    budget = 500  # fits 71 rows of cost 7 (71*7=497)
    out = (
        curation.budget_select(rd.from_pandas(df), "id", "score", "cost", budget=budget)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["score", "id"], ascending=[False, True]).copy()
    want["cum"] = want["cost"].cumsum()
    want = (
        want[want["cum"] <= budget]
        .drop(columns="cum")
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want)
    assert len(out) == 71


def test_budget_select_all_fit(rd):
    from rayquality.ops import curation

    df = pd.DataFrame(
        {
            "id": np.arange(10, dtype=np.int64),
            "score": np.arange(10, dtype=np.int64),
            "cost": np.ones(10, dtype=np.int64),
        }
    )
    out = (
        curation.budget_select(rd.from_pandas(df), "id", "score", "cost", budget=100)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(out) == 10


def test_budget_select_fractional_budget(rd):
    from rayquality.ops import curation

    df = pd.DataFrame(
        {
            "id": np.arange(30, dtype=np.int64),
            "score": np.repeat(np.arange(3, dtype=np.int64), 10),
            "cost": np.full(30, 10, dtype=np.int64),
        }
    )
    # total 300, budget 300*1//3 = 100 -> exactly the score-2 group (ids 20..29)
    out = (
        curation.budget_select(
            rd.from_pandas(df), "id", "score", "cost", budget_num=1, budget_den=3
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out["id"].tolist() == list(range(20, 30))


def test_blocklist_stats(rd):
    from rayquality.ops import text as text_ops

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "Spam spam ham",          # 2/3 blocked (case-folded)
                "spamming is not spam",   # \b: 'spamming' does NOT match
                None,                      # null -> 0/0, unflagged
                "clean text only",
            ],
        }
    )
    out = (
        text_ops.blocklist_stats(rd.from_pandas(df), ["spam"], 1, 4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_blocked"].tolist() == [2, 1, 0, 0]
    assert out["n_tokens"].tolist() == [3, 4, 0, 3]
    # flagged iff blocked/tokens > 1/4
    assert out["flagged"].tolist() == [True, False, False, False]


def test_winsorized_group_sum(rd):
    from rayquality.ops import cleanse

    # values 1..100 in dollars -> cents 100..10000; p05=500, p95=9500
    # (quantile_disc: idx = ceil(q*n)-1 into the sorted multiset)
    df = pd.DataFrame(
        {
            "g": ["a", "b"] * 50,
            "v": (np.arange(1, 101, dtype=np.float64)),
        }
    )
    out = cleanse.winsorized_group_sum(rd.from_pandas(df), "g", "v", 0.05, 0.95)
    assert out["g"].tolist() == ["a", "b"]
    cents = np.arange(1, 101) * 100
    lo, hi = cents[int(np.ceil(0.05 * 100)) - 1], cents[int(np.ceil(0.95 * 100)) - 1]
    w = np.clip(cents, lo, hi)
    assert out["sum_wins_c"].tolist() == [int(w[0::2].sum()), int(w[1::2].sum())]
    assert out["n_clipped"].sum() == int(((cents < lo) | (cents > hi)).sum())
    assert out["n"].tolist() == [50, 50]


def test_top_ngrams(rd):
    from rayquality.ops import text as text_ops

    df = pd.DataFrame(
        {
            "text": [
                "a b a b a b",   # "a b" x3, "b a" x2
                "a b c",         # "a b", "b c"
                None,
                "x",             # too short for bigrams
            ]
        }
    )
    out = text_ops.top_ngrams(rd.from_pandas(df), n=2, top_k=2)
    assert out["ngram"].tolist() == ["a b", "b a"]
    assert out["cnt"].tolist() == [4, 2]


def test_q10_returned_item_revenue(rd):
    from rayquality.ops import multijoin

    cust = rd.read_parquet(f"{SF}/customer.parquet")
    orders = rd.read_parquet(f"{SF}/orders.parquet")
    li = rd.read_parquet(f"{SF}/lineitem.parquet")
    nat = rd.read_parquet(f"{SF}/nation.parquet")
    got = multijoin.q10_returned_item_revenue(cust, orders, li, nat)

    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    l = pd.read_parquet(f"{SF}/lineitem.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    lo, hi = pd.Timestamp("1996-04-01"), pd.Timestamp("1996-07-01")
    o = o[(o["o_orderdate"] >= lo) & (o["o_orderdate"] < hi)]
    l = l[l["l_returnflag"] == "R"].copy()
    l["rev"] = _naive_rev_c100(l)
    m = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    per = m.groupby("o_custkey", as_index=False)["rev"].sum()
    want = per.sort_values(["rev", "o_custkey"], ascending=[False, True]).head(20)
    want = want.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    want = want.sort_values(["rev", "c_custkey"], ascending=[False, True])
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["revenue_c100"].tolist() == want["rev"].tolist()
    assert got["n_name"].tolist() == want["n_name"].tolist()
    import numpy as np

    want_bal = np.floor(want["c_acctbal"].to_numpy() * 100 + 0.5).astype("int64")
    assert got["acctbal_c100"].tolist() == want_bal.tolist()


def test_q18_large_volume_customers(rd):
    from rayquality.ops import multijoin

    cust = rd.read_parquet(f"{SF}/customer.parquet")
    orders = rd.read_parquet(f"{SF}/orders.parquet")
    li = rd.read_parquet(f"{SF}/lineitem.parquet")
    got = multijoin.q18_large_volume_customers(cust, orders, li)

    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    l = pd.read_parquet(f"{SF}/lineitem.parquet").copy()
    l["q"] = _cents(l["l_quantity"])
    qty = l.groupby("l_orderkey", as_index=False)["q"].sum()
    big = qty[qty["q"] > 18000]
    assert len(big) > 0, "threshold must keep some orders at sf0.001"
    m = big.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    m["totalprice_c100"] = _cents(m["o_totalprice"])
    want = m.sort_values(
        ["totalprice_c100", "o_orderkey"], ascending=[False, True]
    ).head(100)
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["total_qty_c100"].tolist() == want["q"].tolist()
    assert got["totalprice_c100"].tolist() == want["totalprice_c100"].tolist()
    assert got["c_name"].tolist() == want["c_name"].tolist()


def test_dedup_lines_within_doc(rd):
    """Intra-doc line dedup: first occurrences keep order, later repeats
    drop, cross-doc repeats are untouched, null text behaves as ''."""
    from rayquality.ops.curation import dedup_lines_within_doc

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a\nb\na\nc\nb\na",     # dups of a (x2) and b (x1)
                "a\nb",                   # same lines, other doc: untouched
                None,                     # null -> ''
                "only one line",
            ],
        }
    )
    got = (
        dedup_lines_within_doc(rd.from_pandas(docs).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["text_clean"].tolist() == ["a\nb\nc", "a\nb", "", "only one line"]
    assert got["n_removed"].tolist() == [3, 0, 0, 0]

    # naive parity on synthetic multi-line corpus built from real texts
    base = pd.read_parquet("/root/testdata/sf0.001/documents.parquet").dropna(
        subset=["text"]
    )
    comp = (
        base.assign(cid=base["doc_id"] // 4)
        .sort_values("doc_id")
        .groupby("cid")["text"]
        .agg("\n".join)
        .reset_index()
        .rename(columns={"text": "text"})
    )
    comp["text"] = comp["text"] + "\n" + comp["text"].str.split("\n").str[0]
    got2 = (
        dedup_lines_within_doc(rd.from_pandas(comp), id_col="cid")
        .to_pandas()
        .sort_values("cid")
        .reset_index(drop=True)
    )

    def naive(t):
        seen, out = set(), []
        for ln in t.split("\n"):
            if ln not in seen:
                seen.add(ln)
                out.append(ln)
        return "\n".join(out), len(t.split("\n")) - len(out)

    want = comp["text"].map(naive)
    assert got2["text_clean"].tolist() == [w[0] for w in want]
    assert got2["n_removed"].tolist() == [w[1] for w in want]
    assert (got2["n_removed"] >= 1).all()  # every composite has >= 1 injected dup
