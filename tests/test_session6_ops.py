"""Tests for the session-6 operator batch: corpus-trained bigram LM NLL
(CCNet-style self-scoring), per-user ordered event paths, and rolling
z-score hourly anomaly detection."""

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _naive_bigram_nll(texts: dict[int, str], alpha: float = 0.1) -> pd.DataFrame:
    import re

    tok = re.compile(r"[a-z0-9]+")
    grams: dict[int, list[tuple[str, str]]] = {}
    c2: dict[tuple[str, str], int] = {}
    for i, s in texts.items():
        w = tok.findall((s or "").lower())
        g = list(zip(w, w[1:]))
        grams[i] = g
        for b in g:
            c2[b] = c2.get(b, 0) + 1
    c1: dict[str, int] = {}
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    vocab = len({b for _, b in c2})
    rows = []
    for i, g in grams.items():
        if not g:
            continue
        lps = [math.log((c2[b] + alpha) / (c1[b[0]] + alpha * vocab)) for b in g]
        nll = -sum(lps) / len(lps)
        rows.append((i, len(g), int(np.floor(nll * 1e6 + 0.5))))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "nll_micro_nats"])


def test_corpus_bigram_nll_naive_parity(rd):
    from rayquality.ops.text import corpus_bigram_nll

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = (
        corpus_bigram_nll(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    want = (
        _naive_bigram_nll(dict(zip(pdf["doc_id"], pdf["text"])))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["n_bigrams"].to_numpy() == want["n_bigrams"].to_numpy()).all()
    # float-sum order may differ by ulps; micro-nat values must agree exactly
    # or (pathologically) by one quantum at a rounding boundary
    diff = np.abs(got["nll_micro_nats"].to_numpy() - want["nll_micro_nats"].to_numpy())
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99


def test_corpus_bigram_nll_outlier_scores_high(rd):
    # a doc repeating the corpus's most common pattern scores LOWER NLL
    # than line noise that shares no bigrams with anything else
    common = pd.DataFrame(
        {"doc_id": np.arange(20), "text": ["the cat sat on the mat"] * 19 + ["zq xv jk wp qz vx"]}
    )
    ds = rd.from_pandas(common)
    got = corpus_nll_sorted(ds)
    noise = got.loc[got["doc_id"] == 19, "nll_micro_nats"].iloc[0]
    typical = got.loc[got["doc_id"] == 0, "nll_micro_nats"].iloc[0]
    assert noise > typical


def corpus_nll_sorted(ds):
    from rayquality.ops.text import corpus_bigram_nll

    return corpus_bigram_nll(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_corpus_bigram_nll_skips_short_docs(rd):
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["one", "", "two words here"]})
    got = corpus_nll_sorted(rd.from_pandas(df))
    assert got["doc_id"].tolist() == [3]
    assert got["n_bigrams"].tolist() == [2]


def test_event_paths_naive_parity(rd):
    from rayquality.ops.windows import event_paths

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = event_paths(ev).to_pandas().sort_values("user_id").reset_index(drop=True)
    pdf = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="stable"
    )
    counts = pdf.groupby("user_id")["event_type"].size()
    paths = pdf.groupby("user_id").head(50).groupby("user_id")["event_type"].agg(">".join)
    assert got["user_id"].tolist() == counts.index.tolist()
    assert got["n_events"].tolist() == counts.tolist()
    assert got["path"].tolist() == paths.tolist()


def test_event_paths_cap_and_order(rd):
    ts = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [7] * 4 + [8],
            "ts": [ts, ts, ts + pd.Timedelta("1s"), ts + pd.Timedelta("2s"), ts],
            "event_type": ["b", "a", "c", "d", "x"],
            "event_id": [2, 1, 3, 4, 5],
        }
    )
    from rayquality.ops.windows import event_paths

    got = (
        event_paths(rd.from_pandas(df), max_events=3)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # ts tie broken by event_id: a(1) before b(2); cap keeps 3 of 4 events
    assert got.loc[0, "path"] == "a>b>c"
    assert got.loc[0, "n_events"] == 4
    assert got.loc[1, "path"] == "x"


def test_hourly_anomalies_naive_parity(rd):
    from rayquality.ops.profile import hourly_anomalies

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = hourly_anomalies(ev)
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf[pdf["event_type"].notna()]
    pdf["hour"] = pdf["ts"].dt.floor("h")
    hours = pd.date_range(pdf["hour"].min(), pdf["hour"].max(), freq="h")
    rows = []
    for typ in sorted(pdf["event_type"].unique()):
        cnt = (
            pdf[pdf["event_type"] == typ].groupby("hour").size().reindex(hours, fill_value=0)
        )
        roll = cnt.rolling(24)
        s1 = roll.sum().shift(1)
        s2 = (cnt**2).rolling(24).sum().shift(1)
        for i in range(24, len(cnt)):
            a, b = s1.iloc[i], s2.iloc[i]
            if 24 * b <= a * a:
                continue
            z = (cnt.iloc[i] - a / 24.0) / np.sqrt((b - a * a / 24.0) / 23.0)
            rows.append((typ, hours[i], int(cnt.iloc[i]), int(np.floor(z * 1e6 + 0.5))))
    want = pd.DataFrame(rows, columns=["event_type", "hour", "n_events", "z_micro"])
    assert len(got) == len(want)
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert np.abs(got["z_micro"].to_numpy() - want["z_micro"].to_numpy()).max() <= 1


def test_hourly_anomalies_flags_spike(rd):
    # 48 calm hours then one 100x spike: the spike hour carries the max z
    ts = pd.date_range("2024-01-01", periods=49, freq="h")
    counts = [5, 6] * 24 + [500]
    rows = []
    eid = 0
    for t, c in zip(ts, counts):
        for _ in range(c):
            rows.append((eid, t, 1, "click", 1.0, "{}"))
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    from rayquality.ops.profile import hourly_anomalies

    got = hourly_anomalies(rd.from_pandas(df))
    top = got.loc[got["z_micro"].idxmax()]
    assert top["hour"] == ts[-1]
    assert top["z_micro"] > 100 * 1e6  # ~989 sigma against a 0.5-sd baseline


def test_dup_rate_by_source_planted(rd):
    from rayquality.ops.textdedup import dup_rate_by_source

    df = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": ["same", "same", "uniq1", "same", "uniq2", "pair", "pair", "uniq3"],
            "source": ["a", "a", "a", "b", "b", "b", "c", "c"],
        }
    )
    got = dup_rate_by_source(rd.from_pandas(df))
    want = pd.DataFrame(
        {"source": ["a", "b", "c"], "n_docs": [3, 3, 2], "n_dup_docs": [2, 2, 1]}
    )
    pd.testing.assert_frame_equal(got, want)


def test_dup_rate_by_source_no_dups(rd):
    from rayquality.ops.textdedup import dup_rate_by_source

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["x", "y"], "source": ["a", "b"]}
    )
    got = dup_rate_by_source(rd.from_pandas(df))
    assert got["n_dup_docs"].tolist() == [0, 0]
    assert got["n_docs"].tolist() == [1, 1]


def test_corpus_bigram_nll_empty_model(rd):
    # corpus where no doc reaches 2 tokens: the trained model is empty and
    # the scorer emits zero rows instead of crashing on a schemaless combine
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["one", ""]})
    from rayquality.ops.text import corpus_bigram_nll

    assert len(corpus_bigram_nll(rd.from_pandas(df)).to_pandas()) == 0


def test_dup_rate_null_source_is_a_group(rd):
    from rayquality.ops.textdedup import dup_rate_by_source

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["x", "x", "y"], "source": ["a", "a", None]}
    )
    got = dup_rate_by_source(rd.from_pandas(df))
    assert len(got) == 2  # the null source is its own group (SQL GROUP BY)
    assert got.loc[got["source"] == "a", "n_dup_docs"].iloc[0] == 2


def test_write_range_sorted_global_order(rd, tmp_path):
    from rayquality.ops.sink import write_range_sorted

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"k": rng.integers(0, 1_000_000, 20_000), "payload": np.arange(20_000)}
    )
    out = str(tmp_path / "sorted")
    man = write_range_sorted(rd.from_pandas(df), "k", out, n_ranges=8)
    # manifest covers every row, ranges are disjoint and ordered
    assert man["n_rows"].sum() == len(df)
    assert (man["min_key"] <= man["max_key"]).all()
    assert (man["max_key"].to_numpy()[:-1] <= man["min_key"].to_numpy()[1:]).all()
    # reading range dirs in lexical order yields a globally sorted corpus
    import glob as g

    ks = []
    for d in sorted(g.glob(out + "/range=*")):
        part = pd.concat([pd.read_parquet(f) for f in sorted(g.glob(d + "/*.parquet"))])
        ks.append(part["k"].to_numpy())
        assert (np.diff(part["k"].to_numpy()) >= 0).all()  # within-range sorted
    allk = np.concatenate(ks)
    assert len(allk) == len(df)
    assert (np.diff(allk) >= 0).all()
    assert sorted(allk.tolist()) == sorted(df["k"].tolist())


def test_write_range_sorted_retry_idempotent(rd, tmp_path):
    from rayquality.ops.sink import write_range_sorted

    df = pd.DataFrame({"k": np.arange(1000), "v": np.arange(1000)})
    out = str(tmp_path / "twice")
    write_range_sorted(rd.from_pandas(df), "k", out, n_ranges=4)
    write_range_sorted(rd.from_pandas(df), "k", out, n_ranges=4)  # simulated retry
    import glob as g

    total = sum(
        len(pd.read_parquet(f)) for f in g.glob(out + "/range=*/*.parquet")
    )
    assert total == 1000  # content-hash filenames: rerun overwrites, never duplicates


def test_event_transitions_naive_parity(rd):
    from rayquality.ops.windows import event_transitions

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = event_transitions(ev)
    pdf = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="stable"
    )
    prev = pdf.groupby("user_id")["event_type"].shift(1)
    pairs = pd.DataFrame({"from_type": prev, "to_type": pdf["event_type"]}).dropna(
        subset=["from_type"]
    )
    want = (
        pairs.groupby(["from_type", "to_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype({"n": np.int64}))


def test_event_transitions_single_user_chain(rd):
    ts0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": [ts0, ts0 + pd.Timedelta("1s"), ts0 + pd.Timedelta("2s"), ts0],
            "event_type": ["a", "b", "a", "z"],
            "event_id": [1, 2, 3, 4],
        }
    )
    from rayquality.ops.windows import event_transitions

    got = event_transitions(rd.from_pandas(df))
    # user 1: a->b, b->a; user 2: no transition; never a cross-user pair
    assert got.values.tolist() == [["a", "b", 1], ["b", "a", 1]]


def test_percent_rank_naive_parity(rd):
    from rayquality.ops.analytic import percent_rank_global

    od = rd.read_parquet(f"{SF}/orders.parquet")
    got = (
        percent_rank_global(od, "o_orderkey", "o_totalprice")
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    v = np.floor(np.abs(pdf["o_totalprice"].to_numpy()) * 100 + 0.5).astype(np.int64)
    v *= np.sign(pdf["o_totalprice"].to_numpy()).astype(np.int64)
    order = np.argsort(v, kind="stable")
    less = np.empty(len(v), np.int64)
    sv = v[order]
    # rows strictly below each value
    first_idx = np.searchsorted(sv, sv, side="left")
    less[order] = first_idx
    want_pct = np.floor(less / (len(v) - 1) * 1e6 + 0.5).astype(np.int64)
    want = pd.DataFrame(
        {"o_orderkey": pdf["o_orderkey"], "value_cents": v, "pct_micro": want_pct}
    ).sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_percent_rank_ties_share_rank(rd):
    from rayquality.ops.analytic import percent_rank_global

    df = pd.DataFrame({"k": [1, 2, 3, 4, 5], "val": [1.0, 1.0, 2.0, 3.0, 3.0]})
    got = (
        percent_rank_global(rd.from_pandas(df), "k", "val")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # PERCENT_RANK: ties share (rank-1)/(n-1); n=5 -> 0, 0, .5, .75, .75
    assert got["pct_micro"].tolist() == [0, 0, 500000, 750000, 750000]


def test_freshness_naive_parity(rd):
    from rayquality.ops.validators import freshness

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = freshness(ev)
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf[pdf["event_type"].notna()]
    want = (
        pdf.groupby("event_type")
        .agg(latest=("ts", "max"), n_rows=("ts", "size"))
        .reset_index()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want["lag_us"] = (
        (want["latest"].max() - want["latest"]).to_numpy("timedelta64[us]").astype(np.int64)
    )
    want["n_rows"] = want["n_rows"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    assert (got["lag_us"] == 0).any()  # the globally freshest group lags zero


def test_inter_event_gaps_naive_parity(rd):
    from rayquality.ops.windows import inter_event_gaps

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        inter_event_gaps(ev)
        .to_pandas()
        .sort_values(["event_type", "gap_s"])
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf[pdf["event_type"].notna()].sort_values(
        ["user_id", "event_type", "ts", "event_id"], kind="stable"
    )
    prev = pdf.groupby(["user_id", "event_type"])["ts"].shift(1)
    mask = prev.notna()
    gaps = (
        (pdf["ts"][mask] - prev[mask]).to_numpy("timedelta64[us]").astype(np.int64)
        // 1_000_000
    )
    want = (
        pd.DataFrame({"event_type": pdf["event_type"][mask], "gap_s": gaps})
        .sort_values(["event_type", "gap_s"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_phash_radius_search_planted(rd):
    from rayquality.ops.image import phash_radius_search

    base = np.int64(0x0123456789ABCDEF)
    near = np.int64(base ^ 0b111)  # 3 bits away
    far = np.int64(~base)  # 64 - popcount-ish, way outside radius
    df = pd.DataFrame(
        {
            "image_id": ["q", "dup", "noise", "exact"],
            "phash": [base, near, far, base],
        }
    )
    got = phash_radius_search(rd.from_pandas(df), ["q"], max_hamming=8)
    # finds the exact copy (0 bits) and the 3-bit variant; never itself/noise
    assert got[["image_id", "hamming"]].values.tolist() == [["exact", 0], ["dup", 3]]
    assert (got["query_id"] == "q").all()


def test_manifest_audit_detects_tampering(rd, tmp_path):
    from rayquality import lineage, pipeline, synth
    from rayquality.config import RunConfig

    corpus = synth.ensure_corpus(3000, seed=42)
    out = str(tmp_path / "audit_run")
    pipeline.run(corpus, RunConfig(output_dir=out, write_kept=False, wave_size=4))
    rep = lineage.audit(out)
    assert rep and all(r["files_ok"] and r["rows_ok"] and r["inputs_ok"] for r in rep)
    assert sum(r["rows_found"] for r in rep) == 3000
    # tamper: delete one wave's parquet -> that wave flags rows_ok False
    import glob as g, os as o

    victim = sorted(g.glob(out + "/verdict/wave-00000/*.parquet"))[0]
    o.remove(victim)
    rep2 = lineage.audit(out)
    assert not rep2[0]["rows_ok"]
    assert all(r["rows_ok"] for r in rep2[1:])


def test_cli_audit(rd, tmp_path, capsys):
    from rayquality import pipeline, synth
    from rayquality.cli import main as cli_main
    from rayquality.config import RunConfig

    corpus = synth.ensure_corpus(3000, seed=42)
    out = str(tmp_path / "cli_audit_run")
    pipeline.run(corpus, RunConfig(output_dir=out, write_kept=False))
    assert cli_main(["audit", out]) == 0
    assert "failed=0" in capsys.readouterr().out


def test_grouped_mode_ties_and_counts(rd):
    from rayquality.ops import windows

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "v": ["b", "a", "a", "z", "y", "m"],  # k=2 ties 1-1 -> 'y' (asc)
        }
    )
    got = (
        windows.grouped_mode(rd.from_pandas(df), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3]
    assert got["v"].tolist() == ["a", "y", "m"]
    assert got["cnt"].tolist() == [2, 1, 1]


def test_grouped_mode_real_corpus(rd):
    from rayquality.ops import windows

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        windows.grouped_mode(ev, "user_id", "event_type")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    c = pdf.groupby(["user_id", "event_type"], as_index=False).size()
    c = c.sort_values(["user_id", "size", "event_type"], ascending=[True, False, True])
    want = c.drop_duplicates("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["cnt"].tolist() == want["size"].tolist()

def test_new_users_daily(rd):
    from rayquality.ops import relational

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = relational.new_users_daily(ev)
    pdf = pd.read_parquet(f"{SF}/events.parquet").copy()
    pdf["day"] = pdf["ts"].dt.floor("D")
    first = pdf.groupby("user_id", as_index=False)["day"].min()
    want = (
        first.groupby("day", as_index=False)
        .size()
        .rename(columns={"size": "new_users"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    want["cum_users"] = want["new_users"].cumsum()
    assert got["day"].tolist() == want["day"].tolist()
    assert got["new_users"].tolist() == want["new_users"].tolist()
    assert got["cum_users"].tolist() == want["cum_users"].tolist()
    assert got["cum_users"].iloc[-1] == pdf["user_id"].nunique()


def test_dau_wau_stickiness(rd):
    from rayquality.ops import relational

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = relational.dau_wau_stickiness(ev)
    pdf = pd.read_parquet(f"{SF}/events.parquet").copy()
    pdf["day"] = pdf["ts"].dt.floor("D")
    pairs = pdf[["user_id", "day"]].drop_duplicates()
    days = sorted(pairs["day"].unique())
    rows = []
    for d in days:
        dau = (pairs["day"] == d).sum()
        wau = pairs.loc[
            (pairs["day"] >= d - pd.Timedelta(days=6)) & (pairs["day"] <= d),
            "user_id",
        ].nunique()
        rows.append((d, dau, wau, int(np.floor(1e6 * dau / wau + 0.5))))
    want = pd.DataFrame(rows, columns=["day", "dau", "wau", "stickiness_micro"])
    assert got["day"].tolist() == want["day"].tolist()
    assert got["dau"].tolist() == want["dau"].tolist()
    assert got["wau"].tolist() == want["wau"].tolist()
    assert got["stickiness_micro"].tolist() == want["stickiness_micro"].tolist()
    assert (got["wau"] >= got["dau"]).all()


def test_rfm_segmentation(rd):
    from rayquality.ops import analytic

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    got = (
        analytic.rfm_segmentation(orders)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/orders.parquet").copy()
    pdf["cents"] = np.floor(pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    per = pdf.groupby("o_custkey").agg(
        last=("o_orderdate", "max"), frequency=("o_orderkey", "size"), monetary_cents=("cents", "sum")
    )
    ref = pdf["o_orderdate"].max()
    per["recency_days"] = ((ref - per["last"]).dt.days).astype(np.int64)
    per = per.reset_index().rename(columns={"o_custkey": "c_custkey"}).sort_values("c_custkey")

    def ntile(df, col, n=5):
        df = df.sort_values([col, "c_custkey"], kind="stable").reset_index(drop=True)
        total = len(df)
        base, rem = divmod(total, n)
        sizes = [base + (1 if b <= rem else 0) for b in range(1, n + 1)]
        buckets = np.repeat(np.arange(1, n + 1), sizes)
        return pd.Series(buckets, index=df["c_custkey"].to_numpy())

    for metric, bcol in (
        ("recency_days", "r_bucket"),
        ("frequency", "f_bucket"),
        ("monetary_cents", "m_bucket"),
    ):
        want = ntile(per, metric)
        assert got.set_index("c_custkey")[bcol].to_dict() == want.to_dict(), bcol
    m = per.set_index("c_custkey")
    g = got.set_index("c_custkey")
    assert g["recency_days"].to_dict() == m["recency_days"].to_dict()
    assert g["frequency"].to_dict() == m["frequency"].to_dict()
    assert g["monetary_cents"].to_dict() == m["monetary_cents"].to_dict()


def test_pixel_verified_near_dups(rd):
    import glob

    from rayquality import codecs, dedup, synth
    from rayquality.ops import image as imops
    from rayquality.phash import band_keys, resize_bilinear

    d = synth.ensure_corpus(1000, seed=42)
    ds = rd.read_parquet(sorted(glob.glob(d + "/*.parquet")))
    got = imops.pixel_verified_near_dups(ds, mse_threshold=80.0)

    # naive single-process reference: same bands, same features, same cap
    pdf = ds.select_columns(["image_id", "phash", "bytes", "fmt"]).to_pandas()
    bk = band_keys(pdf["phash"].to_numpy(np.int64))
    from collections import defaultdict

    buckets = defaultdict(list)
    for row, bands in enumerate(bk):
        for b in bands:
            buckets[int(b)].append(row)
    cand = set()
    for rows in buckets.values():
        if len(rows) < 2 or len(rows) > dedup.GROUP_CAP:
            continue
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = pdf["image_id"].iat[rows[i]], pdf["image_id"].iat[rows[j]]
                cand.add((min(a, b), max(a, b)))

    def feat(row):
        try:
            img = codecs.decode(pdf["bytes"].iat[row], pdf["fmt"].iat[row])
        except codecs.CodecError:
            return None
        return np.stack(
            [resize_bilinear(img[..., c].astype(np.float64), 8, 8) for c in range(3)],
            axis=-1,
        ).ravel()

    feats = {pdf["image_id"].iat[r]: feat(r) for r in range(len(pdf))}
    want = {}
    for a, b in cand:
        fa, fb = feats[a], feats[b]
        if fa is None or fb is None:
            continue
        mse = float(((fa.astype(np.float32) - fb.astype(np.float32)).astype(np.float64) ** 2).mean())
        if mse <= 80.0:
            want[(a, b)] = int(np.floor(mse * 1e6 + 0.5))
    got_map = dict(zip(zip(got["id_a"], got["id_b"]), got["mse_micro"]))
    assert set(got_map) == set(want)
    assert want, "corpus must contain verifiable near-dups"
    # exact duplicates verify at mse == 0
    assert min(got_map.values()) == 0
    for k in got_map:
        assert abs(got_map[k] - want[k]) <= 2  # float32-vs-float64 summation ulp


def test_revenue_concentration(rd):
    from rayquality.ops import analytic

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    got = analytic.revenue_concentration(orders)
    pdf = pd.read_parquet(f"{SF}/orders.parquet").copy()
    pdf["cents"] = np.floor(pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    per = pdf.groupby("o_custkey")["cents"].sum().sort_values(ascending=False)
    n = len(per)
    k = int(np.ceil(0.1 * n))
    top = int(per.iloc[:k].sum())
    total = int(per.sum())
    assert got["top_customers"].iat[0] == k
    assert got["total_customers"].iat[0] == n
    assert got["top_revenue_cents"].iat[0] == top
    assert got["total_revenue_cents"].iat[0] == total
    assert got["share_micro"].iat[0] == int(np.floor(1e6 * top / total + 0.5))
    assert got["share_micro"].iat[0] > 100_000  # top decile holds > 10%


def test_out_of_order_stats(rd):
    from rayquality.ops import windows

    # synthetic: user 1 strictly ordered, user 2 has two late events
    base = pd.Timestamp("2025-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2, 2],
            "event_id": [10, 11, 12, 20, 21, 22, 23],
            "ts": [
                base,
                base + pd.Timedelta(seconds=1),
                base + pd.Timedelta(seconds=2),
                base + pd.Timedelta(seconds=5),
                base + pd.Timedelta(seconds=3),  # 2s late
                base + pd.Timedelta(seconds=9),
                base + pd.Timedelta(seconds=4),  # 5s late
            ],
        }
    )
    got = (
        windows.out_of_order_stats(rd.from_pandas(df))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["n_events"].tolist() == [3, 4]
    assert got["n_late"].tolist() == [0, 2]
    assert got["max_lateness_us"].tolist() == [0, 5_000_000]

    # real corpus: parity vs a naive pandas reference
    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        windows.out_of_order_stats(ev)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "event_id"], kind="stable"
    )
    prev = pdf.groupby("user_id")["ts"].cummax().groupby(pdf["user_id"].to_numpy()).shift(1)
    late = pdf["ts"] < prev
    lateness = (prev - pdf["ts"]).dt.total_seconds().mul(1e6).where(late, 0)
    want = (
        pd.DataFrame(
            {"user_id": pdf["user_id"], "late": late.astype(np.int64), "lat": lateness}
        )
        .groupby("user_id", as_index=False)
        .agg(n_events=("late", "size"), n_late=("late", "sum"), max_lateness_us=("lat", "max"))
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["n_late"].tolist() == want["n_late"].tolist()
    assert got["max_lateness_us"].tolist() == want["max_lateness_us"].astype(np.int64).tolist()


def test_label_centroids(rd):
    from rayquality.ops import cluster

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = cluster.label_centroids(emb)
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    mats = {}
    for lab, grp in pdf.groupby("label"):
        m = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        mats[int(lab)] = (np.floor(m * 1e6 + 0.5).astype(np.int64).sum(axis=0), len(grp))
    for lab, (sums, n) in mats.items():
        sl = got[got["label"] == lab].sort_values("i")
        assert sl["sum_micro"].to_numpy().tolist() == sums.tolist()
        assert (sl["n"] == n).all()
    assert got["label"].nunique() == len(mats)


def test_rfm_and_concentration_empty_orders(rd):
    """ADVICE r4: empty orders must yield the explicit typed empty/zero
    schema, not IndexError (revenue_concentration) or a null-ref crash
    (rfm_segmentation)."""
    import pyarrow as pa

    from rayquality.ops import analytic

    empty = rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_totalprice": pa.array([], pa.float64()),
                "o_orderkey": pa.array([], pa.int64()),
            }
        )
    )
    rc = analytic.revenue_concentration(empty)
    assert rc.to_dict("records") == [
        {
            "top_customers": 0,
            "total_customers": 0,
            "top_revenue_cents": 0,
            "total_revenue_cents": 0,
            "share_micro": 0,
        }
    ]
    rfm = analytic.rfm_segmentation(empty)
    assert rfm.count() == 0
    assert rfm.schema().names == [
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_bucket",
        "f_bucket",
        "m_bucket",
    ]
