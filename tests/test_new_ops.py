import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_sessionize_naive_parity(rd):
    from rayquality.ops.windows import sessionize

    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (
        sessionize(ev, gap_minutes=30)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)[["user_id", "n_sessions", "n_events"]]
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "ts"]]
    want = []
    for uid, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values().to_numpy()
        brk = int((np.diff(ts) > np.timedelta64(1800, "s")).sum()) if len(ts) > 1 else 0
        want.append((uid, brk + 1, len(ts)))
    want = pd.DataFrame(want, columns=["user_id", "n_sessions", "n_events"]).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_systematic_sample(rd):
    from rayquality.ops.windows import systematic_sample

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    s = systematic_sample(orders, "o_orderkey", 20).to_pandas()
    assert (s["o_orderkey"] % 20 == 0).all()
    assert len(s) == len(pd.read_parquet(f"{SF}/orders.parquet").query("o_orderkey % 20 == 0"))


def test_sources_registry(rd, tmp_path):
    from rayquality import sources

    ds = sources.read_table(f"{SF}/region.parquet", "parquet")
    assert ds.count() == 5
    with pytest.raises(ValueError, match="unknown source format"):
        sources.read_table("x", "avro")
    with pytest.raises(NotImplementedError, match="lance"):
        sources.read_table("/tmp/whatever.lance", "lance")
    # extension hook
    sources.register_source("range5", lambda path, **kw: rd.range(5))
    assert sources.read_table("ignored", "range5").count() == 5
    # ORC round-trip through the distributed decode path, with pruning
    import pyarrow as pa
    import pyarrow.orc as po

    tbl = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.5, 1.5, 2.5]})
    orc_dir = tmp_path / "orc"
    orc_dir.mkdir()
    po.write_table(tbl, str(orc_dir / "part0.orc"))
    po.write_table(tbl, str(orc_dir / "part1.orc"))
    got = sources.read_table(str(orc_dir), "orc").to_pandas().sort_values(["a"])
    assert len(got) == 6 and list(got.columns) == ["a", "b", "c"]
    assert got["a"].tolist() == [1, 1, 2, 2, 3, 3]
    pruned = sources.read_table(str(orc_dir), "orc", columns=["b"]).to_pandas()
    assert list(pruned.columns) == ["b"] and len(pruned) == 6
    # numpy source
    np.save(str(tmp_path / "vecs.npy"), np.arange(12).reshape(4, 3))
    nds = sources.read_table(str(tmp_path / "vecs.npy"), "numpy")
    assert nds.count() == 4
    # Feather / Arrow IPC round-trip (V2 default + uncompressed V1), pruned
    import pyarrow.feather as pf

    fdir = tmp_path / "feather"
    fdir.mkdir()
    pf.write_feather(tbl, str(fdir / "part0.feather"))
    pf.write_feather(tbl, str(fdir / "part1.feather"), version=1)
    fgot = sources.read_table(str(fdir), "feather").to_pandas().sort_values(["a"])
    assert len(fgot) == 6 and list(fgot.columns) == ["a", "b", "c"]
    assert fgot["a"].tolist() == [1, 1, 2, 2, 3, 3]
    fpruned = sources.read_table(str(fdir), "arrow", columns=["c"]).to_pandas()
    assert list(fpruned.columns) == ["c"] and len(fpruned) == 6


def test_image_features_and_thumbs(rd):
    from rayquality import synth
    from rayquality.ops import image as imops

    d = synth.ensure_corpus(2000, seed=42)
    import glob

    ds = rd.read_parquet(sorted(glob.glob(d + "/*.parquet"))).limit(300)
    feats = imops.image_features(ds).to_pandas()
    assert len(feats) == 300
    ok = feats["decoded_ok"]
    assert ok.mean() > 0.9  # only injected defects fail
    mat = np.stack(feats.loc[ok, "feat"].to_numpy())
    assert mat.shape[1] == 8 * 8 * 3
    assert (mat.std(axis=0) > 0).any()  # real features, not constants
    # undecodable rows -> zero features
    bad = ~ok
    if bad.any():
        assert np.allclose(np.stack(feats.loc[bad, "feat"].to_numpy()), 0)

    thumbs = imops.thumbnails(ds.limit(20), side=8).to_pandas()
    from rayquality import codecs

    decoded = [codecs.decode(b, "png") for b in thumbs["thumb_png"] if b is not None]
    assert decoded and all(t.shape == (8, 8, 3) for t in decoded)


def test_audio_video_stubs(rd):
    import pyarrow as pa

    from rayquality.ops.image import AudioFeaturizer, VideoFrameSampler

    t = pa.table({"clip_id": ["a"], "bytes": [b"x"], "codec": ["wav"], "sample_rate": [16000]})
    with pytest.raises(NotImplementedError):
        AudioFeaturizer()(t)
    with pytest.raises(NotImplementedError):
        VideoFrameSampler()(t)


def test_ivf_recall_vs_bruteforce(rd):
    from rayquality.ops import ann

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    qids = list(range(20))
    exact = ann.cosine_topk(emb, qids, k=5)
    approx = ann.ivf_topk(emb, qids, k=5, n_cells=16, n_probe=6)
    exact_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    approx_sets = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets.index
    ]
    assert np.mean(recalls) >= 0.5, np.mean(recalls)  # approximate but useful


def test_hash_join_matches_broadcast(rd):
    from rayquality.ops.relational import revenue_by_segment, top_customers_by_revenue

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    customer = rd.read_parquet(f"{SF}/customer.parquet")
    seg = revenue_by_segment(orders, customer)
    # total revenue must equal the sum over the broadcast-join path
    pdf_o = pd.read_parquet(f"{SF}/orders.parquet")
    want_total = int(round(pdf_o["o_totalprice"] * 100).sum())
    assert int(seg["revenue_cents"].sum()) == want_total
    assert int(seg["n_orders"].sum()) == len(pdf_o)


def test_feather_source_composes_with_ops(rd, tmp_path):
    """The feather source must feed the operator chain like any Dataset:
    documents written as Arrow IPC -> exact dedup -> token filter."""
    import pyarrow as pa
    import pyarrow.feather as pf

    from rayquality import sources
    from rayquality.ops import textdedup

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "text": pa.array(
                ["alpha beta gamma"] * 3 + ["delta epsilon"] * 2
                + ["zeta", "eta theta iota kappa", "unique text here"]
            ),
        }
    )
    fdir = tmp_path / "docs_feather"
    fdir.mkdir()
    pf.write_feather(docs.slice(0, 4), str(fdir / "a.feather"))
    pf.write_feather(docs.slice(4), str(fdir / "b.feather"))

    ds = sources.read_table(str(fdir), "feather")
    deduped = textdedup.exact_dedup(ds, id_col="doc_id", text_col="text")
    out = deduped.to_pandas().sort_values("doc_id")
    # 3 copies of one text and 2 of another collapse to their min-id winners
    assert out["doc_id"].tolist() == [0, 3, 5, 6, 7]
