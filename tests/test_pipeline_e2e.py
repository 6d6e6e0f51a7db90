"""End-to-end golden-label parity: Ray pipeline vs naive pandas oracle.

The north-rule gate: keep/drop decision F1 >= 0.99 vs oracle labels, exact
scrubbed-caption equality, exact drop_reasons lists, lossy-decode PSNR>=40.
"""

import glob
import shutil

import numpy as np
import pandas as pd
import pyarrow.dataset as pds
import pytest

from rayquality import codecs, oracle, pipeline, synth
from rayquality.config import RunConfig

N_ROWS = 2000
OUT = "/tmp/rayquality_test_e2e"


@pytest.fixture(scope="module")
def corpus_dir():
    return synth.ensure_corpus(N_ROWS, seed=42)


@pytest.fixture(scope="module")
def run_result(ray_session, corpus_dir):
    shutil.rmtree(OUT, ignore_errors=True)
    summary = pipeline.run(corpus_dir, RunConfig(output_dir=OUT, wave_size=1))
    final = (
        pds.dataset(sorted(glob.glob(OUT + "/final/*.parquet")))
        .to_table()
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    return summary, final


@pytest.fixture(scope="module")
def gold(corpus_dir):
    tbl = pds.dataset(sorted(glob.glob(corpus_dir + "/*.parquet"))).to_table()
    return oracle.label(tbl).sort_values("image_id").reset_index(drop=True)


def test_keep_decision_f1(run_result, gold):
    _, final = run_result
    assert list(final["image_id"]) == list(gold["image_id"])
    g = gold["keep"].to_numpy()
    p = final["keep"].to_numpy()
    tp = int((g & p).sum())
    fp = int((~g & p).sum())
    fn = int((g & ~p).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, (f1, fp, fn)
    assert f1 == 1.0  # in practice the match is exact


def test_drop_reasons_exact(run_result, gold):
    _, final = run_result
    got = final["drop_reasons"].map(list)
    want = gold["drop_reasons"].map(list)
    mism = [(a, b) for a, b in zip(want, got) if a != b]
    assert not mism, mism[:5]


def test_scrubbed_caption_exact(run_result, gold):
    _, final = run_result
    got = final["caption_scrubbed"].where(pd.notna(final["caption_scrubbed"]), None)
    want = gold["caption_scrubbed"].where(pd.notna(gold["caption_scrubbed"]), None)
    assert (got.to_numpy(dtype=object) == want.to_numpy(dtype=object)).all()


def test_model_scores_match(run_result, gold):
    _, final = run_result
    assert (final["lang"].to_numpy() == gold["lang"].to_numpy()).all()
    np.testing.assert_allclose(final["ppl"], gold["ppl"], rtol=1e-6)
    np.testing.assert_allclose(final["lang_conf"], gold["lang_conf"], rtol=1e-6)


def test_summary_consistent(run_result, gold):
    summary, final = run_result
    assert summary["total"] == N_ROWS
    assert summary["kept"] == int(final["keep"].sum()) == int(gold["keep"].sum())
    hits = summary["rule_hits"]
    want_ex = sum("exact_dup" in r for r in gold["drop_reasons"])
    assert hits.get("exact_dup", 0) == want_ex


def test_kept_output_is_scrubbed_and_decodable(run_result):
    _, _ = run_result
    kept = pds.dataset(sorted(glob.glob(OUT + "/kept/*.parquet"))).to_table().to_pandas()
    assert (kept["caption"] == kept["caption_scrubbed"]).all()
    # every kept row decodes and satisfies the pixel invariant
    sample = kept.head(50)
    for _, r in sample.iterrows():
        img = codecs.decode(r["bytes"], r["fmt"])
        assert img.shape[:2] == (r["h"], r["w"])
        if r["fmt"] == "lossy":
            rt = codecs.decode(codecs.encode(img, r["fmt"]), r["fmt"])
            assert codecs.psnr(img, rt) >= 40.0


def test_resume_skips_completed_waves(ray_session, corpus_dir, run_result):
    import os

    wave_files = sorted(glob.glob(OUT + "/verdict/wave-*/*.parquet"))
    mtimes = {f: os.path.getmtime(f) for f in wave_files}
    summary2 = pipeline.run(corpus_dir, RunConfig(output_dir=OUT, wave_size=1))
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f"wave file {f} was rewritten on resume"
    assert summary2["kept"] == run_result[0]["kept"]

    # invalidate one wave -> only that wave recomputes
    os.remove(OUT + "/_manifest/wave-00000.json")
    summary3 = pipeline.run(corpus_dir, RunConfig(output_dir=OUT, wave_size=1))
    assert summary3["kept"] == summary2["kept"]
    w0 = sorted(glob.glob(OUT + "/verdict/wave-00000/*.parquet"))
    w1 = sorted(glob.glob(OUT + "/verdict/wave-00001/*.parquet"))
    assert any(os.path.getmtime(f) > mtimes.get(f, 0) for f in w0)
    assert all(os.path.getmtime(f) == mtimes[f] for f in w1 if f in mtimes)
