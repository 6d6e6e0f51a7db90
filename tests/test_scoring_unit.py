"""Direct unit tests of the Scorer stage (actor __init__ failures surface
late in Ray — smoke the class directly, per the ray guide pitfalls)."""

import numpy as np
import pyarrow as pa

from rayquality import codecs
from rayquality.config import QualityConfig
from rayquality.scoring import Scorer
from rayquality.verdict import REASONS, VERDICT_FIELDS


def _batch(rows):
    cols = {k: [r[k] for r in rows] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    return pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.large_binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
        }
    )


def _img_row(caption, fmt="raw", corrupt=False, bad_dims=False, bad_phash=False):
    from rayquality.phash import phash64
    from rayquality.synth import _gradient_image

    img = _gradient_image(np.random.default_rng(1), 32, 32)
    ph = phash64(img)
    blob = codecs.encode(img, fmt) if fmt in codecs.FORMATS else codecs.encode(img, "raw")
    if corrupt:
        blob = blob[:10]
    return {
        "image_id": "img-x",
        "bytes": blob,
        "w": 32 + (3 if bad_dims else 0),
        "h": 32,
        "fmt": fmt,
        "caption": caption,
        "phash": (ph ^ 1) if bad_phash else ph,
    }


# in-vocabulary words (models are trained on the embedded corpus, so
# out-of-vocabulary English can exceed the perplexity threshold)
GOOD = "The great small house between the city and the world under night water."


def test_scorer_smoke_and_reasons():
    s = Scorer(QualityConfig())
    out = s(
        _batch(
            [
                _img_row(GOOD),
                _img_row(None),
                _img_row(GOOD, fmt="webp"),
                _img_row(GOOD, corrupt=True),
                _img_row(GOOD, bad_dims=True),
                _img_row(GOOD, bad_phash=True),
            ]
        )
    )
    reasons = out["drop_reasons"].to_pylist()
    keep = out["keep"].to_pylist()
    assert keep[0] and reasons[0] == []
    assert reasons[1] == ["caption_missing"]
    assert reasons[2] == ["fmt_invalid"]
    assert reasons[3] == ["decode_error"]
    assert reasons[4] == ["dims_mismatch"]
    assert reasons[5] == ["phash_mismatch"]
    # verdict columns all present with declared names
    for name, _ in VERDICT_FIELDS:
        assert name in out.column_names


def test_scorer_empty_batch():
    s = Scorer(QualityConfig())
    out = s(_batch([]))
    assert out.num_rows == 0
    assert "keep" in out.column_names


def test_scorer_all_null_captions():
    s = Scorer(QualityConfig())
    out = s(_batch([_img_row(None), _img_row("")]))
    assert out["keep"].to_pylist() == [False, False]
    assert all(r == ["caption_missing"] for r in out["drop_reasons"].to_pylist())


def test_reason_order_is_canonical():
    s = Scorer(QualityConfig())
    # a caption failing several rules must list reasons in REASONS order
    bad = "@@@@ ### $$$$ %%%"  # symbol-heavy, few words, short-ish, weird lang
    out = s(_batch([_img_row(bad)]))
    rs = out["drop_reasons"].to_pylist()[0]
    assert rs == [r for r in REASONS if r in set(rs)]
    assert len(rs) >= 2
