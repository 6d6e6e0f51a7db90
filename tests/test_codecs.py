import numpy as np
import pytest

from rayquality import codecs


def _img(seed=0, w=40, h=30):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "ppm", "png"])
def test_lossless_roundtrip(fmt):
    img = _img()
    out = codecs.decode(codecs.encode(img, fmt), fmt)
    np.testing.assert_array_equal(out, img)


def test_lossy_roundtrip_psnr():
    img = _img(1)
    out = codecs.decode(codecs.encode(img, "lossy"), "lossy")
    assert out.shape == img.shape
    p = codecs.psnr(img, out)
    assert p >= 40.0, p  # the north-rule lossy invariant
    assert not np.array_equal(out, img)  # genuinely lossy


def test_png_structure():
    blob = codecs.encode(_img(2), "png")
    assert blob.startswith(b"\x89PNG\r\n\x1a\n")
    assert b"IHDR" in blob and b"IDAT" in blob and blob.endswith(b"IEND" + blob[-4:])


def test_corrupt_and_unknown():
    img = _img(3)
    blob = codecs.encode(img, "png")
    with pytest.raises(codecs.CodecError):
        codecs.decode(blob[: len(blob) // 2], "png")
    with pytest.raises(codecs.CodecError):
        codecs.decode(blob, "webp")
    with pytest.raises(codecs.CodecError):
        codecs.decode(b"nonsense", "raw")


def test_psnr_identical_is_inf():
    img = _img(4)
    assert codecs.psnr(img, img) == float("inf")
