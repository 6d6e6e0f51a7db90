import numpy as np

from rayquality import phash as ph


from rayquality.synth import _gradient_image


def _gradient(seed, w=48, h=48):
    return _gradient_image(np.random.default_rng(seed), w, h)


def test_identical_images_same_hash():
    img = _gradient(0)
    assert ph.phash64(img) == ph.phash64(img.copy())


def test_perturbed_image_small_distance():
    img = _gradient(1)
    noisy = np.clip(img.astype(np.int16) + np.random.default_rng(2).integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    d = ph.hamming64(np.array([ph.phash64(img)]), ph.phash64(noisy))[0]
    assert d <= 6, d


def test_different_images_large_distance():
    a, b = ph.phash64(_gradient(3)), ph.phash64(_gradient(4))
    d = ph.hamming64(np.array([a]), b)[0]
    assert d >= 10, d


def test_popcount_and_matrix():
    xs = np.array([0, 1, 3, (1 << 64) - 1], dtype=np.uint64)
    np.testing.assert_array_equal(ph.popcount64(xs), [0, 1, 2, 64])
    a = np.array([0, -1], dtype=np.int64)
    m = ph.hamming_matrix(a, a)
    np.testing.assert_array_equal(m, [[0, 64], [64, 0]])


def test_band_keys_guarantee():
    # hamming distance 3 < 4 bands -> must share at least one band key
    base = np.int64(0x123456789ABCDEF0)
    flipped = np.int64(base ^ np.int64((1 << 5) | (1 << 6) | (1 << 7)))
    kb = ph.band_keys(np.array([base]))[0]
    kf = ph.band_keys(np.array([flipped]))[0]
    assert len(set(kb) & set(kf)) >= 1


def test_constant_image_hash_is_stable():
    # flat images of any size must collapse to ONE hash (the dedup hot key)
    h32 = ph.phash64(np.full((32, 32, 3), 128, dtype=np.uint8))
    h48 = ph.phash64(np.full((48, 48, 3), 128, dtype=np.uint8))
    h64 = ph.phash64(np.full((64, 64, 3), 200, dtype=np.uint8))
    assert h32 == h48 == h64
