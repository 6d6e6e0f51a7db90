import numpy as np
import pytest

from rayquality.ops.sketch import HllSketch, approx_distinct


def test_hll_accuracy_across_cardinalities():
    rng = np.random.default_rng(0)
    for true_n in (100, 5_000, 200_000):
        sk = HllSketch(12)
        vals = rng.integers(0, 2**62, size=true_n, dtype=np.uint64)
        vals = np.unique(vals)
        sk.add(vals)
        est = sk.estimate()
        assert abs(est - len(vals)) / len(vals) < 0.05, (true_n, est)


def test_hll_merge_equals_union():
    rng = np.random.default_rng(1)
    a_vals = rng.integers(0, 2**62, 50_000, dtype=np.uint64)
    b_vals = rng.integers(0, 2**62, 50_000, dtype=np.uint64)
    a, b, u = HllSketch(12), HllSketch(12), HllSketch(12)
    a.add(a_vals)
    b.add(b_vals)
    u.add(np.concatenate([a_vals, b_vals]))
    a |= b
    assert np.array_equal(a.registers, u.registers)  # merge is exact on registers


def test_hll_strings_and_duplicates():
    sk = HllSketch(12)
    sk.add(np.array(["a", "b", "c", "a", "b"], dtype=object))
    assert 2 <= sk.estimate() <= 4
    with pytest.raises(ValueError):
        HllSketch(2)


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.01/orders.parquet")
    exact = 1500  # distinct o_custkey at sf0.01
    out = approx_distinct(ds, "o_custkey")
    assert out["exact"] is False
    assert abs(out["estimate"] - exact) / exact < 0.05, out
