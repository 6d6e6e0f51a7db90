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


def test_exact_quantiles_matches_duckdb_rule(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rayquality.ops.sketch import exact_quantiles

    rng = np.random.default_rng(8)
    vals = rng.integers(1, 40, size=5000).astype(np.float64)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(4)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = exact_quantiles(ds, "x", qs)
    srt = np.sort(vals)
    import math

    for q, v in zip(got["q"], got["value"]):
        idx = max(0, math.ceil(q * len(srt)) - 1)
        assert v == srt[idx], (q, v, srt[idx])


def test_heavy_hitters_guarantee(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rayquality.ops.sketch import heavy_hitters

    rng = np.random.default_rng(4)
    # background noise + two true heavy values
    vals = rng.integers(0, 10_000, size=20_000).tolist() + [42] * 4000 + [7] * 2500
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    hh = heavy_hitters(ds, "x", k=64, top=5)
    found = dict(zip(hh["x"], hh["min_count"]))
    n = len(vals)
    # guarantee: freq > 2n/k must survive; counts never overestimate
    assert 42 in found and 7 in found
    assert found[42] <= 4000 and found[7] <= 2500
    assert found[42] > 4000 - 2 * n / 64 - 1


def test_hll_registers_state_exact(ray_session):
    """hll_registers == the whole-column HllSketch state, independent of
    batch splits (elementwise max commutes), and every rank is in the valid
    [1, 53] range for p=12."""
    import pandas as pd
    import ray.data as rd

    from rayquality.ops.sketch import hll_registers

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**62, size=30_000).astype(np.int64)
    df = pd.DataFrame({"x": vals})

    got = hll_registers(rd.from_pandas(df).repartition(13), "x", precision=12)

    ref = HllSketch(12)
    ref.add(vals)
    nz = np.nonzero(ref.registers)[0]
    assert got["bucket"].to_numpy().tolist() == nz.tolist()
    assert got["register"].to_numpy().tolist() == ref.registers[nz].tolist()
    assert got["register"].between(1, 53).all()

    # different partitioning -> identical state
    again = hll_registers(rd.from_pandas(df).repartition(2), "x", precision=12)
    assert again.equals(got)


def test_minhash_int_signatures_exact(ray_session):
    """Signatures == a naive per-key loop, independent of batch splits;
    the bias shift preserves unsigned min order."""
    import pandas as pd
    import ray.data as rd

    from rayquality.ops.sketch import _C1, _splitmix64, minhash_int_signatures

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 50, 4000).astype(np.int64)
    items = rng.integers(0, 2**62, 4000).astype(np.int64)
    df = pd.DataFrame({"k": keys, "item": items})

    got = (
        minhash_int_signatures(
            rd.from_pandas(df).repartition(11), "k", "item", n_perm=4
        )
        .to_pandas()
        .sort_values(["k", "perm"])
        .reset_index(drop=True)
    )

    TOP = np.uint64(1) << np.uint64(63)
    rows = []
    for k in np.unique(keys):
        it = items[keys == k].astype(np.uint64)
        for p in range(4):
            with np.errstate(over="ignore"):
                h = _splitmix64(it + np.uint64(p) * _C1)
            rows.append((int(k), p, int(((h ^ TOP).view(np.int64)).min())))
    want = pd.DataFrame(rows, columns=["k", "perm", "sig"])
    assert got["k"].tolist() == want["k"].tolist()
    assert got["perm"].tolist() == want["perm"].tolist()
    assert got["sig"].tolist() == want["sig"].tolist()


def test_simhash_int_signatures_exact(ray_session):
    """Signatures == a naive per-key loop; batch-split independent; strict
    sign rule (zero-sum bit -> 0) honored."""
    import pandas as pd
    import ray.data as rd

    from rayquality.ops.sketch import _splitmix64, simhash_int_signatures

    rng = np.random.default_rng(13)
    keys = rng.integers(0, 40, 3000).astype(np.int64)
    items = rng.integers(0, 2**62, 3000).astype(np.int64)
    df = pd.DataFrame({"k": keys, "item": items})

    got = (
        simhash_int_signatures(rd.from_pandas(df).repartition(9), "k", "item")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    rows = []
    for k in np.unique(keys):
        h = _splitmix64(items[keys == k].astype(np.uint64))
        sig = np.uint64(0)
        for b in range(64):
            contrib = (((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1).sum()
            if contrib > 0:
                sig |= np.uint64(1) << np.uint64(b)
        rows.append((int(k), int(sig.view(np.int64) if hasattr(sig, 'view') else sig)))
    want = pd.DataFrame(rows, columns=["k", "sig"])
    want["sig"] = want["sig"].astype(np.int64)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["sig"].tolist() == want["sig"].tolist()
