"""Property-based tests (hypothesis) for the pure kernels — no Ray in the
loop, so each property runs its full example budget in milliseconds."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_scrub_series_matches_scrub_text(texts):
    from rayquality.scrub import scrub_series, scrub_text

    out, hits = scrub_series(pd.Series(texts))
    for t, s, h in zip(texts, out, hits):
        ws, wh = scrub_text(t)
        assert s == ws
        assert h == wh


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=400),
    st.integers(8, 64),
)
def test_rank_compact_preserves_weight_and_bounds(vals, m):
    from rayquality.ops.sketch import _rank_compact

    v = np.asarray(vals, np.float64)
    w = np.ones(len(v))
    cv, cw = _rank_compact(v, w, m)
    assert len(cv) <= m
    assert np.isclose(cw.sum(), len(v))  # total weight preserved
    assert (np.diff(np.sort(cv)) >= 0).all()
    assert set(cv).issubset(set(v))  # kept points are real data values


def _mg_compress(vals, cnts, k):
    """The canonical Misra-Gries reduction (same arithmetic as the closure
    inside ops.sketch.heavy_hitters: subtract the (k+1)-th largest count,
    drop non-positive)."""
    if len(vals) <= k:
        return list(vals), cnts
    order = np.argsort(-cnts, kind="stable")
    cut = cnts[order[k]]
    keep = order[:k]
    newc = cnts[keep] - cut
    pos = newc > 0
    return [vals[i] for i in np.asarray(keep)[pos]], newc[pos]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=500),
    st.integers(2, 8),
)
def test_misra_gries_guarantee(values, k):
    """Any value with frequency > n/k must survive the k-counter
    compression — the classic guarantee heavy_hitters_exact's verify pass
    relies on — even after splitting into per-batch summaries and merging."""
    vals = [str(v) for v in values]
    n = len(vals)
    # split into 3 "batches", compress each, merge, compress again (the
    # exact dataflow of ops.sketch.heavy_hitters)
    merged: dict[str, int] = {}
    for chunk in np.array_split(np.asarray(vals, object), 3):
        if not len(chunk):
            continue
        vc = pd.Series(chunk).value_counts()
        cv, cc = _mg_compress(vc.index.tolist(), vc.to_numpy(np.int64), k)
        for v, c in zip(cv, cc):
            merged[v] = merged.get(v, 0) + int(c)
    out_v, _out_c = _mg_compress(
        list(merged), np.asarray(list(merged.values()), np.int64), k
    )
    vc_all = pd.Series(vals).value_counts()
    for val, cnt in vc_all.items():
        if cnt * k > n:
            assert val in out_v, (val, cnt, n, k)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 10**12), min_size=1, max_size=2000),
    st.integers(2, 5),
)
def test_hll_merge_equals_single_shot(values, n_splits):
    """Merging per-split sketches must equal one sketch over everything
    (the mergeability the tree-merge stage depends on)."""
    from rayquality.ops.sketch import HllSketch

    arr = np.asarray(values, np.int64)
    whole = HllSketch(10)
    whole.add(arr)
    merged = HllSketch(10)
    for chunk in np.array_split(arr, n_splits):
        part = HllSketch(10)
        if len(chunk):
            part.add(chunk)
        merged |= part
    assert (whole.registers == merged.registers).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 300), min_size=1, max_size=200), st.integers(1, 500))
def test_galloping_next_fit_matches_sequential(tokens, capacity):
    """The searchsorted galloping walk in pack_sequences must equal the
    sequential next-fit rule for any token sequence."""
    tok = np.asarray(tokens, np.int64)
    cum = np.cumsum(tok)
    bins = np.empty(len(tok), np.int64)
    i, b, base = 0, 0, 0
    while i < len(tok):
        j = int(np.searchsorted(cum, base + capacity, side="right"))
        if j <= i:
            j = i + 1
        bins[i:j] = b
        base = int(cum[j - 1])
        i, b = j, b + 1

    want = np.empty(len(tok), np.int64)
    fill, cur = None, -1
    for idx, t in enumerate(tok):
        if fill is None or fill + t > capacity:
            cur, fill = cur + 1, int(t)
        else:
            fill += int(t)
        want[idx] = cur
    assert (bins == want).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-(10**12), 10**12), min_size=1, max_size=50),
    st.lists(st.integers(-(10**12), 10**12), min_size=1, max_size=50),
    st.integers(0, 10**9),
    st.integers(0, 10**9),
)
def test_range_join_bucket_colocation(lts, rts, before_us, after_us):
    """The de-skew co-location invariant of range_join's time-axis salting
    (ops/asof.py): for EVERY matching (left, right) pair — rt within
    [lt - before, lt + after] — the left row's bucket is one of the exactly
    two buckets the right row replicates into, and only one of them (so
    each pair is co-located exactly once, no dedup pass needed). An
    off-by-one here silently DROPS pairs, which the small-SF oracle can
    miss; negative timestamps (pre-1970 casts) must floor, not truncate."""
    from rayquality.ops.asof import _left_bucket, _right_buckets

    w_us = max(1, before_us + after_us)
    lt = np.asarray(lts, np.int64)
    rt = np.asarray(rts, np.int64)
    lb = _left_bucket(lt, w_us)
    b0, b1 = _right_buckets(rt, after_us, w_us)
    for i, l in enumerate(lt):
        for j, r in enumerate(rt):
            if l - before_us <= r <= l + after_us:
                assert (lb[i] == b0[j]) != (lb[i] == b1[j]), (
                    f"pair (lt={l}, rt={r}, before={before_us}, "
                    f"after={after_us}) lb={lb[i]} b0={b0[j]} b1={b1[j]}"
                )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=100),
    st.integers(1, 4096),
    st.booleans(),
)
def test_part_of_range_and_determinism(keys, n_parts, with_salt):
    """_part_of must land every (key, salt) in [0, n_parts) and be a pure
    function of its inputs (stable partition routing is what makes the
    grouped shuffle resumable)."""
    from rayquality.ops.asof import _part_of

    k = np.asarray(keys, np.int64)
    salt = (k // 3) if with_salt else None
    p = _part_of(k, salt, n_parts)
    assert p.dtype == np.int64
    assert ((p >= 0) & (p < n_parts)).all()
    assert (p == _part_of(k, salt, n_parts)).all()


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=1000), max_size=60),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 5),
)
def test_shingle_arrays_matches_naive(texts, k):
    """The vectorized batch shingler (unique-word blake2b + sliding
    polynomial fold) must equal a naive per-document implementation for any
    text and k — it underpins exact/minhash/ngram dedup, so a window
    off-by-one here corrupts every dedup family member."""
    import hashlib

    from rayquality.ops.textdedup import _POLY, _shingle_arrays

    def naive_doc(text):
        words = (text or "").lower().split()
        hs = [
            np.uint64(
                int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
                )
            )
            for w in words
        ]
        out = set()
        with np.errstate(over="ignore"):
            if len(hs) >= k:
                for i in range(len(hs) - k + 1):
                    v = hs[i]
                    for x in hs[i + 1 : i + k]:
                        v = v * _POLY + x
                    out.add(int(v))
            elif hs:
                v = hs[0]
                for x in hs[1:]:
                    v = v * _POLY + x
                out.add(int(v))
        return out

    dd, ss = _shingle_arrays(texts, k)
    got = {}
    for d, s in zip(dd.tolist(), ss.tolist()):
        got.setdefault(d, set()).add(int(s))
    want = {i: naive_doc(t) for i, t in enumerate(texts) if naive_doc(t)}
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(-1e7, 1e7, allow_nan=False),
            # exact half-cent landings — where banker's rounding diverges
            st.integers(-2_000_001, 2_000_001).map(lambda i: i / 200.0),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_quantize_numpy_arrow_duckdb_agree(vals):
    """The two cents kernels (numpy sign-floor and Arrow
    half_towards_infinity) must agree with each other AND with DuckDB's
    ROUND(x*100) on every input incl. exact .5 landings and negatives —
    this IS the oracle-parity contract every money hash rides on."""
    import duckdb
    import pyarrow as pa

    from rayquality.ops.quant import cents_pa, quantize_i64

    v = np.asarray(vals, np.float64)
    got_np = quantize_i64(v, 100.0)
    got_pa = cents_pa(pa.chunked_array([pa.array(v)])).to_numpy(
        zero_copy_only=False
    )
    tbl = pa.table({"x": v})
    got_db = (
        duckdb.sql("SELECT CAST(ROUND(x * 100) AS BIGINT) AS c FROM tbl")
        .fetchnumpy()["c"]
    )
    assert (got_np == got_pa).all()
    assert (got_np == got_db).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=300))
def test_knuth_hash_matches_duckdb(keys):
    """The keyed-sampling rank hash ((key*2654435761) % 2^32, windows.py /
    sink.py) must equal the SQL expression the oracles use — numpy's
    uint64 wraparound is mod 2^64, and 2^32 divides 2^64, so the mod-2^32
    result is exact for any key; DuckDB needs the HUGEINT cast."""
    import duckdb
    import pyarrow as pa

    from rayquality.ops.windows import _H32, _KNUTH

    k = np.asarray(keys, np.uint64)
    with np.errstate(over="ignore"):
        got = ((k * _KNUTH) % _H32).astype(np.int64)
    tbl = pa.table({"k": k.astype(np.int64)})
    want = duckdb.sql(
        "SELECT CAST(CAST(k AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT)"
        " AS h FROM tbl"
    ).fetchnumpy()["h"]
    assert (got == want).all()


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=500), max_size=50),
        min_size=1,
        max_size=5,
    ),
    st.integers(1, 4),
    st.integers(2, 16),
)
def test_minhash_batch_segmentation_matches_per_doc(texts, k, num_perm):
    """minhash_signatures computes all docs' signature minima in one
    (P x S) matrix + np.minimum.reduceat over doc segments — the
    segmentation must equal a per-document min loop exactly (an off-by-one
    in seg_starts silently mixes neighboring docs' signatures). Docs with
    no shingles must keep the all-zeros signature."""
    from rayquality.ops.textdedup import _MERSENNE, _shingle_arrays

    rng = np.random.default_rng(7)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)

    dd, ss = _shingle_arrays(texts, k)
    # the kernel's exact batch arithmetic
    mat = np.zeros((len(texts), num_perm), dtype=np.int64)
    if len(ss):
        with np.errstate(over="ignore"):
            vals = (a[:, None] * (ss[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
        seg_starts = np.nonzero(np.concatenate(([True], dd[1:] != dd[:-1])))[0]
        mins = np.minimum.reduceat(vals, seg_starts, axis=1)
        mat[dd[seg_starts]] = mins.T.astype(np.int64)

    # independent per-doc loop over the same hash family
    want = np.zeros((len(texts), num_perm), dtype=np.int64)
    for d in range(len(texts)):
        sh = ss[dd == d]
        if len(sh):
            with np.errstate(over="ignore"):
                v = (a[:, None] * (sh[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            want[d] = v.min(axis=1).astype(np.int64)
    assert (mat == want).all()



@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 48),
    st.integers(1, 48),
    st.integers(0, 2**31 - 1),
    st.sampled_from(["raw", "ppm", "png"]),
    st.sampled_from(["random", "constant", "gradient"]),
)
def test_lossless_codecs_roundtrip_any_shape(w, h, seed, fmt, kind):
    """Lossless codecs must round-trip EXACTLY for any image shape down to
    1x1 and any content (constant images stress the zlib/filter path,
    gradients stress PNG row filters) — the flagship's decode stage rides
    on these byte contracts."""
    from rayquality import codecs

    rng = np.random.default_rng(seed)
    if kind == "random":
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    elif kind == "constant":
        img = np.full((h, w, 3), rng.integers(0, 256), dtype=np.uint8)
    else:
        img = (
            (np.arange(h)[:, None, None] * 3 + np.arange(w)[None, :, None] * 5
             + np.arange(3)[None, None, :] * 7) % 256
        ).astype(np.uint8)
    out = codecs.decode(codecs.encode(img, fmt), fmt)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(4, 48), st.integers(4, 48), st.integers(0, 2**31 - 1))
def test_lossy_codec_psnr_floor_any_shape(w, h, seed):
    """The lossy codec's PSNR >= 40 dB north-rule invariant must hold at
    any shape, not just the fixture size."""
    from rayquality import codecs

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codecs.decode(codecs.encode(img, "lossy"), "lossy")
    assert out.shape == img.shape
    assert codecs.psnr(img, out) >= 40.0


@settings(max_examples=60, deadline=None)
@given(st.integers(2, 32), st.integers(0, 2**31 - 1))
def test_dct_matrix_matches_naive_and_is_orthonormal(n, seed):
    """phash's DCT matrix must compute the orthonormal DCT-II exactly
    (naive double-sum parity) and be orthogonal (M @ M.T == I) — the
    64-bit hash thresholds these coefficients, so any scale error shifts
    every image's hash."""
    from rayquality.phash import _dct_matrix

    M = _dct_matrix(n)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    got = M @ v
    want = np.empty(n)
    for k in range(n):
        s = sum(
            v[i] * np.cos(np.pi * (2 * i + 1) * k / (2 * n)) for i in range(n)
        )
        scale = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
        want[k] = s * scale
    np.testing.assert_allclose(got, want, atol=1e-10)
    np.testing.assert_allclose(M @ M.T, np.eye(n), atol=1e-10)
