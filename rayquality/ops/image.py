"""Multimodal operators: image decode / resize / feature-extract as
actor-pool ``map_batches`` stages (brief: multimodal columns are opaque
binary + typed metadata; the Ray-side plumbing is real and tested).

Images use the in-repo codecs, so decode/resize/features are REAL here.
Audio/video decoders don't exist in this environment — their stages carry
the same plumbing (schema, batch signature, actor pool) with the decode
kernel stubbed behind ``NotImplementedError`` as mandated by the brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .. import codecs
from ..phash import resize_bilinear, to_gray


class ImageFeaturizer:
    """Actor-pool stage: bytes -> decode -> resize -> grid features.

    Output per row: ``decoded_ok:bool``, ``feat:list<float32>[dim]`` (mean
    RGB over a grid x 3 channels), zeros when undecodable.
    """

    def __init__(self, grid: int = 8) -> None:
        self.grid = grid
        self.dim = grid * grid * 3

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        ok = np.zeros(n, dtype=bool)
        feats = np.zeros((n, self.dim), dtype=np.float32)
        fmts = t["fmt"].to_pylist()
        blobs = t["bytes"]
        g = self.grid
        for i in range(n):
            try:
                img = codecs.decode(blobs[i].as_py(), fmts[i]).astype(np.float32)
            except codecs.CodecError:
                continue
            ok[i] = True
            # area-style pooling per channel via bilinear resize to (g, g)
            for c in range(3):
                feats[i, c * g * g : (c + 1) * g * g] = resize_bilinear(
                    img[..., c].astype(np.float64), g, g
                ).reshape(-1)
        return pa.table(
            {
                "image_id": t["image_id"],
                "decoded_ok": pa.array(ok),
                "feat": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.dim
                ),
            }
        )


def image_features(
    ds: rd.Dataset, grid: int = 8, concurrency: int | None = None, batch_size: int = 256
) -> rd.Dataset:
    from ..pool import actor_cpus, pool_size

    return ds.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        ImageFeaturizer,
        fn_constructor_args=(grid,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, pool_size(concurrency)),
        num_cpus=actor_cpus(),
    )


class Thumbnailer:
    """Actor-pool stage: decode -> resize -> re-encode (png) thumbnail."""

    def __init__(self, side: int = 16) -> None:
        self.side = side

    def __call__(self, t: pa.Table) -> pa.Table:
        thumbs: list[bytes | None] = []
        for blob, fmt in zip(t["bytes"], t["fmt"].to_pylist()):
            try:
                img = codecs.decode(blob.as_py(), fmt)
            except codecs.CodecError:
                thumbs.append(None)
                continue
            small = np.stack(
                [
                    resize_bilinear(img[..., c].astype(np.float64), self.side, self.side)
                    for c in range(3)
                ],
                axis=-1,
            )
            thumbs.append(codecs.encode(np.clip(small, 0, 255).astype(np.uint8), "png"))
        return pa.table(
            {"image_id": t["image_id"], "thumb_png": pa.array(thumbs, pa.large_binary())}
        )


def thumbnails(ds: rd.Dataset, side: int = 16, concurrency: int | None = None) -> rd.Dataset:
    from ..pool import actor_cpus, pool_size

    return ds.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        Thumbnailer,
        fn_constructor_args=(side,),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, pool_size(concurrency)),
        num_cpus=actor_cpus(),
    )


class Augmenter:
    """Actor-pool stage: deterministic training-set image augmentation —
    decode -> (optional horizontal flip, keyed on image_id) -> center crop
    to ``crop_frac`` -> brightness scale -> re-encode. All transforms are
    pure numpy over the in-repo codecs (REAL, not stubbed), and keyed on
    the image id instead of an RNG so reruns and retries produce
    byte-identical augmented corpora (the same determinism contract as
    every sampler in this repo).

    Output: (image_id, aug_png, flipped:bool); undecodable rows emit null.
    """

    def __init__(self, crop_frac: float = 0.875, brightness: float = 1.1) -> None:
        self.crop_frac = crop_frac
        self.brightness = brightness

    def __call__(self, t: pa.Table) -> pa.Table:
        out: list[bytes | None] = []
        flipped: list[bool] = []
        import pandas as pd

        ids = t["image_id"].to_numpy(zero_copy_only=False)
        # stable 64-bit string hash (deterministic across processes)
        do_flip = pd.util.hash_array(ids.astype(object)) % np.uint64(2) == 0
        for i, (blob, fmt) in enumerate(zip(t["bytes"], t["fmt"].to_pylist())):
            try:
                img = codecs.decode(blob.as_py(), fmt).astype(np.float64)
            except codecs.CodecError:
                out.append(None)
                flipped.append(False)
                continue
            if do_flip[i]:
                img = img[:, ::-1]
            h, w = img.shape[:2]
            ch, cw = max(1, int(h * self.crop_frac)), max(1, int(w * self.crop_frac))
            y0, x0 = (h - ch) // 2, (w - cw) // 2
            img = img[y0 : y0 + ch, x0 : x0 + cw]
            img = np.clip(img * self.brightness, 0, 255).astype(np.uint8)
            out.append(codecs.encode(img, "png"))
            flipped.append(bool(do_flip[i]))
        return pa.table(
            {
                "image_id": t["image_id"],
                "aug_png": pa.array(out, pa.large_binary()),
                "flipped": pa.array(flipped),
            }
        )


def augment_images(
    ds: rd.Dataset,
    crop_frac: float = 0.875,
    brightness: float = 1.1,
    concurrency: int | None = None,
) -> rd.Dataset:
    from ..pool import actor_cpus, pool_size

    return ds.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        Augmenter,
        fn_constructor_args=(crop_frac, brightness),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, pool_size(concurrency)),
        num_cpus=actor_cpus(),
    )


class AudioFeaturizer:
    """STUB (no audio codecs in this environment — brief mandates the
    plumbing be real and the decode kernel stubbed).

    Expected input schema: ``(clip_id: string, bytes: binary, codec: string,
    sample_rate: int32)``; output ``(clip_id, feat: list<float32>)``.
    """

    def __init__(self) -> None:
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decode requires an audio codec library (none available "
            "offline); the stage contract is (clip_id, bytes, codec, "
            "sample_rate) -> (clip_id, feat)"
        )


class VideoFrameSampler:
    """STUB: frame sampling needs a video demuxer (none available offline).

    Expected input: ``(video_id, bytes, container, fps)``; output one row
    per sampled frame ``(video_id, frame_idx, frame_png)``.
    """

    def __init__(self, every_n: int = 30) -> None:
        self.every_n = every_n

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video demuxing requires a codec library (none available offline)"
        )


def phash_radius_search(
    ds: rd.Dataset,
    query_ids: list[str],
    max_hamming: int = 8,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> "pd.DataFrame":
    """Near-duplicate RETRIEVAL: every corpus image within ``max_hamming``
    bits of each query image's perceptual hash — dedup machinery turned
    into a lookup ("find the other crops/re-encodes of these images").

    Shuffle-free: the K query hashes collect once (a filtered id lookup,
    O(K)), broadcast in the batch closure, and every batch XOR+popcounts
    its rows against all K queries vectorized ((rows x K) uint64 -> one
    ``unpackbits`` sum). Only matches leave the scan — the output is
    O(hits). K is a user query list, not corpus-sized; for corpus-wide
    all-pairs use the banded-hamming kernel (``ops/pairs.py``) instead.

    Output: (query_id, image_id, hamming) sorted, self-matches excluded.
    """
    import pandas as pd
    import pyarrow.compute as pc

    qdf = (
        ds.select_columns([id_col, phash_col])
        .filter(expr=f"{id_col} in {list(query_ids)}")
        .to_pandas()
        .sort_values(id_col)
    )
    q_ids = qdf[id_col].to_numpy(object)
    q_hash = qdf[phash_col].to_numpy(np.int64).view(np.uint64)

    def scan(t: pa.Table) -> pa.Table:
        ph = t[phash_col].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        x = ph[:, None] ^ q_hash[None, :]  # (rows, K)
        dist = np.unpackbits(x[:, :, None].view(np.uint8), axis=2).sum(
            axis=2, dtype=np.int64
        )
        ri, qi = np.nonzero((dist <= max_hamming) & (ids[:, None] != q_ids[None, :]))
        return pa.table(
            {
                "query_id": pa.array(q_ids[qi], pa.string()),
                id_col: pa.array(ids[ri], pa.string()),
                "hamming": pa.array(dist[ri, qi]),
            }
        )

    out = ds.select_columns([id_col, phash_col]).map_batches(
        scan, batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values(["query_id", "hamming", id_col]).reset_index(drop=True)


def pixel_verified_near_dups(
    ds: rd.Dataset,
    n_bands: int = 4,
    mse_threshold: float = 80.0,
    grid: int = 8,
    num_partitions: int = 8,
) -> "pd.DataFrame":
    """Image near-dups verified at the PIXEL level: phash band collisions
    propose candidate pairs (the cheap, hash-only recall stage), then each
    pair is scored by the mean squared error of the two images' grid
    feature vectors — the ground truth the hash only approximates, so
    phash false positives die here. -> DataFrame (id_a, id_b, mse_micro)
    sorted, mse ascending within ids.

    Distributed end to end: bands explode from the (int64 phash, id)
    columns only; the candidate pair kernel is the shared hash-partitioned
    sweep (``ops/pairs``); pixels are decoded ONCE per image into a
    ``grid x grid x 3`` vector by the ``image_features`` actor pool
    (decode amortized per actor, bytes never shuffle); and the two feature
    lookups are hash joins of the skinny pair list against the skinny
    feature table. Undecodable images cannot be pixel-verified and drop
    out (inner-join semantics on decoded_ok).
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ..phash import band_keys
    from . import pairs as _pairs

    def explode_bands(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = band_keys(ph, n_bands)  # (n, n_bands) int64 band keys
        n = len(ph)
        idx = np.repeat(np.arange(n), n_bands)
        return pa.table(
            {
                "bkey": pa.array(bk.reshape(-1)),
                "image_id": t["image_id"].combine_chunks().take(pa.array(idx)),
            }
        )

    banded = ds.select_columns(["phash", "image_id"]).map_batches(
        explode_bands, batch_format="pyarrow"
    )
    # distinct pairs: a pair sharing M bands comes out of the sweep M times
    # (and from different key partitions, so the distinct needs its own
    # pair-hash partition pass — skinny rows only)
    import pandas as pd

    def add_ppart(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["id_a", "id_b"]], index=False).to_numpy(
            np.uint64
        )
        df = df.copy()
        df["ppart"] = (h % np.uint64(num_partitions * 8)).astype(np.int64)
        return df

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]

    # materialize the two skinny join inputs (candidate pairs; id+vector
    # features): a fused lazy DAG would run the featurizer ACTOR pool and
    # the join's shuffle-aggregator actors concurrently, and on a small
    # cluster the two pools deadlock waiting for each other's CPU slots
    # (observed hang at num_cpus=4). Both tables are O(candidates) /
    # O(images x 4*grid^2*3 bytes) — object-store resident, spillable.
    cand = (
        _pairs.equal_key_pair_ds(banded, "image_id", "bkey")
        .map_batches(add_ppart, batch_format="pandas")
        .groupby("ppart")
        .map_groups(distinct, batch_format="pandas")
        .materialize()
    )

    dim = grid * grid * 3

    def pack_feats(t: pa.Table) -> pa.Table:
        # Arrow's hash join rejects fixed_size_list payload columns; the
        # float32 vectors ride the two joins as fixed-size BINARY instead
        # (same bytes, zero-copy both ways)
        t = t.filter(pc.equal(t["decoded_ok"], True))
        arr = np.asarray(t["feat"].combine_chunks().flatten(), np.float32)
        fsb = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(dim * 4), t.num_rows, [None, pa.py_buffer(arr.tobytes())]
        )
        return pa.table({"image_id": t["image_id"], "feat": fsb})

    feats = image_features(ds, grid=grid).map_batches(
        pack_feats, batch_format="pyarrow"
    ).materialize()

    j1 = cand.join(
        feats,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_a",),
        right_on=("image_id",),
    ).map_batches(
        # the join consumes the right key; only feat needs disambiguating
        lambda t: t.rename_columns(
            ["feat_a" if c == "feat" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        feats,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_b",),
        right_on=("image_id",),
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "mse_micro": pa.array([], pa.int64()),
                }
            )
        def unpack(col: pa.ChunkedArray) -> np.ndarray:
            a = col.combine_chunks()
            raw = np.frombuffer(a.buffers()[1], np.float32)[
                a.offset * dim : (a.offset + len(a)) * dim
            ]
            return raw.reshape(-1, dim).astype(np.float64)

        fa = unpack(t["feat_a"])
        fb = unpack(t["feat"])
        mse = ((fa - fb) ** 2).mean(axis=1)
        keep = mse <= mse_threshold
        return pa.table(
            {
                "id_a": t["id_a"].filter(pa.array(keep)),
                "id_b": t["id_b"].filter(pa.array(keep)),
                "mse_micro": pa.array(
                    np.floor(mse[keep] * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    out = j2.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
