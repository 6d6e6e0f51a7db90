"""Force the distributed (big-path) stage B — the 10^12-scale code path —
and require bit-identical results to the driver-combine small path."""

import glob
import shutil

import pyarrow.dataset as pds
import pytest

from rayquality import pipeline, synth
from rayquality.config import RunConfig

OUT_SMALL = "/tmp/rq_path_small"
OUT_BIG = "/tmp/rq_path_big"


@pytest.fixture(scope="module")
def corpus(ray_session):
    return synth.ensure_corpus(2000, seed=42)


def _final(out):
    return (
        pds.dataset(sorted(glob.glob(out + "/final/*.parquet")))
        .to_table(columns=["image_id", "keep", "drop_reasons"])
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_distributed_stage_b_matches_driver_path(corpus, monkeypatch):
    shutil.rmtree(OUT_SMALL, ignore_errors=True)
    shutil.rmtree(OUT_BIG, ignore_errors=True)
    s_small = pipeline.run(corpus, RunConfig(output_dir=OUT_SMALL, write_kept=False))
    monkeypatch.setattr(pipeline, "DRIVER_COMBINE_MAX", 0)
    s_big = pipeline.run(corpus, RunConfig(output_dir=OUT_BIG, write_kept=False))

    assert s_big["kept"] == s_small["kept"]
    assert s_big["exact_dup_groups"] == s_small["exact_dup_groups"]
    assert s_big["near_dup_losers"] == s_small["near_dup_losers"]
    assert s_big["rule_hits"] == s_small["rule_hits"]

    a, b = _final(OUT_SMALL), _final(OUT_BIG)
    assert list(a["image_id"]) == list(b["image_id"])
    assert (a["keep"].to_numpy() == b["keep"].to_numpy()).all()
    mism = [
        (x, y)
        for x, y in zip(a["drop_reasons"].map(list), b["drop_reasons"].map(list))
        if x != y
    ]
    assert not mism, mism[:5]


def test_big_path_near_dup_uses_distributed_components(corpus, monkeypatch):
    """Above the driver cap the verified pair list must feed the BSP
    connected-components kernel, never the driver union-find: poison the
    union-find and require the distributed loser set to equal the small
    path's (same corpus, same bands)."""
    import ray.data as rd

    from rayquality import dedup

    winners = rd.read_parquet(corpus).select_columns(["phash", "image_id"])
    small = pipeline.compute_near_losers(winners, 3, 4, approx_candidates=10)
    assert small, "corpus must contain planted near-dups for this test"

    def boom(pairs):
        raise AssertionError("driver union-find reached on the big path")

    monkeypatch.setattr(dedup, "component_losers", boom)
    big = pipeline.compute_near_losers(
        winners, 3, 4, approx_candidates=pipeline.DRIVER_COMBINE_MAX + 1
    )
    assert big == small


def test_big_path_near_dup_general_string_ids(corpus, monkeypatch):
    """Non-contract id strings (unpadded, so string order != numeric order)
    must take the general hash-keyed CC path — still no driver union-find —
    and agree with the small path's min-STRING winner per component."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from rayquality import dedup

    def rename(t: pa.Table) -> pa.Table:
        # img-000000042 -> n42x : unpadded, min-string != min-numeric
        nid = pc.binary_join_element_wise(
            "n",
            pc.cast(pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4), pa.int64()), pa.string()),
            "x",
            "",
        )
        return t.set_column(t.schema.get_field_index("image_id"), "image_id", nid)

    winners = (
        rd.read_parquet(corpus)
        .select_columns(["phash", "image_id"])
        .map_batches(rename, batch_format="pyarrow")
    )
    small = pipeline.compute_near_losers(winners, 3, 4, approx_candidates=10)
    assert small, "corpus must contain planted near-dups"

    def boom(pairs):
        raise AssertionError("driver union-find reached on the general big path")

    monkeypatch.setattr(dedup, "component_losers", boom)
    big = pipeline.compute_near_losers(
        winners, 3, 4, approx_candidates=pipeline.DRIVER_COMBINE_MAX + 1
    )
    assert big == small
