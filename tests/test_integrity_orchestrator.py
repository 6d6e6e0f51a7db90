"""FIXTURES.md F2d integrity cases + volumetry + orchestrator parity."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _child_parent(rd):
    child = pd.DataFrame(
        {
            "fk": [1, 2, 3, 99, None],
            "fk2a": [1, 1, 2, 2, None],
            "fk2b": ["x", "y", "x", "zz", "x"],
        }
    )
    parent = pd.DataFrame({"id": [1, 2, 3], "ka": [1, 1, 2], "kb": ["x", "y", "x"]})
    return rd.from_pandas(child), rd.from_pandas(parent)


def test_composite_fk_cases(rd):
    from rayquality.ops.validators import integrity_composite

    child, parent = _child_parent(rd)
    r = integrity_composite(child, ["fk2a", "fk2b"], parent, ["ka", "kb"]).to_pandas().iloc[0]
    # (2,'zz') orphaned; (None,'x') null row
    assert r["orphaned_count"] == 1
    assert r["null_count"] == 1
    assert not r["passed"]


def test_single_fk_with_nulls(rd):
    from rayquality.ops.validators import integrity

    child, parent = _child_parent(rd)
    r = integrity(child, "fk", parent, "id", allow_nulls=True).to_pandas().iloc[0]
    assert r["orphaned_count"] == 1 and r["null_count"] == 1
    r2 = integrity(child, "fk", parent, "id", allow_nulls=False).to_pandas().iloc[0]
    assert not r2["passed"]


def test_empty_reference_all_orphaned(rd):
    from rayquality.ops.validators import integrity_composite

    child, _ = _child_parent(rd)
    empty = rd.from_pandas(pd.DataFrame({"ka": pd.Series([], dtype="int64"), "kb": pd.Series([], dtype="object")}))
    r = integrity_composite(child, ["fk2a", "fk2b"], empty, ["ka", "kb"]).to_pandas().iloc[0]
    assert r["orphaned_count"] == 4  # every non-null key row


def test_self_reference(rd):
    from rayquality.ops.validators import integrity_composite

    # parent_id referencing ids within the same table
    t = rd.from_pandas(pd.DataFrame({"id": [1, 2, 3], "parent_id": [None, 1, 2]}))
    r = integrity_composite(
        t, ["parent_id"], t.select_columns(["id"]), ["id"], allow_self_reference=True
    ).to_pandas().iloc[0]
    assert r["orphaned_count"] == 0 and r["passed"]


def test_duplicate_reference_values_unaffected(rd):
    from rayquality.ops.validators import integrity

    child = rd.from_pandas(pd.DataFrame({"fk": [1, 1, 2]}))
    ref = rd.from_pandas(pd.DataFrame({"id": [1, 1, 2, 2]}))  # dup reference values
    r = integrity(child, "fk", ref, "id").to_pandas().iloc[0]
    assert r["orphaned_count"] == 0 and r["passed"]


def test_volumetry(rd):
    from rayquality.ops.validators import volumetry

    v = volumetry(rd.read_parquet(f"{SF}/customer.parquet"))
    assert v["total_rows"] == 150 and v["total_columns"] == 5
    assert v["data_points"] == 750
    assert v["memory_usage_bytes"] > 0 and v["estimated_disk_mb"] >= 0


def test_orchestrator_full_analysis(rd, tmp_path):
    from rayquality.orchestrator import Orchestrator

    orch = Orchestrator(output_dir=str(tmp_path), sample_size=None)
    out = orch.run_complete_analysis(f"{SF}/orders.parquet")
    assert out["metadata"]["table_name"] == "orders"
    assert out["metadata"]["volumetry"]["total_rows"] == 1500
    assert out["metadata"]["sampling"]["sampling_ratio"] == 1.0
    assert out["summary"]["total_checks"] > 0 and "duration_s" in out["summary"]
    assert set(out["report_paths"]) == {"json", "txt", "html"}


def test_orchestrator_sampling(rd, tmp_path):
    from rayquality.orchestrator import Orchestrator

    orch = Orchestrator(output_dir=str(tmp_path), sample_size=100)
    out = orch.analyze_table(f"{SF}/orders.parquet")
    s = out["metadata"]["sampling"]
    assert s["total_rows"] == 1500
    assert 0 < s["analyzed_rows"] < 1500  # seeded random sample applied
