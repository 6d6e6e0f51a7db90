import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from rayquality.engine import (
    CompletenessValidator,
    DuplicatesValidator,
    IntegrityValidator,
    PatternsValidator,
    Severity,
    ValidationEngine,
    ValidationResult,
    default_engine,
)
from rayquality import report

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_completeness_validator(rd):
    ds = rd.read_parquet(f"{SF}/customer.parquet")
    results = CompletenessValidator(threshold=0.95).validate(ds, "customer")
    assert len(results) == 5
    assert all(r.passed for r in results)  # testdata has no nulls
    assert all(r.validator == "completeness" for r in results)
    with pytest.raises(ValueError):
        CompletenessValidator(threshold=1.5)


def test_duplicates_validator_triage(rd):
    v = DuplicatesValidator()
    assert v.should_validate("codigo_produto")  # unique pattern forces
    assert not v.should_validate("user_email")  # skip pattern
    assert not v.should_validate("fk_order")
    assert v.should_validate("random_col")  # default validate
    v2 = DuplicatesValidator(force_unique_columns={"user_email"})
    assert v2.should_validate("user_email")  # explicit force wins

    ds = rd.read_parquet(f"{SF}/orders.parquet")
    results = DuplicatesValidator(columns=["o_orderkey", "o_custkey"]).validate(ds, "orders")
    by_col = {r.column_name: r for r in results}
    assert by_col["o_orderkey"].passed  # PK unique
    assert not by_col["o_custkey"].passed  # many dups
    assert by_col["o_custkey"].affected_rows > 0


def test_duplicates_env_overrides(rd, monkeypatch):
    """Env-var triage parity (reference duplicates.py:45-152 +
    tests/unit/validators/test_duplicates.py env cases): set env vars
    replace the default pattern lists and add explicit column overrides;
    empty env falls through to the defaults; constructor args still win."""
    monkeypatch.setenv("SKIP_DUPLICATE_PATTERNS", "test_skip,custom_pattern")
    monkeypatch.setenv("FORCE_UNIQUE_PATTERNS", "test_unique,custom_unique")
    monkeypatch.setenv("FORCE_UNIQUE_COLUMNS", "force_column")
    monkeypatch.setenv("ALLOW_DUPLICATE_COLUMNS", "allow_column")
    v = DuplicatesValidator()
    assert v.skip_patterns == ("test_skip", "custom_pattern")
    assert v.unique_patterns == ("test_unique", "custom_unique")
    assert not v.should_validate("my_test_skip_col")
    assert v.should_validate("a_custom_unique_code")
    assert v.should_validate("force_column")
    assert not v.should_validate("allow_column")
    # the default skip list no longer applies once env replaces it
    assert v.should_validate("user_email")

    # constructor args beat env (config-over-env design decision)
    v2 = DuplicatesValidator(unique_patterns=("ctor",), skip_patterns=("c2",))
    assert v2.unique_patterns == ("ctor",) and v2.skip_patterns == ("c2",)

    monkeypatch.setenv("SKIP_DUPLICATE_PATTERNS", "")
    monkeypatch.setenv("FORCE_UNIQUE_PATTERNS", "")
    monkeypatch.delenv("FORCE_UNIQUE_COLUMNS")
    monkeypatch.delenv("ALLOW_DUPLICATE_COLUMNS")
    v3 = DuplicatesValidator()
    assert not v3.should_validate("user_email")  # defaults restored
    assert v3.should_validate("codigo_produto")


def test_patterns_validator_custom(rd):
    ds = rd.read_parquet(f"{SF}/customer.parquet")
    results = PatternsValidator({"c_name": r"Customer#[0-9]{9}"}).validate(ds, "customer")
    assert len(results) == 1 and results[0].passed


def test_patterns_validator_checksum(rd):
    df = pd.DataFrame({"cpf_col": ["123.456.789-09", "111.111.111-11", None]})
    ds = rd.from_pandas(df)
    results = PatternsValidator().validate(ds, "t")
    assert len(results) == 1
    r = results[0]
    assert r.details["pattern_type"] == "cpf"
    assert r.affected_rows == 1 and not r.passed  # null valid, one bad checksum


def test_integrity_validator(rd):
    orders = rd.read_parquet(f"{SF}/orders.parquet")
    customer = rd.read_parquet(f"{SF}/customer.parquet")
    results = IntegrityValidator([("o_custkey", customer, "c_custkey")]).validate(
        orders, "orders"
    )
    assert len(results) == 1 and results[0].passed
    assert results[0].severity == Severity.CRITICAL


def test_engine_error_isolation(rd):
    class Boom:
        def validate(self, ds, name):
            raise RuntimeError("kaput")

    eng = ValidationEngine()
    eng.register_validator("boom", Boom())
    eng.register_validator("completeness", CompletenessValidator(columns=["r_name"]))
    ds = rd.read_parquet(f"{SF}/region.parquet")
    results = eng.validate_data(ds, "region")
    # the raising validator yields a CRITICAL result; the run continues
    assert any(r.severity == Severity.CRITICAL and "kaput" in r.message for r in results)
    assert any(r.validator == "completeness" and r.passed for r in results)


def _mk(rule, sev, passed, affected, total, validator="patterns"):
    return ValidationResult(
        rule_name=rule,
        table_name="t",
        column_name=None,
        severity=sev,
        passed=passed,
        message="m",
        affected_rows=affected,
        total_rows=total,
        validator=validator,
    )


def test_report_summary_and_ordering():
    results = [
        _mk("a", Severity.WARNING, False, 50, 100, "completeness"),
        _mk("b", Severity.CRITICAL, False, 5, 100, "integrity"),
        _mk("c", Severity.ERROR, False, 99, 100, "duplicates"),
        _mk("d", Severity.ERROR, False, 10, 100, "duplicates"),
        _mk("e", Severity.INFO, True, 0, 100),
    ]
    s = report.analyze_results(results)
    assert s["total_checks"] == 5 and s["passed_checks"] == 1
    assert s["success_rate"] == 20.0
    assert s["severity_breakdown"]["ERROR"] == {"total": 2, "passed": 0, "failed": 2}
    assert s["validator_breakdown"]["duplicates"]["failed"] == 2
    # ordering: severity priority first, then affected desc (summary_report.py:104-112)
    order = [r.rule_name for r in report.top_issues(results)]
    assert order == ["b", "c", "d", "a"]
    # score buckets 95/85/70/50 (summary_report.py:136-147)
    assert report.quality_score(96) == "EXCELLENT"
    assert report.quality_score(85) == "GOOD"
    assert report.quality_score(70) == "FAIR"
    assert report.quality_score(50) == "POOR"
    assert report.quality_score(49.9) == "CRITICAL"
    assert report.analyze_results([])["success_rate"] == 100.0


def test_report_manager_files(tmp_path):
    results = [_mk("a", Severity.ERROR, False, 1, 10)]
    rm = report.ReportManager(str(tmp_path))
    paths = rm.generate_unified_report(results, "mytable")
    assert set(paths) == {"json", "txt", "html"}
    data = json.load(open(paths["json"]))
    assert data["table_name"] == "mytable"
    assert data["summary"]["failed_checks"] == 1
    assert "TOP ISSUES" in open(paths["txt"]).read()
    html = open(paths["html"]).read()
    assert "<html" in html
    # styled-summary parity (reference reports/html_report.py:14-117):
    # timestamped header, summary cards, validator/severity breakdowns,
    # per-severity sections
    for section in (
        "Generated on",
        'class="card score"',
        "By validator",
        "By severity",
        "sev-error",
        "Errors",
    ):
        assert section in html, section
    for p in paths.values():
        assert "data_quality_unified_mytable_" in os.path.basename(p)


def test_cli_list_and_describe():
    out = subprocess.run(
        [sys.executable, "-m", "rayquality.cli", "list-tables", SF],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0
    lines = out.stdout.strip().splitlines()
    assert lines[0].split()[0] == "lineitem"  # biggest table first
    out2 = subprocess.run(
        [sys.executable, "-m", "rayquality.cli", "describe-table", f"{SF}/region.parquet"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out2.returncode == 0 and "r_name" in out2.stdout


def test_severity_details_grouping():
    results = [
        _mk("warn_rule", Severity.WARNING, False, 50, 100, "completeness"),
        _mk("crit_rule", Severity.CRITICAL, False, 5, 100, "integrity"),
        _mk("err_big", Severity.ERROR, False, 99, 100, "duplicates"),
        _mk("err_small", Severity.ERROR, False, 10, 100, "duplicates"),
        _mk("ok_rule", Severity.INFO, True, 0, 100),
    ]
    results[1].details["orphaned_samples"] = [7, 8, 9, 10]
    text = report.severity_details(results)
    # sections in priority order; passed rules absent
    assert text.index("[CRITICAL]") < text.index("[ERROR]") < text.index("[WARNING]")
    assert "ok_rule" not in text
    # within a severity: affected desc
    assert text.index("err_big") < text.index("err_small")
    assert "affected 5/100" in text and "pass_rate 95.0%" in text
    assert "samples: 7, 8, 9" in text and "10" not in text.split("samples:")[1].split("\n")[0]
    # all-passed -> empty (cmd_analyze prints nothing)
    assert report.severity_details([_mk("x", Severity.INFO, True, 0, 5)]) == ""


def test_cli_analyze_severity_detail_view():
    """CLI drive: `analyze` on orders must render failed rules grouped by
    severity (duplicates on o_custkey fail at ERROR in this corpus)."""
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "rayquality.cli",
            "--num-cpus",
            "4",
            "analyze",
            f"{SF}/orders.parquet",
            "--output-dir",
            "/tmp/rq_cli_analyze_test",
            "--formats",
            "txt",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode in (0, 1), out.stderr[-2000:]
    assert "[ERROR]" in out.stdout, out.stdout
    assert "failed rule(s)" in out.stdout
    assert "affected" in out.stdout and "pass_rate" in out.stdout


def test_cli_analyze_source_formats(tmp_path):
    """`analyze` must accept any registry format: csv by extension
    inference, sqlite via --table (reference parity — the reference CLI
    analyzes whichever connector is configured, not one file format)."""
    import pandas as pd
    import sqlite3

    df = pd.read_parquet(f"{SF}/region.parquet")
    csv_path = tmp_path / "region.csv"
    df.to_csv(csv_path, index=False)
    db_path = tmp_path / "tiny.db"
    with sqlite3.connect(db_path) as conn:
        df.to_sql("region", conn, index=False)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = [sys.executable, "-m", "rayquality.cli", "--num-cpus", "4", "analyze"]
    out = subprocess.run(
        base + [str(csv_path), "--output-dir", str(tmp_path / "r1"), "--formats", "txt"],
        capture_output=True, text=True, cwd=root,
    )
    assert out.returncode in (0, 1), out.stderr[-2000:]
    assert "region" in out.stdout

    out2 = subprocess.run(
        base + [str(db_path), "--table", "region",
                "--output-dir", str(tmp_path / "r2"), "--formats", "txt"],
        capture_output=True, text=True, cwd=root,
    )
    assert out2.returncode in (0, 1), out2.stderr[-2000:]
    assert "region" in out2.stdout

    # sqlite without --table must fail fast with a clear message
    out3 = subprocess.run(
        base + [str(db_path)], capture_output=True, text=True, cwd=root
    )
    assert out3.returncode != 0 and "--table is required" in out3.stderr
    assert out3.stdout == ""  # failed before any analysis ran


def test_gate_window_rotation_contract():
    """The driver certifies only the first 50 queries() entries. Round-5
    contract: every query never driver-certified across CORRECTNESS_r01..r04
    (17 oracled + 10 rows-only) sits inside the window, so a green
    CORRECTNESS_r05 closes cumulative driver certification to 140/140; the
    remaining window slots are oracled re-certs."""
    import json

    import __ray_entry__ as e

    qs = list(e.queries())
    osql = e.oracle_sql()
    first50 = set(qs[:50])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    certified = set()
    for r in ("r01", "r02", "r03", "r04"):
        with open(os.path.join(repo, f"CORRECTNESS_{r}.json")) as f:
            certified |= set(json.load(f))
    never = set(qs) - certified
    # 27 legacy never-certified entries plus any round-5 additions (new
    # queries are by definition uncertified until CORRECTNESS_r05 lands);
    # every one of them must sit inside the 50-entry window.
    r5_new = {
        "sqlite_scan_orders",
        "dedup_lines_within_documents",
        "quality_dedup_documents",
        "debounce_events_stream",
        "decontaminate_overlap_documents",
        "centroid_outliers_embeddings",
        "edit_distance_dups_documents",
        "domain_profile_documents",
        "pagerank_exact_events",
        "hll_registers_orders",
        "kcenter_exact_embeddings",
        "hamming_radius_pairs_documents",
        "minhash_sets_orders",
        "simhash_sets_orders",
        "bloom_bits_orders",
        "substr_fingerprints_documents",
    }
    assert len(never - r5_new) == 27, sorted(never - r5_new)
    assert r5_new <= never <= first50, sorted(never - first50)
    # every window slot that is not a never-certified entry must be an
    # oracled re-cert (strongest check for the re-used slots)
    recerts = first50 - never
    assert all(k in osql and k in certified for k in recerts), sorted(
        k for k in recerts if k not in osql or k not in certified
    )
    # and nothing previously certified was dropped from the registry
    missing = certified - set(qs)
    assert not missing, sorted(missing)
