"""Report generators: summary analysis + JSON / TXT / HTML sinks.

Reproduces the reference's report layer semantics (citations into
/root/reference): ``_analyze_results`` breakdowns (``reports/base.py:28-105``),
top-issues ordering by (severity_priority, -affected_rows)
(``reports/summary_report.py:99-124``), quality-score buckets 95/85/70/50
(``summary_report.py:136-147``), multi-format generation with unified
timestamped naming (``core/report_manager.py:125-187``). The validator
breakdown uses the explicit ``validator`` field instead of the reference's
rule-name sniffing (SURVEY.md §2.5 A8).
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Any

from .engine import ValidationResult

SEVERITY_PRIORITY = {"CRITICAL": 0, "ERROR": 1, "WARNING": 2, "INFO": 3}


def analyze_results(results: list[ValidationResult]) -> dict[str, Any]:
    """Summary statistics (reports/base.py:28-105 arithmetic)."""
    if not results:
        return {
            "total_checks": 0,
            "passed_checks": 0,
            "failed_checks": 0,
            "success_rate": 100.0,
            "severity_breakdown": {},
            "validator_breakdown": {},
        }
    total = len(results)
    passed = sum(1 for r in results if r.passed)
    sev: dict[str, dict[str, int]] = {}
    val: dict[str, dict[str, int]] = {}
    for r in results:
        s = sev.setdefault(r.severity.value, {"total": 0, "passed": 0, "failed": 0})
        s["total"] += 1
        s["passed" if r.passed else "failed"] += 1
        v = val.setdefault(r.validator, {"total": 0, "passed": 0, "failed": 0})
        v["total"] += 1
        v["passed" if r.passed else "failed"] += 1
    return {
        "total_checks": total,
        "passed_checks": passed,
        "failed_checks": total - passed,
        "success_rate": (passed / total) * 100.0,
        "severity_breakdown": sev,
        "validator_breakdown": val,
    }


def quality_score(success_rate: float) -> str:
    """Score buckets (summary_report.py:136-147)."""
    if success_rate >= 95:
        return "EXCELLENT"
    if success_rate >= 85:
        return "GOOD"
    if success_rate >= 70:
        return "FAIR"
    if success_rate >= 50:
        return "POOR"
    return "CRITICAL"


def top_issues(results: list[ValidationResult], limit: int = 10) -> list[ValidationResult]:
    """Failed results by (severity priority, -affected_rows) (summary_report.py:104-112)."""
    failed = [r for r in results if not r.passed]
    return sorted(
        failed, key=lambda r: (SEVERITY_PRIORITY.get(r.severity.value, 4), -r.affected_rows)
    )[:limit]


def severity_details(results: list[ValidationResult]) -> str:
    """Console detail view of FAILED rules grouped by severity (capability
    parity with the reference's per-severity result tables,
    /root/reference/src/data_quality/cli.py:407-501 — own layout, plain
    text): one section per severity in priority order, each failed rule
    with its column, affected/total counts, pass rate, message, and up to
    three detail samples (invalid values / orphans / dup combos) when the
    validator collected them. Empty string when nothing failed."""
    failed = [r for r in results if not r.passed]
    if not failed:
        return ""
    lines: list[str] = []
    by_sev: dict[str, list[ValidationResult]] = {}
    for r in failed:
        by_sev.setdefault(r.severity.value, []).append(r)
    for sev in sorted(by_sev, key=lambda s: SEVERITY_PRIORITY.get(s, 4)):
        rows = sorted(by_sev[sev], key=lambda r: -r.affected_rows)
        lines.append(f"[{sev}] {len(rows)} failed rule(s)")
        lines.append("-" * 50)
        for r in rows:
            col = r.column_name or "-"
            lines.append(
                f"  {r.rule_name}  (column: {col})"
                f"  affected {r.affected_rows:,}/{r.total_rows:,}"
                f"  pass_rate {r.pass_rate:.1f}%"
            )
            lines.append(f"    {r.message}")
            samples = next(
                (
                    r.details[key]
                    for key in (
                        "invalid_samples",
                        "orphaned_samples",
                        "duplicate_samples",
                        "sample_duplicates",
                    )
                    if r.details.get(key)
                ),
                None,
            )
            if samples:
                shown = ", ".join(repr(s) for s in list(samples)[:3])
                lines.append(f"    samples: {shown}")
        lines.append("")
    return "\n".join(lines)


def json_report(results: list[ValidationResult], table_name: str) -> dict[str, Any]:
    return {
        "report_type": "data_quality",
        "table_name": table_name,
        "generated_at": datetime.now().isoformat(),
        "summary": analyze_results(results),
        "results": [r.to_dict() for r in results],
    }


def txt_report(results: list[ValidationResult], table_name: str) -> str:
    s = analyze_results(results)
    lines = [
        "=" * 50,
        f"DATA QUALITY SUMMARY — {table_name}",
        "=" * 50,
        f"Quality score : {quality_score(s['success_rate'])} ({s['success_rate']:.1f}%)",
        f"Checks        : {s['passed_checks']} passed / {s['failed_checks']} failed"
        f" / {s['total_checks']} total",
        "",
        "SEVERITY BREAKDOWN",
        "-" * 18,
    ]
    for sev_name in ("CRITICAL", "ERROR", "WARNING", "INFO"):
        if sev_name in s["severity_breakdown"]:
            b = s["severity_breakdown"][sev_name]
            lines.append(f"{sev_name:9s}: {b['failed']} failed / {b['total']} total")
    lines += ["", "VALIDATOR BREAKDOWN", "-" * 19]
    for vname, b in sorted(s["validator_breakdown"].items()):
        lines.append(f"{vname:13s}: {b['passed']}/{b['total']} passed")
    issues = top_issues(results)
    if issues:
        lines += ["", "TOP ISSUES", "-" * 10]
        for i, r in enumerate(issues, 1):
            col = f"[{r.column_name}] " if r.column_name else ""
            lines.append(f"{i:2d}. {r.severity.value:8s} {col}{r.rule_name}")
            lines.append(f"    {r.message}")
            if r.affected_rows:
                lines.append(
                    f"    {r.affected_rows:,} / {r.total_rows:,} rows affected"
                    f" ({r.pass_rate:.1f}% pass rate)"
                )
    lines += ["", "=" * 50, "Report generated by rayquality"]
    return "\n".join(lines)


def html_report(results: list[ValidationResult], table_name: str) -> str:
    s = analyze_results(results)
    rows = "\n".join(
        f"<tr class='{'pass' if r.passed else 'fail'}'>"
        f"<td>{r.rule_name}</td><td>{r.column_name or ''}</td>"
        f"<td>{r.severity.value}</td><td>{'PASS' if r.passed else 'FAIL'}</td>"
        f"<td>{r.affected_rows:,}</td><td>{r.total_rows:,}</td>"
        f"<td>{r.pass_rate:.1f}%</td></tr>"
        for r in results
    )
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Data Quality — {table_name}</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
.cards {{ display: flex; gap: 1em; }}
.card {{ border: 1px solid #ccc; border-radius: 8px; padding: 1em; }}
table {{ border-collapse: collapse; margin-top: 1em; }}
td, th {{ border: 1px solid #ddd; padding: 4px 8px; }}
tr.fail {{ background: #ffe5e5; }}
tr.pass {{ background: #eaffea; }}
</style></head><body>
<h1>Data Quality Report — {table_name}</h1>
<div class="cards">
<div class="card"><b>Score</b><br>{quality_score(s["success_rate"])} ({s["success_rate"]:.1f}%)</div>
<div class="card"><b>Passed</b><br>{s["passed_checks"]}</div>
<div class="card"><b>Failed</b><br>{s["failed_checks"]}</div>
<div class="card"><b>Total</b><br>{s["total_checks"]}</div>
</div>
<table><tr><th>Rule</th><th>Column</th><th>Severity</th><th>Status</th>
<th>Affected</th><th>Total</th><th>Pass rate</th></tr>
{rows}
</table></body></html>"""


class ReportManager:
    """Multi-format generation with unified timestamped naming
    (core/report_manager.py:125-187)."""

    FORMATS = ("json", "txt", "html")

    def __init__(self, output_dir: str = "reports") -> None:
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

    def generate_unified_report(
        self,
        results: list[ValidationResult],
        table_name: str,
        formats: tuple[str, ...] = FORMATS,
    ) -> dict[str, str]:
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        paths = {}
        for fmt in formats:
            path = os.path.join(
                self.output_dir, f"data_quality_unified_{table_name}_{ts}.{fmt}"
            )
            if fmt == "json":
                with open(path, "w") as f:
                    json.dump(json_report(results, table_name), f, indent=1)
            elif fmt == "txt":
                with open(path, "w") as f:
                    f.write(txt_report(results, table_name))
            elif fmt == "html":
                with open(path, "w") as f:
                    f.write(html_report(results, table_name))
            else:
                raise ValueError(f"unknown report format {fmt!r}")
            paths[fmt] = path
        return paths
