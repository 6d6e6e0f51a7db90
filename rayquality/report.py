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


_SEV_LABELS = {
    "critical": "Critical issues",
    "error": "Errors",
    "warning": "Warnings",
    "info": "Information",
}


def _result_rows(rs: list[ValidationResult]) -> str:
    from html import escape

    return "\n".join(
        f"<tr class='{'pass' if r.passed else 'fail'}'>"
        f"<td>{escape(r.rule_name)}</td><td>{escape(r.column_name or '—')}</td>"
        f"<td>{'PASS' if r.passed else 'FAIL'}</td>"
        f"<td class='num'>{r.affected_rows:,}</td><td class='num'>{r.total_rows:,}</td>"
        f"<td class='num'>{r.pass_rate:.1f}%</td>"
        f"<td class='msg'>{escape(r.message)}</td></tr>"
        for r in rs
    )


def html_report(results: list[ValidationResult], table_name: str) -> str:
    """Styled HTML report — capability parity with the reference's visual
    summary (reports/html_report.py:14-117 in /root/reference: timestamped
    header, summary cards, validator + severity breakdowns, per-severity
    result sections; own markup and CSS). Failed rules render open, passed
    ones inside a collapsed <details> so big tables stay scannable."""
    from datetime import datetime
    from html import escape

    s = analyze_results(results)
    score = quality_score(s["success_rate"])
    stamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S")

    vrows = "\n".join(
        f"<tr><td>{escape(v)}</td><td class='num'>{b['total']}</td>"
        f"<td class='num'>{b['passed']}</td><td class='num'>{b['failed']}</td>"
        f"<td class='num'>{100.0 * b['passed'] / b['total']:.1f}%</td></tr>"
        for v, b in sorted(s["validator_breakdown"].items())
    )
    srows = "\n".join(
        f"<tr><td>{escape(sev)}</td><td class='num'>{b['total']}</td>"
        f"<td class='num'>{b['passed']}</td><td class='num'>{b['failed']}</td></tr>"
        for sev, b in sorted(
            s["severity_breakdown"].items(),
            key=lambda kv: SEVERITY_PRIORITY.get(kv[0], 4),
        )
    )
    head = (
        "<tr><th>Rule</th><th>Column</th><th>Status</th><th>Affected</th>"
        "<th>Total</th><th>Pass rate</th><th>Message</th></tr>"
    )
    sections = []
    for sev in sorted(
        {r.severity.value for r in results}, key=lambda v: SEVERITY_PRIORITY.get(v, 4)
    ):
        sev_rs = [r for r in results if r.severity.value == sev]
        failed = [r for r in sev_rs if not r.passed]
        passed = [r for r in sev_rs if r.passed]
        label = _SEV_LABELS.get(sev.lower(), sev)
        body = ""
        if failed:
            body += f"<table>{head}{_result_rows(failed)}</table>"
        if passed:
            body += (
                f"<details><summary>{len(passed)} passed check(s)</summary>"
                f"<table>{head}{_result_rows(passed)}</table></details>"
            )
        sections.append(
            f"<section class='sev-{escape(sev.lower())}'><h3>{escape(label)}"
            f"<span class='count'>{len(failed)} failed / {len(sev_rs)}</span></h3>"
            f"{body}</section>"
        )

    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1.0">
<title>Data Quality — {escape(table_name)}</title>
<style>
body {{ font-family: -apple-system, 'Segoe UI', sans-serif; margin: 0;
       background: #f5f6f8; color: #1c2330; }}
.container {{ max-width: 960px; margin: 0 auto; padding: 2em 1.5em; }}
header h1 {{ margin: 0 0 .1em; font-size: 1.7em; }}
header .timestamp {{ color: #6b7485; margin: 0 0 1.5em; }}
.cards {{ display: flex; gap: 1em; flex-wrap: wrap; margin-bottom: 1.5em; }}
.card {{ flex: 1 1 130px; background: #fff; border-radius: 10px;
        padding: .9em 1.1em; box-shadow: 0 1px 3px rgba(20,30,50,.08);
        border-top: 4px solid #9aa4b5; }}
.card h4 {{ margin: 0 0 .3em; font-size: .75em; text-transform: uppercase;
           letter-spacing: .06em; color: #6b7485; }}
.card .metric {{ font-size: 1.6em; font-weight: 700; }}
.card.score {{ border-top-color: #4362d6; }}
.card.ok {{ border-top-color: #2e9e5b; }}
.card.bad {{ border-top-color: #d64545; }}
section {{ background: #fff; border-radius: 10px; padding: 1em 1.2em;
          margin-bottom: 1.2em; box-shadow: 0 1px 3px rgba(20,30,50,.08); }}
section h3 {{ margin: .1em 0 .6em; font-size: 1.05em; }}
section h3 .count {{ float: right; font-weight: 400; color: #6b7485;
                    font-size: .85em; }}
.sev-critical h3 {{ color: #8e1f1f; }} .sev-error h3 {{ color: #d64545; }}
.sev-warning h3 {{ color: #b07d1a; }} .sev-info h3 {{ color: #4362d6; }}
table {{ border-collapse: collapse; width: 100%; font-size: .88em; }}
td, th {{ border-bottom: 1px solid #e6e9ef; padding: 5px 8px; text-align: left; }}
th {{ color: #6b7485; font-size: .85em; text-transform: uppercase;
     letter-spacing: .04em; }}
td.num {{ text-align: right; font-variant-numeric: tabular-nums; }}
td.msg {{ color: #4a5468; }}
tr.fail td:nth-child(3) {{ color: #d64545; font-weight: 700; }}
tr.pass td:nth-child(3) {{ color: #2e9e5b; font-weight: 700; }}
details summary {{ cursor: pointer; color: #4362d6; margin: .4em 0; }}
footer {{ color: #6b7485; text-align: center; padding: 1em 0 2em;
         font-size: .85em; }}
</style></head><body><div class="container">
<header>
<h1>Data Quality Report — {escape(table_name)}</h1>
<p class="timestamp">Generated on {stamp}</p>
</header>
<div class="cards">
<div class="card score"><h4>Score</h4><div class="metric">{score}</div>
{s["success_rate"]:.1f}% success</div>
<div class="card"><h4>Total checks</h4><div class="metric">{s["total_checks"]}</div></div>
<div class="card ok"><h4>Passed</h4><div class="metric">{s["passed_checks"]}</div></div>
<div class="card bad"><h4>Failed</h4><div class="metric">{s["failed_checks"]}</div></div>
</div>
<section><h3>By validator</h3>
<table><tr><th>Validator</th><th>Total</th><th>Passed</th><th>Failed</th>
<th>Pass rate</th></tr>
{vrows}
</table></section>
<section><h3>By severity</h3>
<table><tr><th>Severity</th><th>Total</th><th>Passed</th><th>Failed</th></tr>
{srows}
</table></section>
{"".join(sections)}
<footer>Report generated by rayquality</footer>
</div></body></html>"""


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
