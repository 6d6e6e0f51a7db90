"""Reference-compatible validation engine over Ray Data datasets.

Mirrors the reference's user-facing object model — ``Severity``,
``ValidationResult`` (``src/data_quality/validators/base.py:12-74`` in
/root/reference), validator registry + sequential fan-out with per-validator
error isolation (``validators/base.py:156-212``) — while each validator's
arithmetic executes distributed via :mod:`rayquality.ops.validators`.
A user of the reference can point this engine at a parquet table and get the
same rule results and reports.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum
from typing import Any

import numpy as np
import ray.data as rd

from .ops import validators as vops
from .rules.validity import BUILTIN_PATTERNS, detect_pattern_type


class Severity(Enum):
    INFO = "INFO"
    WARNING = "WARNING"
    ERROR = "ERROR"
    CRITICAL = "CRITICAL"


@dataclass
class ValidationResult:
    """Per-rule outcome (validators/base.py:21-41 field-for-field)."""

    rule_name: str
    table_name: str
    column_name: str | None
    severity: Severity
    passed: bool
    message: str
    details: dict[str, Any] = field(default_factory=dict)
    timestamp: datetime = field(default_factory=datetime.now)
    affected_rows: int = 0
    total_rows: int = 0
    validator: str = "unknown"  # explicit (reference sniffs it from rule_name)

    @property
    def pass_rate(self) -> float:
        if self.total_rows == 0:
            return 100.0
        return ((self.total_rows - self.affected_rows) / self.total_rows) * 100.0

    def to_dict(self) -> dict[str, Any]:
        return {
            "rule_name": self.rule_name,
            "table_name": self.table_name,
            "column_name": self.column_name,
            "severity": self.severity.value,
            "passed": self.passed,
            "message": self.message,
            "details": _to_native(self.details),
            "timestamp": self.timestamp.isoformat(),
            "affected_rows": int(self.affected_rows),
            "total_rows": int(self.total_rows),
            "pass_rate": float(self.pass_rate),
            "validator": self.validator,
        }


def _to_native(obj: Any) -> Any:
    """numpy -> python for JSON (validators/base.py:43-74 semantics)."""
    if isinstance(obj, dict):
        return {k: _to_native(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_native(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    return obj


def _string_columns(ds: rd.Dataset) -> list[str]:
    import pyarrow as pa

    sch = ds.schema()
    out = []
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                out.append(name)
        elif getattr(typ, "__name__", str(typ)) in ("object", "str", "string"):
            # pandas-block schema reports python classes, not Arrow types
            out.append(name)
    return out


class CompletenessValidator:
    """Null-ratio rule per column (validators/completeness.py:98-137)."""

    name = "completeness"

    def __init__(self, threshold: float = 0.95, columns: list[str] | None = None) -> None:
        if not 0.0 <= threshold <= 1.0:
            raise ValueError("threshold must be between 0 and 1")
        self.threshold = threshold
        self.columns = columns

    def validate(self, ds: rd.Dataset, table_name: str) -> list[ValidationResult]:
        cols = self.columns or list(ds.schema().names)
        stats = vops.completeness(ds, cols, self.threshold).to_pandas()
        out = []
        for _, r in stats.iterrows():
            out.append(
                ValidationResult(
                    rule_name=f"completeness_{r['column_name']}",
                    table_name=table_name,
                    column_name=r["column_name"],
                    severity=Severity.WARNING,
                    passed=bool(r["passed"]),
                    message=(
                        f"Column '{r['column_name']}' completeness "
                        f"{r['complete_ratio']:.2%} (threshold {self.threshold:.0%})"
                    ),
                    details={
                        "null_count": int(r["null_count"]),
                        "completeness_ratio": float(r["complete_ratio"]),
                        "threshold": self.threshold,
                    },
                    affected_rows=int(r["null_count"]),
                    total_rows=int(r["total_rows"]),
                    validator="completeness",
                )
            )
        return out


# column-name triage for uniqueness checks (duplicates.py:431-460 semantics:
# explicit force/allow lists win; then unique-ish name patterns force the
# check; then skip patterns suppress it; default = validate)
DEFAULT_UNIQUE_PATTERNS = ("cpf", "cnpj", "codigo", "sku", "login", "slug", "serial")
DEFAULT_SKIP_PATTERNS = (
    "_id", "fk_", "uuid", "email", "name", "nome", "status", "type", "tipo",
    "flag", "date", "created", "updated", "price", "valor", "total", "count",
)


def _env_csv(name: str) -> tuple[str, ...]:
    """Comma-split env list (reference duplicates.py:45-70: empty/unset
    falls through to the defaults)."""
    import os

    return tuple(p.strip() for p in os.getenv(name, "").split(",") if p.strip())


class DuplicatesValidator:
    """Distinct-count rule (duplicates.py:263-320) with name-triage (M9)."""

    name = "duplicates"

    def __init__(
        self,
        max_duplicates: int = 0,
        columns: list[str] | None = None,
        force_unique_columns: set[str] | None = None,
        allow_duplicate_columns: set[str] | None = None,
        unique_patterns: tuple[str, ...] = DEFAULT_UNIQUE_PATTERNS,
        skip_patterns: tuple[str, ...] = DEFAULT_SKIP_PATTERNS,
    ) -> None:
        if max_duplicates < 0:
            raise ValueError("max_duplicates must be >= 0")
        self.max_duplicates = max_duplicates
        self.columns = columns
        # env overrides (duplicates.py:45-152): SKIP_DUPLICATE_PATTERNS /
        # FORCE_UNIQUE_PATTERNS replace the default pattern lists when set;
        # FORCE_UNIQUE_COLUMNS / ALLOW_DUPLICATE_COLUMNS add explicit names.
        # Constructor args still win (config-over-env, SURVEY §2.1 M9): env
        # only substitutes where the caller left the defaults.
        env_unique, env_skip = _env_csv("FORCE_UNIQUE_PATTERNS"), _env_csv(
            "SKIP_DUPLICATE_PATTERNS"
        )
        if unique_patterns == DEFAULT_UNIQUE_PATTERNS and env_unique:
            unique_patterns = env_unique
        if skip_patterns == DEFAULT_SKIP_PATTERNS and env_skip:
            skip_patterns = env_skip
        self.force = {c.lower() for c in (force_unique_columns or set())} | {
            c.lower() for c in _env_csv("FORCE_UNIQUE_COLUMNS")
        }
        self.allow = {c.lower() for c in (allow_duplicate_columns or set())} | {
            c.lower() for c in _env_csv("ALLOW_DUPLICATE_COLUMNS")
        }
        self.unique_patterns = unique_patterns
        self.skip_patterns = skip_patterns

    def should_validate(self, column: str) -> bool:
        low = column.lower()
        if low in self.force:
            return True
        if low in self.allow:
            return False
        if any(p in low for p in self.unique_patterns):
            return True
        if any(p in low for p in self.skip_patterns):
            return False
        return True

    def validate(self, ds: rd.Dataset, table_name: str) -> list[ValidationResult]:
        cols = [
            c for c in (self.columns or list(ds.schema().names)) if self.should_validate(c)
        ]
        if not cols:
            return []
        # ONE pass + one shuffle for every triaged column (VERDICT r1 item 7),
        # not C sequential groupby jobs
        tbl = vops.multi_duplicates(ds, cols, self.max_duplicates).to_pandas()
        out = []
        for _, r in tbl.iterrows():
            col = r["column_name"]
            out.append(
                ValidationResult(
                    rule_name=f"uniqueness_{col}",
                    table_name=table_name,
                    column_name=col,
                    severity=Severity.ERROR,
                    passed=bool(r["passed"]),
                    message=(
                        f"Column '{col}': {int(r['duplicate_count'])} duplicate values "
                        f"(max allowed {self.max_duplicates})"
                    ),
                    details={
                        "distinct_count": int(r["distinct_count"]),
                        "duplicate_count": int(r["duplicate_count"]),
                        "max_duplicates": self.max_duplicates,
                    },
                    affected_rows=int(r["duplicate_count"]),
                    total_rows=int(r["total_rows"]),
                    validator="duplicates",
                )
            )
        return out


class PatternsValidator:
    """Regex/checksum validity (patterns.py:203-296): auto-detects the
    pattern type from column names; custom regex rules supported."""

    name = "patterns"

    def __init__(self, custom_rules: dict[str, str] | None = None) -> None:
        # {column: regex} user rules (patterns.py:179-196)
        self.custom_rules = custom_rules or {}

    def validate(self, ds: rd.Dataset, table_name: str) -> list[ValidationResult]:
        from .rules.validity import VALIDATORS

        # triage every string column first, then run ONE fused pass for all
        # regex + checksum rules (previously one full read per column)
        regex_specs: dict[str, str] = {}
        checksum_specs: dict[str, Any] = {}
        ptype_of: dict[str, str] = {}
        for col in _string_columns(ds):
            if col in self.custom_rules:
                ptype_of[col] = "regex"
                regex_specs[col] = self.custom_rules[col]
                continue
            detected = detect_pattern_type(col)
            if detected in ("email", "phone", "cep"):
                key = {"phone": "phone_br"}.get(detected, detected)
                ptype_of[col] = detected
                regex_specs[col] = BUILTIN_PATTERNS[key].strip("^$")
            elif detected in ("cpf", "cnpj"):
                ptype_of[col] = detected
                checksum_specs[col] = VALIDATORS[detected]
        if not ptype_of:
            return []
        tbl = vops.multi_pattern_validity(
            ds, regex_specs, checksum_specs, with_samples=True
        ).to_pandas()
        out = []
        for _, r in tbl.iterrows():
            col = r["column_name"]
            ptype = ptype_of[col]
            invalid = int(r["invalid_count"])
            out.append(
                ValidationResult(
                    rule_name=f"pattern_{ptype}_{col}",
                    table_name=table_name,
                    column_name=col,
                    severity=Severity.ERROR,
                    passed=invalid == 0,
                    message=f"Column '{col}': {invalid} values fail {ptype} pattern",
                    # <= 10 sample invalid values (reference patterns.py:230-231)
                    details={
                        "pattern_type": ptype,
                        "invalid_count": invalid,
                        "invalid_samples": list(r["invalid_samples"]),
                    },
                    affected_rows=invalid,
                    total_rows=int(r["total_rows"]),
                    validator="patterns",
                )
            )
        return out


class IntegrityValidator:
    """FK membership via broadcast anti-join (integrity.py:120-276)."""

    name = "integrity"

    def __init__(
        self, relations: list[tuple[str, rd.Dataset, str]], allow_nulls: bool = True
    ) -> None:
        # [(fk_column, reference dataset, reference column)]
        self.relations = relations
        self.allow_nulls = allow_nulls

    def validate(self, ds: rd.Dataset, table_name: str) -> list[ValidationResult]:
        out = []
        for fk_col, ref_ds, ref_col in self.relations:
            r = (
                vops.integrity(ds, fk_col, ref_ds, ref_col, self.allow_nulls, with_samples=True)
                .to_pandas()
                .iloc[0]
            )
            invalid = int(r["orphaned_count"]) + (
                0 if self.allow_nulls else int(r["null_count"])
            )
            out.append(
                ValidationResult(
                    rule_name=f"fk_{fk_col}_refs_{ref_col}",
                    table_name=table_name,
                    column_name=fk_col,
                    severity=Severity.CRITICAL,
                    passed=bool(r["passed"]),
                    message=(
                        f"FK '{fk_col}': {int(r['orphaned_count'])} orphaned values "
                        f"(integrity {float(r['integrity_ratio']):.2%})"
                    ),
                    # <= 10 sample orphaned values (reference integrity.py:234)
                    details={
                        "orphaned_count": int(r["orphaned_count"]),
                        "null_count": int(r["null_count"]),
                        "integrity_ratio": float(r["integrity_ratio"]),
                        "orphaned_samples": list(r["orphaned_samples"]),
                    },
                    affected_rows=invalid,
                    total_rows=int(r["total_rows"]),
                    validator="integrity",
                )
            )
        return out


class ValidationEngine:
    """Named-validator registry + sequential fan-out with error isolation
    (validators/base.py:156-212): one failing validator becomes a CRITICAL
    result; the run continues."""

    def __init__(self) -> None:
        self.validators: dict[str, Any] = {}

    def register_validator(self, name: str, validator: Any) -> None:
        self.validators[name] = validator

    def validate_data(self, ds: rd.Dataset, table_name: str) -> list[ValidationResult]:
        results: list[ValidationResult] = []
        for name, validator in self.validators.items():
            try:
                results.extend(validator.validate(ds, table_name))
            except Exception as exc:  # noqa: BLE001 — error isolation by design
                results.append(
                    ValidationResult(
                        rule_name=f"{name}_error",
                        table_name=table_name,
                        column_name=None,
                        severity=Severity.CRITICAL,
                        passed=False,
                        message=f"Validator '{name}' failed: {exc}",
                        details={"error": str(exc)},
                        validator=name,
                    )
                )
        return results


def discover_relations(dir_path: str) -> dict[str, list[tuple[str, str, str]]]:
    """FK auto-discovery over a DIRECTORY of parquet tables — the catalog
    analog of the reference's ``information_schema.key_column_usage`` scan
    (validators/integrity.py:306-362 in /root/reference), which has no
    equivalent in a lake of files, so relations are sniffed from the
    ubiquitous ``<prefix>_<name>key`` naming convention:

      * a column whose name ends in ``key`` has suffix s (text after the
        first ``_``, e.g. ``o_custkey`` -> ``custkey``)
      * the PARENT of suffix s is the table whose name starts with
        s minus the ``key`` tail (``custkey`` -> ``customer``) and which
        itself has a column with suffix s (its PK)
      * every OTHER table holding a column with suffix s gets an FK
        relation to that parent

    Returns {child_table: [(fk_column, parent_table, parent_column), ...]}.
    Only schema metadata is read — no data IO.
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    cols: dict[str, list[str]] = {}
    for f in sorted(_glob.glob(_os.path.join(dir_path, "*.parquet"))):
        name = _os.path.basename(f)[: -len(".parquet")]
        cols[name] = _pq.read_schema(f).names
    suffix_of = lambda c: c.split("_", 1)[1] if "_" in c else c  # noqa: E731
    # parents per suffix: EVERY table whose own name matches the non-empty
    # suffix stem (keeping all matches — not last-wins — so the result is
    # deterministic and identical to the information_schema SQL analog,
    # which joins every matching parent row; a bare 'key' suffix has an
    # empty stem and is ignored on both sides)
    parents: dict[str, list[tuple[str, str]]] = {}
    for t, cs in cols.items():
        for c in cs:
            s = suffix_of(c)
            stem = s[: -len("key")]
            if s.endswith("key") and stem and t.startswith(stem):
                parents.setdefault(s, []).append((t, c))
    out: dict[str, list[tuple[str, str, str]]] = {}
    for t, cs in cols.items():
        rels = []
        for c in cs:
            for p_t, p_c in parents.get(suffix_of(c), []):
                if p_t != t:
                    rels.append((c, p_t, p_c))
        if rels:
            out[t] = rels
    return out


def default_engine(
    relations: list[tuple[str, rd.Dataset, str]] | None = None,
    custom_patterns: dict[str, str] | None = None,
    validators: list[str] | None = None,
) -> ValidationEngine:
    """The reference's default validator set (core/orchestrator.py:67-78).

    ``validators`` subsets the registry by name (reference
    cli.py:256-270 ``validate --validators completeness,duplicates``);
    None/empty registers everything. Unknown names raise."""
    known = ("completeness", "duplicates", "patterns", "integrity")
    if validators:
        bad = set(validators) - set(known)
        if bad:
            raise ValueError(f"unknown validators: {sorted(bad)} (known: {list(known)})")

    def wanted(name: str) -> bool:
        return not validators or name in validators

    eng = ValidationEngine()
    if wanted("completeness"):
        eng.register_validator("completeness", CompletenessValidator())
    if wanted("duplicates"):
        eng.register_validator("duplicates", DuplicatesValidator())
    if wanted("patterns"):
        eng.register_validator("patterns", PatternsValidator(custom_patterns))
    if relations and wanted("integrity"):
        eng.register_validator("integrity", IntegrityValidator(relations))
    return eng
