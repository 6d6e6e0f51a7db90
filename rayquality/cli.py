"""Command-line interface (mirrors the reference CLI surface, cli.py in
/root/reference, over parquet/Lance directories instead of SQL databases).

Commands:
  analyze <table.parquet|dir>   run the validator engine + reports (reference
                                ``analyze``/``validate`` path)
  filter <corpus_dir>           run the flagship image quality-filter pipeline
  list-tables <dir>             tables with row counts, sorted desc (cli.py:48-132)
  describe-table <path>         schema + row count (cli.py:135-177)

This entry point owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ray_init(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def cmd_analyze(args: argparse.Namespace) -> int:
    _ray_init(args.num_cpus)
    import ray.data as rd

    from .engine import default_engine
    from .report import (
        ReportManager,
        analyze_results,
        quality_score,
        severity_details,
    )

    table_name = args.table or os.path.splitext(
        os.path.basename(args.path.rstrip("/"))
    )[0]
    ds = _read_input(args.path, args.source_format, args.table)
    custom = dict(kv.split("=", 1) for kv in (args.pattern or []))
    subset = args.validators.split(",") if args.validators else None
    relations = None
    if args.discover_fk:
        from .engine import discover_relations

        table_dir = os.path.dirname(os.path.abspath(args.path))
        rels = discover_relations(table_dir).get(table_name, [])
        relations = [
            (fk, rd.read_parquet(os.path.join(table_dir, f"{parent}.parquet")), pk)
            for fk, parent, pk in rels
        ]
    engine = default_engine(
        relations=relations, custom_patterns=custom or None, validators=subset
    )
    results = engine.validate_data(ds, table_name)
    summary = analyze_results(results)
    paths = ReportManager(args.output_dir).generate_unified_report(
        results, table_name, tuple(args.formats.split(","))
    )
    print(
        f"{table_name}: {summary['passed_checks']}/{summary['total_checks']} checks passed "
        f"({quality_score(summary['success_rate'])} {summary['success_rate']:.1f}%)"
    )
    if not args.quiet:
        detail = severity_details(results)
        if detail:
            print(detail)
    for fmt, p in paths.items():
        print(f"  {fmt}: {p}")
    return 0 if summary["failed_checks"] == 0 else 1


def cmd_filter(args: argparse.Namespace) -> int:
    _ray_init(args.num_cpus)
    from .config import QualityConfig, RunConfig
    from .pipeline import run

    cfg = RunConfig(
        output_dir=args.output_dir,
        resume=not args.no_resume,
        write_kept=not args.no_kept,
        quality=QualityConfig(),
    )
    summary = run(args.corpus_dir, cfg)
    print(json.dumps(summary, indent=1))
    return 0


def cmd_filter_docs(args: argparse.Namespace) -> int:
    _ray_init(args.num_cpus)
    from .textpipe import DocRunConfig, run_documents

    cfg = DocRunConfig(
        output_dir=args.output_dir,
        min_tokens=args.min_tokens,
        max_ppl=args.max_ppl,
        write_kept=not args.no_kept,
    )
    summary = run_documents(args.path, cfg)
    print(json.dumps(summary, indent=1))
    return 0


def _is_sqlite(path: str) -> bool:
    return path.endswith((".db", ".sqlite", ".sqlite3"))


_EXT_FORMAT = {
    "parquet": "parquet",
    "csv": "csv",
    "json": "json",
    "orc": "orc",
    "feather": "feather",
    "arrow": "arrow",
    "npy": "numpy",
    "db": "sqlite",
    "sqlite": "sqlite",
    "sqlite3": "sqlite",
}


def _read_input(path: str, fmt: str, table: str | None):
    """Resolve an analyze input through the source registry (the reference
    CLI analyzes any connector's table, not just one format). ``auto``
    infers from the extension and falls back to parquet (directories)."""
    import os as _os

    from . import sources

    if fmt == "auto":
        ext = _os.path.splitext(path.rstrip("/"))[1].lower().lstrip(".")
        fmt = _EXT_FORMAT.get(ext, "parquet")
    if fmt == "sqlite":
        if not table:
            raise SystemExit("--table is required for sqlite inputs")
        return sources.read_table(path, "sqlite", table=table)
    return sources.read_table(path, fmt)


def cmd_list_tables(args: argparse.Namespace) -> int:
    if _is_sqlite(args.dir):
        from . import sqlite_source as sq

        rows = [
            (t["table_name"], sq.row_count(args.dir, t["table_name"]))
            for t in sq.list_tables(args.dir)
        ]
    else:
        import pyarrow.parquet as pq

        rows = []
        for f in sorted(glob.glob(os.path.join(args.dir, "*.parquet"))):
            rows.append(
                (os.path.basename(f)[: -len(".parquet")], pq.read_metadata(f).num_rows)
            )
    for name, n in sorted(rows, key=lambda x: -x[1]):
        print(f"{name:20s} {n:>12,}")
    return 0


def cmd_describe(args: argparse.Namespace) -> int:
    if _is_sqlite(args.path):
        # reference describe-table surfaces is_nullable + column_default
        # (connectors/sqlite.py:52-77); FK lines mirror get_foreign_keys
        from . import sqlite_source as sq

        if not args.table:
            raise SystemExit("describe-table on a .db file needs --table NAME")
        print(f"rows: {sq.row_count(args.path, args.table):,}")
        for c in sq.table_info(args.path, args.table):
            null = "NULL" if c["is_nullable"] == "YES" else "NOT NULL"
            dflt = "-" if c["column_default"] is None else c["column_default"]
            print(
                f"  {c['column_name']:20s} {c['data_type'] or 'BLOB':18s} "
                f"{null:9s} default={dflt}"
            )
        for fk in sq.foreign_keys(args.path, args.table):
            print(
                f"  FK {fk['column_name']} -> "
                f"{fk['referenced_table']}.{fk['referenced_column']}"
            )
        return 0
    import pyarrow.parquet as pq

    md = pq.read_metadata(args.path)
    schema = pq.read_schema(args.path)
    print(f"rows: {md.num_rows:,}   row groups: {md.num_row_groups}")
    # nullability parity with the reference's describe-table
    # (connectors/mysql.py:42-67 surfaces is_nullable; parquet has no
    # column-default concept, so that field is always '-')
    for f in schema:
        null = "NULL" if f.nullable else "NOT NULL"
        print(f"  {f.name:20s} {f.type!s:18s} {null:9s} default=-")
    return 0


def cmd_audit(args) -> int:
    """Manifest-vs-disk integrity report; exit 1 if any wave fails."""
    import json as _json

    from .lineage import audit

    reports = audit(args.output_dir)
    for r in reports:
        print(_json.dumps(r))
    bad = [r for r in reports if not (r["files_ok"] and r["rows_ok"] and r["inputs_ok"])]
    print(f"waves={len(reports)} failed={len(bad)}")
    return 1 if bad or not reports else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rayquality")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("analyze", help="run data-quality validators on a parquet table")
    a.add_argument("path")
    a.add_argument("--output-dir", default="reports")
    a.add_argument("--formats", default="json,txt,html")
    a.add_argument("--pattern", action="append", help="column=regex custom rule")
    a.add_argument(
        "--quiet",
        action="store_true",
        help="suppress the per-severity failed-rule detail view",
    )
    a.add_argument(
        "--validators",
        default=None,
        help="comma-separated subset (completeness,duplicates,patterns,integrity)",
    )
    a.add_argument(
        "--discover-fk",
        action="store_true",
        help="auto-discover FK relations from sibling tables' *key columns",
    )
    a.add_argument(
        "--source-format",
        default="auto",
        help="input format from the source registry (auto = infer from "
        "extension: parquet/csv/json/orc/feather/arrow/numpy/sqlite)",
    )
    a.add_argument(
        "--table",
        default=None,
        help="table name inside a sqlite input (required for .db paths); "
        "also used as the report's table name",
    )
    a.set_defaults(fn=cmd_analyze)

    f = sub.add_parser("filter", help="run the image quality-filter pipeline")
    f.add_argument("corpus_dir")
    f.add_argument("--output-dir", default=None)
    f.add_argument("--no-resume", action="store_true")
    f.add_argument("--no-kept", action="store_true")
    f.set_defaults(fn=cmd_filter)

    fd = sub.add_parser("filter-docs", help="run the document quality-filter pipeline")
    fd.add_argument("path", help="documents parquet file or directory")
    fd.add_argument("--output-dir", default="/tmp/rayquality_docq_out")
    fd.add_argument("--min-tokens", type=int, default=5)
    fd.add_argument("--max-ppl", type=float, default=70.0)
    fd.add_argument("--no-kept", action="store_true")
    fd.set_defaults(fn=cmd_filter_docs)

    lt = sub.add_parser(
        "list-tables", help="list parquet (dir) or sqlite (.db) tables by row count"
    )
    lt.add_argument("dir")
    lt.set_defaults(fn=cmd_list_tables)

    d = sub.add_parser(
        "describe-table", help="schema + row count of a parquet table or sqlite --table"
    )
    d.add_argument("path")
    d.add_argument("--table", default=None, help="table name (sqlite .db files)")
    d.set_defaults(fn=cmd_describe)

    au = sub.add_parser(
        "audit", help="verify a pipeline output dir against its checkpoint manifest"
    )
    au.add_argument("output_dir")
    au.set_defaults(fn=cmd_audit)

    args = p.parse_args(argv)
    args.num_cpus = getattr(args, "num_cpus", None)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
