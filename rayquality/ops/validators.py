"""Reference validator suite as distributed Ray Data operators.

Each operator mirrors the decision arithmetic of a reference validator
(citations into /root/reference) but executes as vectorized partial
aggregation inside ``map_batches`` with a tiny driver-side combine — never a
full shuffle when a sum decomposes (SURVEY.md §2.5 A1), and a skinny
``groupby`` only where distinctness genuinely requires one (A2-A4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _fold(sum_cols: list[str], sample_col: str | None = None, key_col: str | None = None):
    """Intermediate partial-merge stage: collapses up to ``batch_size``
    per-batch partial rows into one row (or one per key) so the driver
    collects O(n_batches / 1024) rows, not one per batch — the same
    arithmetic the driver-side combine applies, pushed into the tree.
    Sample-list columns merge as the 10 smallest (deterministic under any
    arrival order)."""

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        def merge(g: pd.DataFrame) -> dict:
            row = {c: g[c].sum() for c in sum_cols}
            if sample_col is not None:
                row[sample_col] = sorted(v for lst in g[sample_col] for v in lst)[:10]
            return row

        if key_col is None:
            return pd.DataFrame([merge(df)])
        # key cardinality is tiny (one row per validated column)
        return pd.DataFrame(
            [{key_col: k, **merge(g)} for k, g in df.groupby(key_col, sort=False)]
        )

    return fold


def completeness(ds: rd.Dataset, columns: list[str], threshold: float = 0.95) -> pa.Table:
    """Per-column null tally (validators/completeness.py:98-120): partial
    ``pc.is_null`` sums per batch, final add on the driver."""

    def per_batch(t: pa.Table) -> pa.Table:
        nulls = [int(pc.sum(pc.is_null(t[c]).cast(pa.int64())).as_py() or 0) for c in columns]
        return pa.table(
            {
                "column_name": pa.array(columns),
                "null_count": pa.array(nulls, pa.int64()),
                "total_rows": pa.array([t.num_rows] * len(columns), pa.int64()),
            }
        )

    parts = (
        ds.select_columns(columns)
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(
            _fold(["null_count", "total_rows"], key_col="column_name"),
            batch_size=1024,
            batch_format="pandas",
        )
        .to_pandas()
    )
    agg = parts.groupby("column_name", as_index=False).sum().sort_values("column_name")
    total = agg["total_rows"].to_numpy()
    nulls = agg["null_count"].to_numpy()
    ratio = np.where(total > 0, (total - nulls) / np.maximum(total, 1), 1.0)
    return pa.table(
        {
            "column_name": pa.array(agg["column_name"]),
            "total_rows": pa.array(total, pa.int64()),
            "null_count": pa.array(nulls, pa.int64()),
            "complete_ratio": pa.array(ratio, pa.float64()),
            "passed": pa.array(ratio >= threshold),
        }
    )


def duplicates(ds: rd.Dataset, column: str, max_duplicates: int = 0) -> pa.Table:
    """Single-column duplicate stats (validators/duplicates.py:263-285).

    Null semantics follow the reference's ``ignore_nulls=True`` default:
    nulls are excluded from distinct/duplicate arithmetic and surfaced as a
    separate ``null_count`` (``duplicate_count = nonnull_total - nunique``).
    Thin wrapper over :func:`multi_duplicates` (one column)."""
    return multi_duplicates(ds, [column], max_duplicates)


def multi_duplicates(
    ds: rd.Dataset, columns: list[str], max_duplicates: int = 0
) -> pa.Table:
    """Distinct/duplicate stats for MANY columns in ONE pass + ONE shuffle.

    Each batch pre-deduplicates per column (``pc.value_counts``) and emits
    skinny (col, val-as-string, cnt) partials; a single
    ``groupby(col, val)`` combines them; a final vectorized scan of the
    (small) per-value table yields total/null/distinct per column. A
    C-column table therefore costs one read pass, not C sequential groupby
    jobs (VERDICT r1 item 7). The string cast of values is per-column
    injective (grouping never crosses columns), so counts are exact.
    """

    def explode(t: pa.Table) -> pa.Table:
        tbls = []
        for c in columns:
            vc = pc.value_counts(t[c].combine_chunks())
            tbls.append(
                pa.table(
                    {
                        "col": pa.array([c] * len(vc), pa.string()),
                        "val": vc.field("values").cast(pa.string()),
                        "cnt": vc.field("counts").cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tbls)

    from .combine import combine_partials

    counts = combine_partials(
        ds.select_columns(columns).map_batches(explode, batch_format="pyarrow"),
        keys=["col", "val"],
        sums=["cnt"],
    )

    def reduce_counts(t: pa.Table) -> pa.Table:
        isnull = pc.is_null(t["val"])
        nullcnt = pc.if_else(isnull, t["cnt"], pa.scalar(0, pa.int64()))
        g = pa.table(
            {
                "col": t["col"],
                "total": t["cnt"],
                "nulls": nullcnt,
                "distinct": pc.invert(isnull).cast(pa.int64()),
            }
        ).group_by("col").aggregate([("total", "sum"), ("nulls", "sum"), ("distinct", "sum")])
        return g.rename_columns(["col", "total", "nulls", "distinct"])

    parts = (
        counts.map_batches(reduce_counts, batch_format="pyarrow")
        .map_batches(
            _fold(["total", "nulls", "distinct"], key_col="col"),
            batch_size=1024,
            batch_format="pandas",
        )
        .to_pandas()
    )
    agg = parts.groupby("col", as_index=False).sum()
    by_col = {r["col"]: r for _, r in agg.iterrows()}
    rows = []
    for c in columns:
        r = by_col.get(c)
        total = int(r["total"]) if r is not None else 0
        nulls = int(r["nulls"]) if r is not None else 0
        distinct = int(r["distinct"]) if r is not None else 0
        dup = total - nulls - distinct
        rows.append((c, total, nulls, distinct, dup, dup <= max_duplicates))
    return pa.table(
        {
            "column_name": pa.array([r[0] for r in rows]),
            "total_rows": pa.array([r[1] for r in rows], pa.int64()),
            "null_count": pa.array([r[2] for r in rows], pa.int64()),
            "distinct_count": pa.array([r[3] for r in rows], pa.int64()),
            "duplicate_count": pa.array([r[4] for r in rows], pa.int64()),
            "passed": pa.array([r[5] for r in rows]),
        }
    )


def duplicate_values(ds: rd.Dataset, column: str, limit: int = 10) -> pa.Table:
    """Top duplicated values (validators/duplicates.py:302-310): groupby ->
    count>1 -> deterministic (count desc, value asc) top-k."""
    counts = ds.select_columns([column]).groupby(column).count()

    def block_topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["count()"], 1))
        idx = pc.sort_indices(t, sort_keys=[("count()", "descending"), (column, "ascending")])
        return t.take(idx[:limit])

    top = (
        counts.map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
        .rename(columns={"count()": "cnt"})
        .sort_values(["cnt", column], ascending=[False, True])
        .head(limit)
    )
    return pa.table({"value": pa.array(top[column]), "cnt": pa.array(top["cnt"], pa.int64())})


def composite_duplicates(ds: rd.Dataset, columns: list[str], max_duplicates: int = 0) -> pa.Table:
    """Composite-key duplicates (validators/duplicates.py:341-429):
    total - distinct key combos. Distinctness via per-batch dedup ->
    key-hash partition -> per-partition dedup (ops.combine) — no
    multi-column sort shuffle."""
    from .combine import distinct_count

    total = ds.count()
    distinct = distinct_count(ds.select_columns(columns), columns)
    dup = total - distinct
    return pa.table(
        {
            "key": pa.array(["+".join(columns)]),
            "total_rows": pa.array([total], pa.int64()),
            "distinct_count": pa.array([distinct], pa.int64()),
            "duplicate_count": pa.array([dup], pa.int64()),
            "passed": pa.array([dup <= max_duplicates]),
        }
    )


def pattern_validity(
    ds: rd.Dataset, column: str, regex: str, allow_nulls: bool = True,
    with_samples: bool = False,
) -> pa.Table:
    """Anchored-regex validity counts (validators/patterns.py:203-234):
    null/empty counts valid iff ``allow_nulls``; non-null values are
    stripped then anchored-matched — vectorized RE2 per batch, summed on
    the driver (same null semantics as the CPF/CNPJ checksum path).
    ``with_samples`` appends an ``invalid_samples`` list column (<= 10
    values, reference O4 parity)."""

    def per_batch(t: pa.Table) -> pa.Table:
        col = pc.cast(t[column], pa.string())
        stripped = pc.utf8_trim_whitespace(pc.fill_null(col, ""))
        nullish = pc.or_(pc.is_null(col), pc.equal(stripped, ""))
        m = pc.match_substring_regex(stripped, f"^(?:{regex})$")
        ok = pc.if_else(nullish, pa.scalar(allow_nulls), m)
        valid = int(pc.sum(ok.cast(pa.int64())).as_py() or 0)
        # <= 10 sample invalid values per batch (reference patterns.py:230-231
        # keeps the first 10 seen; we keep the 10 SMALLEST so the samples are
        # deterministic under any partitioning/arrival order)
        bad = pc.drop_null(pc.if_else(ok, pa.scalar(None, pa.string()), stripped))
        bad = bad.combine_chunks() if isinstance(bad, pa.ChunkedArray) else bad
        samples = bad.take(pc.sort_indices(bad)[:10])
        return pa.table(
            {
                "total_rows": pa.array([t.num_rows], pa.int64()),
                "valid_count": pa.array([valid], pa.int64()),
                "samples": pa.array([samples.to_pylist()], pa.list_(pa.string())),
            }
        )

    parts = (
        ds.select_columns([column])
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(
            _fold(["total_rows", "valid_count"], sample_col="samples"),
            batch_size=1024,
            batch_format="pandas",
        )
        .to_pandas()
    )
    total = int(parts["total_rows"].sum())
    valid = int(parts["valid_count"].sum())
    out = {
        "column_name": pa.array([column]),
        "total_rows": pa.array([total], pa.int64()),
        "valid_count": pa.array([valid], pa.int64()),
        "invalid_count": pa.array([total - valid], pa.int64()),
        "passed": pa.array([total - valid == 0]),
    }
    if with_samples:
        samples = sorted(v for lst in parts["samples"] for v in lst)[:10]
        out["invalid_samples"] = pa.array([samples], pa.list_(pa.string()))
    return pa.table(out)


def multi_pattern_validity(
    ds: rd.Dataset,
    regex_specs: dict[str, str],
    checksum_specs: dict[str, "object"] | None = None,
    allow_nulls: bool = True,
    with_samples: bool = True,
) -> pa.Table:
    """Validity counts + <=10 sample invalid values for MANY pattern rules
    in ONE pass (C validated columns used to cost C full reads in the
    engine). ``regex_specs``: {column: anchored-regex};
    ``checksum_specs``: {column: pandas mask fn} (CPF/CNPJ kernels).
    Null/blank handling matches :func:`pattern_validity`."""
    checksum_specs = checksum_specs or {}
    cols = list(regex_specs) + [c for c in checksum_specs if c not in regex_specs]

    def per_batch(t: pa.Table) -> pa.Table:
        names, totals, valids, samples = [], [], [], []
        for c, regex in regex_specs.items():
            col = pc.cast(t[c], pa.string())
            stripped = pc.utf8_trim_whitespace(pc.fill_null(col, ""))
            nullish = pc.or_(pc.is_null(col), pc.equal(stripped, ""))
            m = pc.match_substring_regex(stripped, f"^(?:{regex})$")
            ok = pc.if_else(nullish, pa.scalar(allow_nulls), m)
            names.append(c)
            totals.append(t.num_rows)
            valids.append(int(pc.sum(ok.cast(pa.int64())).as_py() or 0))
            bad = pc.drop_null(pc.if_else(ok, pa.scalar(None, pa.string()), stripped))
            bad = bad.combine_chunks() if isinstance(bad, pa.ChunkedArray) else bad
            samples.append(bad.take(pc.sort_indices(bad)[:10]).to_pylist())
        for c, fn in checksum_specs.items():
            vals = pd.Series(t[c].to_pylist(), dtype="object")
            mask = fn(vals)  # True = valid (kernels handle null semantics)
            names.append(c)
            totals.append(t.num_rows)
            valids.append(int(mask.sum()))
            bad_vals = sorted(str(v) for v in vals[~mask].dropna())[:10]
            samples.append(bad_vals)
        return pa.table(
            {
                "column_name": pa.array(names, pa.string()),
                "total_rows": pa.array(totals, pa.int64()),
                "valid_count": pa.array(valids, pa.int64()),
                "samples": pa.array(samples, pa.list_(pa.string())),
            }
        )

    parts = (
        ds.select_columns(cols)
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(
            _fold(
                ["total_rows", "valid_count"],
                sample_col="samples",
                key_col="column_name",
            ),
            batch_size=1024,
            batch_format="pandas",
        )
        .to_pandas()
    )
    agg = parts.groupby("column_name", as_index=False).agg(
        total_rows=("total_rows", "sum"),
        valid_count=("valid_count", "sum"),
        samples=("samples", lambda ls: sorted(v for lst in ls for v in lst)[:10]),
    )
    agg = agg.set_index("column_name").reindex(cols).reset_index()
    # an empty/absent column (zero batches) reports 0 rows, passed=True —
    # the reindex fills NaN which int casting would otherwise reject
    agg["total_rows"] = agg["total_rows"].fillna(0)
    agg["valid_count"] = agg["valid_count"].fillna(0)
    agg["samples"] = agg["samples"].apply(lambda v: v if isinstance(v, list) else [])
    out = {
        "column_name": pa.array(agg["column_name"], pa.string()),
        "total_rows": pa.array(agg["total_rows"].astype(np.int64)),
        "valid_count": pa.array(agg["valid_count"].astype(np.int64)),
        "invalid_count": pa.array(
            (agg["total_rows"] - agg["valid_count"]).astype(np.int64)
        ),
        "passed": pa.array((agg["total_rows"] == agg["valid_count"]).to_numpy()),
    }
    if with_samples:
        out["invalid_samples"] = pa.array(list(agg["samples"]), pa.list_(pa.string()))
    return pa.table(out)


def integrity(
    ds: rd.Dataset,
    fk_column: str,
    ref_ds: rd.Dataset,
    ref_column: str,
    allow_nulls: bool = True,
    with_samples: bool = False,
) -> pa.Table:
    """FK membership — the reference's only join, a broadcast anti-join
    (validators/integrity.py:120-276): distinct reference keys are built
    once, ``ray.put`` into the object store, and each batch membership-tests
    against the broadcast set. No shuffle of the big side.
    ``with_samples`` appends an ``orphaned_samples`` list column (<= 10
    values — the reference keeps the first 10 seen, integrity.py:234; we
    keep the 10 smallest for partitioning-independent determinism)."""
    ref_keys = ref_ds.select_columns([ref_column]).unique(ref_column)
    ref_ref = ray.put(np.asarray(ref_keys))

    def per_batch(t: pa.Table) -> pa.Table:
        keys = ray.get(ref_ref)
        col = t[fk_column]
        nulls = int(pc.sum(pc.is_null(col).cast(pa.int64())).as_py() or 0)
        vals = col.drop_null().to_numpy(zero_copy_only=False)
        orphan_mask = ~np.isin(vals, keys)
        orphaned = int(orphan_mask.sum())
        samples = np.sort(vals[orphan_mask])[:10]
        return pa.table(
            {
                "total_rows": pa.array([t.num_rows], pa.int64()),
                "null_count": pa.array([nulls], pa.int64()),
                "orphaned_count": pa.array([orphaned], pa.int64()),
                "samples": pa.array([[str(v) for v in samples]], pa.list_(pa.string())),
            }
        )

    parts = (
        ds.select_columns([fk_column])
        .map_batches(per_batch, batch_format="pyarrow")
        .map_batches(
            _fold(
                ["total_rows", "null_count", "orphaned_count"], sample_col="samples"
            ),
            batch_size=1024,
            batch_format="pandas",
        )
        .to_pandas()
    )
    total = int(parts["total_rows"].sum())
    nulls = int(parts["null_count"].sum())
    orphans = int(parts["orphaned_count"].sum())
    invalid = orphans + (0 if allow_nulls else nulls)
    ratio = (total - orphans) / total if total else 1.0
    out = {
        "fk_column": pa.array([fk_column]),
        "total_rows": pa.array([total], pa.int64()),
        "null_count": pa.array([nulls], pa.int64()),
        "orphaned_count": pa.array([orphans], pa.int64()),
        "integrity_ratio": pa.array([ratio], pa.float64()),
        "passed": pa.array([invalid == 0]),
    }
    if with_samples:
        samples = sorted(v for lst in parts["samples"] for v in lst)[:10]
        out["orphaned_samples"] = pa.array([samples], pa.list_(pa.string()))
    return pa.table(out)


def integrity_composite(
    ds: rd.Dataset,
    fk_columns: list[str],
    ref_ds: rd.Dataset,
    ref_columns: list[str],
    allow_nulls: bool = True,
    allow_self_reference: bool = False,
) -> pa.Table:
    """Composite-key FK membership (validators/integrity.py:180-204 in
    /root/reference): key tuples tested against the broadcast distinct
    reference tuples; any-null key rows count as null (invalid iff
    ``not allow_nulls``). ``allow_self_reference`` unions the child table's
    own key values into the reference set (integrity.py:174-178)."""
    ref_tbl = ref_ds.select_columns(ref_columns).to_pandas().drop_duplicates()
    ref_tuples = set(map(tuple, ref_tbl.itertuples(index=False, name=None)))
    if allow_self_reference:
        own = ds.select_columns(fk_columns).to_pandas().dropna().drop_duplicates()
        ref_tuples |= set(map(tuple, own.itertuples(index=False, name=None)))
    ref_ref = ray.put(ref_tuples)

    def per_batch(t: pa.Table) -> pa.Table:
        keys = ray.get(ref_ref)
        df = t.select(fk_columns).to_pandas()
        any_null = df.isna().any(axis=1)
        nulls = int(any_null.sum())
        vals = df[~any_null]
        # vectorized membership: MultiIndex isin instead of a per-row loop
        member = pd.MultiIndex.from_frame(vals).isin(keys)
        orphaned = int((~member).sum())
        return pa.table(
            {
                "total_rows": pa.array([t.num_rows], pa.int64()),
                "null_count": pa.array([nulls], pa.int64()),
                "orphaned_count": pa.array([orphaned], pa.int64()),
            }
        )

    parts = ds.select_columns(fk_columns).map_batches(per_batch, batch_format="pyarrow").to_pandas()
    total = int(parts["total_rows"].sum())
    nulls = int(parts["null_count"].sum())
    orphans = int(parts["orphaned_count"].sum())
    invalid = orphans + (0 if allow_nulls else nulls)
    ratio = (total - orphans) / total if total else 1.0
    return pa.table(
        {
            "fk_key": pa.array(["+".join(fk_columns)]),
            "total_rows": pa.array([total], pa.int64()),
            "null_count": pa.array([nulls], pa.int64()),
            "orphaned_count": pa.array([orphans], pa.int64()),
            "integrity_ratio": pa.array([ratio], pa.float64()),
            "passed": pa.array([invalid == 0]),
        }
    )


def volumetry(ds: rd.Dataset) -> dict:
    """Row/column counts + byte sizes (core/volumetry_calculator.py:15-46 in
    /root/reference: memory usage + x2.5 disk estimate + data points)."""
    rows = ds.count()
    cols = len(ds.schema().names)
    size = ds.size_bytes() or 0
    return {
        "total_rows": int(rows),
        "total_columns": int(cols),
        "memory_usage_bytes": int(size),
        "estimated_disk_mb": round(size * 2.5 / 1024 / 1024, 2),
        "data_points": int(rows * cols),
    }


def aggregate_consistency(
    parent: rd.Dataset,
    child: rd.Dataset,
    parent_key: str,
    child_key: str,
    parent_value: str,
    child_value: str,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Cross-table CONSISTENCY check: per parent row, compare its stored
    aggregate against the exact sum over its child rows -> lazy
    (parent_key, parent_cents, child_cents, n_children, diff_cents).

    Extends the reference's single-table validator suite
    (``src/data_quality/validators/`` in /root/reference) with the
    conformance check a warehouse runs across tables (e.g. order header
    total vs line-item sum). Plan: map-side combiner on the child (one
    (key, sum, count) partial row per key per batch — bounds hot parents)
    -> hash-partition combine -> ``Dataset.join`` (hash-partitioned,
    left_outer so childless parents surface with n_children = 0) -> one
    vectorized diff pass. Money moves as integer cents end-to-end.
    """
    import pyarrow.compute as pc

    from .combine import combine_partials
    from .quant import cents_pa

    def child_partial(t: pa.Table) -> pa.Table:
        # count_all == SQL COUNT(*): rows with a NULL child value still
        # count as children (plain "count" would silently skip them and
        # diverge from the oracle)
        g = (
            pa.table({child_key: t[child_key], "c": cents_pa(t[child_value])})
            .group_by(child_key)
            .aggregate([("c", "sum"), ([], "count_all")])
        )
        return g.rename_columns([child_key, "child_cents", "n_children"])

    child_agg = combine_partials(
        child.select_columns([child_key, child_value]).map_batches(
            child_partial, batch_format="pyarrow"
        ),
        keys=[child_key],
        sums=["child_cents", "n_children"],
    )

    def parent_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {parent_key: t[parent_key], "parent_cents": cents_pa(t[parent_value])}
        )

    j = (
        parent.select_columns([parent_key, parent_value])
        .map_batches(parent_cents, batch_format="pyarrow")
        .join(
            child_agg,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=(parent_key,),
            right_on=(child_key,),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        cc = pc.fill_null(t["child_cents"].combine_chunks().cast(pa.int64()), 0)
        nc = pc.fill_null(t["n_children"].combine_chunks().cast(pa.int64()), 0)
        return pa.table(
            {
                parent_key: t[parent_key],
                "parent_cents": t["parent_cents"],
                "child_cents": cc,
                "n_children": nc,
                "diff_cents": pc.subtract(t["parent_cents"].combine_chunks(), cc),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def conditional_rule(
    ds: rd.Dataset,
    when_col: str,
    when_val: str,
    then_col: str,
    pattern: str,
) -> pd.DataFrame:
    """Conditional validity rule: rows where ``when_col == when_val`` must
    have ``then_col`` matching ``pattern`` -> one-row DataFrame
    (n_applicable, n_violations, n_null_then).

    The reference's pattern validators are unconditional per-column
    scans (``src/data_quality/validators/duplicates.py:30-34`` builds the
    pattern sets once per table); real rulebooks are conditional ("if
    type is purchase, props must be well-formed"). One vectorized
    RE2 pass per batch (pyarrow ``match_substring_regex``), counts sum on
    the driver — no shuffle at all. A null ``then_col`` on an applicable
    row counts as a violation AND is reported separately.
    """
    def partial(t: pa.Table) -> pd.DataFrame:
        app = pc.equal(t[when_col], pa.scalar(when_val))
        app = pc.fill_null(app, False)
        sub = t.filter(app)
        ok = pc.match_substring_regex(sub[then_col], pattern)
        n_null = pc.sum(pc.is_null(ok)).as_py() or 0
        n_ok = pc.sum(pc.fill_null(ok, False)).as_py() or 0
        n_app = sub.num_rows
        return pd.DataFrame(
            {
                "n_applicable": [np.int64(n_app)],
                "n_violations": [np.int64(n_app - n_ok)],
                "n_null_then": [np.int64(n_null)],
            }
        )

    parts = (
        ds.select_columns([when_col, then_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame({c: [np.int64(parts[c].sum())] for c in parts.columns})


def temporal_consistency(
    child: rd.Dataset,
    parent: rd.Dataset,
    child_key: str,
    parent_key: str,
    child_ts: str,
    parent_ts: str,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Cross-table temporal check: a child event must not precede its
    parent (e.g. a line item shipped before its order was placed) ->
    one-row DataFrame (n_checked, n_violations, n_orphans).

    Same plan shape as :func:`aggregate_consistency`: the parent side
    projects to (key, ts) only, the hash-partitioned ``Dataset.join``
    (left_outer from the child so orphans surface) moves each table once,
    and the comparison + count reduce per batch to three integers.
    """
    pdates = parent.select_columns([parent_key, parent_ts])
    j = child.select_columns([child_key, child_ts]).join(
        pdates,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(child_key,),
        right_on=(parent_key,),
    )

    def count(t: pa.Table) -> pd.DataFrame:
        pts = t[parent_ts].combine_chunks()
        orphan = pc.is_null(pts)
        viol = pc.fill_null(pc.less(t[child_ts].combine_chunks(), pts), False)
        return pd.DataFrame(
            {
                "n_checked": [np.int64(t.num_rows)],
                "n_violations": [np.int64(pc.sum(viol).as_py() or 0)],
                "n_orphans": [np.int64(pc.sum(orphan).as_py() or 0)],
            }
        )

    parts = j.map_batches(count, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({c: [np.int64(parts[c].sum())] for c in parts.columns})


def freshness(
    ds: rd.Dataset,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Freshness check: per group, the latest timestamp and its lag behind
    the table's global latest — the classic data-quality dimension the
    reference's validator suite stops short of (its temporal checks stop at
    row-level consistency; freshness asks "which feeds have gone quiet").

    One combiner pass: per-batch (group, max ts, count) partials combine
    with a skinny hash shuffle (max+sum); the O(|groups|) result computes
    lags on the driver. Null groups are excluded (a null feed name is a
    completeness problem, not a freshness one).

    Output: (group, latest, n_rows, lag_us), int64-exact microsecond lag.
    """
    import pyarrow.compute as pc

    from .combine import combine_partials

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[group_col]))
        g = t.group_by(group_col).aggregate([(ts_col, "max"), ([], "count_all")])
        return g.rename_columns([group_col, "latest", "n_rows"])

    out = combine_partials(
        ds.select_columns([group_col, ts_col]).map_batches(partial, batch_format="pyarrow"),
        keys=[group_col],
        sums=["n_rows"],
        maxs=["latest"],
    ).to_pandas()
    out["latest"] = out["latest"].astype("datetime64[us]")
    global_latest = out["latest"].max()
    # exact integer microseconds: DuckDB's date_diff('second') counts
    # boundary crossings, which is not floor(delta) — microseconds avoid
    # the semantic mismatch entirely
    out["lag_us"] = (global_latest - out["latest"]).to_numpy("timedelta64[us]").astype(np.int64)
    return (
        out[[group_col, "latest", "n_rows", "lag_us"]]
        .sort_values(group_col)
        .reset_index(drop=True)
    )
