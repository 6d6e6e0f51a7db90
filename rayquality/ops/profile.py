"""Data-profiling operators: Benford first-digit analysis, per-group
completeness, and IQR outlier detection.

These extend the reference's column-profiling suite (null counts /
distinct counts / pattern hit rates in
``src/data_quality/validators/completeness.py`` and ``duplicates.py``)
with the classic statistical profile checks a quality engine runs next:
digit-distribution fraud signals (Benford), conditional completeness
(null rates conditioned on a category), and robust outlier counts
(Tukey fences on exact quartiles). Every op is a per-batch combiner
followed by one skinny hash-partition combine — the shuffle carries
aggregates (one row per digit / group / distinct value), never data rows
— and every output column is integer-exact so the driver's dtype-strict
hash gate can verify it against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from . import combine as _combine
from . import quant


def benford_first_digit(
    ds: rd.Dataset, column: str, unit: float = 100.0
) -> pd.DataFrame:
    """First-significant-digit counts of ``column`` (Benford's-law
    profile) -> tiny DataFrame (digit, n), digits 1-9.

    Values quantize to integers at ``unit`` (cents by default) through
    the shared half-away-from-zero rule, so both engines extract the
    digit from the SAME integer; non-positive and null values are
    excluded (Benford applies to positive magnitudes). The per-batch
    combiner reduces each block to <=9 partial rows; the combine shuffle
    moves O(9 x blocks) rows total.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[column].dropna().to_numpy(np.float64)
        c = quant.quantize_i64(v, unit)
        c = c[c > 0]
        # strip trailing digits until scalar: <= 19 vectorized passes
        # (int64 max has 19 digits), no float log10 edge cases
        while (c >= 10).any():
            big = c >= 10
            c[big] //= 10
        counts = np.bincount(c, minlength=10)[1:10]
        digits = np.arange(1, 10, dtype=np.int64)
        keep = counts > 0
        return pd.DataFrame({"digit": digits[keep], "n": counts[keep].astype(np.int64)})

    parts = ds.select_columns([column]).map_batches(partial, batch_format="pandas")
    out = _combine.combine_partials(parts, keys=["digit"], sums=["n"]).to_pandas()
    return out.sort_values("digit").reset_index(drop=True)


def grouped_completeness(
    ds: rd.Dataset, group_col: str, value_cols: list[str]
) -> pd.DataFrame:
    """Conditional completeness: per ``group_col`` value, total rows and
    filled (non-null) counts per value column -> DataFrame
    (group, n_rows, n_<col>...). The reference profiles completeness per
    column over the whole table; conditioning on a category exposes
    null patterns a global rate hides (e.g. one event type never fills
    ``value``). One combiner pass + one skinny combine.
    """

    n_cols = [f"n_{c}" for c in value_cols]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, as_index=False, dropna=False).agg(
            n_rows=(group_col, "size"),
            **{nc: (c, "count") for nc, c in zip(n_cols, value_cols)},
        )
        for c in ["n_rows", *n_cols]:
            g[c] = g[c].astype(np.int64)
        return g

    parts = ds.select_columns([group_col, *value_cols]).map_batches(
        partial, batch_format="pandas"
    )
    out = _combine.combine_partials(
        parts, keys=[group_col], sums=["n_rows", *n_cols]
    ).to_pandas()
    return out.sort_values(group_col).reset_index(drop=True)


def iqr_outlier_counts(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    unit: float = 100.0,
) -> pd.DataFrame:
    """Per-group Tukey-fence outlier counts on exact discrete quartiles
    -> DataFrame (group, q1_units, q3_units, n_outliers, n_rows).

    Two passes over a pruned 2-column read: (1) exact q1/q3 per group via
    the value-counts combiner (:func:`sketch.grouped_quantiles`, bounded
    cardinality in integer units), (2) one counting pass with the tiny
    per-group fence table riding the task closure. The fences stay in
    integers — outlier <=> 10*v < 10*q1 - 15*(q3-q1) or
    10*v > 10*q3 + 15*(q3-q1) — so the oracle reproduces the comparison
    bit-for-bit with no float boundary risk (1.5 x IQR expressed in
    tenths of a unit).
    """
    from . import sketch

    units_col = f"_{value_col}_units"

    def to_units(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        out = pd.DataFrame({group_col: df[group_col].to_numpy()})
        out[units_col] = quant.quantize_i64(v, unit)
        out.loc[df[value_col].isna().to_numpy(), units_col] = pd.NA
        out[units_col] = out[units_col].astype("Int64")
        return out

    skinny = ds.select_columns([group_col, value_col]).map_batches(
        to_units, batch_format="pandas"
    )
    qdf = sketch.grouped_quantiles(skinny, group_col, units_col, [0.25, 0.75])
    fences = qdf.pivot(index=group_col, columns="q", values="value")
    q1 = fences[0.25].astype(np.int64)
    q3 = fences[0.75].astype(np.int64)
    lo10 = (10 * q1 - 15 * (q3 - q1)).to_dict()
    hi10 = (10 * q3 + 15 * (q3 - q1)).to_dict()

    def count_outliers(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[units_col])
        v10 = 10 * df[units_col].astype(np.int64).to_numpy()
        keys = df[group_col].to_numpy()
        # vectorize per group: factorize keys, index the fence arrays
        codes, uniq = pd.factorize(keys)
        lo = np.array([lo10[k] for k in uniq], np.int64)[codes]
        hi = np.array([hi10[k] for k in uniq], np.int64)[codes]
        out_mask = (v10 < lo) | (v10 > hi)
        g = pd.DataFrame({group_col: keys, "n_outliers": out_mask, "n_rows": 1})
        g = g.groupby(group_col, as_index=False).sum()
        g["n_outliers"] = g["n_outliers"].astype(np.int64)
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return g

    counts = _combine.combine_partials(
        skinny.map_batches(count_outliers, batch_format="pandas"),
        keys=[group_col],
        sums=["n_outliers", "n_rows"],
    ).to_pandas()
    out = counts.merge(
        pd.DataFrame(
            {
                group_col: q1.index,
                "q1_units": q1.to_numpy(),
                "q3_units": q3.to_numpy(),
            }
        ),
        on=group_col,
    )
    out = out[[group_col, "q1_units", "q3_units", "n_outliers", "n_rows"]]
    return out.sort_values(group_col).reset_index(drop=True)


def distribution_drift(
    ds_old: rd.Dataset,
    ds_new: rd.Dataset,
    column: str,
    bin_units: int = 10_000,
    unit: float = 100.0,
) -> pd.DataFrame:
    """Value-distribution drift between two snapshots -> DataFrame
    (bin, n_old, n_new): per fixed-width bin of the quantized value, the
    row count in each snapshot. The PSI / chi-square on top is a trivial
    driver-side formula over this (tiny, integer-exact) table — the op
    keeps the oracle-verifiable part exact and leaves the float score to
    the caller.

    Bins are floor(cents / bin_units) (floor, not truncation: negative
    values bin downward on both engines). Each snapshot reduces with the
    same per-batch bincount combiner; the combine shuffle carries one row
    per occupied bin per block. Nulls are excluded on both sides.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[column].dropna().to_numpy(np.float64)
        b = quant.quantize_i64(v, unit) // np.int64(bin_units)
        bins, counts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": bins, "n": counts.astype(np.int64)})

    def side(ds: rd.Dataset) -> pd.DataFrame:
        return _combine.combine_partials(
            ds.select_columns([column]).map_batches(partial, batch_format="pandas"),
            keys=["bin"],
            sums=["n"],
        ).to_pandas()

    old = side(ds_old).rename(columns={"n": "n_old"})
    new = side(ds_new).rename(columns={"n": "n_new"})
    out = old.merge(new, on="bin", how="outer").fillna(0)
    out["n_old"] = out["n_old"].astype(np.int64)
    out["n_new"] = out["n_new"].astype(np.int64)
    return out.sort_values("bin").reset_index(drop=True)


def fd_violations(
    ds: rd.Dataset, det_col: str, dep_col: str
) -> pd.DataFrame:
    """Functional-dependency profile: does ``det_col`` determine
    ``dep_col``? -> one row (n_det_values, n_violating_keys,
    n_violating_rows).

    Classic FD discovery primitive (profiling literature, e.g. TANE /
    Metanome) extending the reference's duplicate/uniqueness suite
    (reference: src/data_quality/validators/duplicates.py): a key that
    maps to >1 distinct dependent value violates the dependency; the row
    count of those keys bounds the repair cost.

    Plan: per-batch distinct (det, dep) with partial row counts
    (combiner) -> one skinny combine keyed on the PAIR -> hash-partition
    by det -> per-partition count distinct deps per det. The shuffle
    carries one row per distinct pair, never data rows; no driver
    structure beyond the 1-row result.
    """

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([det_col, dep_col], as_index=False, dropna=False).size()
        g = g.rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    pairs = _combine.combine_partials(
        ds.select_columns([det_col, dep_col]).map_batches(
            pair_partial, batch_format="pandas"
        ),
        keys=[det_col, dep_col],
        sums=["cnt"],
    )

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[det_col], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(_combine.DEFAULT_N_PARTS)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        per_det = g.groupby(det_col, dropna=False).agg(
            n_dep=(dep_col, "nunique"), rows=("cnt", "sum")
        )
        viol = per_det["n_dep"] > 1
        return pd.DataFrame(
            {
                "n_det_values": [np.int64(len(per_det))],
                "n_violating_keys": [np.int64(int(viol.sum()))],
                "n_violating_rows": [np.int64(int(per_det.loc[viol, "rows"].sum()))],
            }
        )

    parts = (
        pairs.map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_det_values": [np.int64(parts["n_det_values"].sum())],
            "n_violating_keys": [np.int64(parts["n_violating_keys"].sum())],
            "n_violating_rows": [np.int64(parts["n_violating_rows"].sum())],
        }
    )


def grouped_entropy(
    ds: rd.Dataset, group_col: str, value_col: str
) -> pd.DataFrame:
    """Shannon entropy (micro-nats, int64) of the ``value_col``
    distribution within each ``group_col`` value -> DataFrame
    (group, entropy_micro_nats, n_rows).

    A uniformity/diversity profile signal (near-zero entropy = a column
    that is constant within the group; high entropy = well-mixed).
    Counts flow through the usual combiner + skinny combine; the entropy
    fold runs on the (group, value, cnt) table, one row per distinct
    pair. Output quantizes -sum(p*ln p) to integer micro-nats with
    half-up rounding — the same fixed-point contract as the money
    aggregates, so the dtype-strict oracle gate can compare exactly.
    """

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, value_col], as_index=False, dropna=False).size()
        g = g.rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    pairs = _combine.combine_partials(
        ds.select_columns([group_col, value_col]).map_batches(
            pair_partial, batch_format="pandas"
        ),
        keys=[group_col, value_col],
        sums=["cnt"],
    )

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(_combine.DEFAULT_N_PARTS)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        tot = (
            g.groupby(group_col, dropna=False)["cnt"]
            .transform("sum")
            .to_numpy(np.float64)
        )
        p = g["cnt"].to_numpy(np.float64) / tot
        agg = g.assign(term=-(p * np.log(p))).groupby(
            group_col, as_index=False, dropna=False
        ).agg(ent=("term", "sum"), n_rows=("cnt", "sum"))
        agg["entropy_micro_nats"] = np.floor(agg["ent"] * 1e6 + 0.5).astype(
            np.int64
        )
        agg["n_rows"] = agg["n_rows"].astype(np.int64)
        return agg[[group_col, "entropy_micro_nats", "n_rows"]]

    res = (
        pairs.map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return res.sort_values(group_col).reset_index(drop=True)


def mad_outliers(
    ds: rd.Dataset, column: str, unit: float = 100.0, k_mad: int = 3
) -> pd.DataFrame:
    """Robust (Hampel) outlier count via the median absolute deviation ->
    one row (median_cents, mad_cents, n_outliers, n_rows).

    The MAD-based fence is the robust sibling of ``iqr_outlier_counts``
    (same reference lineage: completeness/outlier profiling): a value is
    an outlier iff ``|v - median| > k_mad * MAD``. Three streaming
    passes, each a value-counts combiner + skinny combine (the exact-
    quantile machinery); values quantize to integer units first so every
    comparison is integer-exact on both engine and oracle. Same
    bounded-cardinality contract as ``sketch.exact_quantiles``.
    """
    from . import sketch

    def to_units(df: pd.DataFrame) -> pd.DataFrame:
        v = df[column].dropna().to_numpy(np.float64)
        return pd.DataFrame({"v": quant.quantize_i64(v, unit)})

    units = ds.select_columns([column]).map_batches(to_units, batch_format="pandas")
    med = int(sketch.exact_quantiles(units, "v", [0.5])["value"].iloc[0])

    def to_dev(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d": np.abs(df["v"].to_numpy(np.int64) - med)})

    devs = units.map_batches(to_dev, batch_format="pandas")
    mad = int(sketch.exact_quantiles(devs, "d", [0.5])["value"].iloc[0])
    fence = k_mad * mad

    def count_out(df: pd.DataFrame) -> pd.DataFrame:
        d = np.abs(df["v"].to_numpy(np.int64) - med)
        return pd.DataFrame(
            {
                "n_outliers": [np.int64((d > fence).sum())],
                "n_rows": [np.int64(len(d))],
            }
        )

    parts = units.map_batches(count_out, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "median_cents": [np.int64(med)],
            "mad_cents": [np.int64(mad)],
            "n_outliers": [np.int64(parts["n_outliers"].sum())],
            "n_rows": [np.int64(parts["n_rows"].sum())],
        }
    )


def chi2_independence(
    ds: rd.Dataset, col_a: str, col_b: str
) -> pd.DataFrame:
    """Pearson chi-squared independence statistic between two categorical
    columns -> one row (chi2_micro, dof, n_rows).

    The cross-column consistency profile: a large statistic means
    ``col_a``'s distribution shifts with ``col_b`` (e.g. an event type
    that only fires at night). The contingency table flows through the
    (a, b, cnt) combiner + skinny combine — one row per OBSERVED cell —
    and the driver folds the dense |A| x |B| grid (unobserved cells
    contribute their expected count). Bounded by category cardinality,
    never corpus size. Output quantizes to integer micro-units
    (half-up), the shared fixed-point oracle contract.
    """

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([col_a, col_b], as_index=False, dropna=False).size()
        g = g.rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    cells = _combine.combine_partials(
        ds.select_columns([col_a, col_b]).map_batches(
            pair_partial, batch_format="pandas"
        ),
        keys=[col_a, col_b],
        sums=["cnt"],
    ).to_pandas()
    pivot = cells.pivot_table(
        index=col_a, columns=col_b, values="cnt", fill_value=0, aggfunc="sum"
    ).to_numpy(np.float64)
    n = pivot.sum()
    na = pivot.sum(axis=1)
    nb = pivot.sum(axis=0)
    expected = na[:, None] * nb[None, :] / n
    chi2 = float(((pivot - expected) ** 2 / expected).sum())
    dof = (pivot.shape[0] - 1) * (pivot.shape[1] - 1)
    return pd.DataFrame(
        {
            "chi2_micro": [np.int64(np.floor(chi2 * 1e6 + 0.5))],
            "dof": [np.int64(dof)],
            "n_rows": [np.int64(n)],
        }
    )


def join_cardinality(
    ds_a: rd.Dataset, key_a: str, ds_b: rd.Dataset, key_b: str
) -> pd.DataFrame:
    """EXACT inner-join output cardinality WITHOUT running the join ->
    one row (join_rows, n_keys_common): sum over shared keys of
    count_a(k) * count_b(k).

    The query-planning / blow-up-detection profile (a skewed key pair
    that would explode a join shows up here as a huge product before
    anyone pays for the join). Each side reduces to (key, cnt) through
    the value-counts combiner; both skinny count tables co-partition by
    key hash and each partition sums the products — the shuffle carries
    one row per distinct key per side.
    """

    def count_partial(col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(col, as_index=False).size()
            g = g.rename(columns={col: "k", "size": "cnt"})
            g["cnt"] = g["cnt"].astype(np.int64)
            return g

        return fn

    def side(ds: rd.Dataset, col: str, name: str) -> rd.Dataset:
        counts = _combine.combine_partials(
            ds.select_columns([col]).map_batches(
                count_partial(col), batch_format="pandas"
            ),
            keys=["k"],
            sums=["cnt"],
        )

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = name
            return df

        return counts.map_batches(tag, batch_format="pandas")

    both = side(ds_a, key_a, "a").union(side(ds_b, key_b, "b"))

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["k"], index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pkey"] = (h % np.uint64(_combine.DEFAULT_N_PARTS)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == "a"][["k", "cnt"]]
        b = g[g["side"] == "b"][["k", "cnt"]]
        m = a.merge(b, on="k", suffixes=("_a", "_b"))
        return pd.DataFrame(
            {
                "join_rows": [np.int64((m["cnt_a"] * m["cnt_b"]).sum())],
                "n_keys_common": [np.int64(len(m))],
            }
        )

    parts = (
        both.map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "join_rows": [np.int64(parts["join_rows"].sum())],
            "n_keys_common": [np.int64(parts["n_keys_common"].sum())],
        }
    )


def hourly_anomalies(
    events: "rd.Dataset",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window: int = 24,
) -> pd.DataFrame:
    """Rolling z-score anomaly detection over dense hourly event counts —
    the monitoring primitive behind "this hour's traffic is 5 sigma off
    its trailing day" alerts.

    Counts come from :func:`rayquality.ops.relational.resample_hourly_counts`
    (distributed combiner + skinny combine, dense zero-filled grid — a
    silent hour IS an anomaly). The bucket table is O(|types| x |hours|)
    — aggregate-sized by construction, the same contract as resample /
    histogram — so the rolling pass runs vectorized on it directly: one
    cumsum pair per type gives every trailing-``window`` sum s1 and
    square-sum s2 exactly in int64, and the variance>0 guard is the
    integer test ``window*s2 > s1*s1`` (no float epsilon, so the engine
    and the DuckDB oracle select exactly the same rows).

    z = (cnt - s1/W) / sqrt((s2 - s1^2/W)/(W-1)), half-up micro-quantized
    (the slope/corr idiom). Rows with a partial window are excluded.

    Output: (event_type, hour, n_events, z_micro) for full-window,
    positive-variance buckets.
    """
    from .relational import resample_hourly_counts

    dense = resample_hourly_counts(events, type_col, ts_col)
    w = float(window)
    parts = []
    for typ, g in dense.groupby(type_col, sort=True):  # |types| iterations
        c = g["n_events"].to_numpy(np.int64)
        cs = np.concatenate([[0], np.cumsum(c)])
        cs2 = np.concatenate([[0], np.cumsum(c * c)])
        i = np.arange(len(c))
        lo = i - window
        s1 = cs[i] - cs[np.maximum(lo, 0)]
        s2 = cs2[i] - cs2[np.maximum(lo, 0)]
        ok = (lo >= 0) & (window * s2 > s1 * s1)
        s1f = s1[ok].astype(np.float64)
        s2f = s2[ok].astype(np.float64)
        z = (c[ok] - s1f / w) / np.sqrt((s2f - s1f * s1f / w) / (w - 1.0))
        parts.append(
            pd.DataFrame(
                {
                    type_col: typ,
                    "hour": g["hour"].to_numpy()[ok],
                    "n_events": c[ok],
                    "z_micro": np.floor(z * 1e6 + 0.5).astype(np.int64),
                }
            )
        )
    out = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        columns=[type_col, "hour", "n_events", "z_micro"]
    )
    return out.sort_values([type_col, "hour"]).reset_index(drop=True)
