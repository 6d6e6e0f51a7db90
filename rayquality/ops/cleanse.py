"""Declarative column-cleaning operator — the rewrite counterpart of the
validator suite (validators COUNT problems; this FIXES the mechanical ones
in one vectorized pass).

Mirrors the remediation a reference user performs after reading a
data-quality report (null fills, range clips, case/whitespace
normalization) as a single ``map_batches`` stage: every rule is a
``pyarrow.compute`` kernel, applied in a fixed order (fill -> clip ->
string-normalize), so the op is one streaming pass with no Python row
loops and an exact SQL equivalent (COALESCE / LEAST+GREATEST /
lower(trim())).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def clean_columns(
    ds: rd.Dataset,
    fills: dict[str, object] | None = None,
    clips: dict[str, tuple[float, float]] | None = None,
    str_norm: list[str] | None = None,
) -> rd.Dataset:
    """Apply fills, then clips, then lower+trim normalization; all other
    columns pass through untouched."""
    fills = fills or {}
    clips = clips or {}
    str_norm = str_norm or []

    def per_batch(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in t.column_names}
        for c, v in fills.items():
            cols[c] = pc.fill_null(cols[c], v)
        for c, (lo, hi) in clips.items():
            cols[c] = pc.min_element_wise(
                pc.max_element_wise(cols[c], lo), hi
            )
        for c in str_norm:
            cols[c] = pc.utf8_lower(pc.utf8_trim_whitespace(cols[c]))
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def minmax_normalize(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
) -> rd.Dataset:
    """Per-group min-max feature scaling -> lazy
    (id, group, scaled_micro in [0, 1e6]).

    Two streaming stages with a broadcast of O(groups) stats — the
    canonical "small aggregate, then rewrite" normalization plan:

    1. per-batch (group, min, max) partials over integer CENTS ->
       hash-partition combine -> tiny stats table -> ``ray.put``;
    2. per-row ``round((cents - mn) * 1e6 / (mx - mn))`` — every operand
       is an exact integer before the single float division, and the
       expression is written identically in the SQL oracle, so the two
       sides compute bit-identical doubles and can never hash-diverge
       (unlike mean/stddev z-scores, where streaming-variance algorithms
       differ across engines).

    A constant group (mx == mn) scales to 0.
    """
    import numpy as np
    import pandas as pd
    import ray

    from . import quant

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = quant.cents_np(df[value_col].to_numpy(np.float64))
        # dropna=False: a null group value is a real group (same contract
        # as combine_partials — silently dropping it would crash the scale
        # pass on its rows)
        g = pd.DataFrame({group_col: df[group_col], "c": c}).groupby(
            group_col, as_index=False, dropna=False
        )["c"]
        out = g.min().rename(columns={"c": "mn"})
        out["mx"] = g.max()["c"]
        return out

    from .combine import combine_partials

    stats = combine_partials(
        ds.select_columns([group_col, value_col]).map_batches(
            stat_partial, batch_format="pandas"
        ),
        keys=[group_col],
        sums=[],
        mins=["mn"],
        maxs=["mx"],
    ).to_pandas()  # O(groups): the small side
    stats_ref = ray.put(stats)

    def scale(df: pd.DataFrame) -> pd.DataFrame:
        sm: pd.DataFrame = ray.get(stats_ref)
        c = quant.cents_np(df[value_col].to_numpy(np.float64))
        # vectorized null-safe lookup: pandas merge joins null==null keys
        j = df[[group_col]].merge(sm, on=group_col, how="left")
        mn = j["mn"].to_numpy(np.int64)
        mx = j["mx"].to_numpy(np.int64)
        span = mx - mn
        scaled = np.where(
            span > 0,
            quant.quantize_i64((c - mn) * 1e6 / np.maximum(span, 1), 1.0),
            0,
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                group_col: df[group_col].to_numpy(),
                "scaled_micro": scaled.astype(np.int64),
            }
        )

    return ds.select_columns([id_col, group_col, value_col]).map_batches(
        scale, batch_format="pandas"
    )


def winsorized_group_sum(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> "pd.DataFrame":
    """Outlier-robust grouped totals: clip ``value_col`` (as integer
    cents) at its EXACT corpus-wide [q_lo, q_hi] discrete quantiles, then
    sum per group -> small pd.DataFrame (group, n, sum_wins_c, n_clipped).

    Two streaming passes, no sort: pass 1 is the distributed value-counts
    quantile (``sketch.exact_quantiles`` — combiner + one skinny shuffle;
    bounded-cardinality contract documented there), pass 2 broadcasts the
    two clip bounds and folds LEAST(GREATEST(cents, lo), hi) into a
    per-group partial sum. All arithmetic is int64 cents, so the DuckDB
    oracle (quantile_disc + LEAST/GREATEST on the same cents) hashes
    identically.

    Reference analogue: the range-check rule in
    ``src/data_quality/validators/`` flags out-of-range rows; this is the
    remediation form (clip instead of flag) a metrics pipeline needs.
    """
    import numpy as np
    import pandas as pd

    from . import quant, sketch
    from .combine import combine_partials

    cents_ds = ds.select_columns([group_col, value_col]).map_batches(
        lambda t: pa.table(
            {group_col: t[group_col], "cents": quant.cents_pa(t[value_col])}
        ),
        batch_format="pyarrow",
    ).materialize()  # skinny (group, int64) projection, read by both passes

    qdf = sketch.exact_quantiles(cents_ds, "cents", [q_lo, q_hi])
    lo, hi = int(qdf["value"].iloc[0]), int(qdf["value"].iloc[1])

    def partial(t: pa.Table) -> pd.DataFrame:
        c = t["cents"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                group_col: t[group_col].to_pandas(),
                "n": np.ones(len(c), np.int64),
                "sum_wins_c": np.clip(c, lo, hi),
                "n_clipped": ((c < lo) | (c > hi)).astype(np.int64),
            }
        )
        # map-side combiner: the shuffle carries one row per (batch, group)
        return df.groupby(group_col, as_index=False).sum()

    out = (
        combine_partials(
            cents_ds.map_batches(partial, batch_format="pyarrow"),
            keys=[group_col],
            sums=["n", "sum_wins_c", "n_clipped"],
        )
        .to_pandas()
        .sort_values(group_col)
        .reset_index(drop=True)
    )
    return out
