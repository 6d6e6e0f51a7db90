"""Replicated-corpus scale check for the analytics/text operators.

Builds deliberately enlarged copies of the sf0.1 tables under /tmp —
documents x100 (500k docs; every content string carries 100 exact
duplicates: a hot-key skew test) and events/orders x10 (1M events, 1.5M
orders; user/customer keys offset per replica so the per-user densities
stay realistic) — then times each operator end-to-end and prints one JSON
line of rows/sec. Used for the BASELINE.md "scale check" table
(VERDICT r2 item 8: before/after evidence for the formerly driver-bound
ops: as-of join, range join, sessionize, sliding windows, cohort
retention, tfidf).

Usage: python scripts/scale_check.py [op ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
# cache key includes the source dir name: a bench/smoke run at another SF
# must not reuse (or poison) replicated corpora built from a different base
BIG = f"/tmp/rayquality_scalecheck/{os.path.basename(SF_DIR.rstrip('/'))}"


def _replicate(src: str, out_dir: str, n_rep: int, id_cols: dict[str, int]) -> str:
    """Write n_rep offset copies of a parquet table (one shard per copy).
    ``id_cols`` maps column -> per-replica offset stride."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_OK")
    if os.path.exists(marker):
        return out_dir
    base = pd.read_parquet(src)
    for r in range(n_rep):
        df = base.copy()
        for c, stride in id_cols.items():
            df[c] = df[c] + r * stride
        df.to_parquet(os.path.join(out_dir, f"rep-{r:03d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def main() -> None:
    print(json.dumps(run_ops(set(sys.argv[1:]))))


def run_ops(only: set[str] | None = None, shutdown: bool = True) -> dict:
    """Run the replicated-corpus scale checks (all, or the ``only`` subset)
    -> payload dict. ``shutdown=False`` lets a caller that owns the Ray
    session (bench.py's heavy-tail section) reuse it."""
    only = only or set()
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # Corpus builds and row counts are lazy + memoized: a subset run
    # (bench.py's heavy-tail section passes only=6 ops) must not pay for
    # replicating/counting tables its ops never read.
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def docs_dir() -> str:
        return _replicate(
            f"{SF_DIR}/documents.parquet", BIG + "/docs100", 100, {"doc_id": 1_000_000}
        )

    @lru_cache(maxsize=None)
    def ev_dir() -> str:
        return _replicate(
            f"{SF_DIR}/events.parquet",
            BIG + "/events10",
            10,
            {"event_id": 10_000_000, "user_id": 1_000_000},
        )

    @lru_cache(maxsize=None)
    def ord_dir() -> str:
        return _replicate(
            f"{SF_DIR}/orders.parquet",
            BIG + "/orders10",
            10,
            {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
        )

    @lru_cache(maxsize=None)
    def li_dir() -> str:
        return _replicate(
            f"{SF_DIR}/lineitem.parquet",
            BIG + "/lineitem10",
            10,
            {"l_orderkey": 10_000_000},  # keys track the orders replicas
        )

    def docs() -> rd.Dataset:
        return rd.read_parquet(sorted(glob.glob(docs_dir() + "/*.parquet")))

    def events() -> rd.Dataset:
        return rd.read_parquet(sorted(glob.glob(ev_dir() + "/*.parquet")))

    def orders() -> rd.Dataset:
        return rd.read_parquet(sorted(glob.glob(ord_dir() + "/*.parquet")))

    def lineitem() -> rd.Dataset:
        return rd.read_parquet(sorted(glob.glob(li_dir() + "/*.parquet")))

    @lru_cache(maxsize=None)
    def n_docs() -> int:
        return docs().count()

    @lru_cache(maxsize=None)
    def n_ev() -> int:
        return events().count()

    @lru_cache(maxsize=None)
    def n_ord() -> int:
        return orders().count()

    @lru_cache(maxsize=None)
    def n_li() -> int:
        return lineitem().count()

    from rayquality.ops import asof, text, windows

    results: dict[str, dict] = {}

    def run(name: str, n_rows, fn) -> None:
        """``n_rows`` may be an int or a zero-arg callable — callables are
        only evaluated (and their corpora only built) when the op runs."""
        if only and name not in only:
            return
        n_in = int(n_rows()) if callable(n_rows) else int(n_rows)
        t0 = time.time()
        out = fn()
        n_out = out.count() if isinstance(out, rd.Dataset) else len(out)
        dt = time.time() - t0
        results[name] = {
            "sec": round(dt, 2),
            "rows_in": n_in,
            "rows_out": int(n_out),
            "rows_per_sec": round(n_in / dt),
        }

    run("tfidf_top_terms", n_docs, lambda: text.tfidf_top_terms(docs(), k=3))
    run("sessionize", n_ev, lambda: windows.sessionize(events(), gap_minutes=30))
    run(
        "sliding_windows",
        n_ev,
        lambda: windows.sliding_window_counts(events(), window_minutes=60, slide_minutes=15),
    )
    run("cohort_retention", n_ev, lambda: windows.cohort_retention(events()))
    run(
        "asof_join",
        n_ev,
        lambda: asof.asof_join(
            events(),
            orders(),
            key_left="user_id",
            key_right="o_custkey",
            ts_left="ts",
            ts_right="o_orderdate",
            left_cols=["event_id", "user_id", "ts"],
            right_cols=["o_orderkey", "o_orderdate"],
            tiebreak="o_orderkey",
        ),
    )

    def _range_join():
        import pyarrow as pa

        def rename(t: pa.Table) -> pa.Table:
            return t.select(["event_id", "user_id", "ts"]).rename_columns(
                ["event_id_b", "user_id", "ts_b"]
            )

        return asof.range_join(
            events(),
            events().map_batches(rename, batch_format="pyarrow"),
            key_left="user_id",
            key_right="user_id",
            ts_left="ts",
            ts_right="ts_b",
            left_cols=["event_id", "user_id", "ts"],
            right_cols=["event_id_b", "ts_b"],
            before=pd.Timedelta(minutes=30),
            after=pd.Timedelta(minutes=30),
        )

    run("range_join", n_ev, _range_join)

    # ---- round-3 additions: graph clustering, profiling, curation ----------
    from rayquality.ops import curation, profile, textdedup

    def _components():
        # star edges: every replica doc links to its replica-0 original ->
        # 5k components of size 100, diameter 2 (the dedup-graph shape),
        # 495k edges over 500k nodes
        import pyarrow as pa

        from rayquality.ops import graph

        def mk_edges(t: "pa.Table") -> "pa.Table":
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            base = ids % 1_000_000
            m = ids // 1_000_000 > 0
            return pa.table({"id_a": pa.array(base[m]), "id_b": pa.array(ids[m])})

        edges = docs().select_columns(["doc_id"]).map_batches(
            mk_edges, batch_format="pyarrow"
        )
        return graph.connected_components(
            edges, docs().select_columns(["doc_id"]), "doc_id"
        )

    run("connected_components", n_docs, _components)
    run(
        "per_key_cap",
        n_docs,
        lambda: curation.per_key_cap(docs(), "source", "doc_id", cap=10),
    )
    run("normalized_dedup", n_docs, lambda: textdedup.normalized_dedup(docs()))
    run("benford", n_ord, lambda: profile.benford_first_digit(orders(), "o_totalprice"))
    run(
        "grouped_completeness",
        n_ev,
        lambda: profile.grouped_completeness(events(), "event_type", ["value", "props"]),
    )
    run(
        "iqr_outliers",
        n_ord,
        lambda: profile.iqr_outlier_counts(
            orders(), "o_orderpriority", "o_totalprice", unit=1.0
        ),
    )

    # ---- session-4 additions: analytic suite, bloom join, char stats -------
    from rayquality.ops import analytic, bloom
    from rayquality.ops import text as text_ops

    run("rollup_revenue", n_ord, lambda: analytic.rollup_revenue(orders()))
    run(
        "mode_per_group",
        n_ord,
        lambda: analytic.mode_per_group(orders(), "o_orderstatus", "o_orderpriority"),
    )
    run("gaps_islands", n_ev, lambda: analytic.gaps_islands(events()))
    run("latest_per_key", n_ord, lambda: analytic.latest_per_key(orders()))
    run(
        "corr_exact",
        n_ord,
        lambda: analytic.corr_exact(orders(), "o_totalprice", "o_custkey"),
    )
    run(
        "ntile_bucketize",
        n_ord,
        lambda: analytic.ntile_bucketize(orders(), "o_totalprice", "o_orderkey", 8),
    )
    run(
        "bloom_semi_join",
        n_ord,
        lambda: bloom.bloom_semi_join(
            orders(),
            "o_custkey",
            events().filter(lambda r: r["event_type"] == "purchase"),
            "user_id",
            ["o_orderkey", "o_custkey"],
        ),
    )
    run("char_stats", n_docs, lambda: text_ops.char_stats(docs()))
    run(
        "boilerplate_lines",
        n_docs,
        # 100-way replicated texts = every line is boilerplate at freq>2:
        # worst-case hot-set size and full rewrite volume
        lambda: curation.remove_boilerplate_lines(docs(), max_doc_freq=2),
    )
    def _q3():
        from rayquality.ops import multijoin

        # customers are unreplicated, so only replica-0 orders pass the
        # segment-membership broadcast — the lineitem revenue combiner and
        # the orderkey hash join still see the full 6M/1.5M-row inputs
        return multijoin.q3_shipping_priority(
            rd.read_parquet(f"{SF_DIR}/customer.parquet"), orders(), lineitem()
        )

    run("q3_shipping_priority", n_li, _q3)
    run(
        "first_per_key_window",
        n_ev,
        lambda: windows.first_per_key_window(events()),
    )

    # ---- session-5 additions: FD/entropy/chi2 profiling, baskets, topk,
    # hash sample, MAD, slope, quantile filter, temperature mixture,
    # shared-substring fingerprints ------------------------------------------
    run(
        "fd_violations",
        n_ord,
        lambda: profile.fd_violations(orders(), "o_custkey", "o_orderpriority"),
    )
    run(
        "grouped_entropy",
        n_ev,
        lambda: profile.grouped_entropy(
            events().select_columns(["event_type", "user_id"]),
            "event_type",
            "user_id",
        ),
    )
    run(
        "chi2_independence",
        n_ev,
        lambda: profile.chi2_independence(
            events().select_columns(["event_type", "user_id"]),
            "event_type",
            "user_id",
        ),
    )
    run(
        "basket_pairs",
        n_ev,
        lambda: analytic.basket_pairs(events(), "user_id", "event_type"),
    )
    run(
        "grouped_topk",
        n_ord,
        lambda: analytic.grouped_topk(
            orders(), "o_orderpriority", "o_totalprice", "o_orderkey", k=5
        ),
    )
    run(
        "grouped_hash_sample",
        n_ord,
        lambda: windows.grouped_hash_sample(
            orders(), "o_orderstatus", "o_orderkey", k=10
        ),
    )
    run(
        "mad_outliers",
        n_li,
        lambda: profile.mad_outliers(lineitem(), "l_extendedprice"),
    )
    run(
        "grouped_slope",
        n_ord,
        lambda: analytic.grouped_slope(
            orders().map_batches(
                lambda df: df.assign(x=df["o_custkey"].to_numpy() % 24),
                batch_format="pandas",
            ),
            "o_orderpriority",
            "x",
            "o_totalprice",
        ),
    )
    run(
        "quantile_filter",
        n_docs,
        lambda: curation.quantile_filter(docs(), "n_chars", 0.75)[0],
    )
    run(
        "temperature_mixture",
        n_docs,
        lambda: curation.temperature_mixture(docs(), "source", "doc_id"),
    )

    run(
        "growth_accounting",
        n_ev,
        lambda: analytic.growth_accounting(events()),
    )

    def _grouped_hll():
        from rayquality.ops import sketch

        return sketch.grouped_approx_distinct(events(), "event_type", "user_id")

    run("grouped_approx_distinct", n_ev, _grouped_hll)

    def _changelog():
        from rayquality.ops import increment

        def to_snap(df):
            return pd.DataFrame(
                {
                    "k": df["o_orderkey"].to_numpy(np.int64),
                    "v": df["o_custkey"].to_numpy(np.int64),
                    "version": np.int64(1),
                }
            )

        def to_delta(df):
            k = df["o_orderkey"].to_numpy(np.int64)
            upd, dele = k % 10 == 0, k % 17 == 0
            return pd.concat(
                [
                    pd.DataFrame(
                        {"k": k[upd], "v": np.int64(0), "version": np.int64(2), "op": "u"}
                    ),
                    pd.DataFrame(
                        {"k": k[dele], "v": np.int64(0), "version": np.int64(2), "op": "d"}
                    ),
                ],
                ignore_index=True,
            )

        snap = orders().map_batches(to_snap, batch_format="pandas")
        delta = orders().map_batches(to_delta, batch_format="pandas")
        return increment.apply_changelog(snap, delta, "k", ["v"])

    run("apply_changelog", n_ord, _changelog)
    run(
        "join_cardinality",
        lambda: n_ev() + n_ord(),
        lambda: profile.join_cardinality(events(), "user_id", orders(), "o_custkey"),
    )

    def _pagerank():
        import pyarrow as pa

        from rayquality.ops import graph

        TYPE_BASE = 10**12
        types = ["click", "error", "purchase", "signup", "view"]
        code = {t: TYPE_BASE + i for i, t in enumerate(types)}

        def to_edges(t: "pa.Table") -> "pa.Table":
            users = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            tnode = pd.Series(t["event_type"].to_pylist()).map(code).to_numpy(np.int64)
            return pa.table(
                {
                    "src": pa.array(np.concatenate([users, tnode])),
                    "dst": pa.array(np.concatenate([tnode, users])),
                }
            )

        edges = events().select_columns(["user_id", "event_type"]).map_batches(
            to_edges, batch_format="pyarrow"
        )
        nodes = events().select_columns(["user_id"]).map_batches(
            lambda t: t.select(["user_id"]).rename_columns(["node_id"]),
            batch_format="pyarrow",
        ).union(rd.from_arrow(pa.table({"node_id": list(code.values())})))
        return graph.pagerank(edges, nodes, id_col="node_id", n_parts=32)

    run("pagerank", n_ev, _pagerank)

    def _shared_substr():
        from rayquality.ops import substr

        # 100-way replicated texts: every doc shares ALL fingerprints with
        # its 99 replicas — group_cap-bounded worst case for the pair kernel
        return substr.shared_substring_pairs(docs(), k=32, sample_mod=8)

    run("shared_substring_pairs", n_docs, _shared_substr)

    def _bigram_nll():
        # 100-way replicated corpus: bigram vocab stays the base corpus's
        # (model size independent of replication), scoring scales with rows
        return text.corpus_bigram_nll(docs())

    run("corpus_bigram_nll", n_docs, _bigram_nll)

    def _dup_rate():
        from rayquality.ops import textdedup

        # every text has 100 exact copies -> the dup-hash broadcast is the
        # FULL distinct-text set (worst case for the small-side contract)
        return textdedup.dup_rate_by_source(docs())

    run("dup_rate_by_source", n_docs, _dup_rate)

    def _event_paths():
        return windows.event_paths(events())

    run("event_paths", n_ev, _event_paths)

    def _pixel_near_dups():
        import glob as _glob

        from rayquality import synth
        from rayquality.ops import image as imops

        d = synth.ensure_corpus(20_000, seed=42)
        ids = rd.read_parquet(sorted(_glob.glob(d + "/*.parquet")))
        return imops.pixel_verified_near_dups(ids, mse_threshold=80.0)

    run("pixel_near_dups_20k", 20_000, _pixel_near_dups)

    # ---- the heavy-tail six (VERDICT r3 item 8): the most expensive
    # BENCH queries at replicated scale so regressions in the expensive
    # tail land in the per-round artifact, not just ad-hoc runs ----------
    @lru_cache(maxsize=None)
    def docs10_dir() -> str:
        return _replicate_salted(
            f"{SF_DIR}/documents.parquet", BIG + "/docs10s", 10, {"doc_id": 1_000_000}
        )

    def docs10() -> rd.Dataset:
        return rd.read_parquet(sorted(glob.glob(docs10_dir() + "/*.parquet")))

    @lru_cache(maxsize=None)
    def n_docs10() -> int:
        return docs10().count()
    run(
        "minhash_lsh_10x",
        n_docs10,
        lambda: textdedup.minhash_lsh_pairs(docs10(), threshold=0.5),
    )
    run(
        "ngram_jaccard_10x",
        n_docs10,
        lambda: textdedup.ngram_jaccard_pairs(docs10(), threshold=0.5),
    )
    run(
        "boilerplate_lines_10x",
        n_docs10,
        lambda: curation.remove_boilerplate_lines(docs10(), max_doc_freq=2),
    )

    def _q5():
        from rayquality.ops import multijoin

        # region/nation/supplier/customer stay unreplicated (dimensions);
        # the two big joins probe the full 10x orders/lineitem volume
        return multijoin.q5_local_supplier_volume(
            rd.read_parquet(f"{SF_DIR}/region.parquet"),
            rd.read_parquet(f"{SF_DIR}/nation.parquet"),
            rd.read_parquet(f"{SF_DIR}/supplier.parquet"),
            rd.read_parquet(f"{SF_DIR}/customer.parquet"),
            orders(),
            lineitem(),
        )

    run("q5_local_supplier_10x", n_li, _q5)

    def _bloom():
        import pyarrow.compute as pc

        from rayquality.ops import bloom

        urgent = orders().map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")),
            batch_format="pyarrow",
        )
        return bloom.bloom_semi_join(
            lineitem(), "l_orderkey", urgent, "o_orderkey",
            ["l_orderkey", "l_linenumber"],
        )

    run("bloom_semi_join_10x", n_li, _bloom)

    def _if_counted(fn):
        # report only counts an op actually forced; never pay for a skipped
        # corpus just to fill the header
        return fn() if fn.cache_info().currsize else None

    payload = {
        "n_docs": _if_counted(n_docs),
        "n_events": _if_counted(n_ev),
        "n_orders": _if_counted(n_ord),
        "ops": results,
    }
    if shutdown:
        ray.shutdown()
    return payload


def _replicate_salted(
    src: str, out_dir: str, n_rep: int, id_cols: dict[str, int], text_col: str = "text"
) -> str:
    """Replicas with a per-replica salt suffixed onto EVERY word: TRUE
    n_rep-x volume scaling for shingle-based ops. Word vocabularies are
    disjoint across replicas, so replicas of the same content share no
    shingle (never LSH candidates, never verified pairs) while token counts
    and within-replica shingle frequency statistics are IDENTICAL to the
    base corpus — the workload is n_rep independent copies of the base
    problem. ``_replicate``'s identical contents instead make every bucket a
    C(n_rep,2) hot cluster (quadratic verification work — a SKEW test, which
    docs100's exact-dedup rows already cover, not a volume test)."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_OK")
    if os.path.exists(marker):
        return out_dir
    base = pd.read_parquet(src)
    for r in range(n_rep):
        df = base.copy()
        for c, stride in id_cols.items():
            df[c] = df[c] + r * stride
        df[text_col] = df[text_col].str.replace(r"(\S+)", rf"\1zq{r}", regex=True)
        df.to_parquet(os.path.join(out_dir, f"rep-{r:03d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


if __name__ == "__main__":
    main()
