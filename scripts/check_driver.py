"""Local simulation of the driver's correctness gate: run every queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive exact values)."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    """Dtype-STRICT comparison: the driver hashes values dtype-sensitively
    (int64 vs float64, datetime64[s] vs [us] are mismatches), so this gate
    must fail on any dtype divergence to predict the driver (VERDICT r1)."""
    if sorted(got.columns) != sorted(want.columns):
        return f"SCHEMA MISMATCH got={sorted(got.columns)} want={sorted(want.columns)}"
    if len(got) != len(want):
        return f"ROWCOUNT {len(got)} vs {len(want)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        if g[c].dtype != w[c].dtype:
            return f"DTYPE DIFF col={c} got={g[c].dtype} want={w[c].dtype}"
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        eq = gv == wv
        if not np.asarray(eq).all():
            bad = np.nonzero(~np.asarray(eq))[0][:3]
            return f"VALUE DIFF col={c} rows={bad.tolist()} got={gv[bad]} want={wv[bad]}"
    return "OK"


def main() -> None:
    bad_json = [a for a in sys.argv[1:] if a.startswith("--json") and "=" not in a]
    if bad_json:
        sys.exit("error: --json requires a path — use --json=PATH")
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_out = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1] if len(args) > 1 else None
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    sqls = e.oracle_sql()
    fails = 0
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and only not in name:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:35s} EXEC-ERROR {type(exc).__name__}: {exc}")
            fails += 1
            records[name] = {
                "oracled": name in sqls,
                "ok": False,
                "err": f"{type(exc).__name__}: {exc}"[:300],
            }
            continue
        dt = time.time() - t0
        if name in sqls:
            want = con.sql(sqls[name]).df()
            verdict = compare(name, got, want)
            records[name] = {
                "oracled": True,
                "ok": verdict == "OK",
                "rows": len(got),
                "oracle_rows": len(want),
                "sec": round(dt, 1),
                "err": None if verdict == "OK" else verdict[:300],
            }
        else:
            verdict = f"rows-only ({len(got)} rows)"
            records[name] = {
                "oracled": False,
                "ok": True,
                "rows": len(got),
                "sec": round(dt, 1),
                "err": None,
            }
        status = verdict if verdict.startswith(("OK", "rows-only")) else f"FAIL {verdict}"
        if status.startswith("FAIL"):
            fails += 1
        print(f"{name:35s} {dt:6.1f}s  {status}")
    print("FAILURES:", fails)
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": records}, f, indent=1)
        print("wrote", json_out)
    ray.shutdown()


if __name__ == "__main__":
    main()
