#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry and its ``oracle_sql()``
counterpart (DuckDB over the same parquet dir) at the given sf dir, then
compares row count, schema (column names), and a value hash computed the
way the driver does: sort columns by name, sort rows, round floats, hash.

Usage: python scripts/driver_mimic.py [sf_dir] [--only name1,name2]
Writes a JSON summary to stdout (one line per query + final tally).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df):
    """Driver-style canonical form: pandas df -> (nrows, cols, value hash)."""
    import numpy as np
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            # normalize bytes/lists deterministically
            df[c] = col.map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                else (json.dumps([round(float(x), 6) for x in v])
                      if isinstance(v, (list, tuple, np.ndarray)) else str(v))
            )
        elif np.issubdtype(col.dtype, np.floating):
            # widen f32→f64 BEFORE rounding: equal values must hash equal
            # regardless of which engine's column width they arrived in
            # (cosine distances come back f32 from DuckDB, f64 from numpy;
            # 6-decimal rounding alone leaves ~1e-8 engine noise AND the
            # raw-byte hash still differs across widths)
            df[c] = col.astype(np.float64).round(4)
        elif np.issubdtype(col.dtype, np.integer):
            df[c] = col.astype(np.int64)
        elif np.issubdtype(col.dtype, np.datetime64):
            # ns-vs-us unit changes the pandas hash for identical instants
            df[c] = col.astype("datetime64[ns]")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()[:16]
    return len(df), list(df.columns), h


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    n_pass = n_rows_only = n_fail = n_err = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {}
        t0 = time.time()
        try:
            ray_df = _to_pandas(fn(sf_dir))
            rec["ray_rows"] = len(ray_df)
            if name in oracles:
                ora_df = con.execute(oracles[name]).df()
                rn, rc, rh = _canon(ray_df)
                on, oc, oh = _canon(ora_df)
                rec.update(rows_match=(rn == on), schema_match=(rc == oc),
                           hash_match=(rh == oh), ray_n=rn, ora_n=on)
                if rc != oc:
                    rec["ray_cols"], rec["ora_cols"] = rc, oc
                if rn == on and rc == oc and rh == oh:
                    rec["status"] = "pass"; n_pass += 1
                else:
                    rec["status"] = "FAIL"; n_fail += 1
            else:
                rec["status"] = "no_oracle"; n_rows_only += 1
        except Exception as e:  # noqa: BLE001
            rec["status"] = "ERROR"
            rec["error"] = f"{type(e).__name__}: {e}"
            rec["trace"] = traceback.format_exc()[-800:]
            n_err += 1
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        line = {k: v for k, v in rec.items() if k != "trace"}
        print(json.dumps({name: line}), flush=True)

    print(json.dumps({"TOTAL": {"pass": n_pass, "no_oracle": n_rows_only,
                                "fail": n_fail, "error": n_err,
                                "n": len(results)}}))
    fails = {k: v for k, v in results.items() if v["status"] in ("FAIL", "ERROR")}
    if fails:
        print("\n--- failures ---", file=sys.stderr)
        for k, v in fails.items():
            print(k, json.dumps(v, default=str)[:2000], file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
