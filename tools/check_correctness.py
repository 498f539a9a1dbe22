"""Local simulation of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side over an sf dir,
compare row count + schema + order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df) -> str:
    df = normalize(df)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.md5(payload).hexdigest()


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as ent

    qs = ent.queries()
    oracles = ent.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            results[name] = {"status": "RAY_ERROR", "error": str(e)[:500]}
            print(f"{name:24s} RAY_ERROR {str(e)[:200]}")
            continue
        elapsed = time.perf_counter() - t0
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(got), "sec": round(elapsed, 2)}
            print(f"{name:24s} rows_only rows={len(got)} ({elapsed:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = {"status": "SQL_ERROR", "error": str(e)[:500]}
            print(f"{name:24s} SQL_ERROR {str(e)[:200]}")
            continue
        g, w = normalize(got), normalize(want)
        ok_rows = len(g) == len(w)
        ok_schema = list(g.columns) == list(w.columns)
        ok_hash = value_hash(got) == value_hash(want)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        results[name] = {
            "status": status, "rows": len(g), "oracle_rows": len(w),
            "schema": ok_schema, "hash": ok_hash, "sec": round(elapsed, 2),
        }
        print(f"{name:24s} {status} rows={len(g)}/{len(w)} schema={ok_schema} hash={ok_hash} ({elapsed:.1f}s)")
        if status == "MISMATCH" and len(g) and len(w):
            gd, wd = g.dtypes.to_dict(), w.dtypes.to_dict()
            if gd != wd:
                print(f"   dtypes ray={gd} oracle={wd}")
            merged = g.merge(w, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())

    n_ok = sum(1 for r in results.values() if r["status"] in ("OK", "rows_only"))
    print(f"\n{n_ok}/{len(results)} ok")
    Path("/tmp/correctness_local.json").write_text(json.dumps(results, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
