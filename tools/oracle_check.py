"""Side-by-side Ray-vs-DuckDB oracle check — same comparison the driver runs.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(sf)
            gdf = got.to_pandas() if hasattr(got, "to_pandas") else pd.DataFrame(got)
            if name not in oracles:
                print(f"{name}: rows={len(gdf)} (rows-only, no oracle)")
                continue
            odf = con.sql(oracles[name]).df()
            g, o = norm(gdf), norm(odf)
            if list(g.columns) != list(o.columns):
                print(f"{name}: SCHEMA MISMATCH {list(g.columns)} vs {list(o.columns)}")
                failures += 1
                continue
            if len(g) != len(o):
                print(f"{name}: ROWCOUNT {len(g)} vs {len(o)}")
                failures += 1
                continue
            bad_cols = []
            for c in g.columns:
                a, b = g[c].to_numpy(), o[c].to_numpy()
                if a.dtype.kind == "f":
                    eq = (a == b) | (np.isnan(a) & np.isnan(b))
                else:
                    eq = a == b
                if not eq.all():
                    bad_cols.append((c, a[~eq][:2], b[~eq][:2]))
            if bad_cols:
                print(f"{name}: VALUE MISMATCH {[(c, x.tolist(), y.tolist()) for c, x, y in bad_cols]}")
                failures += 1
            else:
                print(f"{name}: rows={len(g)} OK")
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
