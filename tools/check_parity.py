"""Local replica of the driver's correctness harness: runs each
__ray_entry__ query AND its DuckDB oracle on the same sf dir, compares
row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if not len(df.columns):
            # Dataset.to_pandas() drops columns on 0 rows even when the
            # dataset carries a schema (all-empty blocks) — rebuild the
            # empty frame from the schema so column comparison holds.
            # schema() itself is None when the empty pipeline produced
            # ZERO blocks (fully-empty map_groups output) — leave the
            # column-less frame; the comparator vacuous-passes it
            # against an equally-empty oracle.
            sch = res.schema()
            if sch is not None:
                df = pd.DataFrame({n: pd.Series(dtype=t.to_pandas_dtype())
                                   for n, t in zip(sch.names, sch.types)})
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            rdf = to_pandas(fn(sf_dir))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: ray error {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(rdf)} (rows-only, {dt:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: oracle error {ex}")
            continue
        a, b = canon(rdf), canon(odf)
        if len(a) == 0 and len(b) == 0 and not len(a.columns):
            # zero-block Ray result (schema unrecoverable) vs an
            # equally-empty oracle: vacuously equal
            print(f"PASS {name}: rows=0 (both empty; ray schema lost, {dt:.1f}s)")
            continue
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL {name}: columns ray={list(a.columns)} sql={list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: rows ray={len(a)} sql={len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            failures.append(name)
            print(f"FAIL {name}: {int(bad.sum())}/{len(a)} rows differ; first:")
            print(pd.concat([a[bad].head(3).add_suffix("_ray"),
                             b[bad].head(3).add_suffix("_sql")], axis=1))
            continue
        print(f"PASS {name}: rows={len(a)} ({dt:.1f}s)")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
