#!/usr/bin/env python
"""Simulate the driver's correctness gate: run every __spark_entry__.queries()
entry and its oracle_sql() via DuckDB at sf0.01 (or argv[1]), compare via
sort-columns-then-exact-hash. Strict on dtype skew (int vs float renders
differently) so dtype misalignment surfaces here, not in CORRECTNESS_r{N}.json.

Usage: python tools/driver_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

# ONE table list (review r8: a hand-duplicated copy here would silently miss
# a future fixture table and fail oracles with a confusing missing-view error)
from score_spark.io import TABLES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from score_spark.session import get_session

    spark = get_session(app_name="driver-sim", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, osql = E.queries(), E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name previously yielded "hash-match: 0/0" with exit 0 —
        # a green gate that verified nothing (review r8)
        print(f"unknown query name(s): {sorted(unknown)}; known: {sorted(qs)}")
        return 2
    entry_rows = E.entry(spark).count()
    print(f"entry(): {entry_rows} rows")

    bad, no_oracle = [], []
    for name in sorted(qs):
        if only and name not in only:
            continue
        if name not in osql:
            n = qs[name](spark, sf).count()
            no_oracle.append(name)
            print(f"  {name}: rows-only ({n} rows)")
            continue
        a = canon(qs[name](spark, sf).toPandas())
        e = canon(con.execute(osql[name]).fetchdf())
        ha = hashlib.md5(a.to_csv(index=False).encode()).hexdigest()
        he = hashlib.md5(e.to_csv(index=False).encode()).hexdigest()
        if ha != he:
            bad.append(name)
            print(f"  MISMATCH {name}: spark {len(a)}x{len(a.columns)} vs oracle {len(e)}x{len(e.columns)}")
            if list(a.columns) != list(e.columns):
                print(f"    cols: {list(a.columns)} vs {list(e.columns)}")
            else:
                # diff printing must never abort the remaining checks: a
                # float64-vs-object dtype skew (the exact class this gate
                # exists to surface) made .merge raise (review r8)
                try:
                    merged = a.astype(str).merge(e.astype(str), indicator=True, how="outer")
                    print(merged[merged._merge != "both"].head(6).to_string())
                except Exception as ex:
                    print(f"    (diff unavailable: {type(ex).__name__}: {ex})")
    n_checked = len([n for n in qs if not only or n in only])
    print(f"hash-match: {n_checked - len(bad) - len(no_oracle)}/{n_checked} (rows-only: {len(no_oracle)}); mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
