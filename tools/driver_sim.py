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


def _granularity(vals: pd.Series) -> float | None:
    """Smallest power-of-ten granule (1 .. 1e-6) that every value is an
    integer multiple of, within float64 noise — 2dp-rounded sums report
    0.01, counts report 1.0. None if nothing fits (unrounded doubles).

    Known conservative edge (ADVICE r12, accepted): when every sampled
    value of a genuinely-decimal column happens to be whole (all amounts
    end in .00), this returns 1.0 and the "integer-granule: any delta is
    real" rule blocks ulp-classification of a true 0.01 boundary flip on
    that column — a false NEGATIVE in an informational annotation (the
    mismatch stays flagged as real). Inferring granularity from declared
    dtype would need schema plumbing the sim doesn't carry; erring toward
    "real mismatch" is the safe direction."""
    v = pd.to_numeric(vals, errors="coerce").dropna()
    if v.empty:
        return None
    for nd in range(0, 7):
        g = 10.0**-nd
        scaled = v / g
        # eps scales with the value: at 5e8/0.01 the scaled magnitude is
        # ~5e10 and float64 ulp noise alone is ~1e-5
        if ((scaled - scaled.round()).abs() <= scaled.abs() * 1e-12 + 1e-9).all():
            return g
    return None


def classify_mismatch(a: pd.DataFrame, e: pd.DataFrame) -> tuple[dict, bool]:
    """(per-column max |delta|, is_ulp_class) over two CANONICAL frames.

    ulp-class = the automated form of the sf1 q05/q19 diagnosis (a true sum
    landing ON the .xx5 rounding boundary, flipped by cross-engine
    summation order): same shape, every non-numeric column exactly equal,
    every integer-granule column exactly equal, and every decimal column
    off by AT MOST ONE GRANULE on AT MOST 25% of rows. A rounding-MODE bug
    (floor vs half-even) flips ~half the rows and stays a real mismatch;
    misaligned rows blow the deltas up and stay a real mismatch.

    Alignment (ADVICE r12): canon() sorts rows by ALL columns, so when the
    differing float column sorts alphabetically BEFORE the identity
    columns, a one-granule flip reorders rows and a positional diff
    misattributes whole-row deltas. Both frames are therefore re-sorted by
    the NON-NUMERIC columns first (stable sort, so rows that tie on every
    identity column keep their canon order). Duplicate identity keys whose
    group members differ only in flipped numerics can still misalign
    within the group — that residual stays conservative (labels a true
    ulp flip as a real mismatch, never the reverse)."""
    deltas: dict[str, float] = {}
    if len(a) != len(e) or list(a.columns) != list(e.columns):
        return deltas, False

    def _is_numeric(col: str) -> bool:
        try:
            pd.to_numeric(a[col]), pd.to_numeric(e[col])
        except (ValueError, TypeError):
            return False
        return True

    keys = [c for c in a.columns if not _is_numeric(c)]
    if keys:
        a = a.sort_values(keys, kind="mergesort").reset_index(drop=True)
        e = e.sort_values(keys, kind="mergesort").reset_index(drop=True)
    ulp = len(a) > 0
    for c in a.columns:
        try:
            av, ev = pd.to_numeric(a[c]), pd.to_numeric(e[c])
        except (ValueError, TypeError):
            if not a[c].astype(str).equals(e[c].astype(str)):
                ulp = False
            continue
        if not av.isna().equals(ev.isna()):
            # NULL on one side, a value on the other: (a-e) is NaN there and
            # .max() skips NaN, so without this check a wrong-NULL logic bug
            # would sail through as "no delta" and be certified ulp-class
            # (review r12). Matched NaN positions are equality.
            ulp = False
        d = (av - ev).abs()
        dmax = float(d.max()) if len(d) else 0.0
        if dmax > 0:
            deltas[c] = round(dmax, 9)
            g = _granularity(pd.concat([a[c], e[c]]))
            # "one granule" needs a noise allowance scaled to the VALUES'
            # magnitude, not the granule: a 0.01 flip on a 1.4e8 sum
            # round-trips through float64 as 0.01000002 (ulp ~3e-8), which
            # g * 1.000001 rejected (sf1 q19). Cap the allowance below
            # half a granule so one granule can never blur into two.
            vmax = float(pd.to_numeric(pd.concat([a[c], e[c]])).abs().max())
            noise = min(0.4 * (g or 1.0), vmax * 1e-12 + 1e-9)
            if (
                g is None
                or g >= 1.0  # integer-granule column: any delta is real
                or dmax > g + noise  # more than one rounding granule off
                or (d > g * 1e-6).mean() > 0.25  # too many rows flipped
            ):
                ulp = False
    return deltas, ulp


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


# Spark simpleString -> acceptable DuckDB declared type(s). canon()
# stringifies every dtype before hashing, so a TIMESTAMP/TIMESTAMPTZ or
# int64/float64 skew sailed through the sim and shipped red at the driver
# (h01, r8 — VERDICT r8 #3). This check runs on DECLARED types (Spark
# schema vs the DuckDB relation's .types) BEFORE canonicalization.
# Deliberately absent: TIMESTAMP WITH TIME ZONE is acceptable for NO spark
# type — the driver's strict schema compare treats it as skew.
# Width-only integer skews (spark int vs duckdb BIGINT, etc.) are ALLOWED:
# the driver's r8 gate passed q09/t01 with exactly that shape — integers of
# any width render identically. HUGEINT is NOT allowed: it fetches as
# float64 and renders '5.0' vs '5' (the SKILL.md sum(INT) gotcha).
_DUCK_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_SPARK_TO_DUCK = {
    "bigint": _DUCK_INTS,
    "int": _DUCK_INTS,
    "smallint": _DUCK_INTS,
    "tinyint": _DUCK_INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP"},
    "binary": {"BLOB"},
}


def dtype_skews(spark_df, duck_rel) -> list[str]:
    """Declared-dtype mismatches between a Spark DataFrame and a DuckDB
    relation, by column name. Complex/unmapped Spark types are skipped
    (the skew class that ships red is primitive: timestamps and numerics);
    DECIMAL(p,s) must match exactly."""
    duck = {c: str(t).upper() for c, t in zip(duck_rel.columns, duck_rel.types)}
    out = []
    for f in spark_df.schema.fields:
        s = f.dataType.simpleString()
        d = duck.get(f.name)
        if d is None:
            continue  # column-set mismatch surfaces in the hash compare
        if s.startswith("decimal"):
            if d.replace(" ", "") != s.upper().replace(" ", ""):
                out.append(f"{f.name}: spark {s} vs duckdb {d}")
        elif s in _SPARK_TO_DUCK and d not in _SPARK_TO_DUCK[s]:
            out.append(f"{f.name}: spark {s} vs duckdb {d}")
    return out


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracle strings freeze at operator-module import and embed the
    # sf-tagged xcheck paths (r9) — point them at THIS run's sf before
    # __spark_entry__ pulls the query registry in. Direct assignment, not
    # setdefault: a stale export from an earlier debugging session must not
    # silently pin the oracles to a different sf than argv's (review r9)
    os.environ["SCORE_SPARK_ORACLE_SF_DIR"] = sf

    import __spark_entry__ as E
    from score_spark.session import get_session

    spark = get_session(app_name="driver-sim", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    # non-UTC session tz: an oracle whose output depends on the reader's
    # TimeZone (the r8 h01 class — AT TIME ZONE / TIMESTAMPTZ widening)
    # diverges HERE rather than only in the driver's environment
    con.execute("SET TimeZone='America/Chicago'")
    for t in TABLES:
        # driver testdata is one file per table; replicated scale fixtures
        # (tools/gen_sf_replica.py) are Spark-written DIRECTORIES — glob
        # them so the sim runs at sf1+ too (VERDICT r11 #6)
        src = f"{sf}/{t}.parquet"
        pat = f"{src}/*.parquet" if os.path.isdir(src) else src
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    qs, osql = E.queries(), E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name previously yielded "hash-match: 0/0" with exit 0 —
        # a green gate that verified nothing (review r8)
        print(f"unknown query name(s): {sorted(unknown)}; known: {sorted(qs)}")
        return 2
    entry_rows = E.entry(spark).count()
    print(f"entry(): {entry_rows} rows")

    bad, no_oracle, ulp_class = [], [], []
    for name in sorted(qs):
        if only and name not in only:
            continue
        if name not in osql:
            n = qs[name](spark, sf).count()
            no_oracle.append(name)
            print(f"  {name}: rows-only ({n} rows)")
            continue
        sdf = qs[name](spark, sf)
        rel = con.sql(osql[name])
        # declared-dtype check FIRST: it needs only sdf.schema and
        # rel.types — a skewed query skips the full collect+canon entirely.
        # NOTE the Spark query's ACTIONS (xcheck writes, persists) already
        # ran at construction above, so the oracle's channel reads are fresh
        skews = dtype_skews(sdf, rel)
        if skews:
            bad.append(name)
            print(f"  DTYPE-SKEW {name}: " + "; ".join(skews))
            continue
        a = canon(sdf.toPandas())
        e = canon(rel.fetchdf())
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
                deltas, is_ulp = classify_mismatch(a, e)
                if deltas:
                    print(f"    max numeric deltas (aligned): {deltas}")
                if is_ulp:
                    ulp_class.append(name)
                    print(
                        "    ulp-class: every delta <= one rounding granule on "
                        "<= 25% of rows (summation-order boundary flip)"
                    )
    n_checked = len([n for n in qs if not only or n in only])
    suffix = f" (ulp-class: {ulp_class})" if ulp_class else ""
    print(
        f"hash-match: {n_checked - len(bad) - len(no_oracle)}/{n_checked} "
        f"(rows-only: {len(no_oracle)}); mismatches: {bad}{suffix}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
