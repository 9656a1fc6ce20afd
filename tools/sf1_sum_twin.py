#!/usr/bin/env python
"""Deterministic-summation twins for the sf1 q05/q19 boundary flips
(VERDICT r12 #3).

`SF1_CORRECTNESS_r12.json` left q05/q19 as the only sf1 non-exact rows:
their 2dp-rounded double sums land ON the .xx5 rounding boundary, and the
final digit flips with cross-engine (and run-to-run) partial-aggregation
order. driver_sim's classify_mismatch DIAGNOSES that as ulp-class; this
instrument POSITIVELY DEMONSTRATES the artifact class by removing
association order from the arithmetic and showing the disagreement
vanishes:

  twin leg   both engines compute sum(CAST(term AS DECIMAL(38,10))) —
             per-term double->decimal conversion is a deterministic
             function of each input row (no order dependence), and decimal
             addition is exact and associative, so ANY aggregation order
             yields the same mathematical value. The UNROUNDED decimal sums
             are compared exactly (decimal.Decimal equality per group, all
             groups, both queries). Exact match here proves both engines
             agree on every group's true sum — the residual double-path
             disagreement can only be final-rounding association order.

  double leg the gated double-path query vs its gated oracle, hashed the
             driver's way: either exact (the flip sets wander run to run)
             or a mismatch that classify_mismatch labels ulp-class. A real
             logic bug fails BOTH legs and the tool exits non-zero.

Run after `tools/gen_sf_replica.py` (the sf1 fixtures are gitignored and
re-imaged away between sessions). Writes SF1_SUM_TWIN.json.

Usage: python tools/sf1_sum_twin.py [sf1_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from driver_sim import canon, classify_mismatch
from score_spark.io import TABLES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the exact double-path term both queries sum; the twin casts it per-term
_TERM = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))"

TWIN_SQL = {
    # identical strings run on BOTH engines (Spark SQL and DuckDB parse
    # these the same way) — one source of truth per twin, so the two
    # engines cannot drift apart by construction of the harness itself
    "q05_regional_revenue": f"""
        SELECT r_name, n_name,
               CAST(sum({_TERM}) AS STRING) AS revenue_dec
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "q19_broadcast_part_join": f"""
        SELECT p_brand,
               CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_TERM}
                             ELSE CAST(0 AS DECIMAL(38,10)) END) AS STRING)
                 AS promo_revenue_dec,
               CAST(sum({_TERM}) AS STRING) AS total_revenue_dec
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-07-01'
        GROUP BY p_brand
        ORDER BY p_brand
    """,
}


def _twin_compare(spark, con, sql: str) -> dict:
    """Run one twin SQL on both engines; compare group keys exactly and
    every *_dec column as decimal.Decimal (render-format-proof)."""
    s = spark.sql(sql).toPandas()
    e = con.sql(sql.replace("AS STRING", "AS VARCHAR")).fetchdf()
    out = {"groups": len(s), "exact": False, "max_abs_delta": None}
    if len(s) != len(e) or list(s.columns) != list(e.columns):
        out["error"] = f"shape skew: spark {s.shape} vs duckdb {e.shape}"
        return out
    if out["groups"] == 0:
        out["error"] = "vacuous: zero groups"
        return out
    key_cols = [c for c in s.columns if not c.endswith("_dec")]
    s = s.sort_values(key_cols).reset_index(drop=True)
    e = e.sort_values(key_cols).reset_index(drop=True)
    for c in key_cols:
        if not s[c].astype(str).equals(e[c].astype(str)):
            out["error"] = f"group keys diverge in {c}"
            return out
    deltas = []
    for c in s.columns:
        if not c.endswith("_dec"):
            continue
        dv = [abs(Decimal(a) - Decimal(b)) for a, b in zip(s[c], e[c])]
        deltas.extend(dv)
    out["max_abs_delta"] = str(max(deltas))
    out["exact"] = max(deltas) == 0
    return out


def _double_leg(spark, con, name: str, sf: str) -> dict:
    """The gated double-path query vs its gated oracle, driver-hashed."""
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    a = canon(qs[name](spark, sf).toPandas())
    e = canon(con.sql(osql[name]).fetchdf())
    ha = hashlib.md5(a.to_csv(index=False).encode()).hexdigest()
    he = hashlib.md5(e.to_csv(index=False).encode()).hexdigest()
    if ha == he:
        return {"hash_match": True, "ulp_class": None, "deltas": {}}
    deltas, is_ulp = classify_mismatch(a, e)
    return {"hash_match": False, "ulp_class": bool(is_ulp), "deltas": deltas}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scale_fixtures", "sf1")
    if not os.path.isdir(sf):
        print(f"sf1 fixtures missing at {sf}: run `python tools/gen_sf_replica.py` first")
        return 2
    os.environ["SCORE_SPARK_ORACLE_SF_DIR"] = sf

    from score_spark.session import get_session

    spark = get_session(app_name="sf1-sum-twin", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    con.execute("SET TimeZone='America/Chicago'")
    from score_spark.io import load_table

    for t in TABLES:
        # same TWIN_SQL string runs on both engines: Spark reads the tables
        # through the memoized load_table path as temp views, DuckDB
        # through read_parquet views (directory fixtures need the glob)
        load_table(spark, sf, t).createOrReplaceTempView(t)
        src = f"{sf}/{t}.parquet"
        pat = f"{src}/*.parquet" if os.path.isdir(src) else src
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    report: dict = {"sf_dir": sf}
    ok = True
    for name, sql in TWIN_SQL.items():
        twin = _twin_compare(spark, con, sql)
        dbl = _double_leg(spark, con, name, sf)
        report[name] = {"decimal_twin": twin, "double_path": dbl}
        # the twin must be EXACT; the double path must be exact or ulp-class
        ok &= twin.get("exact", False)
        ok &= dbl["hash_match"] or bool(dbl["ulp_class"])
        print(
            f"{name}: twin exact={twin.get('exact')} groups={twin.get('groups')} "
            f"max_delta={twin.get('max_abs_delta')} | double hash_match={dbl['hash_match']} "
            f"ulp_class={dbl['ulp_class']} deltas={dbl['deltas']}"
        )
    report["verdict"] = "PASS" if ok else "FAIL"
    with open(os.path.join(REPO, "SF1_SUM_TWIN.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"verdict={report['verdict']} -> SF1_SUM_TWIN.json")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
