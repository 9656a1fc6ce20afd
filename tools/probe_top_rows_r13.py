#!/usr/bin/env python
"""Stage-timeline probe for the most expensive sf0.1 bench rows (opt round 13).

Generic over registry names: times construction+noop (oracle-channel writes
drained out, mirroring bench.py), then diffs completed stages around one
timed run via the UI REST API using the probe_c02_m01 instrument. For the
two-leg gate rows, probe the legs (d04_legs / s05_legs) instead — those
exclude xcheck writes, so the stage timeline is pure pipeline.

Usage: python tools/probe_top_rows_r13.py [sf_dir] [name ...]
Names may be registry queries or "d04:classic64" / "s05:auto" leg refs.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import probe_c02_m01 as P  # noqa: E402

RUNS = 4
DEFAULT = (
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "d05_dup_clusters",
    "k01_bucketed_join",
    "s03_ann_lsh",
    "s04_ann_ivf",
    "d04:classic64",
    "d04:wideauto",
    "s05:tuned8x8",
    "s05:auto",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(DEFAULT)

    from score_spark import xcheck
    from score_spark.operators.dedup import d04_legs
    from score_spark.operators.similarity import s05_legs
    from score_spark.queries import QUERIES
    from score_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="probe-top-rows-r13",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4063"},
    )

    def _warm(batches):
        yield from batches

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_warm, "id long").count()

    legs_fns = {"d04": d04_legs, "s05": s05_legs}

    def build(name):
        if ":" in name:
            fam, leg = name.split(":", 1)
            return legs_fns[fam](spark, sf_dir)[leg]
        return QUERIES[name](spark, sf_dir)

    report = {"sf_dir": sf_dir, "runs": RUNS, "queries": {}}
    for name in names:
        try:
            for _ in range(2):
                build(name).write.format("noop").mode("overwrite").save()
            xcheck.drain_oracle_sec()
            walls = []
            for _ in range(RUNS):
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                t0 = time.monotonic()
                df = build(name)
                df.write.format("noop").mode("overwrite").save()
                elapsed = time.monotonic() - t0
                walls.append(round(elapsed - xcheck.drain_oracle_sec(), 3))
                del df
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            before = {s["stageId"] for s in P._rest(spark, "stages?status=complete")}
            t0 = time.monotonic()
            df = build(name)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.monotonic() - t0 - xcheck.drain_oracle_sec(), 3)
            tl = P._stage_timeline(spark, before)
            acct = P._gap_accounting(tl)
            report["queries"][name] = {
                "walls": walls,
                "best": min(walls),
                "timed_run_wall": wall,
                "n_stages": len(tl),
                "sum_execRunSec": round(sum(r["execRunSec"] for r in tl), 3),
                "gap_accounting": acct,
                "stages": [
                    {k: v for k, v in r.items() if k not in ("t0", "t1")} for r in tl
                ],
            }
        except Exception as e:  # keep probing the rest
            report["queries"][name] = {"error": str(e)[:300]}
        print(f"## {name}: {json.dumps(report['queries'][name].get('walls') or report['queries'][name])}", file=sys.stderr)
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
