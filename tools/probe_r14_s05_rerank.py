#!/usr/bin/env python
"""Per-run stage timelines for the s05 tuned8x8 leg at sf1 (opt round 14).

The round-14 sf1 scaling campaign measured the leg FASTER at 8 cores than 32
(5.75 vs 6.52 s) and the generic probe recorded a 5x spread between warm
walls (~4.2 s) and its timed run (20.3 s, execRunSec 588 core-s in the final
rerank stage). Before touching the rerank this probe answers, run by run:

- how many distinct candidate pairs the leg reranks at sf1;
- the per-run execRunSec of each stage (is the 588 core-s save stage a
  stable cost or a GC/oversubscription outlier?);
- where the rerank wall goes: candidates-only vs full rerank walls.

Usage: python tools/probe_r14_s05_rerank.py [sf_dir] [runs]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, ".scale_fixtures", "sf1")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from score_spark.io import load_table
    from score_spark.operators.similarity import lsh_pair_candidates, near_dup_pairs_lsh
    from score_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="probe-r14-s05-rerank",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4064"},
    )

    emb = load_table(spark, sf_dir, "embeddings")

    # candidate volume (one-off, not timed)
    n_cand = lsh_pair_candidates(emb, n_tables=8, n_planes=8).count()
    n_emb = emb.count()
    print(f"## sf1 embeddings={n_emb} tuned8x8 distinct candidates={n_cand}", file=sys.stderr)

    def full():
        return near_dup_pairs_lsh(
            emb, threshold=0.3, cand=lsh_pair_candidates(emb, n_tables=8, n_planes=8)
        )

    def cand_only():
        return lsh_pair_candidates(emb, n_tables=8, n_planes=8)

    report = {"sf_dir": sf_dir, "n_emb": n_emb, "n_cand": n_cand, "legs": {}}
    for label, build in (("cand_only", cand_only), ("full", full)):
        build().write.format("noop").mode("overwrite").save()  # warm
        rows = []
        for i in range(runs):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            before = {s["stageId"] for s in P._rest(spark, "stages?status=complete")}
            t0 = time.monotonic()
            build().write.format("noop").mode("overwrite").save()
            wall = round(time.monotonic() - t0, 3)
            tl = P._stage_timeline(spark, before)
            rows.append(
                {
                    "wall": wall,
                    "n_stages": len(tl),
                    "sum_execRunSec": round(sum(r["execRunSec"] for r in tl), 3),
                    "stages": [
                        {k: v for k, v in r.items() if k not in ("t0", "t1")} for r in tl
                    ],
                }
            )
            print(f"## {label} run{i}: wall={wall} execSum={rows[-1]['sum_execRunSec']}", file=sys.stderr)
        report["legs"][label] = rows
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
