#!/usr/bin/env python
"""ABAB the near_dup_pairs_lsh rerank tiers in ONE session (opt round 14).

SCORE_SPARK_RERANK_GATHER_MAX_BYTES is read at call time, so the same
session alternates join-tier (budget 0) and gather-tier (default) runs of
the s05 legs — controlling for host drift, page cache and JIT. Times the
full leg pipeline (candidates + rerank, noop sink), best-of per tier.

Usage: python tools/probe_r14_gather_abab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, ".scale_fixtures", "sf1")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from score_spark.io import load_table
    from score_spark.operators.similarity import lsh_pair_candidates, near_dup_pairs_lsh
    from score_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(app_name="probe-r14-gather-abab", master=f"local[{cpus}]")
    emb = load_table(spark, sf_dir, "embeddings")

    legs = {
        "tuned8x8": lambda: near_dup_pairs_lsh(
            emb, threshold=0.3, cand=lsh_pair_candidates(emb, n_tables=8, n_planes=8)
        ),
        "auto": lambda: near_dup_pairs_lsh(
            emb, threshold=0.3, cand=lsh_pair_candidates(emb, n_tables=8, n_planes=None)
        ),
    }
    tiers = {"join": "0", "gather": str(64 << 20)}

    walls: dict[tuple[str, str], list[float]] = {}
    for leg, build in legs.items():
        for tier, budget in tiers.items():
            os.environ["SCORE_SPARK_RERANK_GATHER_MAX_BYTES"] = budget
            build().write.format("noop").mode("overwrite").save()  # warm both tiers
        for r in range(rounds):
            for tier, budget in tiers.items():
                os.environ["SCORE_SPARK_RERANK_GATHER_MAX_BYTES"] = budget
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                t0 = time.monotonic()
                build().write.format("noop").mode("overwrite").save()
                w = round(time.monotonic() - t0, 3)
                walls.setdefault((leg, tier), []).append(w)
                print(f"## {leg} {tier} round{r}: {w}s", file=sys.stderr)
    for (leg, tier), ws in walls.items():
        print(f"{leg:10s} {tier:7s} best {min(ws):7.3f} walls {ws}")
    spark.stop()


if __name__ == "__main__":
    main()
