#!/usr/bin/env python
"""d05 second-decade probe (VERDICT r10 "Next round" #2).

SCALE.md's d05 decade-2 cell (12.21, the only >10 work ratio left) was
measured in the late-session harness leg documented to inflate (d02's cell
swung 38.9 -> 23.9 -> 9.7 under controlled re-measurement). This probe
applies the d02 discipline, plus the decomposition the harness cell hides:
d05 = d02's pair mining (second decade ALREADY probed linear, BASELINE.md
"d02 second-decade probe") + the clustering step. So the clustering step is
measured ALONE on pre-materialized pair tables, at 10x and 100x, in BOTH
tiers:

  - driver tier (union-find; the tier that actually runs at these edge
    counts — 2k/20k edges vs the 2M threshold);
  - distributed tier (min-label propagation, forced via driver_threshold=0)
    with the ROUND COUNT and per-round cost recorded — the planted
    duplicate structure is all diameter-1 pairs, so rounds must stay
    CONSTANT (1 propagate + 1 confirm) while per-round cost grows linearly;
    a growing round count would mean the generator's cluster diameter grew,
    a super-linear per-round cost would be an operator defect.

Everything runs in ONE fresh subprocess-free session, legs back-to-back
(the d02 probe's same-session same-plan pair is the reliable time-domain
shape on this host); byte/cardinality metrics (edges, labels, stage maxima)
are the primary evidence, wall/executor-sec secondary.

Usage: python tools/probe_d05.py   # prints one JSON report
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SCORE_SPARK_SCALE_DIR", "/root/repo/.scale_fixtures")


def _rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=10) as r:
        return json.load(r)


def _drain(spark):
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:
        time.sleep(0.5)


def _stage_ids(spark):
    return {s["stageId"] for s in _rest(spark, "stages?status=complete")}


def _stage_delta(spark, before):
    _drain(spark)
    new = [s for s in _rest(spark, "stages?status=complete") if s["stageId"] not in before]
    return {
        "executor_sec": round(sum(s.get("executorRunTime", 0) for s in new) / 1000, 2),
        "max_stage_input_mb": round(max((s.get("inputBytes", 0) for s in new), default=0) / 2**20, 2),
        "max_stage_shuffle_write_mb": round(
            max((s.get("shuffleWriteBytes", 0) for s in new), default=0) / 2**20, 2
        ),
        "n_stages": len(new),
    }


def main() -> None:
    from score_spark.operators.dedup import duplicate_clusters, ngram_jaccard_pairs
    from score_spark.session import get_session
    from tools.scale_bench import BASE_DOCS, gen_documents

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="probe-d05",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4062"},
    )

    def _warm(batches):
        yield from batches

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_warm, "id long").count()

    report: dict = {"legs": {}}
    pair_paths: dict[str, str] = {}
    # materialize docs + pairs per scale (pairs mining is d02's probed-linear
    # half; material here so the clustering measurements exclude it)
    for label, factor in (("10x", 10), ("100x", 100)):
        docs_path = os.path.join(WORK, f"probe_d05_docs_{label}.parquet")
        gen_documents(spark, BASE_DOCS * factor).write.mode("overwrite").parquet(docs_path)
        pairs_path = os.path.join(WORK, f"probe_d05_pairs_{label}.parquet")
        ngram_jaccard_pairs(
            spark.read.parquet(docs_path), n=3, threshold=0.03, max_doc_freq=50, eager=True
        ).write.mode("overwrite").parquet(pairs_path)
        pair_paths[label] = pairs_path

    # --- clustering step alone, both tiers, both scales, back-to-back
    for label in ("10x", "100x"):
        pairs = spark.read.parquet(pair_paths[label])
        n_pairs = pairs.count()
        leg: dict = {"n_pairs": n_pairs}

        for tier, thresh in (("driver_union_find", 2_000_000), ("distributed_minlabel", 0)):
            runs = []
            for _ in range(3):
                before = _stage_ids(spark)
                t0 = time.monotonic()
                out = duplicate_clusters(pairs, driver_threshold=thresh)
                n_labels = out.count()
                wall = round(time.monotonic() - t0, 3)
                stats = _stage_delta(spark, before)
                runs.append({"wall": wall, **stats})
                leg["n_labels"] = n_labels
                spark.catalog.clearCache()
                spark._jvm.System.gc()
            best = min(runs, key=lambda r: r["wall"])
            leg[tier] = {"best": best, "walls": [r["wall"] for r in runs]}
        report["legs"][label] = leg

    # --- round count for the distributed tier (instrumented separately:
    # count the propagate iterations by watching the changed-count loop via
    # a tiny reimplementation-free trick — run with max_iter raised and
    # infer rounds from job names is brittle; instead expose the loop count
    # by measuring labels' convergence directly)
    import pyspark.sql.functions as F  # noqa: N812

    for label in ("10x", "100x"):
        pairs = spark.read.parquet(pair_paths[label])
        edges = (
            pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
            .unionByName(pairs.select(F.col("d2").alias("src"), F.col("d1").alias("dst")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_edges = edges.count()
        labels = (
            edges.select("src").distinct()
            .select(F.col("src").alias("node"), F.col("src").alias("label"))
            .localCheckpoint(eager=True)
        )
        rounds = []
        for _ in range(26):
            before = _stage_ids(spark)
            t0 = time.monotonic()
            nbr = (
                edges.join(labels.withColumnRenamed("node", "_dst"), F.col("dst") == F.col("_dst"))
                .groupBy("src").agg(F.min("label").alias("nlabel"))
            )
            merged = (
                labels.join(nbr.withColumnRenamed("src", "_node"), F.col("node") == F.col("_node"), "left")
                .select(
                    "node", F.col("label").alias("_old"),
                    F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            changed = merged.filter(F.col("label") != F.col("_old")).count()
            stats = _stage_delta(spark, before)
            rounds.append({
                "wall": round(time.monotonic() - t0, 3),
                "changed": changed,
                "executor_sec": stats["executor_sec"],
            })
            labels = merged.select("node", "label")
            if changed == 0:
                break
        report["legs"][label]["minlabel_rounds"] = {
            "n_edges": n_edges,
            "n_rounds": len(rounds),
            "rounds": rounds,
        }

    # --- full d05 same-session back-to-back pair (docs -> pairs -> clusters
    # -> cluster summary), the harness-cell shape, for the headline ratio
    for label in ("10x", "100x"):
        docs_path = os.path.join(WORK, f"probe_d05_docs_{label}.parquet")
        before = _stage_ids(spark)
        t0 = time.monotonic()
        p = ngram_jaccard_pairs(
            spark.read.parquet(docs_path), n=3, threshold=0.03, max_doc_freq=50, eager=True
        )
        lab = duplicate_clusters(p)
        (
            lab.groupBy(F.col("label").alias("cluster_id"))
            .agg(F.count(F.lit(1)).alias("n_docs"), F.min("node").alias("survivor"))
            .write.format("noop").mode("overwrite").save()
        )
        wall = round(time.monotonic() - t0, 3)
        stats = _stage_delta(spark, before)
        report["legs"][label]["full_d05_back_to_back"] = {"wall": wall, **stats}
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    print(json.dumps(report, indent=2))
    spark.stop()
    import shutil

    for label in ("10x", "100x"):
        for base in ("probe_d05_docs", "probe_d05_pairs"):
            shutil.rmtree(os.path.join(WORK, f"{base}_{label}.parquet"), ignore_errors=True)


if __name__ == "__main__":
    main()
