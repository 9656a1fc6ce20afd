"""Relational third decade (sf1 -> sf10 via K=10/K=100 replicas): results in
BASELINE.md "Relational third decade". Usage: python tools/probe_rel_sf10.py"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from score_spark.session import get_session
from tools.gen_sf_replica import replicate
from tools.scale_bench import relational_ops

spark = get_session(app_name="probe-rel-sf10", master="local[32]",
                    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4084"})
def _warm(b): yield from b
spark.range(128, numPartitions=32).mapInPandas(_warm, "id long").count()
def rest(path):
    ui = spark.sparkContext.uiWebUrl; app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=15) as r:
        return json.load(r)
def sids(): return {s["stageId"] for s in rest("stages?status=complete")}

SF1 = "/root/repo/.scale_fixtures/sf1"
SF10 = "/root/repo/.scale_fixtures/sf10"
replicate(spark, "/root/testdata/sf0.1", SF1, 10)
replicate(spark, "/root/testdata/sf0.1", SF10, 100)

out = {}
for label, d in (("sf1", SF1), ("sf10", SF10)):
    ops = relational_ops(spark, d)
    for q in ("q03", "q05", "q09", "q28"):
        best = None
        for _ in range(2):
            before = sids()
            t0 = time.monotonic()
            ops[q]().write.format("noop").mode("overwrite").save()
            wall = round(time.monotonic() - t0, 1)
            try: spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(20_000)
            except Exception: time.sleep(1)
            new = [s for s in rest("stages?status=complete") if s["stageId"] not in before]
            rec = {"wall": wall,
                   "cpu_sec": round(sum(s.get("executorCpuTime",0) for s in new)/1e9, 1),
                   "mem_spill_gb": round(sum(s.get("memoryBytesSpilled",0) for s in new)/2**30, 2),
                   "max_shuffle_mb": round(max((s.get("shuffleWriteBytes",0) for s in new), default=0)/2**20, 1)}
            if best is None or rec["wall"] < best["wall"]: best = rec
            spark.catalog.clearCache(); spark._jvm.System.gc()
        out[f"{q}@{label}"] = best
        print(f"{q}@{label}: {best}", file=sys.stderr)
print(json.dumps(out))
spark.stop()
import shutil
shutil.rmtree(SF1, ignore_errors=True); shutil.rmtree(SF10, ignore_errors=True)
