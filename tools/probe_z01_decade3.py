"""z01 third decade (10M -> 100M rows, real parquet writes): results in
BASELINE.md "z01 third decade". Usage: python tools/probe_z01_decade3.py"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from score_spark.session import get_session
from score_spark.sinks import write_zordered
from tools.scale_bench import gen_events, BASE_EVENTS, BASE_USERS

spark = get_session(app_name="probe-z01-1000x", master="local[32]",
                    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4082"})
def _warm(b): yield from b
spark.range(128, numPartitions=32).mapInPandas(_warm, "id long").count()
def rest(path):
    ui = spark.sparkContext.uiWebUrl; app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=15) as r:
        return json.load(r)
def sids(): return {s["stageId"] for s in rest("stages?status=complete")}

out = {}
for factor in (100, 1000):
    src = f"/root/repo/.scale_fixtures/z01_events_{factor}x.parquet"
    dst = f"/root/repo/.scale_fixtures/z01_out_{factor}x.parquet"
    gen_events(spark, BASE_EVENTS*factor, BASE_USERS*factor).write.mode("overwrite").parquet(src)
    ev = spark.read.parquet(src).select("event_id", "user_id", "value")
    before = sids()
    t0 = time.monotonic()
    write_zordered(ev, dst, ("user_id", "value"), bits_per_dim=8, relative_error=0.01)
    n = spark.read.parquet(dst).count()
    wall = round(time.monotonic() - t0, 1)
    try: spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(20_000)
    except Exception: time.sleep(1)
    new = [s for s in rest("stages?status=complete") if s["stageId"] not in before]
    out[f"{factor}x"] = {
        "rows": n, "wall": wall,
        "cpu_sec": round(sum(s.get("executorCpuTime",0) for s in new)/1e9, 1),
        "mem_spill_gb": round(sum(s.get("memoryBytesSpilled",0) for s in new)/2**30, 2),
        "max_stage_input_mb": round(max((s.get("inputBytes",0) for s in new), default=0)/2**20, 1),
        "max_shuffle_mb": round(max((s.get("shuffleWriteBytes",0) for s in new), default=0)/2**20, 1),
    }
    print(f"{factor}x: {out[f'{factor}x']}", file=sys.stderr)
    spark.catalog.clearCache(); spark._jvm.System.gc()
print(json.dumps(out))
spark.stop()
import shutil
for factor in (100, 1000):
    shutil.rmtree(f"/root/repo/.scale_fixtures/z01_events_{factor}x.parquet", ignore_errors=True)
    shutil.rmtree(f"/root/repo/.scale_fixtures/z01_out_{factor}x.parquet", ignore_errors=True)
