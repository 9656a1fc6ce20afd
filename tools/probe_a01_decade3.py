"""a01 third decade (10M -> 100M events): back-to-back legs, bytes primary —
results in BASELINE.md "a01 third decade". Usage: python tools/probe_a01_decade3.py"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from score_spark.session import get_session
from score_spark.operators.asof import asof_join
from tools.scale_bench import gen_events, BASE_EVENTS, BASE_USERS

spark = get_session(app_name="probe-a01-1000x", master="local[32]",
                    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4077"})
def _warm(b): yield from b
spark.range(128, numPartitions=32).mapInPandas(_warm, "id long").count()
def rest(path):
    ui = spark.sparkContext.uiWebUrl; app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=15) as r:
        return json.load(r)
def sids(): return {s["stageId"] for s in rest("stages?status=complete")}

out = {}
for factor in (100, 1000):
    n_ev, n_us = BASE_EVENTS * factor, BASE_USERS * factor
    path = f"/root/repo/.scale_fixtures/a01_events_{factor}x.parquet"
    gen_events(spark, n_ev, n_us).write.mode("overwrite").parquet(path)
    e = spark.read.parquet(path)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", F.col("event_id").alias("click_id"))
    before = sids()
    t0 = time.monotonic()
    j = asof_join(purchases, clicks, on="user_id", right_value_cols=["click_id"], ranged_by_key=True)
    n_rows = j.count()
    wall = round(time.monotonic() - t0, 1)
    try: spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(20_000)
    except Exception: time.sleep(1)
    new = [s for s in rest("stages?status=complete") if s["stageId"] not in before]
    out[f"{factor}x"] = {
        "events": n_ev, "rows_out": n_rows, "wall": wall,
        "cpu_sec": round(sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 1),
        "run_sec": round(sum(s.get("executorRunTime", 0) for s in new) / 1000, 1),
        "gc_sec": round(sum(s.get("jvmGcTime", 0) for s in new) / 1000, 1),
        "mem_spill_gb": round(sum(s.get("memoryBytesSpilled", 0) for s in new) / 2**30, 2),
        "max_stage_shuffle_write_mb": round(max((s.get("shuffleWriteBytes", 0) for s in new), default=0) / 2**20, 1),
    }
    print(f"{factor}x: {out[f'{factor}x']}", file=sys.stderr)
    spark.catalog.clearCache(); spark._jvm.System.gc()
print(json.dumps(out))
spark.stop()
import shutil
for factor in (100, 1000):
    shutil.rmtree(f"/root/repo/.scale_fixtures/a01_events_{factor}x.parquet", ignore_errors=True)
