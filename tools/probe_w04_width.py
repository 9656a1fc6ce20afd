"""Partition-width A/B on w04's 100M-row leg (BASELINE.md "w04 / c05 third
decades"). Usage: python tools/probe_w04_width.py <shuffle_partitions>"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from score_spark.session import get_session
from score_spark.streaming.windows import conversion_attribution_batch
from tools.scale_bench import gen_events

parts = int(sys.argv[1])
spark = get_session(app_name=f"probe-w04-width-{parts}", master="local[32]",
                    shuffle_partitions=parts,
                    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4081"})
def _warm(b): yield from b
spark.range(128, numPartitions=32).mapInPandas(_warm, "id long").count()
def rest(path):
    ui = spark.sparkContext.uiWebUrl; app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=15) as r:
        return json.load(r)
def sids(): return {s["stageId"] for s in rest("stages?status=complete")}

path = "/root/repo/.scale_fixtures/w04_events_1000x.parquet"
if not os.path.isdir(path):
    gen_events(spark, 100_000_000, 1_500_000).write.mode("overwrite").parquet(path)
ev = spark.read.parquet(path)
before = sids()
t0 = time.monotonic()
df = conversion_attribution_batch(ev, horizon_minutes=30).groupBy("user_id").agg(
    F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
n = df.count()
wall = round(time.monotonic() - t0, 1)
try: spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(20_000)
except Exception: time.sleep(1)
new = [s for s in rest("stages?status=complete") if s["stageId"] not in before]
print(json.dumps({"parts": parts, "rows": n, "wall": wall,
    "cpu_sec": round(sum(s.get("executorCpuTime",0) for s in new)/1e9, 1),
    "mem_spill_gb": round(sum(s.get("memoryBytesSpilled",0) for s in new)/2**30, 2)}))
spark.stop()
