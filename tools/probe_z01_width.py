"""Width A/B on z01's 100M-row leg — a NEGATIVE result (width is not the
lever for encode-shaped stages); BASELINE.md "z01 third decade".
Usage: python tools/probe_z01_width.py <shuffle_partitions>"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from score_spark.session import get_session
from score_spark.sinks import write_zordered
from tools.scale_bench import gen_events

parts = int(sys.argv[1])
spark = get_session(app_name=f"probe-z01-width-{parts}", master="local[32]",
                    shuffle_partitions=parts,
                    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4083"})
def _warm(b): yield from b
spark.range(128, numPartitions=32).mapInPandas(_warm, "id long").count()
def rest(path):
    ui = spark.sparkContext.uiWebUrl; app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=15) as r:
        return json.load(r)
def sids(): return {s["stageId"] for s in rest("stages?status=complete")}

src = "/root/repo/.scale_fixtures/z01w_events.parquet"
if not os.path.isdir(src):
    gen_events(spark, 100_000_000, 1_500_000).write.mode("overwrite").parquet(src)
ev = spark.read.parquet(src).select("event_id", "user_id", "value")
dst = f"/root/repo/.scale_fixtures/z01w_out_{parts}.parquet"
before = sids()
t0 = time.monotonic()
write_zordered(ev, dst, ("user_id", "value"), bits_per_dim=8, relative_error=0.01)
n = spark.read.parquet(dst).count()
wall = round(time.monotonic() - t0, 1)
try: spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(20_000)
except Exception: time.sleep(1)
new = [s for s in rest("stages?status=complete") if s["stageId"] not in before]
print(json.dumps({"parts": parts, "rows": n, "wall": wall,
    "cpu_sec": round(sum(s.get("executorCpuTime",0) for s in new)/1e9, 1),
    "mem_spill_gb": round(sum(s.get("memoryBytesSpilled",0) for s in new)/2**30, 2)}))
import shutil
shutil.rmtree(dst, ignore_errors=True)
spark.stop()
