"""Partition-width A/B on w01's 100M-row leg (BASELINE.md "w01 third
decade" finding #1). Usage: python tools/probe_w01_width.py <shuffle_partitions>"""
import json, sys, time, urllib.request
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from score_spark.session import get_session
from score_spark.streaming.windows import session_stats
from tools.scale_bench import gen_events

CPUS = 32
parts = int(sys.argv[1])  # shuffle partitions to test
spark = get_session(app_name=f"probe-w01-spill-{parts}", master=f"local[{CPUS}]",
                    shuffle_partitions=parts,
                    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4073"})
def _warm(b): yield from b
spark.range(128, numPartitions=CPUS).mapInPandas(_warm, "id long").count()
def rest(path):
    ui = spark.sparkContext.uiWebUrl; app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=15) as r:
        return json.load(r)
def sids(): return {s["stageId"] for s in rest("stages?status=complete")}

n_ev, n_us = 100_000_000, 1_500_000
path = "/root/repo/.scale_fixtures/w01_events_1000x.parquet"
import os
if not os.path.isdir(path):
    gen_events(spark, n_ev, n_us).write.mode("overwrite").parquet(path)
ev = spark.read.parquet(path)
before = sids()
t0 = time.monotonic()
df = session_stats(ev.repartitionByRange("user_id"), gap="30 minutes") \
    .sortWithinPartitions("user_id", "session_start")
df.write.format("noop").mode("overwrite").save()
wall = round(time.monotonic() - t0, 1)
try: spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(20_000)
except Exception: time.sleep(1)
new = [s for s in rest("stages?status=complete") if s["stageId"] not in before]
print(json.dumps({
    "shuffle_partitions": parts, "wall": wall,
    "cpu_sec": round(sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 1),
    "run_sec": round(sum(s.get("executorRunTime", 0) for s in new) / 1000, 1),
    "mem_spill_gb": round(sum(s.get("memoryBytesSpilled", 0) for s in new) / 2**30, 2),
    "disk_spill_gb": round(sum(s.get("diskBytesSpilled", 0) for s in new) / 2**30, 2),
}))
spark.stop()
