"""w04 + c05 third decades (100x -> 1000x): back-to-back legs, bytes primary
— results in BASELINE.md "w04 / c05 third decades".
Usage: python tools/probe_w04c05_decade3.py"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from score_spark.session import get_session
from score_spark.streaming.windows import conversion_attribution_batch
from score_spark.operators.pipeline import chunk_documents, pack_token_stream
from tools.scale_bench import gen_events, gen_documents, BASE_EVENTS, BASE_USERS, BASE_DOCS

spark = get_session(app_name="probe-w04c05-1000x", master="local[32]",
                    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4080"})
def _warm(b): yield from b
spark.range(128, numPartitions=32).mapInPandas(_warm, "id long").count()
def rest(path):
    ui = spark.sparkContext.uiWebUrl; app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=15) as r:
        return json.load(r)
def sids(): return {s["stageId"] for s in rest("stages?status=complete")}

def measure(build):
    before = sids()
    t0 = time.monotonic()
    df = build()
    n = df.count()
    wall = round(time.monotonic() - t0, 1)
    try: spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(20_000)
    except Exception: time.sleep(1)
    new = [s for s in rest("stages?status=complete") if s["stageId"] not in before]
    rec = {"rows_out": n, "wall": wall,
           "cpu_sec": round(sum(s.get("executorCpuTime",0) for s in new)/1e9, 1),
           "mem_spill_gb": round(sum(s.get("memoryBytesSpilled",0) for s in new)/2**30, 2),
           "max_shuffle_mb": round(max((s.get("shuffleWriteBytes",0) for s in new), default=0)/2**20, 1)}
    spark.catalog.clearCache(); spark._jvm.System.gc()
    return rec

out = {}
for factor in (100, 1000):
    ev_path = f"/root/repo/.scale_fixtures/wc_events_{factor}x.parquet"
    doc_path = f"/root/repo/.scale_fixtures/wc_docs_{factor}x.parquet"
    gen_events(spark, BASE_EVENTS*factor, BASE_USERS*factor).write.mode("overwrite").parquet(ev_path)
    gen_documents(spark, BASE_DOCS*factor).write.mode("overwrite").parquet(doc_path)
    ev = lambda: spark.read.parquet(ev_path)
    docs = lambda: spark.read.parquet(doc_path)
    out[f"w04@{factor}x"] = measure(lambda: conversion_attribution_batch(ev(), horizon_minutes=30)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v")))
    out[f"c05@{factor}x"] = measure(lambda: pack_token_stream(
        chunk_documents(docs(), chunk_size=32, overlap=8), budget=512, n_shards=8))
    print(f"{factor}x: w04={out[f'w04@{factor}x']} c05={out[f'c05@{factor}x']}", file=sys.stderr)
print(json.dumps(out))
spark.stop()
import shutil
for factor in (100, 1000):
    shutil.rmtree(f"/root/repo/.scale_fixtures/wc_events_{factor}x.parquet", ignore_errors=True)
    shutil.rmtree(f"/root/repo/.scale_fixtures/wc_docs_{factor}x.parquet", ignore_errors=True)
