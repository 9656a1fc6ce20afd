"""d03 third decade (500k -> 5M docs): back-to-back legs, bytes primary —
results in BASELINE.md "d03 third decade". Usage: python tools/probe_d03_decade3.py"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from score_spark.session import get_session
from score_spark.operators.dedup import minhash_lsh_pairs, minhash_signature_col, shingle_arrays
from tools.scale_bench import gen_documents, BASE_DOCS

spark = get_session(app_name="probe-d03-1000x", master="local[32]",
                    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4078"})
def _warm(b): yield from b
spark.range(128, numPartitions=32).mapInPandas(_warm, "id long").count()
def rest(path):
    ui = spark.sparkContext.uiWebUrl; app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=15) as r:
        return json.load(r)
def sids(): return {s["stageId"] for s in rest("stages?status=complete")}

out = {}
for factor in (100, 1000):
    n = BASE_DOCS * factor
    path = f"/root/repo/.scale_fixtures/d03_docs_{factor}x.parquet"
    gen_documents(spark, n).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    before = sids()
    t0 = time.monotonic()
    sh = shingle_arrays(docs, n=3)
    import pyspark.sql.functions as F
    sigs = sh.select("doc_id", minhash_signature_col("_shs", 16).alias("sig"))
    pairs = minhash_lsh_pairs(docs, n_hashes=16, bands=8, sigs=sigs)
    n_pairs = pairs.count()
    wall = round(time.monotonic() - t0, 1)
    try: spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(20_000)
    except Exception: time.sleep(1)
    new = [s for s in rest("stages?status=complete") if s["stageId"] not in before]
    out[f"{factor}x"] = {
        "docs": n, "pairs": n_pairs, "wall": wall,
        "cpu_sec": round(sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 1),
        "run_sec": round(sum(s.get("executorRunTime", 0) for s in new) / 1000, 1),
        "gc_sec": round(sum(s.get("jvmGcTime", 0) for s in new) / 1000, 1),
        "mem_spill_gb": round(sum(s.get("memoryBytesSpilled", 0) for s in new) / 2**30, 2),
        "max_stage_input_mb": round(max((s.get("inputBytes", 0) for s in new), default=0) / 2**20, 1),
        "max_stage_shuffle_write_mb": round(max((s.get("shuffleWriteBytes", 0) for s in new), default=0) / 2**20, 1),
    }
    print(f"{factor}x: {out[f'{factor}x']}", file=sys.stderr)
    spark.catalog.clearCache(); spark._jvm.System.gc()
print(json.dumps(out))
spark.stop()
import shutil
for factor in (100, 1000):
    shutil.rmtree(f"/root/repo/.scale_fixtures/d03_docs_{factor}x.parquet", ignore_errors=True)
