"""Ad-hoc per-query timer for iterating on performance: quick_time.py q1 q2 ...

Mirrors bench.py's measurement (noop sink, inter-query cleanup, oracle-channel
drain) without the full suite / bytes audit / duckdb baseline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:]

    from score_spark import xcheck
    from score_spark.queries import QUERIES
    from score_spark.session import get_session

    spark = get_session(app_name="score-spark-quick", master=f"local[{cpus}]")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def _warm(batches):
        yield from batches

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_warm, "id long").count()
    xcheck.drain_oracle_sec()
    for name in names:
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.monotonic() - t0
        osec = xcheck.drain_oracle_sec()
        print(f"{name}: query={elapsed - osec:.3f}s oracle_channel={osec:.3f}s")
        del df
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
