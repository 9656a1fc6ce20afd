"""Schema-on-read: derive the minimal nested read-schema per file source from
an analyzed Spark SQL plan — the PySpark-native rebuild of taboola/ScORe.

Usage (mirrors the reference's README flow,
/root/reference/README.md:23-28):

    from score_spark.schema_on_read import SchemaOnRead

    df = spark.read.json(path).select("struct.col1")
    sor = SchemaOnRead.generate(df)
    pruned = sor.for_paths(path)          # minimal StructType
    fast = spark.read.schema(pruned).json(path).select("struct.col1")

Best-effort contract: `generate` never raises; on any analysis failure the
full source schema is returned (reference: README.md:9,
SchemaOnReadExtractor.java:154-158).
"""

from score_spark.schema_on_read.generator import SchemaOnRead
from score_spark.schema_on_read.rewrite import prune

__all__ = ["SchemaOnRead", "prune"]
