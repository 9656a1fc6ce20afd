"""Query registry.

``QUERIES``: name -> callable(spark, sf_dir) -> DataFrame (Spark-first impl).
``ORACLE``:  name -> ANSI SQL string DuckDB can run on the same parquet views.

Names and output column aliases are kept identical between the two so the
driver's order-insensitive value-hash comparison lines up column-for-column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from score_spark.operators import (
    asof,
    dedup,
    multimodal,
    pipeline,
    rangejoin,
    rollup,
    similarity,
    textstats,
)
from score_spark.queries import pruned, relational
from score_spark.streaming import windows as streaming_windows

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _register(mod) -> None:
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)


for _mod in (
    relational,
    textstats,
    dedup,
    similarity,
    asof,
    multimodal,
    rangejoin,
    rollup,
    streaming_windows,
    pruned,
    pipeline,
):
    _register(_mod)
