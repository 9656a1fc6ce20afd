"""score_spark — a PySpark-native analytics engine with the capabilities of
taboola/ScORe, rebuilt Spark-first.

Layout:
  session          SparkSession factory tuned for local testing and cluster scale
  schema_on_read   the ScORe rebuild: driver-side minimal nested read-schema
                   generator over analyzed Catalyst plans
  queries          the relational query surface (parity matrix, SURVEY.md §2B)
  operators        beyond-reference LLM-data-pipeline operators (dedup,
                   similarity search, text analysis, multimodal)
  streaming        event-time streaming operators (windows, watermarks, state)
"""

from score_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
