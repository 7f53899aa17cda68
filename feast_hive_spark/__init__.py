"""feast_hive_spark — a PySpark-native analytics/feature engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference (bennfocus/feast-hive, a Feast offline
store that generates HiveQL and ships it to HiveServer2). Instead of
generating SQL text for a remote Hive, every operator here is a lazy
PySpark DataFrame pipeline planned by Catalyst and executed by
Tungsten — declarative plans, predicate pushdown, broadcast joins,
AQE; no temp tables, no row-wise INSERT uploads.

Layout:
  session.py    SparkSession factory (UTC, AQE, Arrow) — reference's
                connection/config layer (feast_hive/hive.py:43-139)
  types.py      Hive <-> Spark <-> Arrow <-> Feast type map
                (reference: feast_hive/hive_type_map.py)
  sources/      table/query/parquet sources (feast_hive/hive_source.py)
  retrieval.py  lazy RetrievalJob: to_spark_df/to_df/to_arrow
                (feast_hive/hive.py:272-352)
  plans/        pit.py  point-in-time as-of join (hive.py:527-721)
                pull.py latest-per-key pull      (hive.py:143-190)
  operators/    LLM-data-pipeline extensions: dedup, simsearch,
                multimodal
  functions/    text analysis + vector math column functions
  streaming/    Structured Streaming ingest of the events table
"""

from feast_hive_spark.session import get_spark
from feast_hive_spark.retrieval import RetrievalJob
from feast_hive_spark.sources import DataSource, TableSource, QuerySource, ParquetSource
from feast_hive_spark.plans.pit import FeatureView, get_historical_features
from feast_hive_spark.plans.pull import pull_latest

__all__ = [
    "get_spark",
    "RetrievalJob",
    "DataSource",
    "TableSource",
    "QuerySource",
    "ParquetSource",
    "FeatureView",
    "get_historical_features",
    "pull_latest",
]

__version__ = "0.1.0"
