from feast_hive_spark.sources.source import (
    DataSource,
    DataSourceNotFoundException,
    DataSourceNoNameException,
    ParquetSource,
    QuerySource,
    TableSource,
    source_from_json,
)

__all__ = [
    "DataSource",
    "TableSource",
    "QuerySource",
    "ParquetSource",
    "source_from_json",
    "DataSourceNotFoundException",
    "DataSourceNoNameException",
]
