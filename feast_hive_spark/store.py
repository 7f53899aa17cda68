"""SparkOfflineStore — the engine's public facade, mirroring the
reference's ``HiveOfflineStore`` surface (feast_hive/hive.py:140-269):
static ``pull_latest_from_table_or_query`` and
``get_historical_features`` entry points returning lazy
``RetrievalJob``s, configured by a small config object that replaces
the reference's connection block (``HiveOfflineStoreConfig``,
hive.py:43-107 — host/port/auth for a remote HiveServer2 become a
SparkSession + conf overlay).

A user of the reference maps 1:1:

    HiveOfflineStoreConfig(host=..., port=..., hive_conf={...})
      -> SparkOfflineStoreConfig(master=..., spark_conf={...})
    HiveSource(table="db.tbl" | query="SELECT ...")
      -> TableSource / QuerySource (+ ParquetSource)
    HiveOfflineStore.pull_latest_from_table_or_query(...)
      -> SparkOfflineStore.pull_latest_from_table_or_query(...)
    HiveOfflineStore.get_historical_features(...)
      -> SparkOfflineStore.get_historical_features(...)
    job.to_df() / job.to_arrow()   (unchanged)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from feast_hive_spark.plans.pit import FeatureView, get_historical_features
from feast_hive_spark.plans.pull import pull_latest
from feast_hive_spark.retrieval import RetrievalJob
from feast_hive_spark.session import get_spark
from feast_hive_spark.sources.source import DataSource


@dataclass
class SparkOfflineStoreConfig:
    """Replaces HiveOfflineStoreConfig (hive.py:43-107). The Thrift
    connection knobs (host/port/auth/kerberos) have no Spark
    equivalent — the session IS the engine; ``spark_conf`` plays the
    role of the reference's ``hive_conf`` overlay (hive.py:97-107)."""

    type: str = "spark_offline_store"
    app_name: str = "feast_hive_spark"
    master: Optional[str] = None
    spark_conf: dict[str, str] = field(default_factory=dict)
    # parity with entity_uploading_chunk_size (hive.py:64-66): kept for
    # config-compat, ignored — native createDataFrame has no chunking.
    entity_uploading_chunk_size: int = 10000

    def get_spark(self) -> SparkSession:
        return get_spark(
            app_name=self.app_name, master=self.master, extra_conf=self.spark_conf
        )


class SparkOfflineStore:
    """Static offline-store API (reference: hive.py:140-269)."""

    @staticmethod
    def pull_latest_from_table_or_query(
        config: SparkOfflineStoreConfig,
        data_source: DataSource,
        join_key_columns: Sequence[str],
        feature_name_columns: Sequence[str],
        event_timestamp_column: str,
        created_timestamp_column: Optional[str],
        start_date: datetime,
        end_date: datetime,
    ) -> RetrievalJob:
        """Latest-per-key pull (reference entry point 2,
        hive.py:143-190) as a lazy job."""
        spark = config.get_spark()

        def build() -> DataFrame:
            return pull_latest(
                data_source.to_df(spark),
                join_key_columns=join_key_columns,
                feature_name_columns=feature_name_columns,
                event_timestamp_column=event_timestamp_column,
                created_timestamp_column=created_timestamp_column,
                start_date=start_date,
                end_date=end_date,
                date_partition_column=data_source.date_partition_column or None,
            )

        return RetrievalJob(build)

    @staticmethod
    def get_historical_features(
        config: SparkOfflineStoreConfig,
        feature_views: Sequence[FeatureView],
        entity_df: Union[DataFrame, pd.DataFrame, str],
        full_feature_names: bool = False,
        entity_event_timestamp_col: Optional[str] = None,
        on_demand_transforms=None,
    ) -> RetrievalJob:
        """Point-in-time training-set retrieval (reference entry point
        1, hive.py:192-269) as a lazy job. ``feature_views`` carry
        their sources; feature_refs resolution is the caller's concern
        (Feast core did it in the reference)."""
        spark = config.get_spark()
        return get_historical_features(
            spark,
            entity_df,
            feature_views,
            full_feature_names=full_feature_names,
            entity_event_timestamp_col=entity_event_timestamp_col,
            on_demand_transforms=on_demand_transforms,
        )
