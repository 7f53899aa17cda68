"""Optional Feast integration: a real ``feast`` ``OfflineStore``
subclass over this engine, so a reference user's ``feature_store.yaml``
migrates 1:1:

    offline_store:
        type: feast_hive_spark.feast_plugin.SparkFeastOfflineStore
        master: local[*]

Everything here is import-gated: the engine has zero hard dependency
on ``feast`` (it is not installed in the dev container), and this
module imports cleanly either way — ``FEAST_AVAILABLE`` says which
world you are in, and touching the Feast-backed names without feast
raises a clear ImportError instead of a NameError at call time.

Reference surface being mirrored (feast_hive v0.17):
- ``HiveSource`` proto round trip (hive_source.py:50-78 to_proto /
  :164-198 from_proto) — the reference pickles the source inside a
  ``CustomSourceOptions`` proto; we carry the engine's JSON
  serialization (sources/source.py:to_json) in the same envelope,
  which round-trips the same surface without arbitrary-code-execution
  on deserialize.
- ``HiveOfflineStore`` static entry points (hive.py:143-269) — mapped
  onto the engine's planners (plans/pull.py, plans/pit.py).
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, List, Optional, Union

import pandas as pd

try:  # pragma: no cover - exercised only where feast is installed
    from feast import FeatureView as _FeastFeatureView
    from feast.data_source import DataSource as _FeastDataSource
    from feast.infra.offline_stores.offline_store import (
        OfflineStore as _FeastOfflineStore,
    )
    from feast.infra.offline_stores.offline_store import (
        RetrievalJob as _FeastRetrievalJob,
    )
    from feast.protos.feast.core.DataSource_pb2 import (
        DataSource as DataSourceProto,
    )
    from feast.repo_config import FeastConfigBaseModel, RepoConfig

    FEAST_AVAILABLE = True
except ImportError:  # pragma: no cover
    FEAST_AVAILABLE = False

from feast_hive_spark.plans.pit import FeatureView as _EngineFeatureView
from feast_hive_spark.plans.pit import get_historical_features as _pit
from feast_hive_spark.plans.pull import pull_latest as _pull_latest
from feast_hive_spark.retrieval import RetrievalJob as _EngineRetrievalJob
from feast_hive_spark.session import get_spark as _get_spark
from feast_hive_spark.sources.source import (
    DataSource as _EngineSource,
    source_from_json as _source_from_json,
)

_MISSING_MSG = (
    "feast is not installed; `pip install feast` to use "
    "feast_hive_spark.feast_plugin.{name} (the standalone engine API in "
    "feast_hive_spark.store works without it)"
)


def __getattr__(name: str) -> Any:
    """Clear error for Feast-backed names when feast is absent."""
    if not FEAST_AVAILABLE and name in (
        "SparkHiveSource",
        "SparkFeastOfflineStoreConfig",
        "SparkFeastOfflineStore",
    ):
        raise ImportError(_MISSING_MSG.format(name=name))
    raise AttributeError(name)


if FEAST_AVAILABLE:  # pragma: no cover - needs a feast install

    class SparkHiveSource(_FeastDataSource):
        """Feast DataSource wrapping an engine source, with the
        reference's custom-options proto round trip
        (hive_source.py:50-78, :164-198) carrying JSON, not pickle."""

        def __init__(self, engine_source: _EngineSource, **kwargs):
            self.engine_source = engine_source
            super().__init__(
                event_timestamp_column=engine_source.event_timestamp_column,
                created_timestamp_column=engine_source.created_timestamp_column,
                field_mapping=engine_source.field_mapping,
                date_partition_column=engine_source.date_partition_column,
                **kwargs,
            )

        def to_proto(self) -> "DataSourceProto":
            options = DataSourceProto.CustomSourceOptions(
                configuration=self.engine_source.to_json().encode("utf8")
            )
            return DataSourceProto(
                type=DataSourceProto.CUSTOM_SOURCE,
                custom_options=options,
                event_timestamp_column=self.event_timestamp_column,
                created_timestamp_column=self.created_timestamp_column,
                field_mapping=self.field_mapping,
                date_partition_column=self.date_partition_column,
            )

        @staticmethod
        def from_proto(data_source: "DataSourceProto") -> "SparkHiveSource":
            assert data_source.HasField("custom_options")
            engine = _source_from_json(
                data_source.custom_options.configuration.decode("utf8")
            )
            return SparkHiveSource(engine)

        def get_table_query_string(self) -> str:
            return self.engine_source.get_table_query_string()

        def validate(self, config: "RepoConfig") -> None:
            spark = _spark_from_config(config)
            self.engine_source.validate(spark)

    class SparkFeastOfflineStoreConfig(FeastConfigBaseModel):
        """feature_store.yaml block — replaces HiveOfflineStoreConfig
        (hive.py:43-107): Thrift host/port become a Spark master +
        conf overlay."""

        type: str = "feast_hive_spark.feast_plugin.SparkFeastOfflineStore"
        app_name: str = "feast_hive_spark"
        master: Optional[str] = None
        spark_conf: dict = {}

    def _spark_from_config(config: "RepoConfig"):
        os_cfg = config.offline_store
        return _get_spark(
            app_name=getattr(os_cfg, "app_name", "feast_hive_spark"),
            master=getattr(os_cfg, "master", None),
            extra_conf=dict(getattr(os_cfg, "spark_conf", {}) or {}),
        )

    class _JobAdapter(_FeastRetrievalJob):
        """Engine RetrievalJob -> Feast RetrievalJob."""

        def __init__(self, job: _EngineRetrievalJob):
            self._job = job

        def to_df(self) -> pd.DataFrame:
            return self._job.to_df()

        def _to_df_internal(self) -> pd.DataFrame:
            return self._job.to_df()

        def to_arrow(self):
            return self._job.to_arrow()

        def _to_arrow_internal(self):
            return self._job.to_arrow()

    class SparkFeastOfflineStore(_FeastOfflineStore):
        """Drop-in OfflineStore (reference: HiveOfflineStore,
        hive.py:142-269)."""

        @staticmethod
        def pull_latest_from_table_or_query(
            config: "RepoConfig",
            data_source: _FeastDataSource,
            join_key_columns: List[str],
            feature_name_columns: List[str],
            event_timestamp_column: str,
            created_timestamp_column: Optional[str],
            start_date: datetime,
            end_date: datetime,
        ) -> _FeastRetrievalJob:
            assert isinstance(data_source, SparkHiveSource)
            spark = _spark_from_config(config)
            src = data_source.engine_source

            def build():
                return _pull_latest(
                    src.to_df(spark),
                    join_key_columns=join_key_columns,
                    feature_name_columns=feature_name_columns,
                    event_timestamp_column=event_timestamp_column,
                    created_timestamp_column=created_timestamp_column,
                    start_date=start_date,
                    end_date=end_date,
                    date_partition_column=src.date_partition_column or None,
                )

            return _JobAdapter(_EngineRetrievalJob(build))

        @staticmethod
        def get_historical_features(
            config: "RepoConfig",
            feature_views: List["_FeastFeatureView"],
            feature_refs: List[str],
            entity_df: Union[pd.DataFrame, str],
            registry: Any,
            project: str,
            full_feature_names: bool = False,
        ) -> _FeastRetrievalJob:
            spark = _spark_from_config(config)
            engine_fvs = [
                _to_engine_fv(fv, feature_refs, registry, project)
                for fv in feature_views
            ]
            job = _pit(
                spark,
                entity_df,
                engine_fvs,
                full_feature_names=full_feature_names,
            )
            return _JobAdapter(job)

    def _to_engine_fv(
        fv: "_FeastFeatureView", feature_refs: List[str], registry, project
    ) -> _EngineFeatureView:
        """Feast FeatureView + refs -> engine FeatureView: join keys
        come from the view's entities (registry lookup), features from
        the refs addressed to this view."""
        wanted = [
            r.split(":", 1)[1]
            for r in feature_refs
            if r.startswith(f"{fv.name}:")
        ]
        join_keys = []
        for entity_name in fv.entities:
            entity = registry.get_entity(entity_name, project)
            join_keys.append(entity.join_key)
        src = fv.batch_source
        assert isinstance(src, SparkHiveSource)
        return _EngineFeatureView(
            name=fv.name,
            source=src.engine_source,
            join_keys=join_keys,
            features=wanted or [f.name for f in fv.features],
            ttl_seconds=fv.ttl.total_seconds() if fv.ttl else 0,
            event_timestamp_column=src.event_timestamp_column,
            created_timestamp_column=src.created_timestamp_column or None,
        )
