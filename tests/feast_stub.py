"""Protocol-compatible stub of the Feast interfaces the facade touches.

``feast`` is not installable in this environment, so the functional
facade test (`test_feast_plugin.py`) would otherwise never execute —
the facade would stay inspected-correct rather than proven. This
module fabricates the five modules `feast_hive_spark.feast_plugin`
imports, with JUST the surface the facade (and the reference's
universal-suite PIT shape, feast_hive tests/feast_tests_funcs.py:
279-367) consumes:

- ``feast.FeatureView`` / ``feast.Feature`` / ``feast.ValueType``
- ``feast.data_source.DataSource`` (base-class constructor kwargs)
- ``feast.infra.offline_stores.offline_store.OfflineStore`` /
  ``RetrievalJob`` (``to_df``/``to_arrow`` contract)
- ``feast.protos.feast.core.DataSource_pb2.DataSource`` incl.
  ``CustomSourceOptions`` + ``HasField`` (the proto round-trip
  envelope, reference hive_source.py:50-78 / :164-198)
- ``feast.repo_config.FeastConfigBaseModel`` / ``RepoConfig``

Install with :func:`install` (returns the saved sys.modules state),
restore with :func:`uninstall`. The stub mirrors feast 0.17-era
signatures — the vintage the reference pins (setup.py: feast>=0.15).
"""

from __future__ import annotations

import sys
import types
from datetime import timedelta
from typing import Optional


class ValueType:
    UNKNOWN = 0
    DOUBLE = 5
    INT64 = 2
    STRING = 6


class Feature:
    def __init__(self, name: str, dtype: int = ValueType.UNKNOWN):
        self.name = name
        self.dtype = dtype


class FeatureView:
    def __init__(
        self,
        name: str,
        entities,
        features=None,
        batch_source=None,
        ttl: Optional[timedelta] = None,
        **_ignored,
    ):
        self.name = name
        self.entities = list(entities)
        self.features = list(features or [])
        self.batch_source = batch_source
        self.ttl = ttl


class DataSource:
    """feast.data_source.DataSource base: stores the constructor kwargs
    the facade's ``SparkHiveSource.__init__`` forwards."""

    def __init__(
        self,
        event_timestamp_column: str = "",
        created_timestamp_column: str = "",
        field_mapping=None,
        date_partition_column: str = "",
        **_ignored,
    ):
        self.event_timestamp_column = event_timestamp_column
        self.created_timestamp_column = created_timestamp_column
        self.field_mapping = dict(field_mapping or {})
        self.date_partition_column = date_partition_column


class RetrievalJob:
    """feast RetrievalJob contract: public to_df/to_arrow delegate to
    the _internal hooks subclasses implement."""

    def to_df(self):
        return self._to_df_internal()

    def to_arrow(self):
        return self._to_arrow_internal()


# Vendored protocol surface of the pinned public feast vintage (the
# reference pins feast>=0.15, developed against the 0.17 era —
# feast-dev/feast v0.17.0, sdk/python/feast/infra/offline_stores/
# offline_store.py): the exact parameter names, order, and defaults of
# the two abstract OfflineStore entry points and the RetrievalJob /
# DataSource methods the facade implements. The real package cannot be
# installed in this environment, so signature drift is caught
# programmatically against THIS transcription instead
# (test_feast_plugin.py::test_facade_matches_vendored_protocol).
VENDORED_SIGNATURES: dict = {
    "OfflineStore.pull_latest_from_table_or_query": [
        "config",
        "data_source",
        "join_key_columns",
        "feature_name_columns",
        "event_timestamp_column",
        "created_timestamp_column",
        "start_date",
        "end_date",
    ],
    "OfflineStore.get_historical_features": [
        "config",
        "feature_views",
        "feature_refs",
        "entity_df",
        "registry",
        "project",
        ("full_feature_names", False),
    ],
    "RetrievalJob.to_df": ["self"],
    "RetrievalJob.to_arrow": ["self"],
    "DataSource.from_proto": ["data_source"],
    "DataSource.to_proto": ["self"],
    "DataSource.validate": ["self", "config"],
    "DataSource.get_table_query_string": ["self"],
}


def _unimplemented(*_a, **_k):  # the stub base never executes these
    raise NotImplementedError


class OfflineStore:
    """feast.infra.offline_stores.offline_store.OfflineStore base with
    the vendored 0.17-era abstract surface (signatures above) so a
    facade subclass that drifts fails the protocol test, not a user."""

    @staticmethod
    def pull_latest_from_table_or_query(
        config,
        data_source,
        join_key_columns,
        feature_name_columns,
        event_timestamp_column,
        created_timestamp_column,
        start_date,
        end_date,
    ):
        raise NotImplementedError

    @staticmethod
    def get_historical_features(
        config,
        feature_views,
        feature_refs,
        entity_df,
        registry,
        project,
        full_feature_names=False,
    ):
        raise NotImplementedError


class _CustomSourceOptions:
    def __init__(self, configuration: bytes = b""):
        self.configuration = configuration


class DataSourceProto:
    """Duck-typed stand-in for the DataSource protobuf message."""

    CUSTOM_SOURCE = 6
    CustomSourceOptions = _CustomSourceOptions

    def __init__(
        self,
        type: int = 0,
        custom_options: Optional[_CustomSourceOptions] = None,
        event_timestamp_column: str = "",
        created_timestamp_column: str = "",
        field_mapping=None,
        date_partition_column: str = "",
    ):
        self.type = type
        self.custom_options = custom_options
        self.event_timestamp_column = event_timestamp_column
        self.created_timestamp_column = created_timestamp_column
        self.field_mapping = dict(field_mapping or {})
        self.date_partition_column = date_partition_column

    def HasField(self, name: str) -> bool:
        return getattr(self, name, None) is not None


class FeastConfigBaseModel:
    """Pydantic-free config base: class-level defaults become instance
    attributes; keyword overrides win."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)


class RepoConfig:
    def __init__(self, offline_store=None, **kwargs):
        self.offline_store = offline_store
        for k, v in kwargs.items():
            setattr(self, k, v)


_STUB_MODULES = [
    "feast",
    "feast.data_source",
    "feast.infra",
    "feast.infra.offline_stores",
    "feast.infra.offline_stores.offline_store",
    "feast.protos",
    "feast.protos.feast",
    "feast.protos.feast.core",
    "feast.protos.feast.core.DataSource_pb2",
    "feast.repo_config",
]


def _build_modules() -> dict:
    mods = {name: types.ModuleType(name) for name in _STUB_MODULES}
    feast = mods["feast"]
    feast.__stub__ = True
    feast.FeatureView = FeatureView
    feast.Feature = Feature
    feast.ValueType = ValueType
    mods["feast.data_source"].DataSource = DataSource
    off = mods["feast.infra.offline_stores.offline_store"]
    off.OfflineStore = OfflineStore
    off.RetrievalJob = RetrievalJob
    mods["feast.protos.feast.core.DataSource_pb2"].DataSource = DataSourceProto
    rc = mods["feast.repo_config"]
    rc.FeastConfigBaseModel = FeastConfigBaseModel
    rc.RepoConfig = RepoConfig
    # wire submodule attributes so `from feast.infra... import X` works
    feast.data_source = mods["feast.data_source"]
    feast.infra = mods["feast.infra"]
    feast.infra.offline_stores = mods["feast.infra.offline_stores"]
    feast.infra.offline_stores.offline_store = off
    feast.protos = mods["feast.protos"]
    feast.protos.feast = mods["feast.protos.feast"]
    feast.protos.feast.core = mods["feast.protos.feast.core"]
    feast.protos.feast.core.DataSource_pb2 = mods[
        "feast.protos.feast.core.DataSource_pb2"
    ]
    feast.repo_config = rc
    return mods


def install() -> dict:
    """Insert the stub into sys.modules; returns prior entries for
    :func:`uninstall`. Refuses to shadow a real feast install."""
    if "feast" in sys.modules and not getattr(
        sys.modules["feast"], "__stub__", False
    ):
        raise RuntimeError("real feast is importable; stub not needed")
    saved = {name: sys.modules.get(name) for name in _STUB_MODULES}
    sys.modules.update(_build_modules())
    return saved


def uninstall(saved: dict) -> None:
    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod
