"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time as-of join at
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 (+ §7 extensions) with DuckDB oracles;
see feast_hive_spark/registry.py for the definitions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from feast_hive_spark import registry
import feast_hive_spark.registry_analytics  # noqa: F401
import feast_hive_spark.registry_corpus  # noqa: F401
import feast_hive_spark.registry_ext  # noqa: F401
import feast_hive_spark.registry_rel  # noqa: F401 — populates REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["pit_asof_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each entry in ``queries()``."""
    return registry.oracles()
