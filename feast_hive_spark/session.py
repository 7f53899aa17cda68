"""SparkSession factory.

Replaces the reference's entire connection layer — impyla Thrift
connection + session `SET` statements (feast_hive/hive.py:43-139,
:249-254). A Hive connection config (host/port/auth) becomes a
SparkSession with Hive-compatible semantics; the session confs below
are the Spark translations of the reference's perf-motivated SETs.

Scale notes (100 TB / 1000-executor design points):
- `spark.sql.adaptive.*` on: AQE re-plans joins at runtime, coalesces
  tiny shuffle partitions, and splits skewed ones — this is what makes
  a fixed `shuffle.partitions` safe across 0.001x..1000x data.
- `spark.sql.session.timeZone=UTC`: the reference normalizes every
  tz-aware timestamp to naive UTC (hive.py:355-360); pinning the
  session TZ reproduces that semantics engine-wide.
- Arrow on for the columnar driver<->pandas boundary (the reference's
  fetchcolumnar->Arrow path, hive.py:316-352, for free).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # read parquet TIMESTAMP(isAdjustedToUTC=false) as session-TZ
    # timestamps (we pin UTC) instead of TIMESTAMP_NTZ, so parquet
    # scans and createDataFrame ingests agree on one timestamp type
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # local[N]: ~1 shuffle partition per core; on a real cluster this
    # would be ~2-3x total cores, and AQE coalesces the excess anyway.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.ui.enabled": "false",
    # local mode = driver-only: this is the entire executor heap.
    # Measured, not guessed: 8g runs the LSH pipelines in stable
    # 1.5-3s at sf0.1; a 48g heap made the SAME plans swing 8-35s
    # (GC/JIT heuristics degrade with a huge heap + many tiny tasks).
    # Don't raise this without re-measuring.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # PySpark 4's per-DataFrame-op call-site capture does 2 extra py4j
    # round-trips per API call purely to decorate error messages with
    # Python line numbers. Profiled (r6): it is ~60% of the py4j
    # chatter in plan construction (bm25 plan build 0.48s -> 0.19s).
    # A query engine builds plans programmatically — its own
    # exceptions carry context — so this is off engine-wide; flip to
    # "true" when debugging a confusing plan-construction error.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def get_spark(
    app_name: str = "feast_hive_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    enable_hive: bool | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``extra_conf`` mirrors the reference's user-supplied ``hive_conf``
    overlay (feast_hive/hive.py:97-107): user keys win over defaults.

    ``enable_hive`` (default on, ``SPARK_GRAFT_HIVE=0`` to disable)
    turns on the Hive catalog — the reference's entire domain is
    metastore tables (hive_source.py:224-237), so ``TableSource
    ("db.tbl")`` must resolve against a real metastore, not just temp
    views. Locally that is an embedded Derby metastore in a private
    per-process directory (no cwd `metastore_db` pollution, no Derby
    lock collisions between concurrent test/bench JVMs); on a real
    cluster, standard hive-site.xml / thrift metastore configs take
    over via ``extra_conf``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if enable_hive is None:
        enable_hive = os.environ.get("SPARK_GRAFT_HIVE", "1") != "0"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if enable_hive:
        ms_root = os.environ.get(
            "SPARK_GRAFT_METASTORE_DIR",
            os.path.join(tempfile.gettempdir(), f"fhs_metastore_{os.getpid()}"),
        )
        # spark.hadoop. prefix: plain javax.jdo.* keys are dropped as
        # "non-Spark config" before reaching the Hive client
        conf.setdefault(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={ms_root}/derby;create=true",
        )
        conf.setdefault("spark.sql.warehouse.dir", f"{ms_root}/warehouse")
        # keep Derby's log out of the process cwd
        conf.setdefault(
            "spark.driver.extraJavaOptions",
            f"-Dderby.stream.error.file={ms_root}/derby.log",
        )
        builder = builder.enableHiveSupport()
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
