"""One-off: conf matrix for exec-time floor."""
import os
import sys
import time

from feast_hive_spark.registry import REGISTRY
import feast_hive_spark.registry_analytics  # noqa: F401
import feast_hive_spark.registry_corpus  # noqa: F401
import feast_hive_spark.registry_ext  # noqa: F401
import feast_hive_spark.registry_rel  # noqa: F401
from feast_hive_spark.session import get_spark
from feast_hive_spark.sources.tables import TABLES, register_views

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile")
spark.sparkContext.setLogLevel("ERROR")
register_views(spark, sf_dir)
for t in TABLES:
    spark.catalog.cacheTable(t)

def timed(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

# floor: trivial one-task job
r = spark.range(1000)
timed(r)
print("trivial noop:", [round(timed(spark.range(1000)), 3) for _ in range(3)])
# one shuffle
from pyspark.sql import functions as F
g = spark.range(100000).groupBy((F.col("id") % 10).alias("k")).count()
timed(g)
print("1-shuffle noop:", [round(timed(spark.range(100000).groupBy((F.col('id')%10).alias('k')).count()), 3) for _ in range(3)])

names = sys.argv[1:] or ["q1_pricing_summary", "q18_large_orders"]
for conf in [
    {"spark.sql.shuffle.partitions": "8", "spark.sql.adaptive.enabled": "true"},
    {"spark.sql.shuffle.partitions": "8", "spark.sql.adaptive.enabled": "false"},
    {"spark.sql.shuffle.partitions": "2", "spark.sql.adaptive.enabled": "false"},
    {"spark.sql.shuffle.partitions": "1", "spark.sql.adaptive.enabled": "false"},
    {"spark.sql.shuffle.partitions": "32", "spark.sql.adaptive.enabled": "true"},
]:
    for k, v in conf.items():
        spark.conf.set(k, v)
    label = f"shuf={conf['spark.sql.shuffle.partitions']} aqe={conf['spark.sql.adaptive.enabled']}"
    for name in names:
        fn = REGISTRY[name][0]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{label:22s} {name:28s} {ts}")
spark.stop()
