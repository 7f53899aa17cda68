"""One-off: scan-split width + shuffle width matrix."""
import os
import sys
import time

from feast_hive_spark.registry import REGISTRY
import feast_hive_spark.registry_analytics  # noqa: F401
import feast_hive_spark.registry_corpus  # noqa: F401
import feast_hive_spark.registry_ext  # noqa: F401
import feast_hive_spark.registry_rel  # noqa: F401
from feast_hive_spark.session import get_spark
from feast_hive_spark.sources.tables import TABLES, register_views, read_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
minpn = os.environ.get("MINPN")
shuf = os.environ.get("SHUF", "32")
spark = get_spark("profile2")
if minpn:
    spark.conf.set("spark.sql.files.minPartitionNum", minpn)
    spark.conf.set("spark.sql.files.maxPartitionBytes", os.environ.get("MAXPB", "134217728"))
spark.conf.set("spark.sql.shuffle.partitions", shuf)
if os.environ.get("AQE"):
    spark.conf.set("spark.sql.adaptive.enabled", os.environ["AQE"])
if os.environ.get("PFIRST"):
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        os.environ["PFIRST"],
    )
spark.sparkContext.setLogLevel("ERROR")
register_views(spark, sf_dir)
for t in TABLES:
    spark.catalog.cacheTable(t)
# report cache partition counts
li = read_table(spark, sf_dir, "lineitem")
li.write.format("noop").mode("overwrite").save()
print("lineitem cache partitions:", li.rdd.getNumPartitions())

names = sys.argv[1:]
total = 0.0
for name in names:
    fn = REGISTRY[name][0]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    total += min(ts)
    print(f"minpn={minpn} shuf={shuf} {name:28s} {ts}")
print(f"TOTAL(min) = {total:.2f}")
spark.stop()
