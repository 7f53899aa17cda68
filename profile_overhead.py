"""One-off: decompose per-query time into Python plan construction,
Catalyst analysis+optimization+physical planning, and execution."""
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
spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SHUF", "8"))
spark.sparkContext.setLogLevel("ERROR")
register_views(spark, sf_dir)
for t in TABLES:
    spark.catalog.cacheTable(t)

names = sys.argv[1:] or ["q1_pricing_summary", "q10_returned_items", "tfidf_top_terms", "pit_asof_join"]
for name in names:
    fn = REGISTRY[name][0]
    # warmup
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    for i in range(2):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        print(f"{name:28s} build={t1-t0:6.3f} plan={t2-t1:6.3f} exec={t3-t2:6.3f} total={t3-t0:6.3f}")
spark.stop()
