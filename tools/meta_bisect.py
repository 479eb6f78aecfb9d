"""Round-13 lead item: reproduce + name the metadata-plan regression.

Runs the exact bench.py metadata benches (small + deep) on the current
tree, then cProfiles one true-cold read of the deep fixture so the cost
has a NAME, not a guess.
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS",
    "--driver-memory 12g --driver-java-options "
    "\"-Xms12g -XX:+UseG1GC\" pyspark-shell")

from datalake_ingestion_system_spark.session import get_spark
import bench

spark = get_spark("meta-bisect")
spark.range(1000).selectExpr("sum(id)").collect()

t0 = time.time()
small = bench._metadata_plan_bench(spark)
print("metadata_plan:", small, flush=True)
deep = bench._metadata_plan_bench(spark, n_commits=6000,
                                  files_per_commit=8,
                                  fixture_tag="deep_v2")
print("metadata_plan_deep:", deep, flush=True)

# profile one TRUE-COLD deep read
import datalake_ingestion_system_spark.sinks as sk
path = "/tmp/spark_graft_bench_fixtures/commitlog6000_deep_v2"
sk._LOG_CACHE.clear()
fmt = sk.TxnLogFormat()
pr = cProfile.Profile()
pr.enable()
n = fmt.read(spark, path, where="id = 47993").count()
pr.disable()
assert n == 1
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
print(s.getvalue())

# and one WARM (process-cache hit) read profiled
fmt = sk.TxnLogFormat()
pr = cProfile.Profile()
pr.enable()
n = fmt.read(spark, path, where="id = 47993").count()
pr.disable()
assert n == 1
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
print("=== WARM ===")
print(s.getvalue())
