"""Interactive A/B timing harness for optimization work (not imported
by the engine; dev-only). Usage: python -i tools/repl_init.py"""
import time

from java_mapreduce_framework_spark.session import get_spark
from java_mapreduce_framework_spark.plans import registry

SF = "/root/testdata/sf0.1"
spark = get_spark("jmrf-repl")
spark.sparkContext.setLogLevel("ERROR")
SPECS = registry.registry()

# same warm-up as bench.py
spark.range(1_000_000).selectExpr("sum(id)").collect()


def _ident(batches):
    yield from batches


spark.range(100).mapInPandas(_ident, "id long").count()
(
    spark.readStream.format("rate")
    .option("rowsPerSecond", "1")
    .load()
    .groupBy("value")
    .count()
    .writeStream.outputMode("complete")
    .format("noop")
    .trigger(availableNow=True)
    .start()
    .awaitTermination()
)


def t(name, runs=2, sf=SF):
    """Time a registered query with the bench protocol (noop sink,
    min-of-N)."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df = SPECS[name].fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        print(f"  {name}: {time.perf_counter() - t0:.3f}s")
    return round(best, 3)


def tdf(fn, runs=2, sf=SF):
    """Time an arbitrary fn(spark, sf)->DataFrame with the noop sink."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df = fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        took = time.perf_counter() - t0
        best = min(best, took)
        print(f"  {took:.3f}s")
    return round(best, 3)


print("READY: t('query_name'), tdf(fn)")
