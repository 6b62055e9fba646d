#!/usr/bin/env python
"""Measure small-write strategies for the durable store."""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nicefox_graphdb_spark import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

df = (
    spark.range(1000)
    .select(F.expr("uuid()").alias("_id"), F.col("id").alias("k"),
            (F.col("id") % 10).alias("v"))
    .localCheckpoint(eager=True)
)
N_BUCKETS = 32
bucketed = df.withColumn(
    "__bucket", F.pmod(F.xxhash64(F.col("_id")), F.lit(N_BUCKETS)).cast("int")
)

VARIANTS = {
    "rebalance+partitionBy": lambda d, p: d.hint("rebalance", "__bucket")
        .write.partitionBy("__bucket").mode("overwrite").parquet(p),
    "plain+partitionBy": lambda d, p: d
        .write.partitionBy("__bucket").mode("overwrite").parquet(p),
    "repartition1+partitionBy": lambda d, p: d.repartition(1)
        .write.partitionBy("__bucket").mode("overwrite").parquet(p),
    "repartitionCol+partitionBy": lambda d, p: d.repartition("__bucket")
        .write.partitionBy("__bucket").mode("overwrite").parquet(p),
    "coalesce1+partitionBy": lambda d, p: d.coalesce(1)
        .write.partitionBy("__bucket").mode("overwrite").parquet(p),
    "sortWithinPartitions": lambda d, p: d.repartition(1)
        .sortWithinPartitions("__bucket")
        .write.partitionBy("__bucket").mode("overwrite").parquet(p),
}

for name, fn in VARIANTS.items():
    times = []
    for i in range(4):
        p = tempfile.mkdtemp(prefix="nfw3_")
        shutil.rmtree(p)
        t0 = time.time()
        fn(bucketed, p)
        times.append(time.time() - t0)
        shutil.rmtree(p, ignore_errors=True)
    times = times[1:]
    print(f"{name:32s} {min(times):.3f} / {sum(times)/len(times):.3f}")
