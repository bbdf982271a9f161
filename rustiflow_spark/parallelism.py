"""Scan-width guard for CPU-heavy per-row operators.

Spark sizes file-scan partitions by COMPRESSED input bytes
(spark.sql.files.maxPartitionBytes), which undercounts operators whose
per-row cost dwarfs their input bytes — Arrow signature kernels, n-gram
explodes, regex chains over compressed text. A 6 MB parquet of 500k
documents becomes 2 tasks carrying ALL of the work (observed: sf10
minhash/decontam running 2-wide on a 32-core session).

ensure_min_parallelism widens such inputs to the cluster's default
parallelism before the heavy stage. On a real wide scan (a 100-TB corpus
has thousands of partitions) it is a no-op — the repartition only fires
on inputs narrower than the cluster, where the extra shuffle is by
definition small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
