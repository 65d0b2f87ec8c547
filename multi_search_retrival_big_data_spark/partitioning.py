"""Partition-layout helpers.

A 5k-row parquet file arrives as ONE input partition (one row group →
unsplittable), so every CPU-heavy expression chain (n-gram explode,
shingling, 64-way simhash aggregation) runs on a single core while 31
idle. At 100 TB the same tables arrive as thousands of row groups and
need no help — so the helper is a conditional: widen only when the
scan is narrower than the cluster.

This is the Spark-idiomatic fix: correctness is unaffected (every
aggregation downstream is key-based and every sum order-independent),
and the round-robin shuffle it inserts costs far less than the
serial execution it removes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to `n` (default: cluster parallelism) iff the
    current layout is narrower. No-op on well-partitioned inputs."""
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
