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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) LEFT side
    with a deterministic per-row shard and replicate the RIGHT side
    across all shards, so one hot key spreads over `salt` reducers
    instead of one straggler task.

    The shard is hash-derived from the whole left row (deterministic —
    no rand(), which would break retry/replay and oracle comparison).
    Results are identical to the plain join; only the physical
    partitioning differs. AQE's skew-join split handles moderate skew
    automatically — reach for this when a single key exceeds what one
    task can hold (the 'null key' / 'default tenant' pathology).

    Only inner/left joins: replicating the right side would multiply
    unmatched right rows under right/outer semantics."""
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")

    shard = F.pmod(
        F.hash(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).alias("__shard")
    l = left.select("*", shard)
    r = right.crossJoin(
        right.sparkSession.range(salt).select(F.col("id").cast("int").alias("__shard"))
    )
    return l.join(r, keys + ["__shard"], how).drop("__shard")
