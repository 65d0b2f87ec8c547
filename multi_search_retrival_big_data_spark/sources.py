"""Non-parquet sources and sinks — JSONL, CSV, partitioned parquet.

The reference's persistence layer is a zoo of single-node formats:
.json keyframe/id dicts (app.py:150-162, utils/search_utils.py:18-40),
per-keyframe .txt context files (dataset_extraction/context_extraction),
.pkl fitted vectorizers + .npz sparse matrices
(utils/object_retrieval_engine/object_retrieval.py:117-145) and FAISS
.bin indexes (app.py:164-165). In this engine the fitted artifacts map
to persisted bucketed tables (index_store.py); the *interchange*
formats map to Spark's native JSONL/CSV readers and writers here.

Scale notes:
- Readers take an EXPLICIT schema: schema inference is a full extra
  pass over the data at 100 TB and can silently widen types between
  runs. Every reader here requires the caller's schema.
- JSONL and CSV are line-splittable (CSV only when multiLine=false),
  so both parallelize per-file-split like parquet; with
  multiLine=true (quoted newlines) CSV files become one-split-per-file
  — keep files small or prefer JSONL for text-bearing columns.
- Writers emit one file per partition; `coalesce` before writing only
  to bound small-file count, never to 1 (a single writer task is the
  classic ingest bottleneck).
- Partitioned parquet (`partitionBy`) encodes the partition column in
  the directory layout; a reader filtering on it prunes entire
  directories before any IO (PartitionFilters in the scan node) — the
  at-rest layout that makes per-language / per-day scans O(selected
  partitions), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (one object per line, Spark's native json
    format). Strings are escaped per RFC 8259, so newline-bearing text
    columns round-trip exactly."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-explicit JSONL source; mode=FAILFAST so corrupt rows
    surface as job failures, not silent nulls."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink with full quoting so embedded delimiters/newlines
    survive; header carried per file. escape='"' makes Spark emit
    RFC-4180 doubled quotes (its default is backslash escaping, which
    a standards-compliant reader mis-parses)."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: str, multi_line: bool = True) -> DataFrame:
    """Schema-explicit CSV source. multiLine=True is required when
    quoted fields contain newlines — at the cost of per-file (not
    per-split) parallelism; pass False for machine-generated CSV known
    to be newline-free."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", multi_line)
        .option("escape", '"')
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the second columnar interchange format Spark ships
    natively (Hive/Trino ecosystems). Same columnar/stripe layout
    virtues as parquet: column pruning, predicate pushdown via stripe
    stats, splittable files."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-explicit ORC source (explicit schema skips footer-merge
    inference across files, same rule as the other readers)."""
    return spark.read.schema(schema).orc(path)


def write_partitioned_parquet(df: DataFrame, path: str, cols: list[str]) -> None:
    """Hive-style partitioned parquet sink (dir-per-value layout)."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def compact_parquet(
    spark: SparkSession, src_path: str, dst_path: str, target_files: int
) -> None:
    """Small-file compaction: rewrite a fragmented parquet dataset into
    `target_files` files. The classic 100 TB maintenance job — ingest
    (especially streaming foreachBatch appends, one file per
    micro-batch per partition) accumulates thousands of KB-sized files
    whose per-file open/footer cost comes to dominate scans; a periodic
    rewrite restores row-group-sized files. `repartition` (round-robin
    shuffle) rather than `coalesce`: coalesce(n) merges without a
    shuffle but chains upstream partitioning into skewed outputs and
    caps the WRITE parallelism at n; the compaction shuffle is the
    point of the job. Never compact to 1 — a single writer task is the
    other classic ingest bottleneck."""
    spark.read.parquet(src_path).repartition(target_files).write.mode(
        "overwrite"
    ).parquet(dst_path)


def read_parquet(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)
