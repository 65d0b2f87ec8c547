"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — named queries, one per implemented SURVEY.md §2 operator.
oracle_sql()  — matching DuckDB SQL for the sf0.01 correctness gate.

All real logic lives in ``multi_search_retrival_big_data_spark``; this
module only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from multi_search_retrival_big_data_spark.queries import load_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: dense top-k cosine search (SURVEY.md Q1) on
    sf0.001 — the reference's /textsearch core re-expressed as a
    DataFrame plan."""
    reg = load_registry()
    return reg["dense_topk_cosine"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in load_registry().items() if qd.oracle is not None
    }
