"""Named-query registry backing ``__spark_entry__.py``.

Each query is registered with an optional DuckDB oracle SQL string; the
driver runs both at sf=0.01 and compares row count + schema +
order-insensitive value hash (BASELINE.json contract).

Determinism rules every query here follows (SURVEY.md §4):
- every top-k orders by ``ROUND(score, 6) DESC, id ASC`` in BOTH
  engines, so float noise below 1e-6 can never flip membership or
  order differently in Spark vs DuckDB;
- every SUM over doubles is a SUM over ``DECIMAL(38,10)`` casts —
  decimal addition is exact and order-independent, so partial
  aggregation order (Spark) vs sequential order (DuckDB) cannot
  diverge; the final value is cast back to DOUBLE and rounded;
- ratios are computed double/double from those exact sums, then
  rounded.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle)
        return fn

    return deco


_MODULES = [
    "multi_search_retrival_big_data_spark.queries.tpch",
    "multi_search_retrival_big_data_spark.queries.dense_queries",
    "multi_search_retrival_big_data_spark.queries.sparse_queries",
    "multi_search_retrival_big_data_spark.queries.fusion_queries",
    "multi_search_retrival_big_data_spark.queries.bridge_queries",
    "multi_search_retrival_big_data_spark.queries.temporal_queries",
    "multi_search_retrival_big_data_spark.queries.pipeline_queries",
    "multi_search_retrival_big_data_spark.queries.text_queries",
    "multi_search_retrival_big_data_spark.queries.ann_queries",
    "multi_search_retrival_big_data_spark.queries.multimodal_queries",
    "multi_search_retrival_big_data_spark.queries.streaming_queries",
]


def load_registry() -> dict[str, QueryDef]:
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # allow partial builds while modules are still being added
            if mod.rsplit(".", 1)[-1] not in str(e):
                raise
    return REGISTRY
