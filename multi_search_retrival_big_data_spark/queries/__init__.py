"""Named-query registry backing ``__spark_entry__.py``.

Each query is registered with an optional DuckDB oracle SQL string; the
driver runs both at sf=0.01 and compares row count + schema +
order-insensitive value hash (BASELINE.json contract).

Determinism rules every query here follows (SURVEY.md §4; see
queries/common.py and functions/rounding.py):
- every top-k orders by a det-rounded score ``FLOOR(s·1e6 + 0.5)/1e6
  DESC, id ASC`` in BOTH engines (never plain ROUND — Spark rounds the
  shortest string repr, DuckDB the binary value, and they disagree on
  boundary doubles), so float noise below 1e-6 can never flip
  membership or order differently in Spark vs DuckDB;
- every SUM over doubles quantizes each addend first —
  ``SUM(CAST(FLOOR(x·1e12 + 0.5) AS DECIMAL(38,0)))/1e12`` — so the
  accumulation is exact and order-independent: Spark's partial-agg
  order vs DuckDB's sequential order cannot diverge (common.dsum /
  rounding.quantized_sum);
- ratios are computed double/double from those exact sums, then
  det-rounded.
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
    "multi_search_retrival_big_data_spark.queries.sampling_queries",
    "multi_search_retrival_big_data_spark.queries.source_queries",
    "multi_search_retrival_big_data_spark.queries.curation_queries",
    "multi_search_retrival_big_data_spark.queries.rerank_queries",
]

# The driver records a CORRECTNESS row for (at most) the first 50
# registry entries per round, so ordering IS the proof-freshness
# policy. Rotation rule (r4 verdict item 1): never-driver-proven
# queries (new this round, or rows that ever failed) go FIRST, then
# everything else ordered by OLDEST driver proof first — each round
# re-certifies the ~50 stalest entries, so no query's external proof
# ages more than ~⌈N/50⌉ rounds. The proof ledger is read from the
# committed CORRECTNESS_r*.json files at the repo root; ties keep
# module registration order.


def _last_proof_round() -> dict[str, int]:
    """name → round of the MOST RECENT driver row, if that row passed
    (rows/schema/hash all true, or the rows-only check for no-oracle
    entries); 0 if the most recent row failed or errored. A query that
    passed in r2 but regressed in r5 therefore sorts at the FRONT like
    a never-proven query — the latest outcome wins, not the latest
    pass."""
    import glob
    import json
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict[str, tuple[int, bool]] = {}  # name -> (round, passed)
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(p.rsplit("_r", 1)[-1].split(".")[0])
            with open(p) as f:
                data = json.load(f)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            passed = (
                row.get("err") is None
                and bool(row.get("rows_match"))
                and row.get("hash_match") is not False
                and row.get("schema_match") is not False
            )
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, passed)
    return {name: (rnd if passed else 0) for name, (rnd, passed) in latest.items()}


def load_registry() -> dict[str, QueryDef]:
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # allow partial builds while modules are still being added
            if mod.rsplit(".", 1)[-1] not in str(e):
                raise
    last = _last_proof_round()
    names = list(REGISTRY)
    order = sorted(range(len(names)), key=lambda i: (last.get(names[i], 0), i))
    return {names[i]: REGISTRY[names[i]] for i in order}
