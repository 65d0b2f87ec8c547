"""Custom stateful streaming operator via applyInPandasWithState —
the extension seam for operators Spark's built-in aggregations can't
express (running per-key model state, decaying counters, online
sketches).

Demonstrated operator: per-user running event counter + value sum that
persists across micro-batches in the state store. With a single
AvailableNow batch the emitted result equals the batch groupBy — which
is exactly what makes it oracle-verifiable while still exercising the
real state-store code path (GroupState get/update/exists).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value_q BIGINT"
STATE_SCHEMA = "n BIGINT, vq BIGINT"

# value quantization: state sums are kept as integer micro-units so the
# accumulated double is exact and order-independent (same trick as
# queries/common.dsum).
VALUE_SCALE = 1_000_000


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, vq = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # FLOOR(v·1e6 + 0.5) matches the oracle's quantization exactly
        vq += int(np.floor(pdf["value"].to_numpy() * VALUE_SCALE + 0.5).sum())
    state.update((n, vq))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value_q": [vq]}
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Stateful running (n_events, Σvalue) per user. Emits the current
    state for every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
