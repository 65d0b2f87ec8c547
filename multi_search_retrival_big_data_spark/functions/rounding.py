"""Engine-portable deterministic rounding for oracle-compared scores.

Spark's ROUND (HALF_UP via BigDecimal on the shortest string repr) and
DuckDB's ROUND (on the binary double) can disagree on boundary values,
which is enough to flip top-k membership at exact .5·10^-s boundaries.
FLOOR(x·10^s + 0.5)/10^s uses only exact IEEE ops (multiply, add,
floor) and is bit-identical in both engines — every score an operator
rounds for comparison goes through this, never F.round.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def det_round(col: Column, scale: int = 6) -> Column:
    m = F.lit(float(10**scale))
    return F.floor(col * m + F.lit(0.5)).cast("double") / m


def quantized_sum(col: Column, scale: int = 12) -> Column:
    """Order-independent, engine-independent SUM of a double expression:
    quantize each addend exactly, sum as DECIMAL(38,0) (commutative),
    divide back. Valid while |x|·10^scale < 2^53 per row."""
    m = float(10**scale)
    q = F.floor(col * m + F.lit(0.5)).cast("decimal(38,0)")
    return F.sum(q).cast("double") / F.lit(m)
