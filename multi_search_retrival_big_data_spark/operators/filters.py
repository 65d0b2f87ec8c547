"""Search-space algebra — Q14: ignore-list expansion, complement,
intersection; Q23/Q24 limit semantics.

Reference: app.py:192-203 expands each ignored keyframe to its whole
shot (`get_near_frame`), unions them, complements against the id
universe (`np.delete`), and intersects with the explicit id filter and
the active search space (`np.intersect1d`) — app.py:318-328, 381-390.

Spark algebra: expansion = equi-join on the group key; complement =
anti-join; intersection = semi-join chain. All are id-column-only
plans (column pruning keeps them narrow) and every step is
broadcast-able when the ignore/keep lists are request-sized."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_to_group(ids: DataFrame, dim: DataFrame, id_col: str, group_cols: list[str]) -> DataFrame:
    """Every id sharing a group with an input id (the 'whole shot of
    each ignored keyframe' expansion)."""
    groups = (
        dim.join(ids.select(F.col(ids.columns[0]).alias(id_col)), id_col, "left_semi")
        .select(*group_cols)
        .distinct()
    )
    return dim.join(F.broadcast(groups), group_cols, "left_semi").select(id_col)


def complement(universe: DataFrame, removed: DataFrame, id_col: str) -> DataFrame:
    """np.delete equivalent — anti-join against the universe."""
    return universe.select(id_col).join(
        removed.select(F.col(removed.columns[0]).alias(id_col)), id_col, "left_anti"
    )


def intersect_all(sets: list[DataFrame], id_col: str) -> DataFrame:
    """np.intersect1d chain as stacked semi-joins."""
    out = sets[0].select(F.col(sets[0].columns[0]).alias(id_col))
    return reduce(
        lambda acc, s: acc.join(
            s.select(F.col(s.columns[0]).alias(id_col)), id_col, "left_semi"
        ),
        sets[1:],
        out,
    )


def build_search_space(
    dim: DataFrame,
    id_col: str,
    group_cols: list[str],
    ignore_ids: DataFrame | None = None,
    keep_ids: DataFrame | None = None,
    space: DataFrame | None = None,
) -> DataFrame:
    """The full Q14 pipeline: expand ignores → complement → intersect
    with keep set and search space. Returns the allowed id set."""
    allowed = dim.select(id_col)
    if ignore_ids is not None:
        removed = expand_to_group(ignore_ids, dim, id_col, group_cols)
        allowed = complement(allowed, removed, id_col)
    pieces = [allowed]
    if keep_ids is not None:
        pieces.append(keep_ids)
    if space is not None:
        pieces.append(space)
    return intersect_all(pieces, id_col)
