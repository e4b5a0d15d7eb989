"""Window extensions: QUALIFY and frame EXCLUDE.

Reference: WINDOW operator physical_window.cpp:950 with segment-tree frame
aggregation (window_segment_tree.hpp:119); QUALIFY is bound in
bind_select_node.cpp; the EXCLUDE clause (window_expression.hpp:63) has no
Spark frame option and is emulated by subtracting the excluded rows'
contribution from the frame aggregate — exact for sum/count/avg.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def qualify(df: DataFrame, predicate_builder: Callable[[DataFrame], Column]) -> DataFrame:
    """QUALIFY: filter on a window expression. Spark (like the reference's
    binder) evaluates the window in a projection then filters."""
    marked = df.withColumn("__q", predicate_builder(df))
    return marked.filter(F.col("__q")).drop("__q")


def sum_exclude(
    df: DataFrame,
    value: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    frame: tuple[int, int] = (Window.unboundedPreceding, Window.unboundedFollowing),
    exclude: str = "current row",
    out_col: str = "sum_excl",
) -> DataFrame:
    """Windowed SUM with an EXCLUDE clause (current row | group | ties).

    frame_sum  — the normal frame aggregate;
    peer_sum   — sum over rows with equal order-by values (the "group");
    EXCLUDE current row → frame_sum - value
    EXCLUDE group       → frame_sum - peer_sum
    EXCLUDE ties        → frame_sum - peer_sum + value
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by).rowsBetween(*frame)
    # Peers = rows in the same partition with identical order-by key values.
    peer_keys = [*partition_by, *[o.cast("string") for o in order_by]]
    wp = Window.partitionBy(*peer_keys)
    frame_sum = F.sum(value).over(w)
    peer_sum = F.sum(value).over(wp)
    if exclude == "current row":
        expr = frame_sum - value
    elif exclude == "group":
        expr = frame_sum - peer_sum
    elif exclude == "ties":
        expr = frame_sum - peer_sum + value
    elif exclude == "no others":
        expr = frame_sum
    else:
        raise ValueError(f"unknown EXCLUDE mode: {exclude}")
    return df.withColumn(out_col, expr)


def windowed_agg(
    df: DataFrame, spec: WindowSpec, exprs: dict[str, Column]
) -> DataFrame:
    """Attach several window aggregates in one pass (single sort)."""
    out = df
    for name, col in exprs.items():
        out = out.withColumn(name, col.over(spec))
    return out
