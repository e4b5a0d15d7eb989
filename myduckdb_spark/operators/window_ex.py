"""Window extensions: QUALIFY and frame EXCLUDE.

Reference: WINDOW operator physical_window.cpp:950 with segment-tree frame
aggregation (window_segment_tree.hpp:119); QUALIFY is bound in
bind_select_node.cpp; the EXCLUDE clause (window_expression.hpp:16-25,63)
has no Spark frame option. Two emulations:

* subtraction fast path — frame_agg minus the excluded rows' contribution;
  exact for sum/count/avg, but only when the excluded rows' contribution is
  itself window-expressible (current row inside the frame; group/ties only
  under an unbounded frame, because "peers inside a bounded frame" is
  position-dependent).
* frame-materialization path — collect the frame's (row-id, peer-key, value)
  structs with collect_list over the framed window, drop the excluded
  members with a codegen HOF filter, and aggregate the remainder
  (array_min/array_max/size/aggregate). Works for ANY aggregate, any frame,
  any EXCLUDE mode; costs O(frame length) per row, so it is the bounded-
  frame path — exactly the cases the subtraction trick cannot handle.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_UNBOUNDED = (Window.unboundedPreceding, Window.unboundedFollowing)


def qualify(df: DataFrame, predicate_builder: Callable[[DataFrame], Column]) -> DataFrame:
    """QUALIFY: filter on a window expression. Spark (like the reference's
    binder) evaluates the window in a projection then filters."""
    marked = df.withColumn("__q", predicate_builder(df))
    return marked.filter(F.col("__q")).drop("__q")


def _peer_key(order_by: Sequence[Column]) -> Column:
    return F.concat_ws("\x1f", *[o.cast("string") for o in order_by])


def agg_exclude(
    df: DataFrame,
    value: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    frame: tuple[int, int] = _UNBOUNDED,
    exclude: str = "current row",
    agg: str = "sum",
    out_col: str = "agg_excl",
    frame_type: str = "rows",
) -> DataFrame:
    """Windowed aggregate with an EXCLUDE clause.

    agg ∈ {sum, count, avg, min, max}; exclude ∈ {current row, group, ties,
    no others}; frame_type ∈ {rows, range}. Chooses the subtraction fast
    path when it is exact, else the frame-materialization path (any agg ×
    any frame × any mode).
    """
    if exclude not in ("current row", "group", "ties", "no others"):
        raise ValueError(f"unknown EXCLUDE mode: {exclude}")
    if agg not in ("sum", "count", "avg", "min", "max"):
        raise ValueError(f"unsupported aggregate for EXCLUDE: {agg}")
    if frame_type not in ("rows", "range"):
        raise ValueError(f"unknown frame type: {frame_type}")

    wo = Window.partitionBy(*partition_by).orderBy(*order_by)
    w = wo.rangeBetween(*frame) if frame_type == "range" else wo.rowsBetween(*frame)
    if exclude == "no others":
        return df.withColumn(out_col, _plain_agg(agg, value, w))

    cur_in_frame = frame[0] <= 0 <= frame[1]
    # Subtraction needs every excluded row inside the frame: the current row
    # alone whenever the frame straddles it; the whole peer GROUP only under
    # an unbounded frame — or any straddling RANGE frame, where peers share
    # the current row's order value and are therefore always members.
    all_excluded_in_frame = (
        (exclude == "current row" and cur_in_frame)
        or frame == _UNBOUNDED
        or (frame_type == "range" and cur_in_frame)
    )
    if agg in ("sum", "count", "avg") and all_excluded_in_frame:
        return _exclude_by_subtraction(df, value, partition_by, order_by, w, exclude, agg, out_col)
    return _exclude_by_frame_filter(
        df, value, partition_by, order_by, frame, exclude, agg, out_col, frame_type
    )


def _plain_agg(agg: str, value: Column, w: WindowSpec) -> Column:
    fns = {"sum": F.sum, "count": F.count, "avg": F.avg, "min": F.min, "max": F.max}
    return fns[agg](value).over(w)


def _exclude_by_subtraction(
    df: DataFrame,
    value: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    w: WindowSpec,
    exclude: str,
    agg: str,
    out_col: str,
) -> DataFrame:
    """frame_agg minus excluded contribution — exact for additive aggregates.

    Peers are keyed on order-by VALUE equality; valid only when every peer is
    inside the frame (unbounded frame), or for the current row alone.
    """
    wp = Window.partitionBy(*partition_by, _peer_key(order_by))
    frame_sum, frame_cnt = F.sum(value).over(w), F.count(value).over(w)
    peer_sum, peer_cnt = F.sum(value).over(wp), F.count(value).over(wp)
    cur_cnt = F.when(value.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    if exclude == "current row":
        s, c = frame_sum - value, frame_cnt - cur_cnt
        # SUM(x) - x is NULL when x is NULL, but excluding a NULL row must
        # leave the frame sum untouched
        s = F.when(value.isNull(), frame_sum).otherwise(s)
    elif exclude == "group":
        s, c = frame_sum - peer_sum, frame_cnt - peer_cnt
        s = F.coalesce(s, frame_sum)
    else:  # ties
        s = frame_sum - peer_sum + F.coalesce(value, F.lit(0))
        s = F.when(value.isNull(), F.coalesce(frame_sum - peer_sum, frame_sum)).otherwise(s)
        c = frame_cnt - peer_cnt + cur_cnt
    if agg == "sum":
        out = F.when(c > 0, s).otherwise(F.lit(None))
    elif agg == "count":
        out = c
    else:  # avg
        out = F.when(c > 0, s / c).otherwise(F.lit(None))
    return df.withColumn(out_col, out)


def _exclude_by_frame_filter(
    df: DataFrame,
    value: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    frame: tuple[int, int],
    exclude: str,
    agg: str,
    out_col: str,
    frame_type: str = "rows",
) -> DataFrame:
    """Materialize the frame as an array of (rid, peer-key, value) structs,
    HOF-filter the excluded members, aggregate the rest. All codegen."""
    wo = Window.partitionBy(*partition_by).orderBy(*order_by)
    wf = wo.rangeBetween(*frame) if frame_type == "range" else wo.rowsBetween(*frame)
    rid = F.row_number().over(wo)
    pk = _peer_key(order_by)
    vtype = df.select(value.alias("__v")).schema[0].dataType.simpleString()

    out = df.withColumn("__rid", rid).withColumn("__pk", pk).withColumn("__v", value)
    member = F.struct(F.col("__rid").alias("r"), F.col("__pk").alias("k"), F.col("__v").alias("v"))
    arr = F.collect_list(member).over(wf)  # collect_list skips NULL structs: none here

    r, k = F.col("__rid"), F.col("__pk")
    if exclude == "current row":
        keep = lambda x: x["r"] != r  # noqa: E731
    elif exclude == "group":
        keep = lambda x: x["k"] != k  # noqa: E731
    else:  # ties: peers out, self stays
        keep = lambda x: (x["k"] != k) | (x["r"] == r)  # noqa: E731
    vals = F.filter(F.filter(arr, keep), lambda x: x["v"].isNotNull())
    vs = F.transform(vals, lambda x: x["v"])

    if agg == "min":
        res = F.array_min(vs)
    elif agg == "max":
        res = F.array_max(vs)
    elif agg == "count":
        res = F.size(vs)
    else:
        total = F.aggregate(vs, F.lit(None).cast(vtype), lambda acc, x: F.coalesce(acc + x, x, acc))
        res = total / F.size(vs) if agg == "avg" else total
    return (
        out.withColumn(out_col, res)
        .drop("__rid", "__pk", "__v")
    )


def sum_exclude(
    df: DataFrame,
    value: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    frame: tuple[int, int] = _UNBOUNDED,
    exclude: str = "current row",
    out_col: str = "sum_excl",
) -> DataFrame:
    """Windowed SUM with an EXCLUDE clause (kept as the historical entry
    point; dispatches through agg_exclude, which picks a frame-correct
    strategy — the old always-subtract version silently mis-handled
    group/ties under bounded frames)."""
    return agg_exclude(df, value, partition_by, order_by, frame, exclude, "sum", out_col)


def windowed_agg(
    df: DataFrame, spec: WindowSpec, exprs: dict[str, Column]
) -> DataFrame:
    """Attach several window aggregates in one pass (single sort)."""
    out = df
    for name, col in exprs.items():
        out = out.withColumn(name, col.over(spec))
    return out
