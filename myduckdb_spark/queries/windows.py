"""Window-function queries (SURVEY.md §2.6; reference physical_window.cpp
with segment-tree frames, streaming window for partition-less frames).
All ranking/analytic functions and ROWS/RANGE frames are Spark-native;
QUALIFY and frame EXCLUDE are composed in operators/window_ex.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from myduckdb_spark.catalog import load_table, table_row_count
from myduckdb_spark.functions.compat import DEC
from myduckdb_spark.operators.ordering import sorted_small
from myduckdb_spark.operators.window_ex import agg_exclude, qualify, sum_exclude
from myduckdb_spark.queries import register


@register(
    "win_ranking",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cdist
    FROM orders
    WHERE o_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, rn
    """,
    tags=("window", "ranking"),
)
def win_ranking(spark, sf_dir):
    """All ranking functions over one window (single sort pass)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cdist"),
        )
        .orderBy("o_orderpriority", "rn")
    )


@register(
    "win_lead_lag",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           LAG(event_type, 2, 'none') OVER w AS prev2_type
    FROM events WHERE user_id % 100 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
    tags=("window", "analytic"),
)
def win_lead_lag(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "win_running_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_total,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders WHERE o_custkey % 50 = 1
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "frames"),
)
def win_running_frames(spark, sf_dir):
    """ROWS frames: running and sliding aggregates (reference segment-tree
    frame aggregation, window_segment_tree.hpp:119), first/nth value."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 1)
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = wo.rowsBetween(-2, Window.currentRow)
    full = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    price_dec = F.col("o_totalprice").cast(DEC)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec).over(running).cast("double").alias("running_total"),
        F.sum(price_dec).over(sliding).cast("double").alias("window3_total"),
        F.first("o_orderkey").over(wo).alias("first_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           COUNT(*) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
    FROM orders WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
    tags=("window", "frames"),
)
def win_range_frame(spark, sf_dir):
    """RANGE frame over a numeric key — value-based bounds (reference
    WindowBoundary EXPR_PRECEDING). Partition-less: the reference would
    use STREAMING_WINDOW; Spark runs a single-partition window (fine for
    a filtered subset; full-table partition-less windows don't scale on
    any engine)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    w = Window.orderBy("o_totalprice").rangeBetween(-10000, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
    ).orderBy("o_orderkey")


@register(
    "win_qualify_topk",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
      WHERE c_custkey % 20 = 0
    ) WHERE rn <= 3
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """,
    tags=("window", "qualify"),
)
def win_qualify_topk(spark, sf_dir):
    """QUALIFY-style top-k per group (reference binds QUALIFY as
    window+filter; Spark pushes the rank predicate into the window exec
    as WindowGroupLimit — bounded buffers, scales to huge groups)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 20 == 0)
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey).select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    out = qualify(joined, lambda df: F.row_number().over(w) <= 3)
    # ≤ 3 rows per sampled customer: below the cap a single-partition
    # exchange sorts in one task — and the window stage executes ONCE
    # (the range sort's bounds sampling re-runs it); above the cap the
    # footer estimate flips back to the scalable range sort (§2.4)
    est = table_row_count(sf_dir, "customer")
    return sorted_small(
        out,
        "c_custkey", F.col("o_totalprice").desc(), "o_orderkey",
        est_rows=None if est is None else (est // 20 + 1) * 3,
    )


@register(
    "win_exclude_current_row",
    oracle="""
    SELECT n_nationkey, n_regionkey,
           CAST(SUM(CAST(n_nationkey AS DECIMAL(18,6)))
                OVER (PARTITION BY n_regionkey ORDER BY n_nationkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                      EXCLUDE CURRENT ROW) AS DOUBLE) AS sum_others
    FROM nation ORDER BY n_nationkey
    """,
    tags=("window", "exclude"),
)
def win_exclude_current_row(spark, sf_dir):
    """Frame EXCLUDE CURRENT ROW (reference window_expression.hpp:63) —
    no Spark frame option; emulated as frame_sum - current value
    (operators/window_ex.py)."""
    nation = load_table(spark, sf_dir, "nation")
    out = sum_exclude(
        nation,
        value=F.col("n_nationkey").cast(DEC),
        partition_by=["n_regionkey"],
        order_by=[F.col("n_nationkey")],
        exclude="current row",
        out_col="sum_others_dec",
    )
    return (
        out.withColumn("sum_others", F.col("sum_others_dec").cast("double"))
        .select("n_nationkey", "n_regionkey", "sum_others")
        .orderBy("n_nationkey")
    )


@register(
    "win_exclude_group_ties",
    oracle="""
    SELECT o_orderkey, o_custkey,
           MIN(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)
                RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS mn_group,
           MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)
                RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS mx_ties,
           COUNT(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)
                RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS cnt_group
    FROM orders WHERE o_custkey % 50 = 1
    ORDER BY o_orderkey
    """,
    tags=("window", "exclude"),
)
def win_exclude_group_ties(spark, sf_dir):
    """EXCLUDE GROUP / TIES for non-additive aggregates (min/max) over a
    bounded RANGE frame (reference window_expression.hpp:16-25: EXCLUDE is
    orthogonal to the aggregate). RANGE keeps peer membership value-based,
    so results are engine-deterministic even with order-key ties — which a
    bounded ROWS frame with ties is not, on any engine. min/max run on the
    frame-materialization path; count on the subtraction path."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 1)
    yr = F.year("o_orderdate").cast("long")
    common = dict(
        partition_by=["o_custkey"],
        order_by=[yr],
        frame=(-1, 1),
        frame_type="range",
    )
    out = agg_exclude(
        orders, F.col("o_totalprice"), exclude="group", agg="min", out_col="mn_group", **common
    )
    out = agg_exclude(
        out, F.col("o_totalprice"), exclude="ties", agg="max", out_col="mx_ties", **common
    )
    out = agg_exclude(
        out, F.col("o_totalprice"), exclude="group", agg="count", out_col="cnt_group", **common
    )
    return out.select(
        "o_orderkey", "o_custkey", "mn_group", "mx_ties", "cnt_group"
    ).orderBy("o_orderkey")


@register(
    "win_share_of_group",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority, o_orderstatus, rev,
           rev / CAST(SUM(CAST(rev AS DECIMAL(18,6))) OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS share
    FROM g ORDER BY o_orderpriority, o_orderstatus
    """,
    tags=("window", "aggregate"),
)
def win_share_of_group(spark, sf_dir):
    """Aggregate-then-window composition (sum over groupBy output)."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev")
    )
    w = Window.partitionBy("o_orderpriority")
    return g.select(
        "o_orderpriority",
        "o_orderstatus",
        "rev",
        (F.col("rev") / F.sum(F.col("rev").cast(DEC)).over(w).cast("double")).alias("share"),
    ).orderBy("o_orderpriority", "o_orderstatus")
