"""Benchmark variants: production-realistic float aggregation.

The registered builders decimal-cast money/ratio aggregates so the
driver's exact hash-compare is order-independent (functions/compat.py —
summing doubles is order-dependent, and Spark's partial/final aggregation
order differs run-to-run). That exactness device costs ~4x on
aggregate-bound queries (measured: q01 sf1 decimal 1.71s vs double 0.42s,
local[32]) and is NOT something a user of either engine writes — the
reference's own TPC-H runs sum its native column types directly.

These variants keep the query shape identical and sum plain doubles ON
BOTH ENGINES (the bench oracle drops the decimal casts too, so the
DuckDB baseline is the same apples-to-apples float plan). bench.py
prefers them; the correctness gate never sees them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myduckdb_spark.catalog import load_table, table_row_count
from myduckdb_spark.catalog import maybe_broadcast as _mb
from myduckdb_spark.operators.groupjoin import group_join
from myduckdb_spark.operators.ordering import sorted_small, sorted_tiny
from myduckdb_spark.queries import register_bench

_REV = "l_extendedprice * (1 - l_discount)"


@register_bench(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           SUM(l_extendedprice) AS sum_base_price,
           SUM({_REV}) AS sum_disc_price,
           SUM({_REV} * (1 + l_tax)) AS sum_charge,
           AVG(l_quantity) AS avg_qty,
           AVG(l_extendedprice) AS avg_price,
           AVG(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_bench(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # enum-domain group keys (§2.4; mirrors the registered builder)
        .transform(sorted_tiny, "l_returnflag", "l_linestatus")
    )


@register_bench(
    "q03_top_revenue_orders",
    oracle=f"""
    SELECT l_orderkey, SUM({_REV}) AS revenue, o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q03_bench(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_mb(cust, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register_bench(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name, SUM({_REV}) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q05_bench(spark, sf_dir):
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_mb(supplier, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            _mb(customer, sf_dir, "customer"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(_mb(nation, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(_mb(region, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue"))
        # one row per nation of one region (§2.4)
        .transform(sorted_tiny, F.col("revenue").desc(), F.col("n_name"))
    )


@register_bench(
    "q06_forecast_revenue",
    oracle="""
    SELECT SUM(l_extendedprice * l_discount) AS revenue, COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q06_bench(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register_bench(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, SUM({_REV}) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_bench(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_mb(customer, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(_mb(nation, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register_bench(
    "groupjoin_order_items",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, agg.n_items, agg.total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, COUNT(*) AS n_items, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
    ) agg ON o.o_orderkey = agg.l_orderkey
    ORDER BY o.o_orderkey
    """,
)
def groupjoin_bench(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = group_join(
        orders,
        li,
        keys=[("o_orderkey", "l_orderkey")],
        aggs=[
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("total_qty"),
        ],
        how="inner",
    )
    # one row per order — footer-gated single-partition sort (§2.4)
    return sorted_small(
        out.select("o_orderkey", "o_totalprice", "n_items", "total_qty"),
        "o_orderkey",
        est_rows=table_row_count(sf_dir, "orders"),
    )


@register_bench(
    "join_range_theta",
    oracle="""
    SELECT o.o_orderstatus, COUNT(*) AS n_lines, SUM(l.l_quantity) AS qty
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def join_range_theta_bench(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 60 DAY"))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.sum("l_quantity").alias("qty"))
        # one row per order status (§2.4)
        .transform(sorted_tiny, "o_orderstatus")
    )


@register_bench(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n, SUM(o_totalprice) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
)
def agg_rollup_bench(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
        )
        # status×priority rollup — enum-domain group keys (§2.4)
        .transform(sorted_tiny, "gid", "o_orderstatus", "o_orderpriority")
    )
