"""Set operations, sampling, limits, pivot/unpivot/unnest, VALUES,
series generators, recursive CTE (SURVEY.md §2.7-2.8, §2.2 generators).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myduckdb_spark.catalog import load_table
from myduckdb_spark.operators.pivots import pivot, unnest, unpivot
from myduckdb_spark.operators.recursive import recursive_cte
from myduckdb_spark.operators.sample import deterministic_sample
from myduckdb_spark.operators.setops import (
    except_all,
    except_distinct,
    intersect_all,
    intersect_distinct,
    union_all,
    union_distinct,
)
from myduckdb_spark.operators.topk import limit_offset
from myduckdb_spark.queries import register


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def setop_union_distinct(spark, sf_dir):
    return union_distinct(_cust_nations(spark, sf_dir), _supp_nations(spark, sf_dir)).orderBy(
        "nationkey"
    )


@register(
    "setop_except_intersect",
    oracle="""
    WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000),
         s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
    ORDER BY op, nationkey
    """,
    tags=("setop",),
)
def setop_except_intersect(spark, sf_dir):
    """EXCEPT/INTERSECT — the reference plans these as ANTI/SEMI hash
    joins over all columns (plan_set_operation.cpp:47-90); Spark does the
    identical rewrite."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    s = _supp_nations(spark, sf_dir).distinct()
    ex = except_distinct(c, s).withColumn("op", F.lit("except"))
    it = intersect_distinct(c, s).withColumn("op", F.lit("intersect"))
    return union_all(ex, it).select("op", "nationkey").orderBy("op", "nationkey")


@register(
    "setop_all_variants",
    oracle="""
    WITH a AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey % 500 = 0),
         b AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey % 500 = 0 AND l_quantity > 25)
    SELECT 'except_all' AS op, flag, COUNT(*) AS n
    FROM (SELECT flag FROM a EXCEPT ALL SELECT flag FROM b) GROUP BY flag
    UNION ALL
    SELECT 'intersect_all' AS op, flag, COUNT(*) AS n
    FROM (SELECT flag FROM a INTERSECT ALL SELECT flag FROM b) GROUP BY flag
    ORDER BY op, flag
    """,
    tags=("setop",),
)
def setop_all_variants(spark, sf_dir):
    """EXCEPT ALL / INTERSECT ALL — duplicate-preserving variants (the
    row_number trick in both engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    a = li.select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_quantity") > 25).select(F.col("l_returnflag").alias("flag"))
    ex = (
        except_all(a, b)
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    it = (
        intersect_all(a, b)
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    return union_all(ex, it).select("op", "flag", "n").orderBy("op", "flag")


@register(
    "sample_deterministic",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
    tags=("sample",),
)
def sample_deterministic(spark, sf_dir):
    """Engine-independent sample (reference USING SAMPLE is seeded RNG —
    not cross-engine reproducible; bernoulli/reservoir modes are covered
    by unit tests, this query pins the deterministic variant)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        deterministic_sample(orders, F.col("o_orderkey"), 97)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "limit_offset_page",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 30
    """,
    tags=("limit",),
)
def limit_offset_page(spark, sf_dir):
    """LIMIT/OFFSET paging (reference physical_limit.cpp OFFSET support)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return limit_offset(
        orders, [F.col("o_totalprice").desc(), F.col("o_orderkey")], limit=15, offset=30
    )


@register(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_status_counts(spark, sf_dir):
    """PIVOT (reference physical_pivot.cpp): explicit IN-list → no
    discovery pass."""
    orders = load_table(spark, sf_dir, "orders")
    out = pivot(
        orders,
        group_by=["o_orderpriority"],
        pivot_col="o_orderstatus",
        values=["F", "O", "P"],
        agg=F.count(F.lit(1)),
    )
    return (
        out.select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value
    FROM part WHERE p_partkey % 100 = 0
    UNION ALL
    SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part WHERE p_partkey % 100 = 0
    ORDER BY p_partkey, measure
    """,
    tags=("pivot",),
)
def unpivot_part_measures(spark, sf_dir):
    """UNPIVOT (Spark native melt; reference transform_pivot.cpp)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 100 == 0)
    wide = part.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    return unpivot(
        wide, ids=["p_partkey"], value_cols=["p_retailprice", "p_size"],
        var_name="measure", value_name="value",
    ).orderBy("p_partkey", "measure")


@register(
    "unnest_tokens",
    oracle="""
    SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_distinct
    FROM (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    )
    WHERE token <> ''
    GROUP BY lang ORDER BY lang
    """,
    tags=("unnest",),
)
def unnest_tokens(spark, sf_dir):
    """UNNEST (reference physical_unnest.cpp): explode split tokens."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = unnest(
        docs.select("lang", F.split("text", " ").alias("token")), "token"
    ).filter(F.col("token") != "")
    return (
        tokens.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.countDistinct("token").alias("n_distinct"))
        .orderBy("lang")
    )


@register(
    "values_and_series",
    oracle="""
    WITH v(grade, lo, hi) AS (VALUES ('low', 0, 10), ('mid', 10, 30), ('high', 30, 100))
    SELECT v.grade, g.n
    FROM v JOIN (SELECT unnest(generate_series(1, 50)) AS n) g
      ON g.n >= v.lo AND g.n < v.hi
    ORDER BY g.n
    """,
    tags=("values", "series"),
)
def values_and_series(spark, sf_dir):
    """VALUES list (reference EXPRESSION_SCAN) + integer series generator
    (reference range.cpp → spark.range), theta-joined."""
    v = spark.createDataFrame(
        [("low", 0, 10), ("mid", 10, 30), ("high", 30, 100)], ["grade", "lo", "hi"]
    )
    g = spark.range(1, 51).select(F.col("id").cast("int").alias("n"))
    return (
        g.join(F.broadcast(v), (g.n >= v.lo) & (g.n < v.hi))
        .select("grade", "n")
        .orderBy("n")
    )


@register(
    "date_series_buckets",
    oracle="""
    SELECT date_trunc('week', ts) AS week, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("datetime", "aggregate"),
)
def date_series_buckets(spark, sf_dir):
    """date_trunc bucketing (reference date_trunc.cpp / time_bucket.cpp)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("week", "event_type")
    )


@register(
    "recursive_cte_series",
    oracle="""
    WITH RECURSIVE t(n, total) AS (
      SELECT 1, 1
      UNION ALL
      SELECT n + 1, total + n + 1 FROM t WHERE n < 25
    )
    SELECT n, total FROM t ORDER BY n
    """,
    tags=("recursive",),
)
def recursive_cte_series(spark, sf_dir):
    """RECURSIVE CTE (reference physical_recursive_cte.cpp) — driver-side
    fixpoint loop; each iteration is distributed."""
    base = spark.createDataFrame([(1, 1)], "n int, total int")
    out = recursive_cte(
        base,
        step=lambda d: d.filter(F.col("n") < 25).select(
            (F.col("n") + 1).alias("n"), (F.col("total") + F.col("n") + 1).alias("total")
        ),
        union_all=True,
        max_iterations=30,
    )
    return out.orderBy("n")


@register(
    "stream_window_counts_batch",
    oracle="""
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS bucket, event_type,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY bucket, event_type
    """,
    tags=("streaming", "window", "time_bucket"),
)
def stream_window_counts_batch(spark, sf_dir):
    """The batch/stream-symmetric windowed aggregation
    (streaming/ops.py::windowed_counts) run in BATCH mode and
    oracle-checked against DuckDB's time_bucket (reference
    src/core_functions/scalar/date/time_bucket.cpp): F.window's tumbling
    bucket start == time_bucket for the same width. Proves the streaming
    operator's window semantics with a hash row (the stream-mode run of
    the identical function is covered by tests/test_streaming_sql.py)."""
    from myduckdb_spark.streaming.ops import windowed_counts

    ev = load_table(spark, sf_dir, "events")
    out = windowed_counts(ev, window="5 minutes")
    return (
        out.select(
            F.col("w.start").alias("bucket"),
            "event_type",
            F.col("n"),
        )
        .orderBy("bucket", "event_type")
    )


@register(
    "order_nulls_parity",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS pr
    FROM orders
    ORDER BY pr NULLS FIRST, o_orderkey DESC
    LIMIT 50
    """,
    tags=("order", "nulls"),
)
def order_nulls_parity(spark, sf_dir):
    """NULLS FIRST/LAST ordering parity (reference external sort
    src/common/sort/; DuckDB defaults to NULLS LAST, Spark to NULLS FIRST
    on ASC — so portable queries must pin the placement EXPLICITLY, as
    here with asc_nulls_first). The LIMIT makes the returned SET depend
    on the null placement, so the driver's order-insensitive hash still
    proves it."""
    orders = load_table(spark, sf_dir, "orders")
    pr = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    return (
        orders.select("o_orderkey", pr.alias("pr"))
        .orderBy(F.col("pr").asc_nulls_first(), F.col("o_orderkey").desc())
        .limit(50)
    )


@register(
    "collate_nocase_noaccent",
    oracle="""
    WITH v(s) AS (VALUES ('Hallo'),('ham'),('HELLO'),('hElp'),('WoRlD'),('world'),
                         ('Mühleisen'),('MUHLEISEN'),('muhleisen'),('café'),('CAFE')),
    g AS (
      SELECT min(s) AS rep, CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY s COLLATE NOCASE.NOACCENT
    ),
    f AS (
      SELECT CAST(count(*) AS BIGINT) AS n_eq
      FROM v WHERE s COLLATE NOCASE.NOACCENT = 'MÜHLEISEN'
    )
    SELECT rep, n, n_eq FROM g, f ORDER BY rep
    """,
    tags=("collate",),
)
def collate_nocase_noaccent(spark, sf_dir):
    """Collation shim (reference test/sql/collate/, COLLATE NOCASE /
    NOACCENT): grouping and equality under the combined collation via
    collate_key expressions (operators/collation.py) against DuckDB's
    native COLLATE evaluation. Representative per group = binary min(s),
    identical in both engines; n_eq counts collated-equality matches."""
    from myduckdb_spark.operators.collation import collate_key, collated_eq

    v = spark.createDataFrame(
        [("Hallo",), ("ham",), ("HELLO",), ("hElp",), ("WoRlD",), ("world",),
         ("Mühleisen",), ("MUHLEISEN",), ("muhleisen",), ("café",), ("CAFE",)],
        "s string",
    )
    g = (
        v.groupBy(collate_key("s", "nocase.noaccent").alias("k"))
        .agg(F.min("s").alias("rep"), F.count(F.lit(1)).cast("bigint").alias("n"))
        .drop("k")
    )
    f = v.filter(collated_eq("s", "MÜHLEISEN", "nocase.noaccent")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eq")
    )
    return g.crossJoin(f).select("rep", "n", "n_eq").orderBy("rep")


@register(
    "interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_months,
           CAST(o_orderdate + INTERVAL 100 DAY AS TIMESTAMP) AS plus_days,
           CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 36 HOUR
                + INTERVAL 30 MINUTE + INTERVAL 90 SECOND AS TIMESTAMP) AS plus_time,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
           CAST(o_orderdate + to_years(1) - to_months(2) AS TIMESTAMP) AS shifted,
           CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1234567 MICROSECOND)
                AS BIGINT) AS micros
    FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey
    """,
    tags=("datetime", "interval"),
)
def interval_arithmetic(spark, sf_dir):
    """Interval arithmetic parity (reference to_interval.cpp,
    NOTE: interval constants are chosen pairwise-unequal under DuckDB's
    month==30-days interval equality — DuckDB 1.0's expression dedup
    collapses value-equal interval additions (3 MONTH vs 90 DAY) to the
    first occurrence, which is a DuckDB quirk, not engine semantics.
    interval.cpp — SURVEY §7 hard list): month/day/time interval addition,
    mixed chains through the to_interval family, date_diff day counting,
    and microsecond-precision epoch after sub-second interval math, all
    under the pinned-UTC session. Timestamps are emitted (not DATEs):
    month addition is calendar-aware in both engines and the TIMESTAMP
    cast surfaces any drift the driver can hash."""
    from myduckdb_spark.functions.registry import REGISTRY as FN

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    od = F.col("o_orderdate")
    ots = od.cast("timestamp")
    return orders.select(
        "o_orderkey",
        F.add_months(od, 3).cast("timestamp").alias("plus_months"),
        F.date_add(od, 100).cast("timestamp").alias("plus_days"),
        (ots + F.make_interval(hours=F.lit(36), mins=F.lit(30), secs=F.lit(90.0)))
        .cast("timestamp")
        .alias("plus_time"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since"),
        (od.cast("timestamp") + FN["to_years"](F.lit(1)) - FN["to_months"](F.lit(2)))
        .cast("timestamp")
        .alias("shifted"),
        FN["epoch_us"](ots + F.expr("INTERVAL 1234567 MICROSECOND"))
        .cast("bigint")
        .alias("micros"),
    ).orderBy("o_orderkey")
