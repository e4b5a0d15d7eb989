"""agg_rollup plan experiment (round-7 verdict follow-up).

Spark plans ROLLUP/GROUPING SETS through the Expand operator, tripling
the input rows (one copy per grouping) before ONE hash aggregate; the
reference runs the groupings as multiple tables inside a single
HASH_GROUP_BY pass over the input read once. Hypothesis to test: a
manual union-of-partial-aggregates (group at the finest level once,
then re-aggregate the tiny intermediate for the coarser groupings)
avoids the 3x row expansion and should beat the Expand plan at scale.

Runs both shapes over sf1 (or $ROLLUP_SF_DIR) N times and prints medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def expand_plan(spark, sf_dir):
    from myduckdb_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("o_totalprice").alias("total"))
    )


def reagg_plan(spark, sf_dir):
    """Aggregate ONCE at the finest grouping, then re-aggregate the
    (tiny) intermediate for each coarser rollup level — the scan and the
    big shuffle happen once, the union runs over |groups| rows."""
    from myduckdb_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    fine = (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("o_totalprice").alias("total"))
        .cache()
    )
    lvl1 = fine.groupBy("o_orderstatus").agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    ).withColumn("o_orderpriority", F.lit(None).cast("string"))
    lvl0 = fine.agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    ).withColumn("o_orderstatus", F.lit(None).cast("string")) \
     .withColumn("o_orderpriority", F.lit(None).cast("string"))
    cols = ["o_orderstatus", "o_orderpriority", "n", "total"]
    return fine.select(cols).unionByName(lvl1.select(cols)) \
        .unionByName(lvl0.select(cols))


def main() -> None:
    from myduckdb_spark.session import get_spark

    sf_dir = os.environ.get("ROLLUP_SF_DIR", "/root/repo/testdata_sf1")
    runs = int(os.environ.get("ROLLUP_RUNS", "5"))
    spark = get_spark("rollup-exp")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    for name, builder in (("expand", expand_plan), ("reagg", reagg_plan)):
        samples = []
        for _ in range(runs):
            t0 = time.time()
            df = builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        print(f"{name}: median {round(statistics.median(samples), 3)}s "
              f"of {[round(s, 2) for s in sorted(samples)]}")


if __name__ == "__main__":
    main()
