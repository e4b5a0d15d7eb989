"""Table catalog over the driver-generated parquet star schema.

The reference catalogs tables in its own storage (reference:
src/catalog/catalog.cpp, columnar row-groups of 122,880 rows on 256 KiB
blocks — src/include/duckdb/storage/storage_info.hpp:20). Here tables ARE
parquet: Parquet row groups provide the same zone-map (min/max) pruning the
reference implements in src/storage/table/column_data.cpp:343-375, and
Spark's parquet source provides filter/column pushdown equivalent to the
reference TABLE_SCAN (src/function/table/table_scan.cpp:45-147).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one star-schema table (parquet; pushdown-capable).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads as BIGINT
    nanos (spark.sql.legacy.parquet.nanosAsLong); converted here to a
    microsecond TIMESTAMP_NTZ (the data carries no sub-µs precision, and
    NTZ matches how Spark reads the other tables' naive timestamps).

    The nanosAsLong conf is set HERE (it is a runtime SQL conf), not only in
    ``session.py``: callers such as the correctness driver build their own
    vanilla SparkSession, which would otherwise fail the read outright with
    PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS).
    """
    # Session-proofing (callers may bring a vanilla SparkSession — e.g. the
    # correctness driver): timestamp LITERALS in queries parse in the
    # session timezone, and the DuckDB oracle is timezone-naive, so a
    # non-UTC session would shift every TIMESTAMP '...' comparison. Pin
    # UTC here, at the same choke point as the nanosAsLong conf.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer DIV, not double division: ns epoch values exceed 2^53 and
        # would round in float, shifting timestamps by ±1µs
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(CAST(ts DIV 1000 AS BIGINT)) AS TIMESTAMP_NTZ)"),
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` queries see the
    same names the DuckDB oracle uses."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
