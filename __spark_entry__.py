"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001).
``queries()`` / ``oracle_sql()`` — the full operator inventory from
SURVEY.md §2, maintained in ``myduckdb_spark.queries`` (one registry
entry per operator; oracle SQL for every SQL-expressible one).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from myduckdb_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the fork's GroupJoin shape
    (join + group-by aggregate) through the full engine pipeline —
    scan → filter → equi-join → groupBy/agg → orderBy → limit."""
    from myduckdb_spark.queries.core import q03_top_revenue_orders

    return q03_top_revenue_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
