"""Set operations (reference: physical_union.cpp, plan_set_operation.cpp).

The reference plans EXCEPT/INTERSECT as hash joins (ANTI/SEMI over all
columns with IS NOT DISTINCT FROM comparisons) and implements the ALL
variants by numbering duplicate rows on both sides first
(plan_set_operation.cpp:47-90). Spark's built-ins use the exact same
rewrites, so these are thin, named wrappers that document the parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.unionByName(right)


def union_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.unionByName(right).distinct()


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.subtract(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.exceptAll(right)


def intersect_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersect(right)


def intersect_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersectAll(right)
