"""Oracle-exactness helpers.

Summing doubles is order-dependent, and Spark's partial/final aggregation
order differs run-to-run and engine-to-engine — so any query whose result
is hash-compared against DuckDB computes money/ratio aggregates over
DECIMAL casts (exact, associative, order-independent) and casts the final
value back to DOUBLE. The per-row double arithmetic inside the cast is
written with identical operator order on both sides, so the doubles match
bit-for-bit before the cast.

This mirrors what the reference itself does: DuckDB's SUM over DECIMAL
accumulates in HUGEINT/int128 (src/core_functions/aggregate/distributive/
sum.cpp) — exact, order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Exact SUM of a double column via decimal accumulation."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )


def revenue_col() -> Column:
    """l_extendedprice * (1 - l_discount), decimal-cast per row."""
    return (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(DEC)


REVENUE_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"
