"""User-defined function surface (reference
src/include/duckdb/function/udf_function.hpp — CreateScalarFunction :21-36,
CreateAggregateFunction :77-121; Python client UDFs under tools/pythonpkg/).

Spark-first mapping:

* scalar UDF → Arrow-batched ``pandas_udf`` (vectorized; 10-100x faster
  than row-at-a-time python UDFs — the ONLY sanctioned Python hot path);
* UDAF → ``pandas_udf`` in grouped-aggregate form (Series -> scalar),
  usable inside ``groupBy().agg(...)``;
* both register into ``spark.udf`` so the SQL front door sees them too.

UDFs remain the slow path: anything expressible with built-in
``pyspark.sql.functions`` should use the function registry instead
(functions/registry.py) — these helpers exist for genuinely custom logic.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_CREATED: dict[str, object] = {}


def create_scalar_function(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> Callable:
    """CreateScalarFunction: ``fn`` maps pandas Series -> pandas Series
    (vectorized over Arrow batches). Returns the Column-producing callable
    and registers ``name`` for SQL."""
    udf = pandas_udf(return_type)(fn)
    spark.udf.register(name, udf)
    _CREATED[name] = udf
    return udf


def create_aggregate_function(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> Callable:
    """CreateAggregateFunction: ``fn`` maps pandas Series (one group) ->
    scalar. Usable in ``df.groupBy(...).agg(udaf(col))`` and registered
    for SQL aggregate calls. Partial aggregation is NOT available to
    grouped-agg UDFs (whole groups ship to Python) — prefer composing
    built-in aggregates when the math allows; this is the escape hatch
    the reference offers for genuinely custom state machines."""
    from pyspark.sql.functions import PandasUDFType

    udf = pandas_udf(return_type, PandasUDFType.GROUPED_AGG)(fn)
    spark.udf.register(name, udf)
    _CREATED[name] = udf
    return udf


def created() -> dict[str, object]:
    return dict(_CREATED)
