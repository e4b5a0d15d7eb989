"""Top-K (reference: physical_top_n.cpp:514, created by topn_optimizer.cpp
from ORDER BY + LIMIT).

Spark performs the identical rewrite automatically: ``orderBy(...).limit(k)``
plans as TakeOrderedAndProject — per-partition bounded heaps merged on the
driver, no global sort. These helpers add the per-group variant (window +
row_number), the pattern the reference expresses with QUALIFY.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group. One shuffle on the group keys; rank predicate
    is pushed into the window exec (Spark's WindowGroupLimit) so each
    partition keeps a bounded buffer — scales to arbitrarily large groups."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def limit_offset(df: DataFrame, order: Sequence[Column], limit: int, offset: int = 0) -> DataFrame:
    """LIMIT/OFFSET with a total order (reference physical_limit.cpp).
    Spark's offset() is native; order first so the page is deterministic."""
    out = df.orderBy(*order)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def limit_percent(df: DataFrame, order: Sequence[Column], percent: float) -> DataFrame:
    """LIMIT n% (reference physical_limit_percent.cpp — which likewise
    materializes its input to learn the cardinality before emitting).

    Two cheap passes, NO cache: the count() pass is column-pruned to
    nothing (for an unfiltered parquet scan Spark answers it from
    row-group metadata; with filters it still reads only the filter
    columns), then TakeOrdered streams the source once with per-partition
    bounded heaps. The earlier formulation persisted the whole input to
    make it one pass — at 100 TB caching the entire input to take 1% of
    it IS the scale cost, and the cache eviction pressure hurts every
    co-resident query. Two scans where the first touches ~no bytes win."""
    import math

    n = df.count()
    return df.orderBy(*order).limit(int(math.ceil(percent / 100.0 * n)))
