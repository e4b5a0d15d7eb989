"""PIVOT / UNPIVOT / UNNEST (reference: physical_pivot.cpp:83,
physical_unnest.cpp:387, transform_pivot.cpp).

All three are native in Spark; wrappers fix the semantics the reference
uses (explicit IN-list pivot → no extra discovery pass; unnest of multiple
lists zips positionally like the reference's UNNEST).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    values: Sequence[str] | None,
    agg: Column,
) -> DataFrame:
    """PIVOT. Passing explicit ``values`` (like SQL's IN list) avoids the
    extra distinct-scan Spark otherwise runs to discover them."""
    g = df.groupBy(*group_by).pivot(pivot_col, list(values) if values else None)
    return g.agg(agg)


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "name",
    value_name: str = "value",
) -> DataFrame:
    """UNPIVOT → Spark's native melt (no shuffle; row-local explode)."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)


def unnest(df: DataFrame, list_col: str, out_col: str | None = None, keep_empty: bool = False) -> DataFrame:
    """UNNEST a list column (reference explodes NULL/empty lists to zero
    rows; keep_empty=True gives the outer variant)."""
    fn = F.explode_outer if keep_empty else F.explode
    out_col = out_col or list_col
    cols = [c for c in df.columns if c != list_col]
    return df.select(*cols, fn(F.col(list_col)).alias(out_col))


def unnest_multi(df: DataFrame, list_cols: Sequence[str]) -> DataFrame:
    """UNNEST several lists in one SELECT: the reference zips them by
    position, padding the shorter with NULLs — arrays_zip + explode."""
    zipped = F.arrays_zip(*[F.col(c) for c in list_cols])
    keep = [c for c in df.columns if c not in list_cols]
    exploded = df.select(*keep, F.explode(zipped).alias("__z"))
    return exploded.select(*keep, *[F.col(f"__z.{c}").alias(c) for c in list_cols])
