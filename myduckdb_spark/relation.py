"""Relation API — the reference's EP3 (programmatic query building).

The reference's ``Relation`` tree (src/include/duckdb/main/relation.hpp:37,
27 builder node types under src/main/relation/) is a lazy composable query
builder that binds into the same logical plans as SQL. PySpark's DataFrame
IS that abstraction; this class is a thin veneer that (a) mirrors the
reference's method names for drop-in familiarity, and (b) routes through
the engine's operators (AM_US broadcast policy, group-join rewrite, as-of,
…) where they add semantics. Every method returns a new Relation — lazy
until ``df``/``collect``/``write`` — and everything compiles to Catalyst
plans (no interpretation layer of our own).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from myduckdb_spark.catalog import load_table
from myduckdb_spark.operators import joins as J
from myduckdb_spark.operators.groupjoin import group_join
from myduckdb_spark.operators.sample import bernoulli_sample, reservoir_sample
from myduckdb_spark.operators.topk import limit_offset


class Relation:
    """Lazy relational expression (mirrors duckdb's Relation builders)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # --- sources -----------------------------------------------------------
    @classmethod
    def table(cls, spark: SparkSession, sf_dir: str, name: str) -> "Relation":
        return cls(load_table(spark, sf_dir, name))

    @classmethod
    def from_df(cls, df: DataFrame) -> "Relation":
        return cls(df)

    @classmethod
    def values(cls, spark: SparkSession, rows: Sequence, schema: str) -> "Relation":
        return cls(spark.createDataFrame(rows, schema))

    # --- relational builders (reference src/main/relation/*.cpp) ----------
    def project(self, *cols) -> "Relation":
        return Relation(self._df.select(*cols))

    def filter(self, cond) -> "Relation":
        return Relation(self._df.filter(cond))

    def aggregate(self, groups: Sequence[str], *aggs: Column) -> "Relation":
        if groups:
            return Relation(self._df.groupBy(*groups).agg(*aggs))
        return Relation(self._df.agg(*aggs))

    def join(self, other: "Relation", on, how: str = "inner") -> "Relation":
        return Relation(J.amus_join(self._df, other._df, on, how))

    def theta_join(self, other: "Relation", cond: Column, how: str = "inner") -> "Relation":
        return Relation(J.theta_join(self._df, other._df, cond, how))

    def asof_join(self, other: "Relation", on: str, by=None, **kw) -> "Relation":
        return Relation(J.asof_join(self._df, other._df, on, by, **kw))

    def group_join(self, build: "Relation", keys, aggs, how="inner") -> "Relation":
        return Relation(group_join(self._df, build._df, keys, aggs, how))

    def cross(self, other: "Relation") -> "Relation":
        return Relation(self._df.crossJoin(other._df))

    def order(self, *cols) -> "Relation":
        return Relation(self._df.orderBy(*cols))

    def limit(self, n: int, offset: int = 0, order: Sequence[Column] | None = None) -> "Relation":
        if order is not None:
            return Relation(limit_offset(self._df, order, n, offset))
        out = self._df.offset(offset) if offset else self._df
        return Relation(out.limit(n))

    def distinct(self) -> "Relation":
        return Relation(self._df.distinct())

    def union(self, other: "Relation", all: bool = True) -> "Relation":
        u = self._df.unionByName(other._df)
        return Relation(u if all else u.distinct())

    def except_(self, other: "Relation", all: bool = False) -> "Relation":
        return Relation(self._df.exceptAll(other._df) if all else self._df.subtract(other._df))

    def intersect(self, other: "Relation", all: bool = False) -> "Relation":
        return Relation(self._df.intersectAll(other._df) if all else self._df.intersect(other._df))

    def sample(self, fraction: float | None = None, n: int | None = None, seed: int = 42) -> "Relation":
        if n is not None:
            return Relation(reservoir_sample(self._df, n, seed))
        return Relation(bernoulli_sample(self._df, fraction or 0.1, seed))

    def map_batches(self, fn: Callable, schema: str) -> "Relation":
        """Table-in/table-out function (reference TABLEINOUT_FUNCTION) —
        Arrow-batched."""
        return Relation(self._df.mapInPandas(fn, schema))

    def with_column(self, name: str, col: Column) -> "Relation":
        return Relation(self._df.withColumn(name, col))

    # --- sinks (reference COPY TO; SURVEY.md §2.2) -------------------------
    def write_parquet(self, path: str, mode: str = "overwrite", partition_by=None) -> None:
        w = self._df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def write_csv(self, path: str, mode: str = "overwrite", header: bool = True) -> None:
        self._df.write.mode(mode).option("header", header).csv(path)

    def write_json(self, path: str, mode: str = "overwrite") -> None:
        self._df.write.mode(mode).json(path)

    def create_view(self, name: str) -> "Relation":
        self._df.createOrReplaceTempView(name)
        return self

    # --- materialization ---------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def collect(self):
        return self._df.collect()

    def count(self) -> int:
        return self._df.count()

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    def cache(self) -> "Relation":
        """Materialized CTE analog (reference physical_cte.cpp)."""
        return Relation(self._df.cache())

    def summarize(self) -> "Relation":
        """SUMMARIZE (reference src/function/table/summary.cpp): per-column
        profile — count / mean / stddev / min / quartiles / max. Maps to
        DataFrame.summary(), which computes all stats in a single
        distributed pass (approx quantiles; exact count/mean/stddev)."""
        return Relation(self._df.summary())

    # --- round-3 builder additions (reference src/main/relation/:
    # pivot via aggregate_relation, unnest in projection binder,
    # QUALIFY in bind_select_node, TOP_N from topn_optimizer) -----------
    def pivot(self, group_by, pivot_col: str, agg: Column, values=None) -> "Relation":
        from myduckdb_spark.operators.pivots import pivot as _pivot

        groups = [group_by] if isinstance(group_by, str) else list(group_by)
        return Relation(_pivot(self._df, groups, pivot_col, values, agg))

    def unpivot(self, ids, cols, var_name: str = "name", value_name: str = "value") -> "Relation":
        from myduckdb_spark.operators.pivots import unpivot as _unpivot

        return Relation(_unpivot(self._df, ids, cols, var_name, value_name))

    def unnest(self, col: str, out: str | None = None) -> "Relation":
        from myduckdb_spark.operators.pivots import unnest as _unnest

        return Relation(_unnest(self._df, col, out))

    def qualify(self, pred_builder) -> "Relation":
        """QUALIFY: pred_builder receives the DataFrame, returns a boolean
        Column over window expressions (reference bind_select_node.cpp)."""
        from myduckdb_spark.operators.window_ex import qualify as _qualify

        return Relation(_qualify(self._df, pred_builder))

    def top_k(self, order: Sequence[Column], k: int) -> "Relation":
        from myduckdb_spark.operators.topk import top_k as _topk

        return Relation(_topk(self._df, order, k))

    def macro(self, name: str, *args) -> Column:
        """Call a registered scalar macro (functions/macros.py) as a Column."""
        from myduckdb_spark.functions.macros import _SCALAR, _subst, expand_macros

        m = _SCALAR[name.lower()]
        texts = [a._jc.toString() if isinstance(a, Column) else str(a) for a in args]
        return F.expr(expand_macros(_subst(m.body, m.params, texts, m.defaults)))
