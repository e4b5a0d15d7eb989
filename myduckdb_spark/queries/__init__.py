"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 gets a named entry:
a builder ``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible)
an equivalent DuckDB oracle SQL string. ``__spark_entry__.py`` exposes
this registry to the driver; ``tools/check.py`` runs the same comparison
locally.

Column-name discipline: every computed column is aliased identically in
the Spark builder and the oracle SQL (the driver sorts columns by name
before hashing values).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, tags)
        return fn

    return deco


def queries() -> dict[str, Builder]:
    _load_all()
    return {n: q.builder for n, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (side-effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    from myduckdb_spark.queries import (  # noqa: F401
        aggregates,
        core,
        functions_battery,
        join_family,
        pipeline_ops,
        setops_misc,
        tpch_full,
        windows,
    )

    _LOADED = True
