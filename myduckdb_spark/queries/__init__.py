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


# Names that already have a fully-green row in CORRECTNESS_r01.json.
# The correctness driver verified exactly the FIRST 50 registry entries in
# round 1, leaving 32 registered-later queries unverified. queries() therefore
# yields not-yet-green entries first (new queries and round-1 reds included),
# so a driver that again takes the first 50 verifies everything that still
# needs a green row; already-green names fill the remaining slots.
R01_GREEN = frozenset(
    {
        "agg_distinct_and_filter", "agg_rollup", "agg_cube", "agg_grouping_sets",
        "agg_min_max_by", "agg_string_agg_ordered", "agg_stats_exact",
        "agg_median_quantile", "agg_mode_deterministic", "agg_bool_bit",
        "q01_pricing_summary", "q03_top_revenue_orders", "q05_local_supplier_volume",
        "q06_forecast_revenue", "q10_returned_items", "groupjoin_order_items",
        "amus_theta_join", "fn_string_battery", "fn_datetime_battery",
        "fn_struct_map_battery", "join_left_outer_counts", "join_full_outer",
        "join_semi", "join_anti", "join_mark_in_subquery",
        "join_single_scalar_subquery", "join_cross_product", "join_range_theta",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_embedding_cosine", "sim_topk_bruteforce", "text_quality_scores",
        "text_lang_id_confusion", "text_fingerprint", "setop_union_distinct",
        "setop_except_intersect", "setop_all_variants",
    }
)


def _ordered_names() -> list[str]:
    names = list(REGISTRY)
    return [n for n in names if n not in R01_GREEN] + [n for n in names if n in R01_GREEN]


def queries() -> dict[str, Builder]:
    _load_all()
    return {n: REGISTRY[n].builder for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: REGISTRY[n].oracle for n in _ordered_names() if REGISTRY[n].oracle is not None}


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
