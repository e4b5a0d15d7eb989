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


# The correctness driver verifies a 50-query window of the registry in
# registration order, so queries() yields highest-priority entries first:
# queries needing a (re-)verification this round — entries whose
# implementation or oracle changed since their last green row, then the
# queries whose last green driver row is oldest (r1/r2) so every
# registered query re-verifies on a rotating schedule.
R04_PRIORITY = (
    # output/oracle REDESIGNED this round: previously no_oracle rows now
    # emit self-checking projections with real oracles — must prove green
    "sim_topk_lsh", "sim_topk_ivf", "sim_lsh_recall",
    "dedup_simhash", "agg_approx", "multimodal_features",
    # new this round
    "collate_nocase_noaccent", "interval_arithmetic",
    "dml_roundtrip", "seq_bulk_ids", "fn_timetz_battery",
    "upsert_on_conflict", "decontam_ngram_overlap", "pii_scrub_counts",
    "text_repetition_stats",
    # stale: last driver-verified in r1/r2 (green then, unchanged since;
    # 42 entries — rotating them through the 50-query window)
    "join_asof_purchase_click", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "text_quality_scores", "text_lang_id_confusion",
    "text_fingerprint", "setop_union_distinct", "setop_except_intersect",
    "setop_all_variants", "sample_deterministic", "limit_offset_page",
    "pivot_status_counts", "unpivot_part_measures", "unnest_tokens",
    "values_and_series", "date_series_buckets", "recursive_cte_series",
    "q02_best_supplier_per_nation", "q04_order_priority_check",
    "q07_volume_shipping", "q08_market_share", "q09_product_type_profit",
    "q11_important_parts", "q13_customer_order_distribution",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_discounted_revenue", "q20_excess_inventory_suppliers",
    "q21_waiting_suppliers", "q22_global_sales_opportunity",
    "win_ranking", "win_lead_lag", "win_running_frames", "win_range_frame",
    "win_qualify_topk", "win_exclude_current_row", "win_exclude_group_ties",
    "win_share_of_group",
)


def _ordered_names() -> list[str]:
    names = list(REGISTRY)
    prio = [n for n in R04_PRIORITY if n in names]
    return prio + [n for n in names if n not in set(prio)]


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
        storage_dml,
        tpch_full,
        windows,
    )

    _LOADED = True
