"""GroupJoin — the fork's fused group-by-over-join, as a plan rewrite.

Reference: physical_group_join.cpp:15-286 builds an aggregate hash table
over the build side keyed by the grouping columns, then probes it with the
other side, appending aggregate columns to each probe row. Detection
predicate ``canReplaceByGroupJoin`` (physical_plan_generator.cpp:76-84)
fires for Aggregate(Join(probe, build)) where the grouping keys are the
join keys; the reference's own substitution is commented out (:93) — it
only logs "Group Join Candidate Found !". We implement the rewrite fully.

Spark-first realization: the fused operator IS the rewritten plan

    probe ⋈ (build.groupBy(keys).agg(...))

which at scale is strictly better than aggregate-after-join: the build
side is reduced BEFORE the join (map-side partial aggregation + one
shuffle of the reduced set), the join often turns broadcast-able, and no
wide join result is ever materialized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myduckdb_spark.operators.joins import amus_join


def group_join(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str] | Sequence[tuple[str, str]],
    aggs: Sequence[Column],
    how: str = "inner",
    broadcast_build: bool | None = None,
) -> DataFrame:
    """Fused group-by-over-join: per probe row, attach build-side aggregates.

    ``keys`` — join/group keys: column names shared by both sides, or
    (probe_col, build_col) pairs. ``aggs`` — aggregate Columns evaluated
    over the build side (must be aliased). Equi-join only, like the
    reference (physical_group_join.cpp:28-44 throws on non-equi).

    ``how='inner'`` drops probe rows with no build group (the reference's
    inner GroupJoin); ``'left'`` keeps them with NULL aggregates.
    """
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in keys]
    build_keys = [b for _, b in pairs]
    aggregated = build.groupBy(*build_keys).agg(*aggs)
    if broadcast_build is None:
        # The aggregated build side is |distinct keys| rows — frequently
        # tiny; let the AM_US policy decide from plan statistics.
        cond = None
        renamed = aggregated
        for p, b in pairs:
            renamed = renamed.withColumnRenamed(b, f"__gk_{b}")
        for p, b in pairs:
            c = F.col(p) == F.col(f"__gk_{b}")
            cond = c if cond is None else (cond & c)
        out = amus_join(probe, renamed, cond, how)
        return out.drop(*[f"__gk_{b}" for _, b in pairs])
    if broadcast_build:
        aggregated = F.broadcast(aggregated)
    if all(p == b for p, b in pairs):
        return probe.join(aggregated, [p for p, _ in pairs], how)
    cond = None
    for p, b in pairs:
        c = probe[p] == aggregated[b]
        cond = c if cond is None else (cond & c)
    return probe.join(aggregated, cond, how).drop(*[aggregated[b] for _, b in pairs])


def is_group_join_candidate(group_keys: Sequence[str], join_keys: Sequence[str]) -> bool:
    """The reference's detection predicate (physical_plan_generator.cpp:76-84):
    an Aggregate over a comparison join where every grouping key is a join
    key of one side — i.e. the aggregate can be pushed through the join."""
    return set(group_keys) <= set(join_keys)
