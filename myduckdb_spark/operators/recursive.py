"""Recursive CTE (reference: physical_recursive_cte.cpp:233 — iterate the
recursive term against the working table, union results until fixpoint).

Spark has no recursive query primitive, so the fixpoint loop runs on the
driver — but each ITERATION is a full distributed DataFrame computation,
and the loop only moves a row COUNT to the driver, never rows. Iteration
results are persisted so lineage doesn't re-grow (vital at scale: without
persist, iteration k re-executes iterations 1..k-1).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    union_all: bool = True,
    max_iterations: int = 100,
) -> DataFrame:
    """WITH RECURSIVE cte AS (base UNION [ALL] step(cte)) SELECT * FROM cte.

    ``step`` receives the previous iteration's delta and returns the next
    candidate rows. For UNION (distinct) semantics, new rows are
    anti-joined against everything seen so far before the next iteration —
    the standard semi-naive evaluation, which is also what keeps the work
    per iteration proportional to the frontier, not the accumulated set.
    """
    # localCheckpoint truncates lineage each iteration — without it,
    # iteration k's plan embeds iterations 1..k-1 and planning time
    # (not data volume) dominates.
    frontier = base.localCheckpoint(eager=True)
    chunks = [frontier]
    for _ in range(max_iterations):
        nxt = step(frontier)
        if not union_all:
            seen = chunks[0]
            for c in chunks[1:]:
                seen = seen.unionByName(c)
            nxt = nxt.distinct().join(seen, on=list(base.columns), how="left_anti")
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        chunks.append(nxt)
        frontier = nxt
    else:
        raise RuntimeError(f"recursive CTE did not converge in {max_iterations} iterations")
    out = chunks[0]
    for c in chunks[1:]:
        out = out.unionByName(c)
    return out
