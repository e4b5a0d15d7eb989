"""Registry-level lifetime for query-builder persists (guide §5).

Query builders ``persist()`` intermediates that several branches of ONE
query share (dedup's per-doc bitmaps, the similarity harnesses' shared
embedding projection). The builder cannot ``unpersist()`` them itself —
the caller materializes the returned DataFrame later — so without a
release point a long-lived session looping over ``queries()`` accumulates
cache entries without bound (storage memory competes with execution
memory, §5).

``persist_tracked`` registers the DataFrame; the query registry releases
everything tracked at the START of the next builder invocation — by then
the previous query's materialization is over (callers build → run →
build → run), so its caches have no further reader. Unpersisting a
DataFrame that is later recomputed is always CORRECT (Spark just
recomputes the lineage); the only cost of a release that fires "too
early" (a caller interleaving two built queries) is recomputation, never
a wrong result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() with release at the next registered-builder invocation."""
    _LIVE.append(df)
    return df.persist()


def release_tracked() -> None:
    """Unpersist every tracked DataFrame (idempotent, never raises)."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped, etc. — release is best-effort
            pass
