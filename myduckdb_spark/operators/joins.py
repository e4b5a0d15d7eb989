"""Join family.

Reference inventory (SURVEY.md §2.4; reference files under
src/execution/operator/join/):

* HASH_JOIN / NESTED_LOOP / BLOCKWISE_NL / PIECEWISE_MERGE / IE_JOIN —
  all collapse to ``df.join(other, cond, how)``: Catalyst picks
  broadcast-hash / shuffled-hash / sort-merge for equi conditions and
  broadcast-nested-loop for theta conditions; the reference's strategy
  ladder (plan_comparison_join.cpp:172-268) is Catalyst's job here.
* AM_US_JOIN (fork op, physical_am_us_join.cpp:13-476) — a materializing
  NLJ preferred when BOTH inputs are ≤ am_us_join_threshold (default 100,
  client_config.hpp:104). The *policy* is what matters at scale: tiny
  inputs should never shuffle. We mirror it with broadcast hints
  (``amus_join``): the small side is broadcast so Spark picks
  BroadcastHashJoin/BroadcastNestedLoopJoin — the distributed analog of
  "materialize the small side and loop".
* ASOF_JOIN (physical_asof_join.cpp:876 LoC) — no Spark primitive;
  implemented below as a union + window fill (one sort, no N² work).
* MARK join — existence flag with NULL-aware IN semantics (used by the
  reference for `x IN (subquery)` rewrites); composed below.
* SINGLE join — scalar-subquery join that must error on multi-match;
  composed below with a runtime guard.
* POSITIONAL join (physical_positional_join.cpp:196) — row-aligned zip.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_AMUS_THRESHOLD = 100  # reference default: client_config.hpp:104


# ---------------------------------------------------------------------------
# AM_US policy: small-input joins must not shuffle.
# ---------------------------------------------------------------------------

def _estimated_rows(df: DataFrame, probe_threshold: int | None = None) -> float:
    """Catalyst's size estimate for the plan (rows if available).

    The JVM stats API (`df._jdf.queryExecution()`) is a private surface
    pinned to this PySpark version; if it drifts, fall back to a BOUNDED
    count probe — `limit(threshold+1).count()` — which answers the only
    question the AM_US policy asks ("is this input tiny?") at the cost of
    scanning at most threshold+1 rows, instead of silently disabling the
    policy with inf."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        stats = plan.stats()
        row_count = stats.rowCount()
        if row_count.isDefined():
            return float(str(row_count.get()))
        # Fall back to size-based guess: assume ~100 bytes/row.
        return float(str(stats.sizeInBytes())) / 100.0
    except Exception:
        if probe_threshold is None:
            return float("inf")
        try:
            n = df.limit(probe_threshold + 1).count()
            return float(n) if n <= probe_threshold else float("inf")
        except Exception:
            return float("inf")


def amus_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | str | Sequence[str] | None = None,
    how: str = "inner",
    threshold: int | None = None,
) -> DataFrame:
    """Join with the fork's AM_US small-input policy.

    If either side's estimated cardinality is ≤ ``threshold`` the smaller
    side gets a broadcast hint, so arbitrary theta conditions run as
    BroadcastNestedLoopJoin and equi conditions as BroadcastHashJoin —
    no shuffle, matching the reference's "materialize small side, loop"
    strategy (plan_comparison_join.cpp:158-223) but distributed-safe.

    ``threshold`` defaults to the engine option ``am_us_join_threshold``
    (SET-able via the SQL front door, like the reference's
    settings.cpp:1402-1411 knob).
    """
    if threshold is None:
        from myduckdb_spark.config import get_option

        threshold = int(get_option("am_us_join_threshold"))
    lrows = _estimated_rows(left, probe_threshold=threshold)
    rrows = _estimated_rows(right, probe_threshold=threshold)
    if min(lrows, rrows) <= threshold:
        if rrows <= lrows:
            right = F.broadcast(right)
        else:
            left = F.broadcast(left)
    return left.join(right, on, how)


def theta_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_small: bool = True,
) -> DataFrame:
    """Arbitrary-condition join (reference NLJ / blockwise-NLJ / IEJoin).

    Semantics are identical in Spark; the physical strategy is BNLJ (or
    cartesian + filter). ``broadcast_small`` applies the AM_US policy.
    """
    if broadcast_small:
        return amus_join(left, right, condition, how)
    return left.join(right, condition, how)


# ---------------------------------------------------------------------------
# MARK join: existence column with NULL-aware IN semantics.
# ---------------------------------------------------------------------------

def mark_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    mark_col: str = "mark",
) -> DataFrame:
    """`left_key IN (SELECT right_key FROM right)` as a boolean column.

    Three-valued semantics (reference MARK join, used for IN-subquery
    plans; join/physical_am_us_join.cpp:288-302 handles the same cases):

    * match found            → TRUE
    * no match, RHS has NULL → NULL   (unknown)
    * left key NULL, RHS non-empty → NULL
    * no match, no NULLs     → FALSE
    * RHS empty              → FALSE (even for NULL probe)

    Implemented as a left join against the distinct key set plus a
    broadcast 1-row summary of RHS null-ness — one shuffle on the key,
    no N² work, skew-safe under AQE.
    """
    keys = right.select(F.col(right_key).alias("__rk")).distinct()
    summary = F.broadcast(
        right.agg(
            F.count(F.lit(1)).alias("__rhs_n"),
            F.max(F.col(right_key).isNull().cast("int")).alias("__rhs_has_null"),
        )
    )
    joined = (
        left.join(keys, F.col(left_key).eqNullSafe(F.col("__rk")) & F.col("__rk").isNotNull(), "left")
        .crossJoin(summary)
    )
    mark = (
        F.when(F.col("__rhs_n") == 0, F.lit(False))
        .when(F.col("__rk").isNotNull(), F.lit(True))
        .when(F.col(left_key).isNull(), F.lit(None).cast("boolean"))
        .when(F.col("__rhs_has_null") == 1, F.lit(None).cast("boolean"))
        .otherwise(F.lit(False))
    )
    return joined.withColumn(mark_col, mark).drop("__rk", "__rhs_n", "__rhs_has_null")


# ---------------------------------------------------------------------------
# SINGLE join: scalar-subquery join, errors on multiple matches.
# ---------------------------------------------------------------------------

def single_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Left join guaranteeing ≤1 match per left row (reference SINGLE join).

    The reference raises "More than one row returned by a subquery" on
    multi-match; we reproduce that with ``raise_error`` evaluated lazily
    per group — distributed, no driver round-trip.
    """
    on = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [c for c in right.columns if c not in on]
    grouped = right.groupBy(*on).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.first(c).alias(c) for c in value_cols],
    )
    guard = F.when(
        F.col("__n") > 1,
        F.raise_error(F.lit("SINGLE join: more than one row returned by a subquery")),
    )
    checked = grouped.select(
        *on,
        *[F.coalesce(guard.cast(right.schema[c].dataType), F.col(c)).alias(c) for c in value_cols],
    )
    return left.join(checked, on, "left")


# ---------------------------------------------------------------------------
# POSITIONAL join: row-aligned zip of two ordered relations.
# ---------------------------------------------------------------------------

def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[str],
    right_order: Sequence[str],
) -> DataFrame:
    """Zip rows by position (reference POSITIONAL_JOIN, FULL-outer padding).

    Positions must be defined by an explicit ordering (parquet/DataFrames
    have no inherent row order at scale). Numbering is DISTRIBUTED: a
    range-repartition + within-partition sort orders the data globally
    across partitions, rows get per-partition row numbers in parallel,
    and per-partition counts (one tiny collect, ≤ #partitions rows)
    become cumulative offsets added to each partition's numbers — the
    zipWithIndex pattern. No single-task global Window.orderBy sort,
    which would serialize the whole input through one task at scale.
    """
    return _number_rows(left, left_order).join(
        _number_rows(right, right_order), "__pos", "full"
    ).drop("__pos")


def _number_rows(df: DataFrame, order: Sequence[str]) -> DataFrame:
    """Attach a global 1-based ``__pos`` ordered by ``order``, computed
    with per-partition numbering + broadcast cumulative offsets."""
    cols = [F.col(c) for c in order]
    part = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    pid = part.withColumn("__pid", F.spark_partition_id())
    counts = pid.groupBy("__pid").count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["count"]
    off_map = F.create_map(
        *[F.lit(x) for p, o in sorted(offsets.items()) for x in (p, o)]
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        pid.withColumn("__rn", F.row_number().over(w))
        .withColumn("__pos", F.col("__rn") + off_map[F.col("__pid")])
        .drop("__pid", "__rn")
    )


# ---------------------------------------------------------------------------
# ASOF join.
# ---------------------------------------------------------------------------

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | None = None,
    direction: str = "backward",
    right_prefix: str = "",
    allow_exact_match: bool = True,
) -> DataFrame:
    """As-of join (reference ASOF_JOIN, physical_asof_join.cpp:17-30).

    For each left row, attach the payload of the latest right row with
    ``right.on <= left.on`` (backward; ``>=`` for forward), optionally
    within equal ``by`` partition keys. Left rows with no prior right row
    keep NULL payloads (LEFT OUTER asof, the reference default).

    Spark-first plan: tag and union both sides, then a single window
    sorted by (by, on, side) carries the last right payload forward with
    ``last(..., ignorenulls=True)``. One sort/shuffle on (by, on) — the
    same cost as the reference's partitioned merge, and it scales: no
    per-row probing, no N².
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by = list(by or [])
    payload_cols = [c for c in right.columns if c != on and c not in by]
    out_names = [right_prefix + c for c in payload_cols]

    # Left rows are always __side=1. At equal timestamps the right row must
    # sort BEFORE the left row iff exact matches are allowed (so the window
    # ending at the left row sees it), AFTER otherwise.
    right_side = 0 if allow_exact_match else 2

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType).alias("__payload"),
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by and c != on],
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(right_side).alias("__side"),
        F.struct(*payload_cols).alias("__payload"),
    ).select(*[F.col(c) for c in left.columns], F.col("__side"), F.col("__payload"))

    unioned = lhs.unionByName(rhs)
    order = [F.col(on).asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("__side").asc()]
    if by:
        w = (
            Window.partitionBy(*[F.col(c) for c in by])
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.withColumn(
            "__match", F.last("__payload", ignorenulls=True).over(w)
        )
    else:
        # no partition keys: Window.partitionBy() of nothing would pull
        # every row through ONE task. Instead range-repartition on the
        # traversal order, forward-fill per partition in parallel, and
        # broadcast each partition's closing payload as the carry-in for
        # all later partitions (the positional_join offsets pattern —
        # the carry set is ≤ #partitions rows by construction).
        spark = left.sparkSession
        part = unioned.repartitionByRange(*order).sortWithinPartitions(*order)
        # persist BEFORE any job runs: range partitioning samples the input,
        # so without a materialized cache the finals collect, the partition
        # count, and the final output job could each re-sample and assign
        # rows to DIFFERENT partitions — silently attaching wrong carry
        # payloads. One materialization, three consistent readers.
        pid = part.withColumn("__pid", F.spark_partition_id()).persist()
        # a partition's closing payload in traversal order = the payload
        # of its extreme `on` among right rows (__side constant there, so
        # the tie-break column is irrelevant)
        pick = F.max_by if direction == "backward" else F.min_by
        finals = {
            r["__pid"]: r["__final"]
            for r in pid.filter(F.col("__payload").isNotNull())
            .groupBy("__pid")
            .agg(pick("__payload", F.col(on)).alias("__final"))
            .collect()
        }
        payload_type = rhs.schema["__payload"].dataType
        carry_rows, last_seen = [], None
        for p in range(pid.rdd.getNumPartitions()):
            carry_rows.append((p, last_seen))
            if p in finals:
                last_seen = finals[p]
        carry_df = spark.createDataFrame(
            carry_rows,
            T.StructType(
                [
                    T.StructField("__pid", T.IntegerType(), False),
                    T.StructField("__carry", payload_type, True),
                ]
            ),
        )
        w2 = (
            Window.partitionBy("__pid")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = (
            pid.withColumn("__m0", F.last("__payload", ignorenulls=True).over(w2))
            .join(F.broadcast(carry_df), "__pid", "left")
            .withColumn("__match", F.coalesce(F.col("__m0"), F.col("__carry")))
        )
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("__match").getField(c).alias(o) for c, o in zip(payload_cols, out_names)],
    )
    return out
