"""SparkSession factory.

The reference engine's executor knobs (thread count, vector size, buffer
manager; reference: src/parallel/executor.cpp, src/storage/buffer_manager.cpp)
map onto a handful of Spark configs chosen here:

* AQE on (runtime re-plan = the reference's adaptive build/probe-side and
  join-order decisions, reference: src/optimizer/build_probe_side_optimizer.cpp),
* shuffle partitions sized to cores for local mode (a real cluster would use
  ~2-3x total cores; see ``tune_for_scale``),
* UTC session timezone (DuckDB timestamps are naive/UTC — required for
  oracle comparisons),
* Arrow transfers on (all Pandas-UDF paths are Arrow-batched).

ANSI SQL mode is Spark 4's default and matches DuckDB's error-on-overflow /
error-on-bad-cast semantics (reference: src/function/scalar/operators/
arithmetic.cpp overflow checks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "myduckdb-spark",
    cpus: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Local-mode single-JVM; on a real cluster the same configs apply except
    master/driver-memory, which the cluster manager owns.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle parallelism ~ cores locally. AQE coalesces down when small.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        # AQE: runtime coalescing, skew-join splitting, plan re-optimization.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true): byte-driven
        # coalescing (false + 64MB advisory) measured +5% on sf0.1 fixed
        # overhead but single-threaded the 30-60MB shuffle stages at sf1
        # (groupjoin 1.49s -> 4.43s, join_range_theta 0.75s -> 2.47s) —
        # on a many-core box the sub-advisory stages still want the
        # parallelism.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # DuckDB timestamps are naive-UTC; pin the session so values match.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime bloom-filter pushed from join build side to probe scan =
        # the reference's join_filter_pushdown optimizer
        # (src/optimizer/join_filter_pushdown_optimizer.cpp).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        # The events table stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects by default; read nanos as BIGINT and convert in
        # catalog.load_table (values carry no sub-µs precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # DuckDB map_concat / map() keeps the LAST value for duplicate
        # keys (map_concat.cpp); Spark errors by default
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # DuckDB double-quotes are ALWAYS identifiers (never string
        # literals) — matches ANSI; needed for "names with spaces()"
        .config("spark.sql.ansi.doubleQuotedIdentifiers", "true")
        # DuckDB's TIMESTAMP is naive (no zone): literals and casts
        # default to TIMESTAMP_NTZ; Spark's instant TIMESTAMP then maps
        # to the reference's TIMESTAMP WITH TIME ZONE (typeof parity)
        .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
    )
    if driver_memory is None:
        driver_memory = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    builder = builder.config("spark.driver.memory", driver_memory)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_scale(spark: SparkSession, target_bytes: int) -> None:
    """Size shuffle parallelism for a given input volume.

    Rule of thumb: ~128-256 MB of shuffle data per partition keeps
    partitions comfortably in executor memory; AQE coalesces the excess.
    At 100 TB this yields O(500k) shuffle partitions pre-AQE — set the
    static number high and let AQE shrink, never the reverse.
    """
    per_partition = 128 * 1024 * 1024
    n = max(DEFAULT_CPUS, min(1_000_000, target_bytes // per_partition))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
