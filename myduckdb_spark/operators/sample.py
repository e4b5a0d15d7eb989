"""Sampling (reference: physical_reservoir_sample.cpp,
physical_streaming_sample.cpp; SampleMethod enum sample_options.hpp:18 =
RESERVOIR | BERNOULLI | SYSTEM).

Bernoulli maps to ``df.sample`` (per-row coin flip, executor-local — no
shuffle). Reservoir (exact-n) maps to order-by-random + limit, which Spark
executes as TakeOrdered: O(n) scan, per-partition heaps of size n, no full
sort — the distributed analog of reservoir sampling. SYSTEM (block-level)
maps to sampling whole partitions — the analog of the reference's
vector-granular skip sampling.

``deterministic_sample`` is a hash-free modulo filter used where an
engine-independent, seedless "sample" is needed (oracle comparisons).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bernoulli_sample(df: DataFrame, fraction: float, seed: int | None = None) -> DataFrame:
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def reservoir_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Exact-n uniform sample. rand() is seeded per-partition → deterministic
    for a fixed partitioning; executes as TakeOrderedAndProject (top-n heap
    per partition, merge on driver), not a global sort."""
    return df.orderBy(F.rand(seed)).limit(n)


def system_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Block-level sample: keep whole partitions with probability ~fraction.

    pmod, not %: Spark's % keeps the dividend's sign, so a plain modulo of
    xxhash64 (negative ~half the time) would always pass the `< threshold`
    test for those partitions, inflating the keep rate to ~0.5+fraction/2.
    """
    keep = (
        F.pmod(F.xxhash64(F.spark_partition_id(), F.lit(seed)), F.lit(10_000))
        < int(fraction * 10_000)
    )
    return df.withColumn("__keep", keep).filter(F.col("__keep")).drop("__keep")


def deterministic_sample(df: DataFrame, key: Column, modulus: int, remainder: int = 0) -> DataFrame:
    """Engine-independent pseudo-sample: ``key % modulus == remainder``.
    Identical row set in any SQL engine — used for oracle-checked queries."""
    return df.filter((key % modulus) == remainder)
