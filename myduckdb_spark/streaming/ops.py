"""Streaming operators over an events-shaped stream.

Batch/stream symmetry: each function takes any DataFrame — batch or
streaming — and returns the transformed DataFrame; the caller picks the
source (``read_events_stream``) and sink. Watermarks bound state for the
windowed aggregations; ``sessionize`` uses session_window (native gap
sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet stores ts as TIMESTAMP(NANOS); Spark's parquet reader
# has no nanosecond timestamp type, so the file schema must declare the
# column as raw INT64 nanos (matching spark.sql.legacy.parquet.nanosAsLong,
# which the batch path in catalog.py relies on) and convert after read.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, dir_path: str, max_files: int = 1) -> DataFrame:
    """File-source stream over parquet events (one file per trigger —
    deterministic smoke runs; swap for kafka in production)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(dir_path)
    )
    # plain TIMESTAMP (not NTZ like the batch catalog): watermarks and
    # window()/session_window() require event time on TimestampType.
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
    )


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding window count+sum per event_type. The watermark
    bounds state: late rows beyond it are dropped (documented semantics;
    batch runs ignore the watermark)."""
    ev = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return ev.groupBy(win.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value")
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessions per user (session_window — native stateful
    sessionization; the batch analog via lag+cumsum is in tests)."""
    ev = events.withWatermark("ts", watermark)
    return ev.groupBy(F.session_window("ts", gap).alias("s"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start"),
        F.max("ts").alias("end"),
    )


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a streaming query to completion over the available files
    (smoke-test sink)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
