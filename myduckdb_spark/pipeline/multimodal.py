"""Multimodal column plumbing.

Convention: media are opaque ``binary`` columns plus a typed metadata
struct — the schema a 100 TB multimodal corpus actually uses (payload
bytes in parquet, metadata queryable without touching bytes):

    content:  binary
    media:    struct<kind string, mime string, width int, height int,
                     duration_ms bigint, sample_rate int>

Decoders (image decode, audio resample, video frame-sample) need media
libraries that are NOT in this container — the Spark-side plumbing
(schemas, mapInPandas batch shape, partitioning) is real and tested with
a deterministic fake decoder; the library call sites raise
NotImplementedError behind ``require_codec``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = "doc_id long, kind string, n_bytes long, feat array<float>"


def require_codec(name: str):
    """Media decoders are stubbed in this environment (no PIL/ffmpeg)."""
    raise NotImplementedError(
        f"codec '{name}' not available in this container; plug a real "
        f"decoder here — the surrounding Spark plumbing is production-shaped"
    )


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a deterministic fake media column from text bytes (test rig:
    exercises binary columns + metadata struct without real codecs)."""
    content = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("image/fake").alias("mime"),
        (F.length(content) % 640).cast("int").alias("width"),
        (F.length(content) % 480).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.select(F.col(id_col), content.alias("content"), meta.alias("media"))


def extract_features(
    df: DataFrame,
    decoder: str = "fake",
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract media batches via mapInPandas (Arrow).

    Real decoders would run per Arrow batch (bounded memory: batch_hint
    rows × payload size); the 'fake' decoder derives a deterministic
    8-dim feature from the bytes so the pipeline is end-to-end testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder != "fake":
                require_codec(decoder)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] if m is not None else None for m in pdf["media"]],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["content"]],
                    "feat": [
                        [float((sum(b[i::8]) % 1000) / 1000.0) for i in range(8)]
                        if b is not None and len(b) else [0.0] * 8
                        for b in pdf["content"]
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode sample timestamps from metadata
    (pure SQL — which frames to decode is decided WITHOUT touching bytes;
    the decode itself is extract_features territory)."""
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("media.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_ms"),
    )
