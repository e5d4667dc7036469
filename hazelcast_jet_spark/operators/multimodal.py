"""Multimodal column plumbing (SURVEY Phase 5).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side plumbing (schemas, batch iteration, partition sizing) is
real and tested; the actual codecs are STUBBED (decode libs are not in
this container) behind deterministic fakes / NotImplementedError.

Scale shape: media rows are huge — `mapInPandas` with small Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``) keeps executor memory
bounded; metadata-only transforms never touch the payload column thanks to
column pruning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

#: canonical multimodal schema: payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),        # image/video
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),  # audio/video
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", StringType()),       # stub: md5 of payload
])


def read_binary_files(spark, path: str) -> DataFrame:
    """Raw-bytes file source — RawBytesFileFormat.java analog:
    spark.read.format('binaryFile')."""
    return spark.read.format("binaryFile").load(path)


def decode_image(payload: bytes) -> "object":
    """STUB — image codecs not present in this container.  The real
    implementation would PIL-decode inside extract_features' batch loop."""
    raise NotImplementedError("image decode requires PIL/opencv (not installed)")


def extract_features(df: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """Feature extraction over media payloads via Arrow-batched
    mapInPandas.  The 'feature' is a deterministic fake (md5 of payload)
    so the plumbing — schema, batching, pruning — is fully testable."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                "feature": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                ),
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling *plan*: one output row per sampled timestamp
    (payload decode stubbed).  Demonstrates the explode-by-metadata shape:
    frame timestamps are derived from duration metadata without touching
    the payload, so pruning keeps the heavy column out until decode."""
    ts = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(ts).alias("frame_ts_ms"))
    )
