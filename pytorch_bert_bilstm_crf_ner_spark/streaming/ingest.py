"""Structured Streaming ingest (optional surface — the reference is
batch-only + a sync Flask endpoint, `scripts/server.py`; the north_rule is
batch.  This covers the S8 analog: continuous transcript arrival).

A file-source stream over the transcripts directory feeds the SAME
Arrow-batched tagging operator via ``foreachBatch``; the checkpoint
location gives exactly-once file processing, so re-running after a kill
only tags files that arrived since — the streaming twin of the batch
pipeline's lineage resume.  ``Trigger.AvailableNow`` drains the backlog
then stops (incremental batch), a plain start() would run continuously.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..core.model import TaggerConfig
from ..operators.tagging import extract_mentions

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def stream_mentions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: TaggerConfig | None = None,
    available_now: bool = True,
):
    """Start the incremental tagging stream; returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        (
            extract_mentions(batch_df, cfg)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
