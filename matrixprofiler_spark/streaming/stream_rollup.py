"""Structured Streaming ingestion of the rollup engine.

The production shape: new pre-tokenized docs land as files (or Kafka); a
streaming query computes the finest-tier bucket aggregates incrementally
and appends them to the rollup sink, with event-time watermarking for the
timestamped (events-style) variant. The batch and streaming paths share
the same kernel (`finest_rollup` is a mapInPandas transformation, legal in
streaming), so outputs are identical rows.

Two entry points:
* ``stream_tokens_rollup`` — file-source stream of tokens parquet ->
  finest-tier rollup -> parquet sink (append). Per-doc rows are
  self-contained, so no state/watermark is needed; exactly-once comes from
  the checkpointed file source + idempotent sink.
* ``stream_events_rollup`` — event-time tumbling window aggregation with a
  watermark for late data (the classic readStream -> withWatermark ->
  groupBy(window) shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import finest_rollup
from ..sources.tokens import TOKENS_SCHEMA


def stream_tokens_rollup(spark: SparkSession, input_dir: str, sink_dir: str,
                         checkpoint_dir: str, bucket_size: int = 60):
    """File-source streaming rollup; returns the StreamingQuery.

    Use ``trigger(availableNow=True)`` semantics via ``process_available``
    for batch-ish catch-up runs (and in tests)."""
    stream = (
        spark.readStream.schema(TOKENS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    rolled = finest_rollup(stream, bucket_size)
    return (
        rolled.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_events_rollup(spark: SparkSession, input_dir: str, sink_dir: str,
                         checkpoint_dir: str, watermark: str = "1 hour"):
    """Watermarked event-time tumbling rollup of an events stream
    (ts, user_id, value): per (user, 1h window) count + exact cents sum.
    Late rows beyond the watermark are dropped deterministically."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(F.count("*").alias("cnt"), F.sum(cents).alias("sum_cents"))
        .select(
            F.col("win.start").alias("window_start"),
            "user_id", "cnt", "sum_cents",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
