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


def incremental_bucket_rollup(spark: SparkSession, input_dir: str, sink_dir: str,
                              checkpoint_dir: str, bucket_size: int = 60):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    docs arrive as ordered (doc_id, chunk_off, tokens) appends; per-doc
    state carries the trailing partial bucket (the same sufficient state —
    running counts/sums — the reference's incremental MPX prototypes keep,
    src/mpx.cpp:194-376), and each micro-batch emits the buckets it
    completed. Completed buckets never change (append output mode).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    chunk_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("source", T.StringType(), False),
            T.StructField("chunk_off", T.LongType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("source", T.StringType(), False),
            T.StructField("bucket", T.LongType(), False),
            T.StructField("cnt", T.LongType(), False),
            T.StructField("sum_v", T.LongType(), False),
            T.StructField("sumsq", T.LongType(), False),
            T.StructField("min_v", T.IntegerType(), False),
            T.StructField("max_v", T.IntegerType(), False),
        ]
    )
    # state: next expected offset + trailing partial bucket accumulators
    state_schema = T.StructType(
        [
            T.StructField("next_off", T.LongType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("sum_v", T.LongType()),
            T.StructField("sumsq", T.LongType()),
            T.StructField("min_v", T.LongType()),
            T.StructField("max_v", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        doc_id = key[0]
        if state.exists:
            next_off, cnt, s, s2, mn, mx = state.get
        else:
            next_off, cnt, s, s2, mn, mx = 0, 0, 0, 0, 2**31, -(2**31)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("chunk_off")
            for _, row in pdf.iterrows():
                src = row["source"]
                x = np.asarray(row["tokens"], dtype=np.int64)
                off = int(row["chunk_off"])
                assert off == next_off, f"out-of-order chunk for {doc_id}"
                for v in x:
                    b = next_off // bucket_size
                    cnt += 1
                    s += int(v)
                    s2 += int(v) * int(v)
                    mn = min(mn, int(v))
                    mx = max(mx, int(v))
                    next_off += 1
                    if next_off % bucket_size == 0:
                        out_rows.append((doc_id, src, b, cnt, s, s2, mn, mx))
                        cnt, s, s2, mn, mx = 0, 0, 0, 2**31, -(2**31)
        state.update((next_off, cnt, s, s2, mn, mx))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    stream = (
        spark.readStream.schema(chunk_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    agg = stream.groupBy("doc_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
