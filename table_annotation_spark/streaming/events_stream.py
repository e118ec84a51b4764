"""Structured Streaming surface of the engine.

The reference is batch-only (SURVEY.md §2.8: no streaming semantics to
match), so streaming here serves two engine capabilities:

1. ``windowed_event_counts`` — the rel_events_window batch plan expressed as
   a watermark + tumbling-window streaming aggregation over an events stream.
2. ``annotate_stream`` — incremental KG construction: a stream of source-repo
   rows is annotated per micro-batch via foreachBatch running the SAME batch
   pipeline (exactly-once per batch when the sink is idempotent on
   (table_id, row_idx, pred) keys).

Both are tested with file-source streams over the driver parquet
(tests/test_streaming.py) using availableNow triggers — no long-running jobs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def read_events_stream(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """File-source stream over an events parquet directory."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts with late-data watermark — the
    streaming form of relational.events_window."""
    # parquet TIMESTAMP_NTZ → TIMESTAMP for event-time semantics
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "value_milli",
        )
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Drain a stream with an availableNow trigger into an in-memory sink."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def annotate_stream(
    spark: SparkSession,
    src_stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Incremental pipeline: each micro-batch of source rows is handed to
    batch_fn (which runs the batch annotation pipeline and writes triples).
    State (which tables were processed) lives in the streaming checkpoint —
    resumable exactly like the batch checkpoints."""
    return (
        src_stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
