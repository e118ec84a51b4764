"""Structured Streaming surface of the engine.

The reference is batch-only (SURVEY.md §2.8: no streaming semantics to
match), so streaming here serves two engine capabilities:

1. ``windowed_event_counts`` — the rel_events_window batch plan expressed as
   a watermark + tumbling-window streaming aggregation over an events stream.
2. ``annotate_stream`` — incremental KG construction: a stream of source-repo
   rows is annotated per micro-batch via foreachBatch running the SAME batch
   pipeline (exactly-once per batch when the sink is idempotent on
   (table_id, row_idx, pred) keys).
3. ``windowed_topk_stream`` — per-window top-k event types: append-mode
   windowed counts (finalized atomically per window) + foreachBatch rank.
4. ``dedup_stream`` / ``sessionize_stream`` — watermark-evicted exact dedup
   and custom stateful gap sessionization (applyInPandasWithState).

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


def windowed_topk_stream(
    stream_df: DataFrame,
    out_dir: str,
    ckpt_dir: str,
    k: int = 3,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Per-window top-k over a stream: the k most frequent event types per
    tumbling event-time window — the streaming twin of the batch
    rank-per-group shape (relational.topk_window / text.ngram_topk).

    Rank is NOT a streaming-expressible aggregate, so the plan is the
    canonical two-stage decomposition: (1) the watermarked windowed count
    (windowed_event_counts) in APPEND mode, which emits each window's
    groups exactly once — atomically, in the micro-batch whose watermark
    passes the window end, because the watermark is global per trigger —
    then (2) a foreachBatch row_number()-per-window over those finalized
    rows. Since a window's rows always finalize together, the per-batch
    rank IS the exact per-window rank; no cross-batch state beyond the
    windowed agg's own store (O(open windows × event types), watermark-
    evicted).

    Ties break on event_type ascending so the emitted set is deterministic
    across restarts (pinned by TestStreamingTopK's 3-restart harness)."""
    from pyspark.sql import Window

    counts = windowed_event_counts(stream_df, window, watermark)

    def emit_topk(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        (
            batch_df.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .where(F.col("rank") <= k)
            .select("window_start", "event_type", "n_events", "rank")
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        counts.writeStream.foreachBatch(emit_topk)
        .outputMode("append")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
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


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication on event_id — the streaming twin of
    ``operators.dedup.exact_dedup``'s first-wins semantics, for ingest
    pipelines where upstream at-least-once delivery duplicates records.

    Uses ``dropDuplicatesWithinWatermark``: state holds one entry per key
    seen within the watermark horizon and is EVICTED once the watermark
    passes, so state is O(keys per watermark window), not O(all keys ever)
    — the only dedup shape that survives an unbounded 100 TB/day stream.
    The contract is correspondingly bounded: duplicates arriving further
    apart than the watermark are NOT collapsed (exact global dedup is the
    batch operator's job)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """CUSTOM STATEFUL streaming operator: per-user gap sessionization via
    ``applyInPandasWithState`` — the streaming twin of
    ``operators.sessions.sessionize`` (same 30-min gap rule, same output
    schema).

    Per user, the state is the OPEN session's running aggregates
    (session_seq, last event epoch, n_events, first/last event id). Each
    micro-batch sorts its events by (epoch, event_id), closes a session
    whenever the gap to the previous event exceeds the threshold (emitting
    the closed session downstream), and re-arms an event-time timeout at
    last_epoch + gap so a session with no successor event is flushed once
    the watermark passes its close time. Emitted rows are therefore exactly
    the CLOSED sessions; a session still open at end-of-stream stays in
    state until a later batch's watermark advances past its timeout
    (pinned by tests/test_multimodal_streaming.py::TestStatefulSessionize).

    Scale shape: state is O(distinct users) — open sessions carry full
    aggregates, timed-out users shrink to a counter-only tombstone (a few
    longs) that preserves the dense per-user session_seq the batch twin
    computes; each micro-batch touches only keys with new events plus
    timed-out keys. Trade session-numbering parity for O(active users)
    state by keying sessions on their start epoch instead."""
    import pandas as pd

    from ..operators.sessions import SESSION_GAP_MIN

    gap_s = SESSION_GAP_MIN * 60

    def fn(key, pdfs, state):
        user_id = key[0]
        if state.hasTimedOut:
            seq, last_epoch, n, first, last = state.get
            # flush the open session but KEEP a counter-only tombstone
            # (n_events=0, no timeout re-armed): session_seq is a DENSE
            # per-user counter in the batch twin, so a user who returns
            # after a timeout must continue numbering, not restart at 1
            # (caught by the exact-equality restart test). State is
            # therefore O(distinct users), a few longs each — the
            # unavoidable price of dense per-user numbering; switch the
            # session identity to its start epoch if O(active users)
            # state matters more than numbering parity.
            state.update((seq, last_epoch, 0, 0, 0))
            yield pd.DataFrame(
                {
                    "user_id": [user_id], "session_seq": [seq],
                    "n_events": [n], "first_event": [first], "last_event": [last],
                }
            )
            return
        if state.exists:
            seq, last_epoch, n, first, last = state.get
            open_sess = n > 0
        else:
            seq, last_epoch, n, first, last = 0, 0, 0, 0, 0
            open_sess = False
        out = {k: [] for k in
               ("user_id", "session_seq", "n_events", "first_event", "last_event")}
        for pdf in pdfs:
            pdf = pdf.sort_values(["epoch", "event_id"])
            for epoch, event_id in zip(pdf["epoch"], pdf["event_id"]):
                epoch, event_id = int(epoch), int(event_id)
                if open_sess and epoch - last_epoch > gap_s:
                    out["user_id"].append(user_id)
                    out["session_seq"].append(seq)
                    out["n_events"].append(n)
                    out["first_event"].append(first)
                    out["last_event"].append(last)
                    open_sess = False
                if not open_sess:
                    seq += 1
                    n, first, last = 0, event_id, event_id
                    open_sess = True
                n += 1
                first = min(first, event_id)
                last = max(last, event_id)
                # max, not assignment: a late-but-within-watermark event from
                # a LATER micro-batch (epoch < last_epoch — the per-batch sort
                # only orders within one batch) must merge into the open
                # session without regressing its end point, else the timeout
                # re-arms earlier and later gaps are measured from the wrong
                # origin, diverging from the batch twin
                last_epoch = max(last_epoch, epoch)
        if open_sess:
            state.update((seq, last_epoch, n, first, last))
            state.setTimeoutTimestamp((last_epoch + gap_s) * 1000)
        if out["user_id"]:
            yield pd.DataFrame(out)

    events = events.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "epoch", F.unix_timestamp("ts")
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "user_id bigint, session_seq bigint, n_events bigint, "
                "first_event bigint, last_event bigint"
            ),
            stateStructType=(
                "session_seq bigint, last_epoch bigint, n_events bigint, "
                "first_event bigint, last_event bigint"
            ),
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
