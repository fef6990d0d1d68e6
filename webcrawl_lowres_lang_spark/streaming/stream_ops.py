"""Structured Streaming formulations of the engine's incremental pieces.

The reference is batch-with-threads (SURVEY §2.8: no watermarks or stream
windows exist there), but the engine exposes the streaming twins a
continuous crawl would run in production:

- ``stream_hourly_counts``: file-source stream of events -> watermarked
  tumbling-window aggregation (late data handled by the watermark instead
  of the reference's cumulative re-runs).
- ``stream_discovery_dedup``: micro-batch seen-set maintenance via
  ``foreachBatch`` — each batch anti-joins the persistent seen table and
  appends the remainder: the J5 insert-dedup operator in streaming form.
- ``stream_stateful_sessionize``: a CUSTOM STATEFUL operator via
  ``applyInPandasWithState`` — per-user session counting whose state
  (last event time, running session count) survives across micro-batches;
  the arbitrary-state analog of the crawl's incremental frontier state.

All run with ``Trigger.AvailableNow`` in tests (bounded, deterministic)
and with a continuous trigger unchanged in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def stream_hourly_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    checkpoint: str,
    output_mode: str = "complete",
    query_name: str = "hourly_counts",
    max_files_per_trigger: int = 4,
):
    """Watermarked tumbling-window count/sum over a file-source stream.
    Returns the (started) streaming query writing to an in-memory sink.

    ``output_mode="append"`` exercises the watermark's REAL semantics: a
    window emits exactly once, in the micro-batch whose watermark passes
    its end (state evicted), and a late row arriving in a LATER batch is
    dropped — it neither re-emits nor resurrects the finalized window
    (asserted in tests/test_streaming.py::test_watermark_drops_late_rows;
    note Spark merges a late row that lands in the SAME batch as the
    eviction — the watermark is a bound on state, not a per-row filter
    against the live maximum). This is how the engine bounds state for
    late data instead of the reference's cumulative re-runs."""
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("win.start").alias("hour"), "event_type", "cnt", "total_value"
        )
    )
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_discovery_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    seen_path: str,
    out_path: str,
    checkpoint: str,
):
    """Streaming URL-seen maintenance (J5 as a stream): per micro-batch,
    anti-join the persistent seen table, append survivors to both the
    output and the seen table. foreachBatch keeps the cross-batch state in
    storage (Iceberg table in production; parquet dir here), which is what
    a 10^10-row seen set needs — not in-executor state."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        from ..sources.tablestore import append_table, read_table, table_exists

        s = batch.sparkSession
        if table_exists(seen_path):
            seen = read_table(s, seen_path).select("url_hash")
            fresh = batch.join(seen, "url_hash", "left_anti")
        else:
            fresh = batch
        fresh = fresh.dropDuplicates(["url_hash"])
        append_table(fresh, out_path)
        append_table(fresh.select("url_hash"), seen_path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


SESSION_GAP_SECONDS = 30 * 60

_SESS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", LongType()),
    ]
)
_SESS_STATE = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch rows into (last_ts, n_sessions, n_events)
    state: a new session starts when the gap to the previous event exceeds
    SESSION_GAP_SECONDS. Emits one running-total row per (user, batch)."""
    last_ts, n_sessions, n_events = state.get if state.exists else (None, 0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts_us", "event_id"])
    for ts in rows["ts_us"].astype("int64"):
        # state timestamps are unix MICROS — gap semantics identical to the
        # batch lag formulation (ts - prev > INTERVAL 30 MINUTE) at full
        # timestamp precision
        if last_ts is None or ts - last_ts > SESSION_GAP_SECONDS * 1_000_000:
            n_sessions += 1
        last_ts = int(ts)
        n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_sessions": n_sessions, "n_events": n_events, "last_ts": last_ts}]
    )


def stream_stateful_sessionize(
    spark: SparkSession, source_dir: str, schema: str, checkpoint: str
):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-user gap-based session counting with state carried across
    micro-batches. The latest row per user in the update-mode sink is the
    running total; with time-ordered input slices it equals the batch
    sessionization (tests/test_streaming.py asserts this against the
    ``events_sessionize`` formulation).

    Scale shape: state is (3 longs) x |users|, hash-partitioned by user —
    the same keyed-state layout a production continuous crawl would keep
    for per-host politeness counters."""
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .select(
            # full microsecond precision: truncating to whole seconds
            # (cast('long')) made sub-second gaps in (1800.0, 1801.0)
            # classify differently from the batch formulation's
            # INTERVAL-30-MINUTE timestamp arithmetic
            "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us")
        )
    )
    stateful = events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_SESS_OUTPUT,
        stateStructType=_SESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        stateful.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_sessions")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
