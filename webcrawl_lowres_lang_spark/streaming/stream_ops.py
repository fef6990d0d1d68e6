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

Both run with ``Trigger.AvailableNow`` in tests (bounded, deterministic)
and with a continuous trigger unchanged in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_hourly_counts(
    spark: SparkSession, source_dir: str, schema: str, checkpoint: str
):
    """Watermarked tumbling-window count/sum over a file-source stream.
    Returns the (started) streaming query writing to an in-memory sink."""
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
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
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hourly_counts")
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
        s = batch.sparkSession
        import os

        if os.path.isdir(seen_path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(seen_path) for f in fs
        ):
            seen = s.read.parquet(seen_path).select("url_hash")
            fresh = batch.join(seen, "url_hash", "left_anti")
        else:
            fresh = batch
        fresh = fresh.dropDuplicates(["url_hash"])
        fresh.write.mode("append").parquet(out_path)
        fresh.select("url_hash").write.mode("append").parquet(seen_path)

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
