"""Structured Streaming twins: windowed agg equals the batch formulation;
streaming seen-set dedup equals batch dedup regardless of arrival order."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawl_lowres_lang_spark.streaming.stream_ops import (
    stream_discovery_dedup,
    stream_hourly_counts,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_stream_hourly_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # split into several files to get multiple micro-batches
    batch.repartition(6).write.parquet(src)

    q = stream_hourly_counts(spark, src, EVENTS_SCHEMA, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {
        (r["hour"], r["event_type"]): (r["cnt"], r["total_value"])
        for r in spark.sql("SELECT * FROM hourly_counts").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["cnt"], r["total_value"])
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total_value"))
        .collect()
    }
    assert got == want


def test_stream_dedup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "disc_src")
    schema = "url_hash long, url string"
    rows = [(h % 70, f"u{h % 70}") for h in range(200)]  # heavy duplication
    df = spark.createDataFrame(rows, schema)
    df.repartition(5).write.parquet(src)

    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    q = stream_discovery_dedup(spark, src, schema, seen, out, str(tmp_path / "ck2"))
    q.awaitTermination(120)

    got = sorted(r["url_hash"] for r in spark.read.parquet(out).collect())
    assert got == sorted(set(h % 70 for h in range(200)))
    # seen table has exactly one entry per hash
    seen_df = spark.read.parquet(seen)
    assert seen_df.count() == seen_df.select("url_hash").distinct().count()
