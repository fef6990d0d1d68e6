"""Structured Streaming twins: windowed agg equals the batch formulation;
streaming seen-set dedup equals batch dedup regardless of arrival order."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawl_lowres_lang_spark.streaming.stream_ops import (
    stream_discovery_dedup,
    stream_hourly_counts,
    stream_stateful_sessionize,
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


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState session counting across micro-batches equals
    the batch lag-based sessionization when slices arrive in time order."""
    import os
    import time

    import pandas as pd
    from pyspark.sql import Window

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "event_id", "ts")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    # 5 time-ordered slices -> 5 micro-batches (maxFilesPerTrigger=1,
    # oldest-mtime-first); mtimes set explicitly so batch order is the
    # slice order
    # micro-second timestamps: pandas' default nanos write as raw INT64,
    # which Spark's streaming parquet reader refuses to coerce
    events["ts"] = events["ts"].astype("datetime64[us]")
    n = len(events)
    base = time.time() - 1000
    for i in range(5):
        chunk = events.iloc[i * n // 5 : (i + 1) * n // 5]
        path = os.path.join(src, f"slice{i:03d}.parquet")
        chunk.to_parquet(path, index=False)
        os.utime(path, (base + i, base + i))

    q = stream_stateful_sessionize(
        spark, src, "user_id long, event_id long, ts timestamp", str(tmp_path / "ck3")
    )
    q.awaitTermination(180)

    # final running total per user = the row with the highest n_events
    rows = spark.sql("SELECT * FROM stateful_sessions").collect()
    got = {}
    for r in rows:
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[1]:
            got[r["user_id"]] = (r["n_sessions"], r["n_events"])

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        e.withColumn("__prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("__prev").isNull()
                | F.expr("ts - __prev > INTERVAL '30' MINUTE"),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    want = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in sess.collect()}
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


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode watermark semantics: a window emits once the watermark
    (2h) passes its end, and a row arriving LATER than the watermark is
    dropped — the emitted hour-10 window counts only the on-time rows."""
    import os
    import time

    import pandas as pd

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def slice_df(rows):
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        return df

    base = time.time() - 1000
    # batch 0: two on-time rows in hour 10 + a 13:30 row (advances the
    # watermark to 11:30 as of the NEXT batch)
    s0 = slice_df([
        (1, "2026-01-01 10:10:00", 1, "view", 1.0, ""),
        (2, "2026-01-01 10:20:00", 1, "view", 2.0, ""),
        (3, "2026-01-01 13:30:00", 1, "view", 4.0, ""),
    ])
    # batch 1: watermark 11:30 crosses the [10:00, 11:00) window end ->
    # the window finalizes, emits (2, 3.0), and its state is EVICTED
    s1 = slice_df([(4, "2026-01-01 15:30:00", 1, "view", 16.0, "")])
    # batch 2: a LATE hour-10 row arrives after its window was evicted
    # (10:40 against watermark 13:30) -> dropped; it must neither re-emit
    # nor resurrect the finalized window
    s2 = slice_df([(5, "2026-01-01 10:40:00", 1, "view", 8.0, "")])
    for i, df in enumerate((s0, s1, s2)):
        path = os.path.join(src, f"s{i}.parquet")
        df.to_parquet(path, index=False)
        os.utime(path, (base + i, base + i))

    q = stream_hourly_counts(
        spark, src, EVENTS_SCHEMA, str(tmp_path / "ck_late"),
        output_mode="append", query_name="hourly_append", max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    all_rows = spark.sql("SELECT * FROM hourly_append").collect()
    rows = {
        (str(r["hour"]), r["event_type"]): (r["cnt"], r["total_value"])
        for r in all_rows
    }
    # the finalized hour-10 window emitted WITHOUT the late row, exactly once
    assert rows[("2026-01-01 10:00:00", "view")] == (2, 3.0)
    assert len(all_rows) == len(rows)  # no window emitted twice
    # unfinalized windows (13:00, 15:00) have not emitted in append mode
    assert ("2026-01-01 15:00:00", "view") not in rows
