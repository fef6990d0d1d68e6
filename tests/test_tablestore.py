"""The Iceberg seam (sources/tablestore.py): append/overwrite/exists
semantics every persistent engine table relies on."""

from __future__ import annotations

import os

from webcrawl_lowres_lang_spark.sources.tablestore import (
    append_table,
    overwrite_table,
    read_table,
    rewrite_table,
    table_exists,
)


def test_roundtrip_and_exists(spark, tmp_path):
    p = str(tmp_path / "t1")
    assert not table_exists(p)
    os.makedirs(p)
    assert not table_exists(p)  # empty dir is not a table
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    overwrite_table(df, p)
    assert table_exists(p)
    assert read_table(spark, p).count() == 5
    append_table(spark.range(5, 8).selectExpr("id", "id * 2 AS v"), p)
    assert read_table(spark, p).count() == 8
    overwrite_table(df, p)
    assert read_table(spark, p).count() == 5


def test_rewrite_and_crash_recovery(spark, tmp_path):
    """rewrite_table's non-atomic window: a crash between its two renames
    (simulated by renaming the table to .rewrite.old by hand) must be
    healed by the next table_exists call, and a stale .rewrite.old from a
    previous crash must not wedge the next rewrite."""
    p = str(tmp_path / "t3")
    overwrite_table(spark.range(10).selectExpr("id", "id % 3 AS bucket"), p)
    rewrite_table(read_table(spark, p).filter("id < 7"), p)
    assert read_table(spark, p).count() == 7

    # crash window: table gone, data parked in .rewrite.old
    os.rename(p, p + ".rewrite.old")
    assert not os.path.isdir(p)
    assert table_exists(p)  # recovery restored it
    assert read_table(spark, p).count() == 7

    # stale .rewrite.old left behind (crash AFTER the second rename but
    # before cleanup) must not break the next rewrite
    os.makedirs(p + ".rewrite.old")
    rewrite_table(read_table(spark, p).filter("id < 5"), p)
    assert read_table(spark, p).count() == 5
    assert not os.path.isdir(p + ".rewrite.old")


def test_partitioned_append_detected(spark, tmp_path):
    """Partitioned tables have only `col=val` subdirs at top level —
    table_exists must see them (the SeenSet bucket layout)."""
    p = str(tmp_path / "t2")
    df = spark.range(10).selectExpr("id", "id % 3 AS bucket")
    append_table(df, p, partition_by=("bucket",))
    assert table_exists(p)
    assert sorted(
        r["bucket"] for r in read_table(spark, p).select("bucket").distinct().collect()
    ) == [0, 1, 2]
    assert read_table(spark, p).count() == 10
