"""The Iceberg seam (sources/tablestore.py): append/overwrite/exists
semantics every persistent engine table relies on."""

from __future__ import annotations

import os

from webcrawl_lowres_lang_spark.sources.tablestore import (
    append_table,
    overwrite_table,
    read_table,
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
