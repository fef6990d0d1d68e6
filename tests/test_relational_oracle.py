"""Every registered SQL-expressible plan must match its DuckDB oracle at
sf0.01 (the same gate the driver runs for CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from webcrawl_lowres_lang_spark.plans import relational  # noqa: F401

try:
    from webcrawl_lowres_lang_spark.plans import pipeline_ops  # noqa: F401
except ImportError:
    pass
try:
    from webcrawl_lowres_lang_spark.plans import crawl_ops  # noqa: F401
except ImportError:
    pass

from webcrawl_lowres_lang_spark.plans.registry import REGISTRY

from .oracle_harness import run_pair

SF_DIR = "/root/testdata/sf0.01"

SQL_CASES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is not None)
ROWS_ONLY_CASES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is None)


@pytest.mark.parametrize("name", SQL_CASES)
def test_matches_duckdb_oracle(spark, name):
    spec = REGISTRY[name]
    run_pair(spark, SF_DIR, name, spec.fn, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_ivf_recall_floor(spark):
    """recall@10 of the nprobe=1 learned-quantizer IVF vs exhaustive
    ground truth (same integer-dot metric) must clear the floor recorded
    in COVERAGE.md — measured 0.86 mean / 0.7 min at sf0.01, 0.98 mean
    at sf0.1."""
    rows = REGISTRY["ann_ivf_recall"].fn(spark, SF_DIR).collect()
    vals = {r["query_id"]: r["recall_at_10"] for r in rows}
    assert len(vals) == 5
    assert min(vals.values()) >= 0.7
    assert sum(vals.values()) / len(vals) >= 0.8


def test_ivf_nprobe_knob_improves_recall(spark):
    """The IVF recall/cost knob works: probing the 2 nearest cells
    strictly dominates nprobe=1 recall on every query and lifts the mean
    (the scan cost doubles — the classic IVF trade)."""
    from webcrawl_lowres_lang_spark.plans.pipeline_ops import _ivf_recall_impl

    r1 = {
        r["query_id"]: r["recall_at_10"]
        for r in _ivf_recall_impl(spark, SF_DIR, nprobe=1).collect()
    }
    r2 = {
        r["query_id"]: r["recall_at_10"]
        for r in _ivf_recall_impl(spark, SF_DIR, nprobe=2).collect()
    }
    assert set(r1) == set(r2) and len(r1) == 5
    assert all(r2[q] >= r1[q] for q in r1)
    assert sum(r2.values()) / 5 >= sum(r1.values()) / 5
    assert sum(r2.values()) / 5 >= 0.9


def test_emb_lsh_width_scales_with_corpus(spark, tmp_path):
    """The embedding-LSH per-band width must grow with the corpus so mean
    bucket occupancy stays bounded (the round-3 fixed 16-bit signature
    packed a 10x corpus into the same 512 buckets and candidate pairs grew
    superlinearly). Builds the band table at 1x and 10x the sf0.001
    embeddings table and asserts (a) bb grows, (b) mean occupancy stays
    within 4x of the design target at BOTH sizes."""
    from pyspark.sql import functions as F

    from webcrawl_lowres_lang_spark.plans.pipeline_ops import (
        _EMB_OCC_TARGET,
        emb_band_bits,
        emb_band_table,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    reps = spark.range(10).select(F.col("id").alias("__rep"))
    big = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(10_000_000))
        .drop("__rep")
    )
    big_path = str(tmp_path / "emb10x.parquet")
    big.write.parquet(big_path)
    big = spark.read.parquet(big_path)

    occ = {}
    bbs = {}
    for tag, df in (("1x", base), ("10x", big)):
        bands, bb = emb_band_table(df)
        bbs[tag] = bb
        stats = bands.groupBy("band_idx", "band_val").count().agg(
            F.avg("count").alias("mean_occ")
        ).collect()[0]
        occ[tag] = float(stats["mean_occ"])
    assert bbs["10x"] > bbs["1x"]
    assert bbs["1x"] == emb_band_bits(2 * base.count())
    for tag in ("1x", "10x"):
        # replicas collide by construction (identical vectors share every
        # band), so allow 4x the design target — the invariant is that
        # occupancy does NOT grow ~10x with the corpus
        assert occ[tag] <= 4 * _EMB_OCC_TARGET, (tag, occ)
