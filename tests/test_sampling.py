"""Deterministic stratified sampling (training-data mixing) tests.

The oracle gate (test_relational_oracle) pins ``sample_stratified_balanced``
against the DuckDB plain-window twin; these tests pin the kernel's
invariants: balanced quotas, partitioning-independence, and the
exactness-guard retry path (a deliberately starved cutoff must widen until
the result is identical to the unfiltered window answer).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawl_lowres_lang_spark.plans.pipeline_ops import balanced_sample
from webcrawl_lowres_lang_spark.plans.registry import load

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["doc_id"], r["lang"], r["sample_rank"])
        for r in df.select("doc_id", "lang", "sample_rank").collect()
    )


def test_balanced_quotas(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id", "lang", "source")
    out = balanced_sample(d).groupBy("lang").count().collect()
    quota = min(
        r["count"] for r in d.groupBy("lang").count().collect()
    )
    assert {r["count"] for r in out} == {quota}
    assert len(out) == d.select("lang").distinct().count()


def test_partitioning_invariance(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id", "lang", "source")
    a = _rows(balanced_sample(d))
    b = _rows(balanced_sample(d.repartition(17, "doc_id")))
    assert a == b and len(a) > 0


def test_starved_margin_widens_to_exact(spark):
    # margin=1e-4 makes the first cutoff keep ~0 survivors per stratum;
    # the guard must keep widening until the result equals the margin-2
    # (effectively unfiltered at this scale) answer.
    d = load(spark, SF_DIR, "documents").select("doc_id", "lang", "source")
    assert _rows(balanced_sample(d, margin=1e-4)) == _rows(
        balanced_sample(d, margin=2.0)
    )


def test_sample_is_hash_prefix_of_stratum(spark):
    # the kept doc_ids per stratum are exactly the quota smallest by the
    # md5 permutation — i.e. a reproducible uniform subsample, not a
    # "first rows of the file" artifact.
    d = load(spark, SF_DIR, "documents").select("doc_id", "lang", "source")
    out = balanced_sample(d)
    quota = out.groupBy("lang").count().first()["count"]
    h = F.md5(F.col("doc_id").cast("string"))
    expect = {}
    for r in d.select("lang", "doc_id", h.alias("h")).collect():
        expect.setdefault(r["lang"], []).append((r["h"], r["doc_id"]))
    for lang, pairs in expect.items():
        want = {doc for _, doc in sorted(pairs)[:quota]}
        got = {r["doc_id"] for r in out.where(F.col("lang") == lang).collect()}
        assert got == want, lang
