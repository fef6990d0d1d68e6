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


# ---------------------------------------------------------------------------
# Temperature resampling (sample_temperature_lang)
# ---------------------------------------------------------------------------


def _python_temperature_twin(sf_dir: str, alpha: float = 0.3):
    """Third implementation (python math/hashlib over raw parquet) of the
    alpha-sampling selection, independent of both SQL dialects."""
    import hashlib
    import math

    import duckdb

    con = duckdb.connect()
    try:
        rows = con.execute(
            f"SELECT doc_id, lang FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    finally:
        con.close()
    counts: dict[str, int] = {}
    for _, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    nn = sum(counts.values())
    w = {lg: math.pow(n / nn, alpha) for lg, n in counts.items()}
    sw = sum(w.values())
    cutoff = {}
    epochs = {}
    for lg, n in counts.items():
        raw = ((w[lg] / sw) * nn) / n
        cutoff[lg] = int(math.floor(round(min(1.0, raw), 9) * float(16**15)))
        epochs[lg] = max(1.0, raw)
    selected = set()
    for doc_id, lang in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        if h < cutoff[lang]:
            selected.add(doc_id)
    return selected, counts, epochs


def test_temperature_sampling_matches_python_twin(spark):
    from webcrawl_lowres_lang_spark.plans import pipeline_ops  # noqa: F401
    from webcrawl_lowres_lang_spark.plans.registry import REGISTRY

    out = REGISTRY["sample_temperature_lang"].fn(spark, SF_DIR).collect()
    selected, counts, epochs = _python_temperature_twin(SF_DIR)
    assert {r["doc_id"] for r in out} == selected
    for r in out:
        assert r["lang_docs"] == counts[r["lang"]]
        assert abs(r["epochs"] - round(epochs[r["lang"]], 4)) < 1e-9


def test_temperature_sampling_upweights_tail(spark):
    # the defining property: after alpha-sampling, rare languages keep ALL
    # their docs (rate 1, epochs >= 1) while the head language is
    # downsampled (rate < 1, epochs == 1).
    from webcrawl_lowres_lang_spark.plans import pipeline_ops  # noqa: F401
    from webcrawl_lowres_lang_spark.plans.registry import REGISTRY
    from webcrawl_lowres_lang_spark.plans.registry import load

    d = load(spark, SF_DIR, "documents")
    orig = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    head = max(orig, key=lambda lg: orig[lg])
    tail = min(orig, key=lambda lg: orig[lg])
    out = REGISTRY["sample_temperature_lang"].fn(spark, SF_DIR)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    rates = {
        r["lang"]: (r["sample_rate"], r["epochs"])
        for r in out.select("lang", "sample_rate", "epochs").distinct().collect()
    }
    assert got[tail] == orig[tail] and rates[tail][0] == 1.0 and rates[tail][1] > 1.0
    assert got[head] < orig[head] and rates[head][0] < 1.0 and rates[head][1] == 1.0
