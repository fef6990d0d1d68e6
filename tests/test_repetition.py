"""Gopher/C4-style repetition signal tests.

The oracle gate pins ``text_repetition_stats`` bit-identical against the
DuckDB twin; these tests pin the kernel semantics on hand-built documents
where every signal is computable by eye, plus the plan-shape contract
(the whole operator is map-side: zero shuffles, zero Python).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from webcrawl_lowres_lang_spark.plans.pipeline_ops import text_repetition_stats
from webcrawl_lowres_lang_spark.plans.registry import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _run_on(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("___rep_docs")
    # drive the registered builder against a temp view by monkey-free
    # substitution: rebuild the same expressions on the literal frame
    import webcrawl_lowres_lang_spark.plans.pipeline_ops as po

    orig_load = po.load
    try:
        po.load = lambda spark, sf_dir, name: df  # noqa: ARG005
        out = text_repetition_stats(spark, SF_DIR)
        return {r["doc_id"]: r.asDict() for r in out.collect()}
    finally:
        po.load = orig_load


def test_signals_exact(spark):
    rows = [
        # "a b a b a b": 6 words {a,b} -> dup_word 1-2/6; bigrams
        # ab,ba,ab,ba,ab -> 5 total 2 distinct -> dup 0.6; top bigram
        # 'a b' x3 -> 3*2/6 = 1.0; trigrams aba,bab,aba,bab -> dup 0.5
        (1, "a b a b a b"),
        # all distinct words: every signal 0, not flagged
        (2, "one two three four five"),
        # single repeated word: dup_word 0.75, bigram 'x x' x3 -> top 1.5
        (3, "x x x x"),
    ]
    got = _run_on(spark, rows)
    d1 = got[1]
    assert d1["n_tokens"] == 6
    assert abs(d1["dup_word_frac"] - round(1 - 2 / 6, 4)) < 1e-9
    assert abs(d1["dup_bigram_frac"] - round(1 - 2 / 5, 4)) < 1e-9
    assert abs(d1["dup_trigram_frac"] - 0.5) < 1e-9
    assert abs(d1["top_bigram_frac"] - 1.0) < 1e-9
    assert d1["repetitive"] is True

    d2 = got[2]
    assert d2["dup_word_frac"] == 0.0
    assert d2["dup_bigram_frac"] == 0.0
    assert d2["dup_trigram_frac"] == 0.0
    assert d2["repetitive"] is False

    d3 = got[3]
    assert abs(d3["dup_word_frac"] - 0.75) < 1e-9
    assert abs(d3["top_bigram_frac"] - 1.5) < 1e-9
    assert d3["repetitive"] is True


def test_short_docs_excluded(spark):
    got = _run_on(spark, [(1, "just two"), (2, "a b c")])
    assert set(got) == {2}  # < 3 tokens filtered out


def test_plan_is_map_side(spark):
    plan = (
        REGISTRY["text_repetition_stats"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
