"""Lexicon bootstrap loop (T2): phase crawls grow the lexicon
deterministically; extraction matches a local recomputation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from webcrawl_lowres_lang_spark.operators.scoring import tokenize
from webcrawl_lowres_lang_spark.sources import fixtures as fx
from webcrawl_lowres_lang_spark.sources.querygen import english_filter
from webcrawl_lowres_lang_spark.streaming.bootstrap import (
    LexiconStore,
    extract_lexicon_from_ledger,
    run_bootstrap_phases,
)
from webcrawl_lowres_lang_spark.streaming.crawler import CrawlConfig, CrawlEngine

CFG = dict(n_urls=500, n_pages=50, n_hosts=16, n_lexicon_terms=24,
           query_count=2, num_search_pages=1, host_budget=4, rounds=1,
           validate_pixels=False)


def test_bootstrap_phases_grow_lexicon(spark, tmp_path):
    base = english_filter(
        fx.gen_lexicon_rows(42, 24), {t for (t,) in fx.gen_english_lexicon_rows()}
    )
    store = LexiconStore(spark, str(tmp_path / "lex"))
    engines = []

    def make_engine(lex_rows, phase):
        # phase crawls use separate checkpoints; the grown lexicon REALLY
        # drives the next phase's queries + scoring via the override
        cfg = CrawlConfig(seed=42, **CFG)
        eng = CrawlEngine(spark, cfg, str(tmp_path / f"ck{phase}"), lexicon_rows=lex_rows)
        engines.append(eng)
        return eng

    metrics = run_bootstrap_phases(
        spark, make_engine, store, base, phases=2, relevance_threshold=0.02
    )
    assert store.versions() == [0, 1, 2]
    v0 = store.read(0).count()
    assert metrics[0]["lexicon_terms"] >= v0, "merge must never shrink"
    assert metrics[0]["extracted_terms"] > 0, "phase 1 extracted nothing"
    # T2 end-to-end: phase 2 crawled with the GROWN lexicon, not the seed —
    # its lexicon (hence the scoring vector) must differ from phase 1's
    import numpy as np

    assert engines[0].lex_rows == base
    assert engines[1].lex_rows != base
    assert len(engines[1].lex_rows) >= len(base)
    assert not np.array_equal(engines[1].lex.vec, engines[0].lex.vec)
    # determinism: re-running phase 1 extraction gives identical lexicon
    eng = make_engine(base, 99)
    eng.run()
    a = sorted(map(tuple, extract_lexicon_from_ledger(eng.ledger_df(), 0.02).collect()))
    b = sorted(map(tuple, extract_lexicon_from_ledger(eng.ledger_df(), 0.02).collect()))
    assert a == b


def test_resume_preserves_lexicon_override(spark, tmp_path):
    """A phase crawl resumed from checkpoint must keep crawling with the
    GROWN lexicon override, not silently revert to the fixture seed
    (lexicon rows persist in the round metadata)."""
    grown = english_filter(
        fx.gen_lexicon_rows(42, 24), {t for (t,) in fx.gen_english_lexicon_rows()}
    ) + [("tangiwhenua", 7), ("korokoro", 3)]
    d = str(tmp_path / "ck_lex_resume")
    eng = CrawlEngine(spark, CrawlConfig(seed=42, **CFG), d, lexicon_rows=grown)
    eng.run()
    res = CrawlEngine.resume(spark, d)
    assert res.lex_rows == eng.lex_rows
    assert res.queries == eng.queries
    import numpy as np

    assert np.array_equal(res.lex.vec, eng.lex.vec)


def test_extraction_matches_local_recomputation(spark, tmp_path):
    eng = CrawlEngine(spark, CrawlConfig(seed=42, **CFG), str(tmp_path / "ck"))
    eng.run()
    got = {
        r["term"]: r["freq"]
        for r in extract_lexicon_from_ledger(eng.ledger_df(), 0.02).collect()
    }
    rows = eng.ledger_df().filter(
        (F.col("status") == 200) & (F.col("caption_score") >= 0.02)
    ).select("caption").collect()
    want = Counter()
    for r in rows:
        want.update(tokenize(r["caption"]))
    assert got == dict(want)
