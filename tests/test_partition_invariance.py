"""North-rule determinism evidence: the crawl produces the IDENTICAL fetch
ordering and seen set when the shuffle parallelism changes — the sandbox
stand-in for 'same results at N and 4N executors'."""

from __future__ import annotations

from webcrawl_lowres_lang_spark.streaming.crawler import (
    CrawlConfig,
    CrawlEngine,
    fetch_order,
)

CFG = CrawlConfig(
    seed=42, n_urls=500, n_pages=40, n_hosts=16, n_lexicon_terms=24,
    query_count=2, num_search_pages=1, host_budget=4, rounds=2,
    validate_pixels=False,
)


def _run(spark, tmp_path, tag: str, partitions: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        eng = CrawlEngine(spark, CFG, str(tmp_path / f"ck_{tag}"))
        eng.run()
        order = fetch_order(eng.ledger_df())
        seen = sorted(r["url_hash"] for r in eng.seen.load().select("url_hash").collect())
        return order, seen
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_crawl_invariant_under_parallelism(spark, tmp_path):
    o_lo, s_lo = _run(spark, tmp_path, "p3", 3)
    o_hi, s_hi = _run(spark, tmp_path, "p29", 29)
    assert len(o_lo) > 20
    assert o_lo == o_hi, "fetch ordering changed with shuffle parallelism"
    assert s_lo == s_hi, "seen set changed with shuffle parallelism"
