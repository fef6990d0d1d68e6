#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the crawl-engine throughput job, and print
ONE JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

value = end-to-end wall seconds for the whole headline suite (lower is
better); "crawl" carries the north-rule metric (frontier-scheduling +
fetch URLs/sec on the synthetic frontier).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webcrawl_lowres_lang_spark.plans import pipeline_ops, relational  # noqa: F401
from webcrawl_lowres_lang_spark.plans.registry import REGISTRY
from webcrawl_lowres_lang_spark.session import DEFAULT_CPUS, get_spark

HEADLINE = [
    "q1_pricing_summary",
    "j1_join_group_agg",
    "j5_seen_set_anti_join",
    "a9_range_histogram",
    "w2_ranked_enumerate",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "text_langid_ngram",
    "text_quality_score",
    "events_sessionize",
]

CRAWL_BENCH = dict(
    n_urls=30_000, n_pages=300, n_hosts=1500, query_count=24, num_search_pages=4,
    host_budget=16, rounds=2, validate_pixels=False,
)


def _force(df) -> None:
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _burn(_: int) -> int:
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < 1.0:
        x += 1
    return x


def hw_mops() -> float:
    """Pure-CPU capacity sample (no Spark): million loop-iterations/sec
    across all cores. This sandbox VM's effective capacity drifts ~3x over
    a day (shared host); recording the contemporaneous sample with every
    bench run makes cross-run deltas interpretable (see BASELINE.md)."""
    import multiprocessing as mp

    with mp.Pool(DEFAULT_CPUS) as p:
        total = sum(p.map(_burn, range(DEFAULT_CPUS)))
    return round(total / 1e6, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    hw_before = hw_mops()
    spark = get_spark(app_name="bench", master=f"local[{DEFAULT_CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the small sf so headline timings measure the
    # queries, not first-query session initialization. Each headline plan
    # runs once at sf0.001 (trivial data) so janino whole-stage-codegen
    # compilation of the plan shape — a once-per-plan JVM cost, not query
    # work — is paid before the timed sf runs.
    #
    # shuffle partitions = cores for the sf0.1 suite: one task wave per
    # shuffle. The 3x-cores default exists for skewed/straggler-prone
    # stages; at this data volume the extra tasks are pure scheduling
    # overhead (measured: whole suite 9.0s at 32 vs 10.5s at 96). On a
    # real cluster AQE's advisory partition sizing governs instead.
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    for name in HEADLINE:
        _force(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # crawl-engine throughput (north metric: URLs/sec through
    # frontier-scheduling + fetch under politeness budget)
    from webcrawl_lowres_lang_spark.streaming.crawler import CrawlConfig, CrawlEngine

    # crawl rounds are many small jobs — size partitions to round volume,
    # not to the big-scan default (3x cores), or task scheduling dominates
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    try:
        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            eng = CrawlEngine(spark, CrawlConfig(**CRAWL_BENCH), td)
            eng.run()
            crawl_secs = time.perf_counter() - t0
            fetched = eng.ledger_df().count()
            seen_total = eng.seen.count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline-suite-seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": {
            "urls_fetched": fetched,
            "urls_seen": seen_total,
            "rounds": CRAWL_BENCH["rounds"],
            "secs": round(crawl_secs, 3),
            "urls_per_sec": round(fetched / crawl_secs, 2),
        },
        "cpus": DEFAULT_CPUS,
        # contemporaneous pure-CPU capacity samples (sandbox VM drifts ~3x)
        "hw_mops": {"before": hw_before, "after": hw_mops()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
