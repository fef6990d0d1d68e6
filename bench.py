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

# Skew-stress leg: n_hosts=2 puts the MAJORITY of the frontier on ONE
# registrable domain — the pathological case the salted two-phase
# admission exists for (reference analog: the host-skew display,
# display.py:86-97). Config notes: distinct canonical URLs are bounded by
# n_hosts x n_pages (paths are ``mix % n_pages``), so a small n_hosts
# needs a larger n_pages or the whole space collapses and the leg
# under-fetches; seeds (query_count x num_search_pages) and links/page
# (n_urls / n_pages) are sized so ONE discovery round covers ~5k distinct
# URLs — comparable volume to CRAWL_BENCH (measured: 4631 fetched,
# top_domain_share 0.585, vs 5592 uniform). host_budget is scaled so
# politeness tokens do NOT bind (host0 carries the fixture's
# crawl_delay=2.0 trap: effective budget = 9000/3 = 3000/round > its
# ~2.7k admitted); the metric isolates SCHEDULING cost under skew, not
# politeness-budget semantics.
CRAWL_SKEW = dict(
    n_urls=90_000, n_pages=3000, n_hosts=2, query_count=64, num_search_pages=8,
    host_budget=9000, rounds=2, validate_pixels=False,
)


def _force(df) -> None:
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    # builders may persist intermediates (text_langid_ngram's gram agg);
    # release them here so 4+ invocations per session don't accumulate
    # live cached copies (the unpersist is a no-op for other queries)
    pipeline_ops.release_persisted()


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


TENX_OPS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_langid_ngram",
    "text_fingerprint",
    "dedup_embedding_lsh",
    "ann_bruteforce_topk",
    # iterative: pairs + O(log n)-round component contraction; the tenx
    # corpus makes components BIGGER (10 near-dup replicas x 3 chained
    # generations link into one cluster), so this also stresses round count
    "dedup_cluster_components",
    # round 5: corpus-frequency join-back (boilerplate lines repeat 10x
    # harder in the replica corpus) and the eval-gram broadcast join
    "dedup_boilerplate_lines",
    "bench_contamination",
    # round 5 late adds: the shingle-frequency + interval-merge span pass
    # (duplicate spans repeat 10x harder across replicas) and the
    # broadcast-LM perplexity scorer (gram explode is the linear part;
    # the model table stays bounded by the trigram space)
    "dedup_duplicate_spans",
    "text_perplexity_bucket",
]


def _build_tenx_corpus(spark, sf_dir: str, out_dir: str, factor: int = 10) -> None:
    """Materialize a ``factor``x replica corpus of the documents and
    embeddings tables: replica r offsets ids by r*10^7 and perturbs text
    (a replica-tag token appended) so replicas are near- but not
    exact-duplicates — the same construction as BASELINE.md's round-3 10x
    table, now driver-reproducible."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    big_docs = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(10_000_000))
        .withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("__rep")))
            ),
        )
        .drop("__rep")
    )
    big_docs.repartition(DEFAULT_CPUS).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    big_emb = (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(10_000_000))
        .drop("__rep")
    )
    big_emb.repartition(DEFAULT_CPUS).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    hw_before = hw_mops()
    spark = get_spark(app_name="bench", master=f"local[{DEFAULT_CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # shuffle partitions = cores for the sf0.1 suite: one task wave per
    # shuffle. The 3x-cores default exists for skewed/straggler-prone
    # stages; at this data volume the extra tasks are pure scheduling
    # overhead (measured: whole suite 9.0s at 32 vs 10.5s at 96). On a
    # real cluster AQE's advisory partition sizing governs instead.
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))

    # COLD pass first: the full suite at sf_dir with nothing warmed —
    # session init, janino codegen, OS page cache all included. Recorded
    # as value_cold so round-over-round deltas can separate real plan work
    # from measurement hygiene (the warmed number below is the headline).
    cold_timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(REGISTRY[name].fn(spark, sf_dir))
        cold_timings[name] = round(time.perf_counter() - t0, 3)
    value_cold = round(sum(cold_timings.values()), 3)

    # JVM/codegen warmup at sf0.001: each headline plan shape compiles once
    # on trivial data so the timed runs measure query work, not
    # once-per-plan JVM costs. (After the cold pass this is near-free but
    # keeps the warmed methodology identical to round 3.)
    for name in HEADLINE:
        _force(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # 10x data-volume leg (BASELINE.md's scale-ratio table, now emitted by
    # the driver bench itself): replica-expanded documents/embeddings, the
    # eight heavy operators, same warmed methodology. Disable with
    # SPARK_GRAFT_SF10X=0.
    tenx: dict[str, object] = {}
    if os.environ.get("SPARK_GRAFT_SF10X", "1") != "0":
        # sf-dir reference timings for the TENX ops outside the headline
        # suite (warmed the same way) so every ratio has a denominator
        sf_timings = dict(timings)
        for name in TENX_OPS:
            if name not in sf_timings:
                _force(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))
                t0 = time.perf_counter()
                _force(REGISTRY[name].fn(spark, sf_dir))
                sf_timings[name] = round(time.perf_counter() - t0, 3)
        with tempfile.TemporaryDirectory() as tenx_dir:
            t0 = time.perf_counter()
            _build_tenx_corpus(spark, sf_dir, tenx_dir)
            build_secs = round(time.perf_counter() - t0, 3)
            tenx_timings: dict[str, float] = {}
            for name in TENX_OPS:
                t0 = time.perf_counter()
                _force(REGISTRY[name].fn(spark, tenx_dir))
                tenx_timings[name] = round(time.perf_counter() - t0, 3)
            tenx = {
                "factor": 10,
                "build_secs": build_secs,
                "sf_queries": {n: sf_timings[n] for n in TENX_OPS if n in sf_timings},
                "queries": tenx_timings,
                "ratio_vs_sf": {
                    n: round(tenx_timings[n] / sf_timings[n], 2)
                    for n in TENX_OPS
                    if sf_timings.get(n, 0) > 0
                },
            }

    # crawl-engine throughput (north metric: URLs/sec through
    # frontier-scheduling + fetch under politeness budget). hw_mops is
    # sampled IMMEDIATELY around the crawl so the capacity window is
    # attributable to this phase, not the whole bench.
    from webcrawl_lowres_lang_spark.streaming.crawler import CrawlConfig, CrawlEngine

    hw_crawl_before = hw_mops()
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        eng = CrawlEngine(spark, CrawlConfig(**CRAWL_BENCH), td)
        eng.run()
        crawl_secs = time.perf_counter() - t0
        fetched = eng.ledger_df().count()
        seen_total = eng.seen.count()
    hw_crawl_after = hw_mops()

    # skew-stress crawl: same volume, ~50% of URLs on one domain
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        eng_skew = CrawlEngine(spark, CrawlConfig(**CRAWL_SKEW), td)
        eng_skew.run()
        skew_secs = time.perf_counter() - t0
        led = eng_skew.ledger_df()
        skew_fetched = led.count()
        top = (
            led.groupBy("domain").count().orderBy("count", ascending=False).first()
        )
        top_share = round(top["count"] / max(skew_fetched, 1), 3) if top else 0.0
    hw_skew_after = hw_mops()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline-suite-seconds",
        "value": total,
        "unit": "sec",
        "value_cold": value_cold,
        "queries": timings,
        "queries_cold": cold_timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": {
            "urls_fetched": fetched,
            "urls_seen": seen_total,
            "rounds": CRAWL_BENCH["rounds"],
            "secs": round(crawl_secs, 3),
            "urls_per_sec": round(fetched / crawl_secs, 2),
            # capacity window bracketing the crawl phase specifically
            "hw_mops": {"before": hw_crawl_before, "after": hw_crawl_after},
        },
        "crawl_skew": {
            "urls_fetched": skew_fetched,
            "top_domain_share": top_share,
            "secs": round(skew_secs, 3),
            "urls_per_sec": round(skew_fetched / skew_secs, 2),
            "hw_mops": {"before": hw_crawl_after, "after": hw_skew_after},
        },
        "cpus": DEFAULT_CPUS,
        # contemporaneous pure-CPU capacity samples (sandbox VM drifts ~3x)
        "hw_mops": {"before": hw_before, "after": hw_mops()},
    }
    if tenx:
        out["tenx"] = tenx
    print(json.dumps(out))


if __name__ == "__main__":
    main()
