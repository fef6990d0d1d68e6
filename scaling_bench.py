#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule: ">=0.8 throughput
scaling efficiency from N to 4N executors"; sandbox substitute per
BASELINE.md: the same job at local[8] vs local[32] on identical input).

The measured job is the engine's hot path — frontier resolution →
priority admission → fetch (join + Arrow-batch decode + phash + sha256)
→ caption scoring — over a pre-seeded frontier, sized so compute dominates
fixed orchestration. Fixture generation + session warmup run before the
timer; both cluster sizes process byte-identical input (partition-invariant
generators).

Usage:
  python scaling_bench.py              # both sizes + efficiency JSON
  python scaling_bench.py --child N    # internal: one measured run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_URLS = int(os.environ.get("SCALING_N_URLS", "400000"))
N_PAGES = 400
N_HOSTS = 4000
SEED = 42


def throughput_job(cpus: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from webcrawl_lowres_lang_spark.operators.fetch import fetch_and_validate
    from webcrawl_lowres_lang_spark.operators.politeness import admit_per_domain, with_priority
    from webcrawl_lowres_lang_spark.operators.scoring import LexiconVector, relevance_udf
    from webcrawl_lowres_lang_spark.session import get_spark
    from webcrawl_lowres_lang_spark.sources import fixtures as fx
    from webcrawl_lowres_lang_spark.functions.urls import with_url_keys

    spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    lex_rows = fx.gen_lexicon_rows(SEED, 48)
    lex = LexiconVector(dict(lex_rows))
    words = [t for t, _ in lex_rows]
    links = fx.gen_link_graph(spark, SEED, N_URLS, N_HOSTS, N_PAGES)
    pages = fx.gen_pages(spark, SEED, N_PAGES, words).cache()
    robots = fx.gen_robots(spark, SEED, N_HOSTS).cache()
    pages.count(), robots.count()  # materialize fixtures before the timer
    score_udf = relevance_udf(spark, lex)

    # frontier = every graph URL, resolved exactly like the crawl loop
    frontier = links.select("url_id", "url", "robots_disallow").withColumn(
        "depth", F.lit(0)
    ).withColumn("relevance", F.lit(0.0))
    frontier = with_url_keys(frontier).filter(F.col("url_canon").isNotNull())
    # tiny warmup pass compiles all codegen + starts python workers
    warm = frontier.limit(2000)
    fetch_and_validate(
        with_priority(warm), links, pages, SEED, validate_pixels=False
    ).count()

    t0 = time.perf_counter()
    p = with_priority(frontier)
    admitted, _ = admit_per_domain(p, robots, base_budget=10**9)
    ledger = fetch_and_validate(admitted, links, pages, SEED, validate_pixels=False)
    ledger = ledger.withColumn(
        "caption_score",
        F.when(F.col("caption").isNotNull(), score_udf(F.col("caption"))).otherwise(F.lit(0.0)),
    )
    n = ledger.count()
    secs = time.perf_counter() - t0
    return {"cpus": cpus, "urls": n, "secs": round(secs, 2), "urls_per_sec": round(n / secs, 1)}


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        print("RESULT " + json.dumps(throughput_job(int(sys.argv[2]))))
        return

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
            capture_output=True, text=True, timeout=3000,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
            raise SystemExit(f"child local[{cpus}] failed")
        results[cpus] = json.loads(line[-1][len("RESULT "):])

    thr8, thr32 = results[8]["urls_per_sec"], results[32]["urls_per_sec"]
    eff = (thr32 / thr8) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling-efficiency-Nto4N",
                "value": round(eff, 3),
                "unit": "ratio",
                "local8": results[8],
                "local32": results[32],
                "speedup": round(thr32 / thr8, 2),
                "n_urls": N_URLS,
            }
        )
    )


if __name__ == "__main__":
    main()
