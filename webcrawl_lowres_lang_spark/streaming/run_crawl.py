"""CLI entry: run the crawl engine end-to-end on the synthetic web and
print per-round metrics + a sample of the fetch ledger.

    python -m webcrawl_lowres_lang_spark.streaming.run_crawl \
        [--rounds 3] [--urls 2000] [--pages 100] [--hosts 40] \
        [--budget 5] [--checkpoint DIR] [--resume]

On a cluster the same module runs via
``spark-submit --py-files webcrawl_lowres_lang_spark.zip -m ...`` with
``master`` taken from the environment.
"""

from __future__ import annotations

import argparse
import json
import tempfile

from ..session import get_spark
from .crawler import CrawlConfig, CrawlEngine


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--urls", type=int, default=2000)
    ap.add_argument("--pages", type=int, default=100)
    ap.add_argument("--hosts", type=int, default=40)
    ap.add_argument("--budget", type=int, default=5)
    ap.add_argument("--queries", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-validate", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="run-crawl")
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = args.checkpoint or tempfile.mkdtemp(prefix="crawl_ckpt_")

    if args.resume:
        eng = CrawlEngine.resume(spark, ckpt)
        eng.cfg.rounds = args.rounds
        eng.run(frontier=eng.resumed_frontier())
    else:
        cfg = CrawlConfig(
            seed=args.seed, n_urls=args.urls, n_pages=args.pages, n_hosts=args.hosts,
            query_count=args.queries, host_budget=args.budget, rounds=args.rounds,
            validate_pixels=not args.no_validate,
        )
        eng = CrawlEngine(spark, cfg, ckpt)
        eng.run()

    for m in eng.metrics:
        print(json.dumps(m))
    print(f"checkpoint: {eng.dir}")
    eng.ledger_df().orderBy("round", "fetch_seq").show(10, truncate=60)


if __name__ == "__main__":
    main()
