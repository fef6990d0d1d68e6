#!/usr/bin/env python
"""Diagnostic / isolation benchmarks (guide §1.4): noop-sink per-query
timing with JVM GC + heap + pure-CPU capacity telemetry interleaved, so
in-session degradation (heap growth, GC stalls, cleaner backlog) can be
separated from shared-host capacity drift. NOT the driver contract —
bench.py stays the frozen measurement; numbers from here are cited in
OPTIMIZATION_r06.md as isolation evidence.

Usage:
  python bench_extra.py passes [N]     # N repeated headline passes
  python bench_extra.py one <query> [sf_dir]   # single query, fresh session
"""

from __future__ import annotations

import json
import os
import sys
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


def _force(spark, df) -> None:
    df.write.format("noop").mode("overwrite").save()
    pipeline_ops.release_persisted()


def jvm_stats(spark) -> dict:
    """Driver-JVM heap + cumulative GC counters via JMX beans."""
    jvm = spark._jvm
    rt = jvm.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / 1e9
    total = rt.totalMemory() / 1e9
    gc_count, gc_ms = 0, 0
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    for i in range(beans.size()):
        b = beans.get(i)
        gc_count += b.getCollectionCount()
        gc_ms += b.getCollectionTime()
    return {"heap_used_gb": round(used, 2), "heap_total_gb": round(total, 2),
            "gc_count": int(gc_count), "gc_ms": int(gc_ms)}


def _burn(_: int) -> int:
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < 0.5:
        x += 1
    return x


def hw_mops() -> float:
    import multiprocessing as mp

    with mp.Pool(DEFAULT_CPUS) as p:
        total = sum(p.map(_burn, range(DEFAULT_CPUS)))
    return round(total / 5e5, 1)


def passes(n: int = 4) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_extra", master=f"local[{DEFAULT_CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    out = []
    for p in range(n):
        hw = hw_mops()
        row: dict = {"pass": p, "hw_mops": hw, "jvm_before": jvm_stats(spark)}
        timings = {}
        for name in HEADLINE:
            spark.sparkContext.setJobDescription(f"pass{p}:{name}")
            t0 = time.perf_counter()
            _force(spark, REGISTRY[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        row["queries"] = timings
        row["total"] = round(sum(timings.values()), 3)
        row["jvm_after"] = jvm_stats(spark)
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": [r["total"] for r in out]}))


def one(name: str, sf_dir: str | None = None) -> None:
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_extra", master=f"local[{DEFAULT_CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    # codegen warmup on sf0.001, then 3 timed runs
    _force(spark, REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))
    for i in range(3):
        t0 = time.perf_counter()
        _force(spark, REGISTRY[name].fn(spark, sf_dir))
        print(json.dumps({"run": i, "secs": round(time.perf_counter() - t0, 3),
                          "jvm": jvm_stats(spark), "hw_mops": hw_mops()}), flush=True)




def crawl_profile() -> None:
    """Run the CRAWL_BENCH leg standalone with the UI enabled, then dump
    per-job wall durations from the status REST API — the per-phase cost
    breakdown of one crawl round (guide §7.1)."""
    import tempfile
    import urllib.request

    from webcrawl_lowres_lang_spark.streaming.crawler import CrawlConfig, CrawlEngine

    spark = get_spark(
        app_name="crawl_profile",
        master=f"local[{DEFAULT_CPUS}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4455"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    cfg = dict(
        n_urls=30_000, n_pages=300, n_hosts=1500, query_count=24, num_search_pages=4,
        host_budget=16, rounds=2, validate_pixels=False,
    )
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        eng = CrawlEngine(spark, CrawlConfig(**cfg), td)
        eng.run()
        secs = time.perf_counter() - t0
        fetched = eng.ledger_df().count()
    print(json.dumps({"secs": round(secs, 2), "fetched": fetched,
                      "urls_per_sec": round(fetched / secs, 2), "hw": hw_mops()}))
    pw = sorted(getattr(eng, "phase_wall", []), key=lambda x: x[1])
    for (ph, t), (_, t2) in zip(pw, pw[1:] + [("end", time.monotonic())]):
        if t2 - t > 0.3:
            print(json.dumps({"wall_phase": ph, "secs": round(t2 - t, 2)}))
    app_id = spark.sparkContext.applicationId
    jobs = json.load(urllib.request.urlopen(
        f"http://localhost:4455/api/v1/applications/{app_id}/jobs?status=succeeded"))
    from collections import defaultdict
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    by_phase: dict[str, list[float]] = defaultdict(list)
    spans: dict[str, list] = {}
    for j in jobs:
        sub = datetime.strptime(j["submissionTime"], fmt)
        comp = datetime.strptime(j["completionTime"], fmt)
        dur = (comp - sub).total_seconds()
        desc = j.get("description") or j.get("name", "?")[:40]
        by_phase[desc].append(dur)
        sp = spans.setdefault(desc, [sub, comp])
        sp[0] = min(sp[0], sub)
        sp[1] = max(sp[1], comp)
    for desc in sorted(by_phase, key=lambda d: spans[d][0]):
        durs = by_phase[desc]
        wall = (spans[desc][1] - spans[desc][0]).total_seconds()
        print(json.dumps({"phase": desc, "n_jobs": len(durs),
                          "job_secs": round(sum(durs), 2), "wall_span": round(wall, 2)}))
    total_jobs = sum(len(v) for v in by_phase.values())
    print(json.dumps({"n_jobs": total_jobs,
                      "sum_job_secs": round(sum(sum(v) for v in by_phase.values()), 2)}))


def qprof() -> None:
    """Stage-level profile of one query on the 10x corpus (or sf_dir):
    run with UI on, dump per-stage duration/tasks/shuffle from REST."""
    import tempfile
    import urllib.request

    from bench import _build_tenx_corpus

    name = sys.argv[2]
    use_tenx = len(sys.argv) > 3 and sys.argv[3] == "tenx"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="qprof", master=f"local[{DEFAULT_CPUS}]",
                      extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4456"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    with tempfile.TemporaryDirectory() as td:
        if use_tenx:
            _build_tenx_corpus(spark, sf_dir, td)
            target = td
        else:
            target = sf_dir
        _force(spark, REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))
        app_id = spark.sparkContext.applicationId
        base = f"http://localhost:4456/api/v1/applications/{app_id}"
        n_before = len(json.load(urllib.request.urlopen(f"{base}/stages")))
        t0 = time.perf_counter()
        _force(spark, REGISTRY[name].fn(spark, target))
        print(json.dumps({"op": name, "secs": round(time.perf_counter() - t0, 3),
                          "hw": hw_mops()}), flush=True)
        stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
        rows = []
        for st in stages:
            rows.append((st["stageId"], round(st.get("executorRunTime", 0) / 1000, 1),
                         st.get("numCompleteTasks"),
                         round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
                         round(st.get("shuffleReadBytes", 0) / 1e6, 1),
                         (st.get("description") or st.get("name", ""))[:60]))
        rows.sort()
        for r in rows:
            if r[0] >= 0 and r[1] > 0.3:
                print(json.dumps({"stage": r[0], "exec_run_s": r[1], "tasks": r[2],
                                  "shufW_MB": r[3], "shufR_MB": r[4], "name": r[5]}))


def tenx() -> None:
    """Replicate bench.py's tenx leg: build the 10x replica corpus, run
    the TENX ops warmed, print per-op timings + hw samples."""
    import tempfile

    from bench import TENX_OPS, _build_tenx_corpus

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_extra_tenx", master=f"local[{DEFAULT_CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    with tempfile.TemporaryDirectory() as tenx_dir:
        t0 = time.perf_counter()
        _build_tenx_corpus(spark, sf_dir, tenx_dir)
        print(json.dumps({"build_secs": round(time.perf_counter() - t0, 2), "hw": hw_mops()}), flush=True)
        for name in TENX_OPS:
            _force(spark, REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))  # warm plan
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"tenx:{name}")
            _force(spark, REGISTRY[name].fn(spark, tenx_dir))
            print(json.dumps({"op": name, "tenx_secs": round(time.perf_counter() - t0, 3)}), flush=True)
        print(json.dumps({"hw_after": hw_mops()}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "passes"
    if mode == "passes":
        passes(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif mode == "one":
        one(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    elif mode == "crawl":
        crawl_profile()
    elif mode == "tenx":
        tenx()
    elif mode == "qprof":
        qprof()
