"""spark-submit CLI surface (streaming/run_crawl.py): flags mirror
CrawlConfig, a run emits per-round metrics JSON + a summary line, and
--resume continues from the newest snapshot."""

from __future__ import annotations

import json

from webcrawl_lowres_lang_spark.streaming.crawler import CrawlConfig
from webcrawl_lowres_lang_spark.streaming.run_crawl import build_parser, main


def test_parser_defaults_mirror_config():
    args = build_parser().parse_args(["--checkpoint", "/tmp/x"])
    cfg = CrawlConfig()
    import dataclasses

    for f in dataclasses.fields(CrawlConfig):
        assert getattr(args, f.name) == getattr(cfg, f.name), f.name


def test_cli_run_and_resume(spark, tmp_path, capsys):
    ck = str(tmp_path / "ck_cli")
    base = [
        "--checkpoint", ck, "--rounds", "1", "--n-urls", "600",
        "--n-pages", "60", "--n-hosts", "20", "--validate-pixels", "false",
    ]
    assert main(base) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]["summary"]
    assert summary["rounds"] == 1 and summary["urls_fetched"] > 0
    rounds = [x for x in lines if "round" in x]
    assert len(rounds) == 1 and rounds[0]["round"] == 0
    # resume one extra round from the snapshot
    assert main(["--checkpoint", ck, "--resume", "--extra-rounds", "1"]) == 0
    lines2 = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    s2 = lines2[-1]["summary"]
    assert s2["rounds"] == 2
    assert s2["urls_fetched"] >= summary["urls_fetched"]
    assert s2["urls_seen"] >= summary["urls_seen"]
