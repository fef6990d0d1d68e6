#!/usr/bin/env python
"""Capture `.explain("formatted")` for registered queries into plans/<tag>/.

Usage:
  python capture_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "after") for
each named query, or for every query that already has a *_before.txt in
plans/<tag>/ when no names are given. Explain only PLANS the query (no
execution), so this is cheap; ops that train models during plan build
(IVF/Lloyd) do run those jobs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webcrawl_lowres_lang_spark.plans import crawl_ops, pipeline_ops, relational  # noqa: F401
from webcrawl_lowres_lang_spark.plans.registry import REGISTRY
from webcrawl_lowres_lang_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    names = sys.argv[3:]
    if not names:
        names = sorted(
            f[: -len("_before.txt")]
            for f in os.listdir(out_dir)
            if f.endswith("_before.txt")
        )
    spark = get_spark("capture-plans")
    for name in names:
        if name not in REGISTRY:
            print(f"skip (not registered): {name}")
            continue
        df = REGISTRY[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        pipeline_ops.release_persisted()
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
