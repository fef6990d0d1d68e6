#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission (north rule: "runs
via spark-submit --py-files on multi-executor clusters").

    python package.py                      # -> dist/webcrawl_lowres_lang_spark.zip
    spark-submit --py-files dist/webcrawl_lowres_lang_spark.zip \
        your_job.py    # e.g. a driver script calling streaming.run_crawl
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "webcrawl_lowres_lang_spark"


def main() -> str:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
