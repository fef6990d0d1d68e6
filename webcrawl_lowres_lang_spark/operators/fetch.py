"""Fetch stage: resolve admitted frontier rows against the synthetic web
(link graph -> status, content store -> image+caption), then decode and
validate pixels in Arrow batches.

Reference semantics re-expressed: HTTP GET + status check
(``lrl-crawler.py:185-189``), content sniffing (``:192-206``), SHA-256 of
the body (``:231-233``), rejection flags (``:382-386``). The network is
replaced by a deterministic join — which is exactly how a production
Spark fetcher is shaped too: fetch workers write (url, bytes) pages to a
store; downstream stages JOIN on content id instead of re-fetching.

Scale shape:
- links/pages joins are shuffle hash joins on url_id/image_id (both sides
  big at 10^10); candidates arrive already bounded by the politeness
  budget, so the probe side is one round's admissions, not the frontier.
- decode+validate is ``mapInPandas`` — one Python invocation per Arrow
  batch, numpy inside; per-row cost is dominated by zlib, not Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.imaging import decode_image, phash64, psnr, render_image

FETCH_RESULT_COLS = (
    "url_id long, url_canon string, url_hash long, domain string, depth int, "
    "relevance double, priority double, status int, image_id string, "
    "fmt string, caption string, phash long, phash_ok boolean, psnr_db double, "
    "file_sha256 string, w int, h int"
)


def fetch_and_validate(
    admitted: DataFrame,
    links: DataFrame,
    pages: DataFrame,
    seed: int,
    validate_pixels: bool = True,
) -> DataFrame:
    """Admitted frontier rows -> fetch ledger rows.

    status: 200 fetched+decoded; 404/429 recorded as failures (no body);
    phash_ok: recomputed-phash == stored phash; psnr_db vs the reference
    renderer (inf for lossless) — the per-row invariant gate.
    """
    cand = admitted.select(
        "url_id", "url_canon", "url_hash", "domain", "depth", "relevance", "priority"
    )
    l = links.select("url_id", "status", "image_id")
    joined = cand.join(l, "url_id", "left")
    # NOTE: the stored phash deliberately does NOT enter the Arrow batch —
    # a nullable int64 converts to float64 in pandas and silently corrupts
    # 64-bit hashes; the phash_ok comparison happens JVM-side afterwards.
    p = pages.select("image_id", "bytes", "w", "h", "fmt", "caption")
    joined = joined.join(p, "image_id", "left")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            out = []
            for row in b.itertuples(index=False):
                status = int(row.status) if pd.notna(row.status) else 404
                rec = {
                    "url_id": int(row.url_id),
                    "url_canon": row.url_canon,
                    "url_hash": int(row.url_hash),
                    "domain": row.domain,
                    "depth": int(row.depth),
                    "relevance": float(row.relevance),
                    "priority": float(row.priority),
                    "status": status,
                    "image_id": None,
                    "fmt": None,
                    "caption": None,
                    "phash": None,
                    "phash_ok": None,
                    "psnr_db": None,
                    "file_sha256": None,
                    "w": None,
                    "h": None,
                }
                if status == 200 and row.image_id is not None and row.bytes is not None:
                    data = bytes(row.bytes)
                    img = decode_image(data, row.fmt)
                    ph = phash64(img)
                    rec.update(
                        image_id=row.image_id,
                        fmt=row.fmt,
                        caption=row.caption,
                        phash=int(ph),
                        file_sha256=hashlib.sha256(data).hexdigest(),
                        w=int(row.w),
                        h=int(row.h),
                    )
                    if validate_pixels:
                        # per-row invariant vs the reference oracle: the
                        # renderer is the ground truth; lossless must be
                        # exact (inf), lossy >= 40 dB (input_hint)
                        k = int(row.image_id.split("-")[1])
                        base_k = k - 1 if (k % 50 == 1 and k > 0) else k
                        expected = render_image(seed, f"img-{base_k:08d}", int(row.w), int(row.h))
                        if k % 50 == 1 and k > 0:
                            import numpy as np

                            expected = expected.copy()
                            expected[:3, :3] = np.clip(
                                expected[:3, :3].astype(np.int32) + 2, 0, 255
                            ).astype(np.uint8)
                        rec["psnr_db"] = float(psnr(expected, img))
                out.append(rec)
            pdf = pd.DataFrame(out)
            if len(pdf):
                # a nullable int64 column materializes as float64 and
                # corrupts 64-bit hashes — force pandas' nullable Int64
                pdf["phash"] = pd.array([r["phash"] for r in out], dtype="Int64")
            yield pdf

    result = joined.mapInPandas(process, FETCH_RESULT_COLS)
    stored = pages.select(
        F.col("image_id"), F.col("phash").alias("__stored_phash")
    )
    return (
        result.join(stored, "image_id", "left")
        .withColumn(
            "phash_ok",
            F.when(F.col("phash").isNull(), F.lit(None).cast("boolean")).otherwise(
                F.col("phash") == F.col("__stored_phash")
            ),
        )
        .drop("__stored_phash")
    )


def sniff_reject(df: DataFrame) -> DataFrame:
    """S14/S16: unknown format -> rejected flag column (no file moves)."""
    known = F.col("fmt").isin("png", "jpeg")
    return df.withColumn(
        "rejected",
        F.when(F.col("status") != 200, F.lit(True)).otherwise(~F.coalesce(known, F.lit(False))),
    )
