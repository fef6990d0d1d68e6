"""Lexicon bootstrap loop (SURVEY T2; reference entry
``lrl-regenerate-dict.py`` → ``extract.extract_database_downloaded``,
``extract.py:187-239``, and the DH2025 Tongan phase experiment).

phase(n): crawl with lexicon v(n) → keep captions whose relevance clears
the detector threshold → tokenize (reference filter: len>=3, no digits,
``extract.py:65-70``) → count (A10) → merge-sum into lexicon v(n) (A11,
``fileutils.py:89-96``) or replace → lexicon v(n+1) regenerates the next
phase's queries. Lexicon snapshots are versioned per phase (Iceberg
snapshot analog: one parquet dir per version).

Tokenization runs the SAME Python kernel as the relevance scorer
(operators/scoring.tokenize) inside an Arrow-batched pandas UDF — the
regex-unicode-parity risk (SURVEY §4: Java vs Python ``\\w``) is avoided
by never re-implementing the tokenizer in Java regex.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import ArrayType, StringType

from ..operators.scoring import tokenize
from ..sources.tablestore import overwrite_table, read_table


def tokenize_udf():
    @F.pandas_udf(ArrayType(StringType()))
    def tok(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: tokenize(t or ""))

    return tok


def extract_lexicon_from_ledger(
    ledger: DataFrame, relevance_threshold: float = 0.05
) -> DataFrame:
    """Captions of accepted fetches that clear the detector threshold ->
    (term, freq). Reference analog: keep paragraphs matching the chosen
    detector then Counter() them (extract.py:150-184, 208-213)."""
    kept = ledger.filter(
        (F.col("status") == 200)
        & F.col("caption").isNotNull()
        & (F.col("caption_score") >= relevance_threshold)
    ).select("caption")
    return (
        kept.select(F.explode(tokenize_udf()(F.col("caption"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )


def merge_lexicons(core: DataFrame, topup: DataFrame) -> DataFrame:
    """A11 merge-sum (fileutils.py:89-96): union + groupBy sum."""
    return (
        core.unionByName(topup)
        .groupBy("term")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )


class LexiconStore:
    """Versioned lexicon snapshots: one parquet dir per phase (Iceberg
    snapshot stand-in; reference: dicts/unigram_words_<lang>.json rewritten
    per phase)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def write(self, version: int, lexicon: DataFrame) -> None:
        overwrite_table(lexicon, os.path.join(self.path, f"v{version}"))

    def read(self, version: int) -> DataFrame:
        return read_table(self.spark, os.path.join(self.path, f"v{version}"))

    def versions(self) -> list[int]:
        return sorted(
            int(n[1:]) for n in os.listdir(self.path) if n.startswith("v") and n[1:].isdigit()
        )


def run_bootstrap_phases(
    spark: SparkSession,
    make_engine,
    store: LexiconStore,
    base_lexicon_rows: list[tuple[str, int]],
    phases: int = 2,
    mode: str = "merge",
    relevance_threshold: float = 0.05,
) -> list[dict]:
    """Outer bootstrap loop. ``make_engine(lex_rows, phase)`` builds a
    CrawlEngine seeded with the given lexicon (queries regenerate per
    phase, reference: DH2025-TONGAN-EXPT-PHASE02-GENURLS.sh). Returns
    per-phase metrics incl. lexicon size growth (A17)."""
    lex_rows = list(base_lexicon_rows)
    store.write(0, spark.createDataFrame(lex_rows, "term string, freq long"))
    out = []
    for phase in range(1, phases + 1):
        eng = make_engine(lex_rows, phase)
        eng.run()
        extracted = extract_lexicon_from_ledger(eng.ledger_df(), relevance_threshold)
        core = store.read(phase - 1)
        new_lex = merge_lexicons(core, extracted) if mode == "merge" else extracted
        store.write(phase, new_lex)
        rows = sorted(
            (r["term"], int(r["freq"])) for r in store.read(phase).collect()
        )
        out.append(
            {
                "phase": phase,
                "lexicon_terms": len(rows),
                "fetched": eng.ledger_df().count(),
                "extracted_terms": extracted.count(),
            }
        )
        lex_rows = rows
    return out
