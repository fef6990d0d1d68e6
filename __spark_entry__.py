"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are thin views over the engine's plan
registry (webcrawl_lowres_lang_spark/plans); every operator claimed done in
SURVEY.md §2 has a registry entry with a DuckDB oracle where the semantics
are ANSI-SQL-expressible (non-SQL ops register with oracle=None and get the
driver's rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the plan modules populates the registry. ORDER MATTERS for
# evidence: the driver's correctness report covers the first 50 entries of
# queries(), so the SURVEY-§2 core (relational 17 + crawl_ops 16 = 33
# slots) registers BEFORE the pipeline extensions — round 5 had
# pipeline_ops (31) first, which silently pushed 14 core queries
# (incl. crawl_round_smoke) out of the checked window.
# tests/test_coverage_doc.py pins the core set inside the first 50.
from webcrawl_lowres_lang_spark.plans import relational  # noqa: F401

try:  # optional modules appear as the build progresses
    from webcrawl_lowres_lang_spark.plans import crawl_ops  # noqa: F401
except ImportError:
    pass
try:
    from webcrawl_lowres_lang_spark.plans import pipeline_ops  # noqa: F401
except ImportError:
    pass

from webcrawl_lowres_lang_spark.plans.registry import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
