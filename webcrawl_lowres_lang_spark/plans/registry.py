"""Central registry mapping query names -> (spark plan, oracle SQL).

Every operator claimed done in SURVEY.md §2 registers here; the driver's
__spark_entry__.queries()/oracle_sql() are thin views over this registry.

Conventions (driver correctness-gate contract):
- every computed column is aliased identically in the DataFrame plan and
  the oracle SQL (the driver hashes values after sorting columns by name);
- LIMIT/top-k queries always carry a total, deterministic tie-break order;
- float aggregates are rounded to a fixed scale on BOTH sides so the
  value-hash is insensitive to summation order.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_PKG_NAME = "webcrawl_lowres_lang_spark"
_SHIPPED: set[int] = set()


def ensure_executors_can_import(spark: SparkSession) -> None:
    """Ship the package to executors via addPyFile (idempotent per context).

    The driver may create its SparkSession from any cwd; python workers
    only see the package when it is on their sys.path. This is the
    runtime equivalent of `spark-submit --py-files` and costs one zip
    upload per SparkContext.
    """
    sc = spark.sparkContext
    key = id(sc._jsc)
    if key in _SHIPPED:
        return
    zpath = os.path.join(tempfile.gettempdir(), f"{_PKG_NAME}_pyfiles.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for dirpath, _, files in os.walk(os.path.join(_PKG_ROOT, _PKG_NAME)):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, _PKG_ROOT))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    survey_ref: str = ""  # operator ids from SURVEY.md §2, e.g. "J1,A6"
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ref: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_executors_can_import(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, survey_ref=survey_ref, tags=tags
        )
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver-provided parquet table.

    Plain ``spark.read.parquet`` keeps Catalyst's pushdown/pruning path:
    filters land in ``PushedFilters`` and projections in ``ReadSchema``.
    """
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
