"""The evidence map (COVERAGE.md) must not rot: every backticked
query-style name it cites has to exist in the live REGISTRY. Round-4
review found eight stale names left behind by a registry consolidation —
this gate makes that class of drift a test failure."""

from __future__ import annotations

import re
from pathlib import Path

from webcrawl_lowres_lang_spark.plans import (  # noqa: F401  (populate REGISTRY)
    crawl_ops,
    pipeline_ops,
    relational,
)
from webcrawl_lowres_lang_spark.plans.registry import REGISTRY

# A token is a "query citation" when it follows the registry's naming
# families; other backticked identifiers (functions, columns, test names)
# are out of scope for this gate.
_QUERY_LIKE = re.compile(
    r"^(?:[sajwfce]\d+(?:_[a-z0-9]\w*)+|(?:dedup|ann|text|events|multimodal|u\d+|q\d+)_\w+"
    r"|crawl_round_smoke|search_connector_scalars)$"
)


def test_coverage_md_cites_only_live_registry_names():
    doc = Path(__file__).resolve().parents[1] / "COVERAGE.md"
    tokens = set(re.findall(r"`([a-z][a-z0-9_]+)`", doc.read_text()))
    cited = {t for t in tokens if _QUERY_LIKE.match(t)}
    assert cited, "COVERAGE.md lost its query citations entirely?"
    stale = sorted(cited - set(REGISTRY))
    assert not stale, f"COVERAGE.md cites names missing from REGISTRY: {stale}"
