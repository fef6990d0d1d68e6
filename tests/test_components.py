"""Connected-components (transitive dup clustering) tests.

The oracle gate (test_relational_oracle) already pins
``dedup_cluster_components`` against the DuckDB recursive-closure twin;
these tests pin the ``connected_components`` kernel itself: exact parity
with a sequential union-find on adversarial graph shapes, and the
transitivity property the operator exists for.
"""

from __future__ import annotations

import pytest

from webcrawl_lowres_lang_spark.plans.pipeline_ops import (
    _docs_with_chained_copies,
    _minhash_candidate_pairs,
    connected_components,
)

SF_DIR = "/root/testdata/sf0.001"


def _spark_labels(spark, edge_list):
    df = spark.createDataFrame(edge_list, "doc_a long, doc_b long")
    stars = connected_components(df)
    return {r["u"]: r["v"] for r in stars.collect()}


def _union_find_labels(edge_list):
    """Sequential reference: min doc_id per component, non-roots only."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent if find(x) != x}


def test_chain_collapses_transitively(spark):
    # 1-2-3-4 is a path: (1,4) never appears as an edge, yet all four
    # must share one cluster; {10,11} stays separate.
    labels = _spark_labels(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert labels == {2: 1, 3: 1, 4: 1, 11: 10}


def test_long_path_converges_within_log_rounds(spark):
    # a 64-node path is the worst case for label propagation (diameter
    # 63); the alternating-star algorithm must finish inside the default
    # max_iters or connected_components raises.
    path = [(i, i + 1) for i in range(63)]
    labels = _spark_labels(spark, path)
    assert set(labels.values()) == {0}
    assert set(labels) == set(range(1, 64))


def test_matches_union_find_on_modular_graph(spark):
    # deterministic pseudo-random graph: multi-component, with cycles,
    # bridges, and isolated pairs.
    edges = []
    for i in range(300):
        a, b = i % 97, (i * 31 + 7) % 211
        if a != b:
            edges.append((min(a, b), max(a, b)))
    expect = _union_find_labels(edges)
    assert _spark_labels(spark, edges) == expect


def test_cluster_query_links_non_candidate_pairs(spark):
    # the operator's reason to exist: same-cluster doc pairs that were
    # NEVER direct LSH candidates (linked only through an intermediate
    # generation). At sf0.001 the chained corpus yields ~22 such pairs.
    pairs = _minhash_candidate_pairs(_docs_with_chained_copies(spark, SF_DIR))
    pairs.cache()
    try:
        pset = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
        stars = connected_components(pairs)
        labels = {r["u"]: r["v"] for r in stars.collect()}
        for root in list(labels.values()):
            labels.setdefault(root, root)
        by_cluster: dict[int, list[int]] = {}
        for node, root in labels.items():
            by_cluster.setdefault(root, []).append(node)
        indirect = [
            (a, b)
            for members in by_cluster.values()
            for i, a in enumerate(sorted(members))
            for b in sorted(members)[i + 1 :]
            if (a, b) not in pset
        ]
        assert len(indirect) > 0, "corpus produced no transitive-only links"
    finally:
        pairs.unpersist()
