"""connected_components / keep_canonical (operators/groups.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from spider_man_spark.operators.groups import (
    connected_components,
    dup_groups_from_pairs,
    keep_canonical,
)


def _union_find(n_ids, pairs):
    """Driver-side oracle: min-id component label per id."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label = min id in component (roots are
    # always the min because we always parent max under min)
    return {i: find(i) for i in n_ids}


def test_cc_doubling_chains(spark):
    """id -> 2*id chains: components are {odd * 2^k}, max depth ~8 —
    exercises the log-round transitive closure, not just pair merging."""
    ids = list(range(1, 300))
    pairs = [(i, 2 * i) for i in ids if 2 * i < 300]
    edges = spark.createDataFrame(pairs, "a long, b long")
    got = {
        r.id: r.group_id for r in connected_components(edges).collect()
    }
    want = _union_find(set(x for p in pairs for x in p), pairs)
    assert got == want
    # every component label is the odd generator of its chain
    assert all(v % 2 == 1 for v in got.values())


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    ids = list(range(2000))
    pairs = [
        (rng.randrange(2000), rng.randrange(2000)) for _ in range(1500)
    ]
    pairs = [p for p in pairs if p[0] != p[1]]
    edges = spark.createDataFrame(pairs, "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r.id: r.group_id
        for r in connected_components(edges, nodes=nodes).collect()
    }
    want = _union_find(set(ids), pairs)
    assert got == want
    # singletons present and self-labeled
    endpoints = set(x for p in pairs for x in p)
    lonely = set(ids) - endpoints
    assert lonely and all(got[i] == i for i in lonely)


def test_cc_string_ids_and_dup_pairs_alias(spark):
    pairs = spark.createDataFrame(
        [("u2", "u1"), ("u3", "u2"), ("u9", "u8"), ("u1", "u1")],
        "id_a string, id_b string",
    )
    got = {
        r.id: r.group_id for r in dup_groups_from_pairs(pairs).collect()
    }
    assert got == {
        "u1": "u1", "u2": "u1", "u3": "u1", "u8": "u8", "u9": "u8"
    }


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "a long, b long")
    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    got = {
        r.id: r.group_id
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 2}
    assert connected_components(edges).count() == 0


def test_keep_canonical_default_and_prefer(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (7, 1)],
        "doc_id long, n_chars long",
    )
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, group_id long"
    )
    # default: min doc_id wins; ungrouped row 7 survives as its own group
    kept = keep_canonical(docs, groups)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 7]
    # prefer longest doc, min-id tiebreak
    kept2 = keep_canonical(
        docs, groups,
        prefer=F.struct(
            (-F.col("n_chars")).alias("a"), F.col("doc_id").alias("b")
        ),
    )
    assert sorted(r.doc_id for r in kept2.collect()) == [2, 7]


def test_cc_hub_component_single_round(spark):
    """A 1->N star (the hot dup-cluster shape) must not need many
    rounds or concentrate rows: converges and labels all to the hub
    min."""
    pairs = [(0, i) for i in range(1, 500)]
    edges = spark.createDataFrame(pairs, "a long, b long")
    got = connected_components(edges)
    assert got.filter(F.col("group_id") != 0).count() == 0
    assert got.count() == 500


def test_dedupe_near_transitive_chain(spark):
    """dedupe_near folds a revision chain a~b~c into ONE kept doc even
    when (a, c) alone falls below the pair threshold — the grouping is
    the transitive closure, not pair-local."""
    from spider_man_spark.operators.textdedup import dedupe_near

    base = [f"w{i}" for i in range(100)]
    rev1 = list(base); rev1[10] = "xchanged"
    rev2 = list(rev1); rev2[50] = "ychanged"
    rows = [
        (1, " ".join(base)),
        (2, " ".join(rev1)),
        (3, " ".join(rev2)),
        (4, " ".join(f"q{i}" for i in range(100))),  # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats: dict = {}
    kept = dedupe_near(docs, threshold=0.85, cc_stats=stats)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4]
    assert stats["rounds"] >= 1 and stats["edges"] == 2
