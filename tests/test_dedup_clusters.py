"""Near-dup cluster resolution (operators/dedup.py): distributed connected
components (alternating large-star/small-star) + canonical-keeper selection —
the step every published dedup pipeline runs after pair generation."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators import dedup


def _cc(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    if not edges:
        df = df.filter("a <> a")
    out = dedup.connected_components(df)
    return {r.node: r.component for r in out.collect()}


def _py_components(edges):
    """Union-find oracle."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_transitive_chain_resolves(spark):
    # planted chain 0-1-2-3-4 plus separate pair; transitivity must close
    got = _cc(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}


def test_orderings_cycles_and_self_loops(spark):
    # reversed pairs, a cycle, duplicate and self-loop edges
    got = _cc(spark, [(9, 2), (2, 5), (5, 9), (5, 9), (7, 7), (3, 8)])
    assert got == {2: 2, 5: 2, 9: 2, 3: 3, 8: 3}


def test_long_chain_beats_naive_propagation_bound(spark):
    # a 60-node chain converges inside the star algorithm's log-round
    # budget — naive 1-hop min propagation would need 60 rounds
    n = 60
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1


def test_random_graphs_match_union_find(spark):
    rng = random.Random(13)
    for trial in range(3):
        nodes = rng.randrange(20, 80)
        edges = [(rng.randrange(nodes), rng.randrange(nodes))
                 for _ in range(rng.randrange(10, 120))]
        edges = [e for e in edges if e[0] != e[1]]
        assert _cc(spark, edges) == _py_components(edges), (trial, edges)


def test_empty_pairs(spark):
    assert _cc(spark, []) == {}


def test_resolve_clusters_keeper_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, float(q)) for i, q in
         [(0, 1.0), (1, 9.0), (2, 3.0), (5, 2.0), (6, 2.0), (7, 0.5)]],
        "doc_id long, q double")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "a long, b long")
    out = {r.doc_id: r for r in
           dedup.resolve_near_dup_clusters(docs, pairs,
                                           quality_col="q").collect()}
    assert len(out) == 6
    # cluster {0,1,2}: keeper = doc 1 (best quality beats min id)
    for d in (0, 1, 2):
        assert out[d].cluster_id == 0 and out[d].cluster_size == 3
        assert out[d].keeper_id == 1
    assert out[1].is_keeper and not out[0].is_keeper
    # cluster {5,6}: equal quality → tie to min id
    assert out[5].keeper_id == 5 and out[5].cluster_size == 2
    assert out[6].cluster_id == 5 and not out[6].is_keeper
    # singleton keeps itself
    assert out[7].cluster_id == 7 and out[7].is_keeper \
        and out[7].cluster_size == 1


def test_resolve_clusters_min_id_keeper_without_quality(spark):
    docs = spark.createDataFrame([(3,), (4,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([(9, 4)], "a long, b long")
    out = {r.doc_id: r for r in
           dedup.resolve_near_dup_clusters(docs, pairs).collect()}
    assert out[4].keeper_id == 4 and out[9].keeper_id == 4
    assert out[3].is_keeper


def test_cluster_pipeline_on_near_identical_docs(spark):
    """End-to-end over text: four near-identical docs + two unrelated ones
    → LSH candidates → CC → one cluster, keeper = longest text."""
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "astronauts quietly measure forty two green bottles on the wall "
            "and every sentence here repeats across variants")
    rows = [(i, base + f" tail{i}" * i) for i in range(4)]
    rows += [(10, "completely different text about submarine engineering "
                  "with turbines valves reactors and sonar arrays galore"),
             (11, "unrelated recipe for sourdough bread flour water salt "
                  "yeast knead rest bake crust crumb hydration schedule")]
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("q", F.length("text").cast("double"))
    pairs = dedup.lsh_candidate_pairs(docs, k=16, n_bands=8)
    out = {r.doc_id: r for r in
           dedup.resolve_near_dup_clusters(docs, pairs,
                                           quality_col="q").collect()}
    assert out[0].cluster_id == 0 and out[0].cluster_size == 4
    assert all(out[i].cluster_id == 0 for i in range(4))
    assert out[0].keeper_id == 3          # longest variant wins
    assert out[10].cluster_size == 1 and out[11].cluster_size == 1
    # the deduplicated corpus = keepers only
    keep = dedup.resolve_near_dup_clusters(docs, pairs, quality_col="q") \
        .filter("is_keeper")
    assert keep.count() == 3
