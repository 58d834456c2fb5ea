"""Host-graph PageRank (operators/graph.py): bounded relational rounds
with uniform dangling-mass redistribution, pinned against a Python
replica (same per-round 9-dp rounding)."""

from __future__ import annotations

import random
from decimal import ROUND_HALF_UP, Decimal

from amazon_textract_transformer_pipeline_spark.operators import graph


def _r9(x: float) -> float:
    """Spark-semantics round: HALF_UP on the shortest decimal repr
    (BigDecimal.valueOf path) — Python's round() is half-even and
    diverges one ulp on boundary values."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-9"),
                                           rounding=ROUND_HALF_UP))


def _py_pagerank(edges, n_iter=8, d=graph.DAMPING):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    n = float(len(nodes))
    outdeg = {v: 0 for v in nodes}
    for s, _ in e:
        outdeg[s] += 1
    r = {v: _r9(1.0 / n) for v in nodes}
    for _ in range(n_iter):
        dmass = sum(r[v] for v in nodes if outdeg[v] == 0)
        contrib = {v: 0.0 for v in nodes}
        for s, t in e:
            contrib[t] += r[s] / outdeg[s]
        r = {v: _r9((1.0 - d) / n + d * (contrib[v] + dmass / n))
             for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank
            for r in graph.pagerank(df, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    got = _run(spark, [(0, 1), (1, 0)])
    assert got == {0: 0.5, 1: 0.5}


def test_star_sink_accumulates_and_mass_is_conserved(spark):
    edges = [(i, 99) for i in range(5)]
    got = _run(spark, edges)
    want = _py_pagerank(edges)
    assert got == want
    assert got[99] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-6  # dangling mass recycled


def test_duplicate_edges_and_self_loops_deduped(spark):
    edges = [(0, 1), (0, 1), (1, 1), (1, 0)]
    got = _run(spark, edges)
    assert got == _py_pagerank(edges)


def test_random_graph_matches_replica(spark):
    rng = random.Random(23)
    edges = [(rng.randrange(40), rng.randrange(50)) for _ in range(150)]
    got = _run(spark, edges, n_iter=6)
    want = _py_pagerank(edges, n_iter=6)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) <= 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6
