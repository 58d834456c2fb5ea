"""SemDedup (operators/dedup.py:semantic_dedup): clustered embedding-cosine
deduplication — Abbas et al. 2023 semantics pinned against a brute-force
Python replica (same rounding, same tie-breaks)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators import dedup

SCHEMA = "vec_id long, embedding array<float>"


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA)


def _cos9(a, b):
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) * float(x) for x in a))
    nb = math.sqrt(sum(float(x) * float(x) for x in b))
    if na * nb == 0.0:
        return None
    return round(dot / (na * nb), 9)


def _py_semantic_dedup(rows, cents, threshold=0.95, max_cluster=10_000):
    """Brute-force replica of the pinned semantics."""
    vecs = dict(rows)
    assigned = {}
    for vid, v in rows:
        best = max(
            cents,
            key=lambda c: (
                -2.0 if _cos9(v, vecs[c]) is None else _cos9(v, vecs[c]),
                -c,
            ),
        )
        assigned[vid] = (best, _cos9(v, vecs[best]))
    clusters: dict[int, list[int]] = {}
    for vid, (cid, _) in assigned.items():
        clusters.setdefault(cid, []).append(vid)
    out = {}
    for cid, members in clusters.items():
        members.sort(key=lambda vid: (
            -2.0 if assigned[vid][1] is None else assigned[vid][1], vid))
        for rank0, vid in enumerate(members):
            dup_of = None
            for w in members[:min(rank0, max_cluster)]:
                c = _cos9(vecs[w], vecs[vid])
                if c is not None and c >= threshold:
                    dup_of = w
                    break
            out[vid] = (cid, assigned[vid][1], rank0 + 1, dup_of)
    return out


def _run(spark, rows, cents_ids=None, **kw):
    embs = _df(spark, rows)
    cents = None
    if cents_ids is not None:
        vecs = dict(rows)
        cents = spark.createDataFrame(
            [(c, [float(x) for x in vecs[c]]) for c in cents_ids],
            "cent_id long, centv array<float>")
    got = dedup.semantic_dedup(embs, centroids=cents, **kw)
    return {
        r.vec_id: (r.cluster_id, r.cent_cos, r.cluster_rank, r.dup_of,
                   r.is_dup, r.kept)
        for r in got.collect()
    }


def test_exact_copy_flagged_with_source_witness(spark):
    # one centroid at id 0; ids 1 and 2 are identical vectors -> both in
    # cluster 0, equal cent_cos, vec_id tie-break ranks 1 first; 2 flags
    # with witness 1. The centroid itself is not a dup (cos(0, 1) is low).
    rows = [(0, [1.0, 0.0]), (1, [0.1, 1.0]), (2, [0.1, 1.0])]
    got = _run(spark, rows, cents_ids=[0])
    assert got[2][3] == 1 and got[2][4] is True and got[2][5] is False
    assert got[1][3] is None and got[1][5] is True
    assert got[0][3] is None


def test_keeps_farthest_from_centroid(spark):
    # two near-identical vectors; the one with LOWER cosine-to-centroid
    # ranks first (the paper keeps the outlier) and becomes the witness,
    # regardless of id order.
    rows = [(0, [1.0, 0.0]),
            (5, [0.9, 0.1]),    # closer to centroid
            (9, [0.88, 0.16])]  # farther from centroid, cos(5,9) >= 0.95
    assert _cos9(rows[1][1], rows[2][1]) >= 0.95
    c5 = _cos9(rows[1][1], rows[0][1])
    c9 = _cos9(rows[2][1], rows[0][1])
    assert c9 < c5
    got = _run(spark, rows, cents_ids=[0])
    assert got[9][3] is None and got[9][5] is True   # farther: kept
    assert got[5][3] == 9 and got[5][4] is True      # nearer: dup of 9


def test_zero_norm_never_flags_and_lands_lowest_centroid(spark):
    rows = [(0, [1.0, 0.0]), (7, [0.0, 1.0]), (42, [0.0, 0.0])]
    got = _run(spark, rows, cents_ids=[7, 0])
    # NULL cosine everywhere -> deterministic lowest cent_id
    assert got[42][0] == 0 and got[42][1] is None
    assert got[42][3] is None and got[42][5] is True
    assert all(got[i][3] is None for i in (0, 7))


def test_max_cluster_caps_witness_set(spark):
    # three identical vectors; with max_cluster=1 only the rank-1 member
    # witnesses, so both later members point at it (never at each other)
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 1.0]),
            (3, [0.0, 1.0])]
    got = _run(spark, rows, cents_ids=[0], max_cluster=1)
    assert got[2][3] == 1 and got[3][3] == 1


def test_default_seed_centroids_modulo_rule(spark):
    # centroid_every=2 -> ids 0 and 2 are centroids; 1 and 3 identical ->
    # same cluster, later id flagged
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.5, 0.5]),
            (3, [0.0, 1.0])]
    got = _run(spark, rows, centroid_every=2)
    assert got[3][3] == 1 and got[1][3] is None


def test_random_corpus_matches_python_replica(spark):
    import numpy as np

    rng = random.Random(61)
    rows = []
    for i in range(80):
        v = [rng.gauss(0, 1) for _ in range(8)]
        # quantize through float32: the operator stores array<float>, so the
        # Python replica must fold the same float32-exact doubles
        rows.append((i, [float(np.float32(round(x, 3))) for x in v]))
    # plant copies + one zero vector to force dup structure
    rows += [(100 + i, rows[i][1]) for i in range(0, 30, 3)]
    rows.append((200, [0.0] * 8))
    cents = [i for i, _ in rows if i % 10 == 0]
    want = _py_semantic_dedup(rows, cents, threshold=0.9)
    got = _run(spark, rows, cents_ids=cents, threshold=0.9)
    assert set(got) == set(want)
    for vid, (cid, cc, rank, dup_of) in want.items():
        g = got[vid]
        assert g[0] == cid, (vid, g, want[vid])
        if cc is None:
            assert g[1] is None
        else:
            assert abs(g[1] - cc) < 1e-9
        assert g[2] == rank and g[3] == dup_of


def test_accepts_trained_kmeans_centroids(spark):
    # contract check: similarity.kmeans_centroids output (cent_id, centv)
    # plugs straight into semantic_dedup's centroids= argument
    from amazon_textract_transformer_pipeline_spark.operators import (
        similarity,
    )

    rows = [(i, [float((i % 7) + 1), float((i * 3) % 5)])
            for i in range(30)]
    rows += [(100 + i, rows[i][1]) for i in range(4)]  # planted copies
    embs = _df(spark, rows)
    cents = similarity.kmeans_centroids(embs, k=4, n_iter=2)
    got = {r.vec_id: r for r in dedup.semantic_dedup(
        embs, threshold=0.999, centroids=cents).collect()}
    assert len(got) == len(rows)
    # every planted copy is flagged against an earlier identical witness
    for i in range(4):
        r = got[100 + i]
        assert r.is_dup is True
        assert got[r.dup_of].cluster_id == r.cluster_id


def test_arrow_assignment_twin_matches_sql(spark):
    import numpy as np

    rng = random.Random(17)
    rows = []
    for i in range(60):
        v = [float(np.float32(round(rng.gauss(0, 1), 3))) for _ in range(8)]
        rows.append((i, v))
    rows += [(100 + i, rows[i][1]) for i in range(0, 20, 2)]
    rows.append((200, [0.0] * 8))          # zero-norm vector
    embs = _df(spark, rows)
    kw = dict(threshold=0.9, centroid_every=10)
    sql_out = {r.vec_id: (r.cluster_id, r.cent_cos, r.cluster_rank,
                          r.dup_of, r.is_dup)
               for r in dedup.semantic_dedup(embs, **kw).collect()}
    arw_out = {r.vec_id: (r.cluster_id, r.cent_cos, r.cluster_rank,
                          r.dup_of, r.is_dup)
               for r in dedup.semantic_dedup(embs, assign="arrow",
                                             **kw).collect()}
    assert sql_out == arw_out
