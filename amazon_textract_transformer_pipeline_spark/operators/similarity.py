"""Similarity search over an embedding column (ARRAY<FLOAT>).

* :func:`brute_force_topk` — exact cosine top-k: broadcast the (small) query
  side against the full corpus; one window per query. The correctness
  baseline and the right plan whenever |queries| ≪ |corpus|.
* :func:`lsh_topk` — the scale path: random-hyperplane (sign) LSH buckets
  both sides; top-k computed *within bucket* (plus multi-probe via several
  independent tables). Recall < 1 by construction; the baseline measures it.

Hyperplanes are pseudo-random ±1 vectors derived from the portable hash —
no stored model state, identical across engines/runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textsql as X


def cosine_col(a: str, b: str) -> F.Column:
    return F.expr(X.cosine(a, b, "spark"))


#: candidate-keep margin for Arrow-exact top-k selection: Spark's
#: round(·, 9) moves a double by ≤ 5e-10, so two raw cosines more than
#: 1e-9 apart can never swap order after rounding — keeping everything
#: within 1e-9 of the k-th best raw value guarantees the post-rounding
#: top-k is a subset of the kept rows, with the final pick made by
#: Spark's own round + window (no Python-side rounding semantics).
_ROUND9_MARGIN = 1e-9


def _fold_dot(mat, qmat):
    """(n, q) cosine numerators/denominators with the EXACT association
    order of textsql.cosine's Spark HOF fold (left-to-right double
    accumulation): per-dimension products rounded to double, then
    sequential adds — bit-identical to the relational path, unlike one
    numpy matmul (pairwise/FMA summation)."""
    import numpy as np

    n, d = mat.shape
    acc = np.zeros((n, qmat.shape[0]))
    for i in range(d):
        acc += mat[:, i:i + 1] * qmat[None, :, i]
    nrm = np.zeros(n)
    for i in range(d):
        nrm += mat[:, i] * mat[:, i]
    return acc, np.sqrt(nrm)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, topk: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query (query ≠ self).

    Round-7 optimization (guide §4.2): the O(N·Q) scoring runs as an
    Arrow kernel instead of a BroadcastNestedLoopJoin over interpreted
    HOF folds — the query matrix is collected (queries ≪ corpus, the
    same budget the broadcast paid) and each corpus batch computes all
    cosines with the exact fold association order (:func:`_fold_dot`),
    keeping per task only candidates within :data:`_ROUND9_MARGIN` of
    the k-th best raw score (any row dropped is provably outside the
    post-rounding top-k). The final round(·, 9) + per-query window runs
    in Spark on ~(tasks × Q × k) rows, so results are bit-identical to
    the relational form (kept as :func:`brute_force_topk_sql`,
    parity-tested) and to the DuckDB oracle.

    Zero-norm vectors keep the SQL path's NULL-cosine semantics: NULL
    rows sort after every scored row and are emitted per task capped at
    ``topk`` lowest cand_ids per query — exactly the rows that could
    still place in a top-k short of scored candidates.
    """
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    _schema_out = T.StructType([
        T.StructField("query_id", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("cand_id", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), True),
    ])
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return corpus.sparkSession.createDataFrame([], _schema_out)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    nq = len(qids)
    qnrm = np.zeros(nq)
    for i in range(qmat.shape[1]):
        qnrm += qmat[:, i] * qmat[:, i]
    qnrm = np.sqrt(qnrm)

    def run(batches):
        # per-query running keep-set across the task's batches
        vals = [np.empty(0) for _ in range(nq)]
        cids = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        null_ids = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        for b in batches:
            ids = b[id_col].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            mat = np.array(list(b[vec_col]), dtype=np.float64)
            dot, cnrm = _fold_dot(mat, qmat)
            denom = cnrm[:, None] * qnrm[None, :]  # qv is `a` in cosine(a, b)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / denom
            for j in range(nq):
                mask = ids != qids[j]
                v, c, dn = cos[mask, j], ids[mask], denom[mask, j]
                nullm = dn == 0.0
                if nullm.any():
                    nu = np.sort(np.concatenate([null_ids[j], c[nullm]]))
                    null_ids[j] = nu[:topk]
                    v, c = v[~nullm], c[~nullm]
                if len(v):
                    vals[j] = np.concatenate([vals[j], v])
                    cids[j] = np.concatenate([cids[j], c])
                if len(vals[j]) > topk:
                    kth = np.partition(vals[j], -topk)[-topk]
                    keep = vals[j] >= kth - _ROUND9_MARGIN
                    vals[j], cids[j] = vals[j][keep], cids[j][keep]
        out_q: list = []
        out_c: list = []
        out_v: list = []
        for j in range(nq):
            out_q.extend([qids[j]] * (len(vals[j]) + len(null_ids[j])))
            out_c.extend(cids[j].tolist() + null_ids[j].tolist())
            out_v.extend(vals[j].tolist() + [None] * len(null_ids[j]))
        if out_q:
            yield pd.DataFrame({"query_id": out_q, "cand_id": out_c,
                                "cos_raw": out_v})

    schema = T.StructType([
        T.StructField("query_id", T.LongType(), False),
        T.StructField("cand_id", T.LongType(), False),
        T.StructField("cos_raw", T.DoubleType(), True),
    ])
    partial = corpus.select(id_col, vec_col).mapInPandas(run, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc())
    return (
        partial.select("query_id", "cand_id",
                       F.round(F.col("cos_raw"), 9).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "cand_id", "cos")
    )


def brute_force_topk_sql(corpus: DataFrame, queries: DataFrame, topk: int = 5,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Relational (oracle-shaped) exact top-k — the round-6 form:
    broadcast queries, HOF-fold cosines, one window per query. Kept as
    the cross-checkable baseline for :func:`brute_force_topk`'s exact
    Arrow kernel (parity-tested bit-identical)."""
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_col("qv", "cv"), 9))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "cand_id", "cos")
    )


def brute_force_topk_arrow(corpus: DataFrame, queries: DataFrame,
                           topk: int = 5, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Vectorized twin of :func:`brute_force_topk`: the query matrix is
    collected (queries ≪ corpus — same budget as the broadcast) and each
    corpus Arrow batch runs ONE numpy matmul + per-query partial top-k,
    so only batches × queries × k candidate rows ever leave the stage;
    a final per-query window selects the global top-k. Same ranking
    semantics (cosine desc, cand_id asc ties).

    float64 matmul sums in a different association order than the HOF
    fold, so the 9-dp rounded cosine can differ in the last digit on
    knife-edge values — this is the scale path; the relational variant
    remains the exact-oracle baseline (the unit test pins ≥99.9% rank
    agreement)."""
    import pandas as pd

    import pyspark.sql.types as T

    _schema_out = T.StructType([
        T.StructField("query_id", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("cand_id", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ])
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        # a (0, dim) query matrix would shape-error inside the executor;
        # mirror the relational twin's empty result instead
        return corpus.sparkSession.createDataFrame([], _schema_out)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0

    def run(batches):
        for b in batches:
            ids = b[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(b[vec_col]), dtype=np.float64)
            if mat.size == 0:
                continue
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            cos = (mat @ qmat.T) / norms[:, None] / qnorm[None, :]
            out = {"query_id": [], "cand_id": [], "cos": []}
            for j in range(len(qids)):
                col = cos[:, j]
                mask = ids != qids[j]
                cand_ids = ids[mask]
                vals = col[mask]
                if not len(vals):
                    continue
                k = min(topk, len(vals))
                # partial top-k per batch: order by (-cos, cand_id)
                order = np.lexsort((cand_ids, -vals))[:k]
                out["query_id"].extend([qids[j]] * k)
                out["cand_id"].extend(cand_ids[order])
                out["cos"].extend(np.round(vals[order], 9))
            if out["query_id"]:
                yield pd.DataFrame(out)

    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("query_id", T.LongType(), False),
        T.StructField("cand_id", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ])
    partial = corpus.select(id_col, vec_col).mapInPandas(run, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "cand_id", "cos")
    )


def _plane_coefficients(n_planes: int, table_ix: int, dim: int) -> list[list[int]]:
    """Pseudo-random ±1 hyperplane coefficients, fixed at plan-build time.

    plane p, dim d coefficient = +1 if md5-hash64('t{table}|p{p}|d{d}') is
    even else −1 — the Python twin of functions/portable.py's hash64, so the
    values are identical to what the round-1 in-SQL derivation produced, but
    they are now *literals* in the plan: no per-row md5, no interpreted
    expensive-lambda path (the builder measured that form ~350× slower).
    """
    import hashlib

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        [(h64(f"t{table_ix}|p{p}|d{d}") % 2) * 2 - 1 for d in range(dim)]
        for p in range(n_planes)
    ]


def _sign_bucket_expr(vec_col: str, n_planes: int, table_ix: int, engine: str,
                      dim: int = 64) -> str:
    """Bucket id = sign bits against n_planes pseudo-random ±1 hyperplanes.

    bucket = Σ_p (dot_p > 0) << p, where dot_p = ⟨vec, coef_p⟩ and coef_p is
    a *literal* ±1 array (see :func:`_plane_coefficients`) — the remaining
    lambda bodies are cheap multiply-adds, which stay on the acceptable side
    of the interpreted-HOF cost line. Identical literals on both engines ⇒
    identical buckets by construction.
    """
    coefs = _plane_coefficients(n_planes, table_ix, dim)
    bits = []
    if engine == "spark":
        for p, cs in enumerate(coefs):
            arr = "array(" + ",".join(str(c) for c in cs) + ")"
            # zip_with pads the shorter side with NULL; coalesce(·, 0) makes
            # length mismatch a truncation instead of a NULL dot — and avoids
            # a per-row slice() allocation of the literal array
            dot = (f"aggregate(zip_with({vec_col}, {arr}, "
                   f"(v, c) -> coalesce(cast(v as double) * c, 0.0d)), "
                   f"cast(0 as double), (acc, x) -> acc + x)")
            bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << p} ELSE 0 END)")
        return "cast(" + " + ".join(bits) + " as bigint)"
    for p, cs in enumerate(coefs):
        arr = "[" + ",".join(str(c) for c in cs) + "]"
        dot = (f"list_sum(list_transform("
               f"list_zip({vec_col}, list_slice({arr}, 1, len({vec_col}))), "
               f"z -> z[1]::DOUBLE * z[2]))")
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def lsh_topk(corpus: DataFrame, queries: DataFrame, topk: int = 5,
             n_planes: int = 8, n_tables: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates share a sign-LSH bucket in ≥1 table.

    Shuffle profile: corpus hashed once per table (map-side), joined on
    (table, bucket) — bounded buckets instead of a global crossJoin.
    ``dim`` sizes the literal hyperplane arrays (extra dims beyond the actual
    vector length are sliced off; vectors longer than dim are truncated).
    """
    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        parts = []
        for t in range(n_tables):
            e = _sign_bucket_expr(vec_col, n_planes, t, "spark", dim=dim)
            parts.append(df.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}v"),
                F.lit(t).alias("tbl"),
                F.expr(e).alias("bucket"),
            ))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    qb = F.broadcast(bucketed(queries, "query"))
    cb = bucketed(corpus, "cand")
    scored = (
        cb.join(qb, ["tbl", "bucket"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "queryv", "candv")
        .distinct()  # same pair can collide in several tables
        .withColumn("cos", F.round(cosine_col("queryv", "candv"), 9))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "cand_id", "cos")
    )


def cosine_near_duplicates(embs: DataFrame, threshold: float = 0.98,
                           n_planes: int = 8, n_tables: int = 4,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           dim: int = 64) -> DataFrame:
    """Corpus-wide embedding near-dup pairs (a < b, cosine ≥ threshold) via
    sign-LSH self-join — the scale form of dedup.embedding_near_duplicates'
    linear consecutive scan. Candidates must share a bucket in ≥1 table
    (recall grows with n_tables; at 0.98 cosine the angle is ~11°, so
    8-plane sign buckets collide with high probability); never all-pairs —
    the self-join is keyed (table, bucket) exactly like lsh_topk.
    """
    def bucketed(prefix: str) -> DataFrame:
        parts = []
        for t in range(n_tables):
            e = _sign_bucket_expr(vec_col, n_planes, t, "spark", dim=dim)
            parts.append(embs.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}v"),
                F.lit(t).alias("tbl"), F.expr(e).alias("bucket")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    left = bucketed("a").repartition("tbl", "bucket")
    right = left.select(F.col("a_id").alias("b_id"),
                        F.col("av").alias("bv"), "tbl", "bucket")
    return (
        left.join(right, ["tbl", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(F.col("a_id").alias("a"), F.col("b_id").alias("b"),
                "av", "bv")
        .distinct()
        .withColumn("cos", F.round(cosine_col("av", "bv"), 9))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


#: above this k the centroid relation stops being broadcast (k × dim
#: doubles ≈ 400 MB at k=2^16, dim=768 — the practical broadcast
#: ceiling); the assignment join is then left to AQE, which picks a
#: shuffle strategy sized to the actual relation.
KMEANS_BROADCAST_K = 65_536


def kmeans_centroids(corpus: DataFrame, k: int, n_iter: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     broadcast_k: int = KMEANS_BROADCAST_K) -> DataFrame:
    """Bounded-iteration relational Lloyd's fit → (cent_id, centv) —
    trained replacement for ivf_topk's random-sample centroids (pass the
    result as its ``centroids=`` argument).

    Spherical k-means (cosine objective, the IVF metric here): assignment
    is the same broadcast-centroids max_by-cosine pass the IVF index
    itself runs; update is an element-wise mean (posexplode → (cell, dim)
    hash agg with map-side partials → re-assembled array) followed by
    L2 normalization. Empty cells keep their previous centroid (the
    coalescing left join below).

    Scale notes: each iteration is one map-side assignment over the
    corpus plus a (k × dim)-cell aggregate; ``n_iter`` is a hard bound
    (default 5 — Lloyd's moves little after a handful of rounds on web
    embeddings). The centroid relation stays a DATAFRAME between
    iterations: ``localCheckpoint`` (executor storage) cuts the lineage
    each round where round 4 collected k rows to the driver — at the
    module's own k ≈ √N guidance that collect was a multi-GB driver
    object at 10^12 rows. The assignment join broadcasts only while
    k ≤ ``broadcast_k`` (cap documented above); beyond it the join is
    AQE-decided, so the driver never materializes the centroids at any
    k."""
    to_double = F.expr(
        f"transform({vec_col}, x -> cast(x as double))").alias("centv")
    cents = (
        corpus.select(F.col(id_col).cast("long").alias("cent_id"),
                      to_double)
        .orderBy(F.expr(_hash_order_expr("cent_id")), F.col("cent_id"))
        .limit(k)
    ).localCheckpoint()
    for _ in range(n_iter):
        cdf = F.broadcast(cents) if k <= broadcast_k else cents
        assigned = (
            corpus.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).alias("_v"))
            .join(cdf)
            .select("_id", "_v", "cent_id",
                    F.round(cosine_col("centv", "_v"), 9).alias("_d"))
            .groupBy("_id").agg(
                F.max_by(F.struct("cent_id", "_v"),
                         F.struct(F.col("_d"),
                                  (-F.col("cent_id")).alias("_t")))
                .alias("best"))
            .select(F.col("best.cent_id").alias("cent_id"),
                    F.col("best._v").alias("_v"))
        )
        means = (
            assigned.select("cent_id", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cent_id", "pos").agg(F.avg("x").alias("m"))
            .groupBy("cent_id").agg(
                F.expr("transform(array_sort(collect_list(struct(pos, m))),"
                       " s -> s.m)").alias("mean"))
            .select("cent_id",
                    F.expr("aggregate(mean, 0d, (a, x) -> a + x * x, "
                           "a -> sqrt(a))").alias("_n"), "mean")
            .select("cent_id",
                    F.expr("CASE WHEN _n > 0 THEN "
                           "transform(mean, x -> x / _n) ELSE mean END")
                    .alias("new_centv"))
        )
        cents = (
            cents.join(means, "cent_id", "left")
            .select("cent_id",
                    F.coalesce("new_centv", "centv").alias("centv"))
        ).localCheckpoint()
    return cents


def _hash_order_expr(col: str) -> str:
    from ..functions import textsql as X
    return X.h64(f"cast({col} as string)", "spark")


def ivf_topk(corpus: DataFrame, queries: DataFrame, topk: int = 5,
             n_centroids: int = 256, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF-flat approximate top-k: corpus partitioned into Voronoi cells
    around coarse centroids; queries search only their ``nprobe`` nearest
    cells.

    Centroids are a *fixed-size* deterministic sample of ``n_centroids``
    corpus vectors — the first k in portable-hash order of the id (a
    seedless uniform draw both engines replay exactly) — rather than
    k-means: the classic random-centroid IVF baseline, keeping the whole
    index relational and deterministic (no iterative fit, exact DuckDB
    oracle). Swapping in trained centroids changes only the ``cents``
    relation. Choose ``n_centroids`` ≈ √N so cells hold ≈ √N vectors each
    (FAISS guidance); crucially k is *independent of corpus size* — a
    stride-based sample would make the broadcast relation and the N×(N/s)
    assignment join grow linearly with the corpus and OOM at 10^12 rows.

    Shuffle profile at scale: the centroid sample is a per-partition top-k
    merge (TakeOrderedAndProject — no full sort) and the k-row result is
    broadcast; cell assignment is one map-side pass (corpus × k cosines,
    cheap zip_with folds); the probe join is keyed by cell id so candidate
    generation is bounded by cell sizes — never all-pairs. Recall rises
    with ``nprobe`` (measure with :func:`topk_recall`).

    ``centroids``: optional trained (cent_id, centv) relation — e.g.
    :func:`kmeans_centroids` — replacing the random sample; everything
    downstream (assignment, probing, verification) is unchanged.
    """
    if centroids is not None:
        # trained relation of caller-chosen k: no forced broadcast —
        # AQE broadcasts it while it is actually small and shuffles
        # beyond that (same cap rationale as KMEANS_BROADCAST_K)
        cents = centroids.select("cent_id", "centv")
    else:
        cents = F.broadcast(
            corpus.select(F.col(id_col).alias("cent_id"),
                          F.col(vec_col).alias("centv"))
            .orderBy(F.expr(_hash_order_expr("cent_id")), F.col("cent_id"))
            .limit(n_centroids))

    def nearest_cells(df: DataFrame, prefix: str, n: int) -> DataFrame:
        """(id, cent_id) of the n nearest centroids. The k-way centroid
        explode sheds the vector immediately, so the per-vector reduction
        shuffles only (id, cent_id, dist) — 24-byte rows, not k copies of
        the embedding; the vector rejoins once at the end."""
        scored = (
            df.select(F.col(id_col).alias(f"{prefix}_id"),
                      F.col(vec_col).alias("_v"))
            .join(cents)
            .select(f"{prefix}_id", "cent_id",
                    F.round(cosine_col("centv", "_v"), 9).alias("_d"))
        )
        if n == 1:
            # max_by with a (dist, -cent_id) key: single hash aggregate with
            # map-side partials, deterministic tie-break toward low cent_id
            narrow = scored.groupBy(f"{prefix}_id").agg(
                F.max_by("cent_id",
                         F.struct(F.col("_d"), (-F.col("cent_id")).alias("_t")))
                .alias("cent_id"))
        else:
            w = Window.partitionBy(f"{prefix}_id").orderBy(
                F.col("_d").desc(), F.col("cent_id").asc())
            narrow = (
                scored.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= n).select(f"{prefix}_id", "cent_id")
            )
        return narrow.join(
            df.select(F.col(id_col).alias(f"{prefix}_id"),
                      F.col(vec_col).alias(f"{prefix}v")),
            f"{prefix}_id")

    cells = nearest_cells(corpus, "cand", 1)
    probes = nearest_cells(queries, "query", nprobe)
    scored = (
        probes.join(cells, "cent_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "queryv", "candv")
        .distinct()  # a candidate can sit in several probed cells' joins
        .withColumn("cos", F.round(cosine_col("queryv", "candv"), 9))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "cand_id", "cos")
    )


def topk_recall(exact: DataFrame, approx: DataFrame) -> float:
    """Fraction of exact top-k pairs recovered by the approximate index."""
    e = exact.select("query_id", "cand_id")
    a = approx.select("query_id", "cand_id")
    hit = e.join(a, ["query_id", "cand_id"], "left_semi").count()
    total = e.count()
    return hit / total if total else 1.0
