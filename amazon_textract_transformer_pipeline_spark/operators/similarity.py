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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textsql as X


def cosine_col(a: str, b: str) -> F.Column:
    return F.expr(X.cosine(a, b, "spark"))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, topk: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query (query ≠ self). Broadcast queries."""
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


def _sign_bucket_expr(vec_col: str, n_planes: int, table_ix: int, engine: str) -> str:
    """Bucket id = sign bits against n_planes pseudo-random ±1 hyperplanes.

    plane p, dim d coefficient = +1 if hash64('t{table}|p{p}|d{d}') is even
    else −1; bucket = Σ_p (dot_p > 0) << p. Pure SQL on both engines.
    """
    if engine == "spark":
        coef = X.h64(f"concat('t{table_ix}', '|p', cast(p as string), '|d', cast(d as string))", "spark")
        dot = (f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
               f"(v, d) -> cast(v as double) * (({coef} % 2) * 2 - 1)), "
               f"cast(0 as double), (acc, x) -> acc + x)")
        return (f"aggregate(transform(sequence(0, {n_planes - 1}), p -> "
                f"CASE WHEN ({dot}) > 0 THEN shiftleft(cast(1 as bigint), p) "
                f"ELSE cast(0 as bigint) END), cast(0 as bigint), (a, x) -> a + x)")
    coef = X.h64(f"concat('t{table_ix}', '|p', cast(p as varchar), '|d', cast(d as varchar))", "duck")
    dot = (f"list_sum(list_transform(range(0, len({vec_col})), "
           f"d -> {vec_col}[d + 1]::DOUBLE * (({coef} % 2) * 2 - 1)))")
    return (f"list_sum(list_transform(range(0, {n_planes}), p -> "
            f"CASE WHEN ({dot}) > 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END))")


def lsh_topk(corpus: DataFrame, queries: DataFrame, topk: int = 5,
             n_planes: int = 8, n_tables: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share a sign-LSH bucket in ≥1 table.

    Shuffle profile: corpus hashed once per table (map-side), joined on
    (table, bucket) — bounded buckets instead of a global crossJoin.
    """
    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        parts = []
        for t in range(n_tables):
            e = _sign_bucket_expr(vec_col, n_planes, t, "spark")
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


def topk_recall(exact: DataFrame, approx: DataFrame) -> float:
    """Fraction of exact top-k pairs recovered by the approximate index."""
    e = exact.select("query_id", "cand_id")
    a = approx.select("query_id", "cand_id")
    hit = e.join(a, ["query_id", "cand_id"], "left_semi").count()
    total = e.count()
    return hit / total if total else 1.0
