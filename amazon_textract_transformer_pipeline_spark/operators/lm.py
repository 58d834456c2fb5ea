"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al., *CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data*, LREC 2020): score every document by the
perplexity of a language model trained on a trusted reference corpus and
bucket head/middle/tail. CCNet uses a KenLM 5-gram; no such runtime
exists here and the point at 10^12-doc scale is different anyway — an
n-gram LM with **stupid backoff** (Brants et al., *Large Language Models
in Machine Translation*, EMNLP 2007: score = count ratio, fixed 0.4
backoff, no normalization — designed precisely for distributed
count-based training) is exactly two DataFrame aggregations, and scoring
is three hash joins. Everything stays JVM-side; both training and
scoring are shuffle-on-uniform-keys (word / word-pair), skew-safe.

Model (pinned, replayed exactly by the DuckDB oracle):

* tokens = whitespace words of lowercased text;
* ``S(w2 | w1) = c2(w1,w2) / c1(w1)`` when the bigram was seen, else
  ``0.4 * c1(w2) / N``, else ``0.4 * 1 / (10 * N)`` for unseen unigrams;
* doc log-score = sum of ``ln S`` over the doc's adjacent pairs;
  ``perplexity = exp(-mean)``; docs with < 2 tokens score NULL.

Scale: unigram/bigram relations are huge at CC scale — they join back
by SHUFFLE hash join on the uniform token keys (no broadcast; AQE may
still pick one at small scale). The 1-row token total rides along via a
broadcast-able single-row cross join, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textsql as X

BACKOFF = 0.4
#: unseen-unigram floor: P1 = 1 / (UNSEEN_SCALE * N)
UNSEEN_SCALE = 10.0


def _pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    ws = X.words(f"lower({text_col})", "spark")
    return (
        docs.select(id_col, F.expr(ws).alias("ws"))
        .filter(F.expr("size(ws) >= 2"))
        .select(id_col, F.explode(F.expr(
            "transform(sequence(0, size(ws) - 2), "
            "i -> struct(element_at(ws, i + 1) as w1, "
            "element_at(ws, i + 2) as w2))")).alias("p"))
        .select(id_col, "p.w1", "p.w2")
    )


def train_bigram_lm(ref_docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text"):
    """(unigrams, bigrams, total) count relations from a reference corpus.

    ``unigrams``: (w, c1); ``bigrams``: (w1, w2, c2); ``total``: single
    row (n_tokens). Two shuffles, both with map-side partial counts.
    """
    ws = X.words(f"lower({text_col})", "spark")
    toks = ref_docs.select(F.explode(F.expr(ws)).alias("w"))
    unigrams = toks.groupBy("w").agg(F.count("*").alias("c1"))
    bigrams = (_pairs(ref_docs, id_col, text_col)
               .groupBy("w1", "w2").agg(F.count("*").alias("c2")))
    total = unigrams.agg(F.sum("c1").cast("double").alias("n_tokens"))
    return unigrams, bigrams, total


def perplexity_score(docs: DataFrame, unigrams: DataFrame,
                     bigrams: DataFrame, total: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc stupid-backoff bigram log-score + perplexity.

    Returns (id, n_pairs, logprob_sum, perplexity) — perplexity NULL for
    docs with fewer than two tokens (no pairs to score). Floats rounded
    to 6 places: the pair-sum's combine order is partition-dependent, so
    last-ulp wobble is expected and rounded away (driver-gate FP
    practice).
    """
    pairs = _pairs(docs, id_col, text_col)
    scored = (
        pairs
        .join(bigrams, ["w1", "w2"], "left")
        .join(unigrams.withColumnRenamed("w", "w1")
              .withColumnRenamed("c1", "c1a"), ["w1"], "left")
        .join(unigrams.withColumnRenamed("w", "w2")
              .withColumnRenamed("c1", "c1b"), ["w2"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.expr(
                f"ln(CASE WHEN c2 IS NOT NULL "
                f"THEN c2 / cast(c1a as double) "
                f"ELSE {BACKOFF} * coalesce(c1b / n_tokens, "
                f"1.0 / ({UNSEEN_SCALE} * n_tokens)) END)").alias("lp"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("lp").alias("ll"))
    return (
        docs.select(id_col).join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.round("ll", 6).alias("logprob_sum"),
            F.round(F.expr("exp(-(ll / n_pairs))"), 6).alias("perplexity"),
        )
    )


#: CCNet buckets by reference-distribution thresholds computed offline;
#: here the thresholds are pinned constants (compared on the ROUNDED
#: perplexity so both engines bucket identically at the boundary).
PPL_HEAD_MAX = 1000.0
PPL_MIDDLE_MAX = 100000.0


def ppl_bucket_sql(ppl_col: str = "perplexity") -> str:
    """head/middle/tail bucketing CASE — valid in both engines."""
    return (f"CASE WHEN {ppl_col} IS NULL THEN NULL "
            f"WHEN {ppl_col} <= {PPL_HEAD_MAX} THEN 'head' "
            f"WHEN {ppl_col} <= {PPL_MIDDLE_MAX} THEN 'middle' "
            f"ELSE 'tail' END")


def with_ppl_bucket(scored: DataFrame,
                    ppl_col: str = "perplexity") -> DataFrame:
    return scored.withColumn("ppl_bucket", F.expr(ppl_bucket_sql(ppl_col)))
