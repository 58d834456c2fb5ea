"""Stupid-backoff bigram LM (operators/lm.py): hand-computed scores,
backoff paths, NULL path for sub-pair docs, in-domain < gibberish."""

from __future__ import annotations

import math

from amazon_textract_transformer_pipeline_spark.operators.lm import (
    perplexity_score,
    train_bigram_lm,
    with_ppl_bucket,
)


def _score(spark, ref_rows, doc_rows):
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    uni, big, tot = train_bigram_lm(ref)
    out = with_ppl_bucket(perplexity_score(docs, uni, big, tot)).collect()
    return {r.doc_id: r for r in out}


def test_hand_computed_seen_bigram(spark):
    # ref: "a b a b a c" → c1: a=3 b=2 c=1, N=6; c2: ab=2 ba=2 ac=1
    r = _score(spark, [(0, "a b a b a c")], [(1, "a b")])
    # S(b|a) = c2(ab)/c1(a) = 2/3
    exp_ll = math.log(2 / 3)
    assert r[1].n_pairs == 1
    assert abs(r[1].logprob_sum - round(exp_ll, 6)) < 1e-9
    assert abs(r[1].perplexity - round(math.exp(-exp_ll), 6)) < 1e-9


def test_backoff_to_unigram_and_floor(spark):
    r = _score(spark, [(0, "a b a b a c")],
               [(1, "b c"),      # unseen bigram, seen unigram c: 0.4*(1/6)
                (2, "a zzz")])   # unseen unigram: 0.4*(1/(10*6))
    assert abs(r[1].logprob_sum - round(math.log(0.4 * 1 / 6), 6)) < 1e-9
    assert abs(r[2].logprob_sum - round(math.log(0.4 / 60), 6)) < 1e-9


def test_sub_pair_doc_scores_null(spark):
    r = _score(spark, [(0, "a b")], [(1, "single"), (2, "")])
    for d in (1, 2):
        assert r[d].n_pairs == 0
        assert r[d].logprob_sum is None
        assert r[d].perplexity is None
        assert r[d].ppl_bucket is None


def test_case_insensitive_tokens(spark):
    r = _score(spark, [(0, "The cat sat")], [(1, "THE CAT SAT")])
    # identical after lowering: every bigram seen, ppl low
    assert r[1].perplexity < 4.0


def test_in_domain_beats_gibberish(spark):
    ref = [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)]
    r = _score(spark, ref, [
        (10, "the quick brown fox"),
        (11, "zx qv wk pj mn bv"),
    ])
    assert r[10].perplexity < r[11].perplexity
    assert r[10].ppl_bucket == "head"
