"""NB quality classifier (operators/quality.py): GPT-3-style corpus
selection — smoothed multinomial Naive Bayes, trained and scored
relationally, pinned against a brute-force Python replica."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators import quality


def _py_nb(labeled, score, alpha=quality.ALPHA):
    """Replica of the pinned model. labeled: [(text, is_hq)]."""
    c_hq: dict[str, int] = {}
    c_lq: dict[str, int] = {}
    docs_hq = docs_lq = 0
    for text, hq in labeled:
        if hq:
            docs_hq += 1
        else:
            docs_lq += 1
        for w in text.lower().split():
            (c_hq if hq else c_lq)[w] = (c_hq if hq else c_lq).get(w, 0) + 1
    vocab = len(set(c_hq) | set(c_lq))
    n_hq, n_lq = sum(c_hq.values()), sum(c_lq.values())
    out = {}
    for doc_id, text in score:
        toks = text.lower().split()
        s = math.log(docs_hq / docs_lq)
        for w in toks:
            s += math.log((c_hq.get(w, 0) + alpha) / (n_hq + alpha * vocab))
            s -= math.log((c_lq.get(w, 0) + alpha) / (n_lq + alpha * vocab))
        out[doc_id] = (len(toks), round(s, 6))
    return out


def _run(spark, labeled, score):
    lab = spark.createDataFrame(
        [(i, t, hq) for i, (t, hq) in enumerate(labeled)],
        "doc_id long, text string, is_hq boolean")
    sc = spark.createDataFrame(score, "doc_id long, text string")
    wc, stats = quality.train_nb(lab)
    got = quality.nb_quality_score(sc, wc, stats)
    return {r.doc_id: (r.n_tokens, r.nb_logodds, r.quality_pass)
            for r in got.collect()}


LABELED = [
    ("the quick brown fox reads fine prose", True),
    ("a thoughtful essay about the world", True),
    ("buy cheap pills now cheap cheap", False),
    ("click here now free free prize", False),
]


def test_matches_python_replica_incl_oov_and_empty(spark):
    score = [
        (0, "the quick fox"),            # hq vocabulary
        (1, "cheap pills free"),          # lq vocabulary
        (2, "zebra quantum unseen"),      # fully out-of-vocabulary
        (3, ""),                          # zero tokens -> prior ratio only
        (4, "the cheap prose prize"),     # mixed
    ]
    want = _py_nb(LABELED, score)
    got = _run(spark, LABELED, score)
    assert set(got) == set(want)
    for did, (n, s) in want.items():
        gn, gs, gp = got[did]
        assert gn == n
        assert abs(gs - s) < 2e-6, (did, gs, s)
        assert gp == (gs > 0)


def test_separates_planted_vocabularies(spark):
    score = [(0, "fine prose about the world"),
             (1, "free pills click prize")]
    got = _run(spark, LABELED, score)
    assert got[0][2] is True and got[0][1] > 0
    assert got[1][2] is False and got[1][1] < 0


def test_equal_priors_empty_doc_scores_zero_and_fails(spark):
    got = _run(spark, LABELED, [(9, "")])
    assert got[9] == (0, 0.0, False)


def test_oov_shifts_toward_larger_token_class(spark):
    # lq has more tokens than hq in this fixture? compute: hq 7+6=13,
    # lq 6+6=12 -> hq larger; unseen words then favor LQ (denominator
    # n_hq+aV > n_lq+aV makes each unseen token's ratio < 1).
    got = _run(spark, LABELED, [(5, "zzz yyy xxx")])
    assert got[5][1] < 0 and got[5][2] is False


def _py_tfidf(texts, topk=5):
    import math
    toks = {d: t.lower().split() for d, t in texts}
    n = float(len(texts))
    df: dict[str, int] = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    out = {}
    for d, ws in toks.items():
        tf: dict[str, int] = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            ((round(c * math.log(n / df[w]), 9), w, c) for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]))
        out[d] = [(r + 1, w, c, df[w], s)
                  for r, (s, w, c) in enumerate(scored[:topk])]
    return out


def test_tfidf_matches_replica_and_rare_terms_win(spark):
    from amazon_textract_transformer_pipeline_spark.operators.quality import (
        tfidf_top_terms,
    )

    texts = [
        (0, "common common common zebra"),
        (1, "common words only here"),
        (2, "common words zebra quark quark"),
        (3, "xx common"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in tfidf_top_terms(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.rank, r.term, r.tf, r.df, r.score))
    for d in got:
        got[d].sort()
    want = _py_tfidf(texts)
    assert got == want
    # rare term beats frequent common term within doc 2
    assert got[2][0][1] == "quark"
    # df=N terms score exactly 0 but still rank (deterministic term asc)
    assert all(s == 0.0 for _, t, _, _, s in got[1] if t == "common")
