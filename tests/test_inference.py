"""I1-I3: window predictions + cross-window mean vs direct Python math."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators.assembly import pages_view
from amazon_textract_transformer_pipeline_spark.operators.inference import (
    StubModel,
    _stub_cls_py,
    aggregate_word_predictions,
    enrich_words_with_model,
    predict_windows,
)
from amazon_textract_transformer_pipeline_spark.operators.splitting import (
    split_pages_to_windows,
    split_words,
    stub_tokenize,
)


def _expected_word_probs(url, page_num, words):
    """Direct Python replay: tokenize → split → stub model → global mean."""
    counts = [len(stub_tokenize(w["text"])) for w in words]
    model = StubModel()
    acc: dict[int, list[np.ndarray]] = {}
    for wix, (s, e) in enumerate(split_words(counts, 510)):
        boosts = [_stub_cls_py(url, page_num, s + i, model.n_classes, 3)
                  for i in range(e - s)]
        probs = model.predict_window(url, page_num, wix, s, counts[s:e], boosts)
        for i in range(e - s):
            acc.setdefault(s + i, []).append(probs[i])
    return {pos: np.mean(vs, axis=0) for pos, vs in acc.items()}


def test_word_predictions_match_python(spark, doc_words):
    pages = pages_view(doc_words).cache()
    preds = aggregate_word_predictions(
        predict_windows(split_pages_to_windows(pages))
    ).cache()

    # pick pages incl. a multi-window one
    long_page = (
        split_pages_to_windows(pages).filter("window_ix > 0")
        .select("url", "page_num").distinct().limit(2).collect()
    )
    some = pages.limit(3).select("url", "page_num").collect()
    targets = {(r.url, r.page_num) for r in long_page} | {
        (r.url, r.page_num) for r in some
    }

    page_words = {
        (r.url, r.page_num): r.words
        for r in pages.filter(
            F.struct("url", "page_num").isin(
                [F.struct(F.lit(u), F.lit(p)) for (u, p) in targets]
            )
        ).collect()
    }
    got = {
        (r.url, r.page_num, r.word_pos): r
        for r in preds.filter(
            F.struct("url", "page_num").isin(
                [F.struct(F.lit(u), F.lit(p)) for (u, p) in targets]
            )
        ).collect()
    }
    assert len(page_words) == len(targets)
    n_checked = 0
    for (url, pnum), words in page_words.items():
        expected = _expected_word_probs(url, pnum, words)
        for pos, exp in expected.items():
            r = got[(url, pnum, pos)]
            assert np.allclose(np.array(r.probs), exp, atol=1e-12), (url, pnum, pos)
            assert r.pred_cls == int(np.argmax(exp))
            assert math.isclose(r.pcc, float(np.max(exp)), rel_tol=1e-12)
            n_checked += 1
    assert n_checked > 100


def test_multiwindow_words_averaged(spark, doc_words):
    """Words duplicated by the <50% backfill get >1 window contribution."""
    pages = pages_view(doc_words)
    wp = predict_windows(split_pages_to_windows(pages))
    dup = (
        wp.groupBy("url", "page_num", "word_pos")
        .agg(F.count("*").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert dup > 0


def test_enrich_words_with_model_end_to_end(spark, doc_words):
    pages = pages_view(doc_words)
    windows = split_pages_to_windows(pages)
    enriched = enrich_words_with_model(doc_words, windows).cache()
    # oversize words (never windowed) keep NULL predictions
    n_null = enriched.filter("pred_cls IS NULL AND length(text) >= 3000").count()
    n_big = enriched.filter("length(text) >= 3000").count()
    assert n_big > 0 and n_null == n_big
    # everything else predicted
    assert enriched.filter("pred_cls IS NULL AND length(text) < 3000").count() == 0
    # and the mention extractor consumes it
    from amazon_textract_transformer_pipeline_spark.config import (
        DEMO_CONFIG,
        field_config_df,
    )
    from amazon_textract_transformer_pipeline_spark.operators.entities import (
        extract_mentions,
    )

    m = extract_mentions(enriched, field_config_df(spark, DEMO_CONFIG))
    n = m.count()
    assert n > 500
    multiword = m.filter(F.size("Blocks") > 1).count()
    assert multiword > 0  # boost bias produces real runs
