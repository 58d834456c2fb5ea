"""Q1-Q4 splitter: contract cases re-derived from splitting.py:63-144."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators.assembly import pages_view
from amazon_textract_transformer_pipeline_spark.operators.splitting import (
    n_examples,
    split_pages_to_windows,
    split_words,
    stub_tokenize,
)


def test_stub_tokenize():
    assert stub_tokenize("the") == ["the"]
    assert stub_tokenize("extraordinary") == ["extr", "aord", "inar", "y"]
    assert stub_tokenize("$1,234.56") == ["$", "1", ",", "234", ".", "56"]
    assert stub_tokenize("") == [""]
    assert all(len(stub_tokenize("x" * 3000)) == 750 for _ in [0])


def test_split_all_fit():
    assert split_words([3, 3, 3], 10) == [(0, 3)]
    assert split_words([], 10) == []


def test_split_exact_boundary():
    # 10 tokens exactly fills; no second window
    assert split_words([5, 5], 10) == [(0, 2)]
    # 11th token forces split; second window (1 word, 1 token) is <50% →
    # pulled back to include word 1 (5+1=6 ≤ 10), not word 0 (11 > 10)
    assert split_words([5, 5, 1], 10) == [(0, 2), (1, 3)]


def test_split_backfill_under_half():
    # [3,3,3,3] max 10: first window 0-2 (9 toks); final (3,4) is 3 toks
    # < 5 → start pulled back to word 1 (9 ≤ 10)
    assert split_words([3, 3, 3, 3], 10) == [(0, 3), (1, 4)]


def test_split_no_backfill_at_half():
    # final window exactly 50% (5 of 10) → NOT pulled back (strict <)
    assert split_words([5, 5, 5], 10) == [(0, 2), (2, 3)]


def test_split_oversize_word_skipped():
    assert split_words([12], 10) == []
    # oversize in middle: neighbors each form windows; trailing 3-token
    # window can't pull back past the 12-token word
    assert split_words([3, 12, 3], 10) == [(0, 1), (2, 3)]
    # oversize at start
    assert split_words([12, 3], 10) == [(1, 2)]


def test_n_examples():
    assert n_examples(1021, 510) == 3
    assert n_examples(510, 510) == 1


def test_windows_cover_pages(spark, doc_words):
    pages = pages_view(doc_words)
    win = split_pages_to_windows(pages).cache()
    stats = win.agg(
        F.max("n_tokens").alias("mx"),
        F.count("*").alias("n"),
        F.sum(F.when(F.col("window_ix") == 0, 1).otherwise(0)).alias("n_first"),
    ).collect()[0]
    assert stats.mx <= 510
    assert stats.n >= stats.n_first > 0

    # coverage: per page, union of [start,end) spans all words except
    # oversize-skips (the 3000-char word = 750 tokens > 510)
    per_page = (
        win.groupBy("url", "page_num")
        .agg(F.min("start_word").alias("s"), F.max("end_word").alias("e"),
             F.sum(F.col("end_word") - F.col("start_word")).alias("covered"))
    )
    n_words = pages.select(
        "url", "page_num", F.size("words").alias("nw"),
        # count oversize words on the page
        F.size(F.filter("words", lambda w: F.length(w["text"]) >= 3000)).alias("nbig"),
    )
    joined = per_page.join(n_words, ["url", "page_num"])
    bad = joined.filter(
        (F.col("s") != 0) | (F.col("e") != F.col("nw") - F.col("nbig"))
        # allow gaps only when an oversize word exists on the page
    ).filter(F.col("nbig") == 0).count()
    assert bad == 0

    # multi-window pages exist in the fixture (long-page mod 89)
    assert win.filter("window_ix > 0").count() > 0


def test_tokenize_windows_collation(spark, doc_words):
    """I1: CLS/SEP conventions, word_ids map, token-level box select."""
    from amazon_textract_transformer_pipeline_spark.operators.splitting import (
        CLS_BOX,
        SEP_BOX,
        tokenize_windows,
    )

    pages = pages_view(doc_words)
    win = split_pages_to_windows(pages)
    tk = tokenize_windows(win).limit(20).collect()
    assert len(tk) == 20
    for r in tk:
        assert r.tokens[0] == "[CLS]" and r.tokens[-1] == "[SEP]"
        assert r.word_ids[0] == -1 and r.word_ids[-1] == -1
        assert list(r.boxes1000[0]) == CLS_BOX
        assert list(r.boxes1000[-1]) == SEP_BOX
        assert len(r.tokens) == len(r.word_ids) == len(r.boxes1000)
        # word_ids monotone nondecreasing over content tokens
        content = [w for w in r.word_ids if w >= 0]
        assert content == sorted(content)
        # token count consistent with the splitter's budget (+2 specials)
        assert len(r.tokens) <= 512
        # all boxes within 0-1000
        assert all(0 <= v <= 1000 for b in r.boxes1000 for v in b)


def test_window_bounds_variant_matches_full(spark, doc_words):
    """split_pages_to_window_bounds must emit exactly the bounds of
    split_pages_to_windows (same splitter, narrow Arrow payload)."""
    from amazon_textract_transformer_pipeline_spark.operators.splitting import (
        split_pages_to_window_bounds,
    )

    pages = pages_view(doc_words)
    cols = ["url", "page_num", "window_ix", "start_word", "end_word",
            "n_tokens"]
    full = {tuple(r) for r in split_pages_to_windows(
        pages, max_content_seq_len=24).select(*cols).collect()}
    bounds = {tuple(r) for r in split_pages_to_window_bounds(
        pages, max_content_seq_len=24).collect()}
    assert full == bounds and len(bounds) > 0
