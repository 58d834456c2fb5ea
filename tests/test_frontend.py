"""Front-end + assembly: the byte-identical-per-url flagship invariant."""

from __future__ import annotations

from amazon_textract_transformer_pipeline_spark.operators.assembly import (
    assemble_text,
    words_view,
)
from amazon_textract_transformer_pipeline_spark.operators.frontend import (
    pages_to_struct,
    parse_html,
)
from amazon_textract_transformer_pipeline_spark.sources.synthetic import (
    expected_text,
    make_page_row,
)


def test_parse_html_pure_roundtrip():
    """Parser recovers the generator's exact word structure, no Spark."""
    for i in range(0, 250):
        row = make_page_row(i)
        pages = parse_html(row["html"])
        assert expected_text(pages) == row["text"], f"row {i}"


def test_parse_strips_boilerplate():
    html = (b"<html><body><nav><p>MENU</p></nav>"
            b"<article><p>keep <b>me</b></p><script>drop()</script></article>"
            b"<footer><p>legal</p></footer></body></html>")
    assert parse_html(html) == [[["keep", "me"]]]


def test_parse_entities_and_unicode():
    html = "<article><p>AT&amp;T café a&lt;b</p></article>".encode()
    assert parse_html(html) == [[["AT&T", "café", "a<b"]]]


def test_parse_no_article_fallback():
    html = b"<html><body><p>one two</p><div>three</div></body></html>"
    assert parse_html(html) == [[["one", "two"], ["three"]]]


def test_empty_doc_and_empty_page():
    assert parse_html(b"<html><body><article></article></body></html>") == []
    assert parse_html(None) == []


def test_geometry_in_unit_square_and_deterministic():
    row = make_page_row(3)
    pages = pages_to_struct(row["url"], parse_html(row["html"]))
    again = pages_to_struct(row["url"], parse_html(row["html"]))
    assert pages == again  # determinism (replaces uuid4, SURVEY §2.3 O7)
    for pg in pages:
        for w in pg["words"]:
            b = w["box"]
            assert 0.0 <= b["left"] and b["left"] + b["width"] <= 1.0 + 1e-9
            assert 0.0 <= b["top"] and b["top"] + b["height"] <= 1.0 + 1e-9
            assert 0.0 <= w["conf"] <= 100.0


def test_byte_identical_extraction_spark(spark, pages_df, doc_words):
    """THE north-rule invariant: extracted_text == oracle text, per url."""
    result = assemble_text(doc_words)
    joined = result.join(pages_df.select("url", "text"), "url", "inner")
    n = joined.count()
    assert n == 300
    mismatches = joined.filter("extracted_text <> text").count()
    assert mismatches == 0


def test_words_view_reading_order(spark, doc_words):
    """word_pos is reading order: reassembling from the relational view
    matches the array-HOF assembly."""
    from pyspark.sql import functions as F

    wv = words_view(doc_words)
    re_asm = (
        wv.groupBy("url", "page_num", "line_id")
        .agg(F.array_join(F.transform(F.array_sort(F.collect_list(F.struct("word_pos", "text"))),
                                      lambda s: s["text"]), " ").alias("line_text"),
             F.min("word_pos").alias("first_pos"))
        .groupBy("url")
        .agg(F.array_join(F.transform(F.array_sort(F.collect_list(
            F.struct("page_num", "first_pos", "line_text"))),
            lambda s: s["line_text"]), "\n").alias("relational_text"))
    )
    hof = assemble_text(doc_words).select("url", "extracted_text")
    bad = (re_asm.join(hof, "url")
           .filter("relational_text <> extracted_text").count())
    assert bad == 0


def test_skewed_corpus_extracts_byte_identical(spark):
    """The skew-bench corpus obeys the same byte-identical contract as
    synthetic_pages_df — the straggler evidence measures real extraction,
    not a degenerate workload."""
    from amazon_textract_transformer_pipeline_spark.operators.assembly import (
        assemble_text,
    )
    from amazon_textract_transformer_pipeline_spark.operators.frontend import (
        html_to_words,
    )
    from amazon_textract_transformer_pipeline_spark.sources import (
        skewed_pages_df,
    )

    pages = skewed_pages_df(spark, 60, heavy_lines=30, hot_frac=0.3)
    out = assemble_text(html_to_words(pages)) \
        .join(pages.select("url", "text"), "url")
    assert out.filter("extracted_text <> text").count() == 0
    assert out.count() == 60
    hot = out.filter("url LIKE 'https://bighost000%'").count()
    assert hot == 18  # hot_frac 0.3
