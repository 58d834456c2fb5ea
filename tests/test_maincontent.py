"""Densitometric main-content classification (operators/maincontent.py):
parser block/anchor accounting on hostile HTML, the WSDM-2010 tree's
branch behavior, and the end-to-end extract_main_content plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators.maincontent import (
    classify_blocks,
    extract_main_content,
    html_to_blocks,
    parse_blocks,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8") if isinstance(h, str) else h)
         for u, h in rows],
        "url string, html binary")


# -- parser ----------------------------------------------------------------
def test_blocks_split_on_block_tags_and_count_words():
    blocks = parse_blocks(
        b"<html><body><p>one two three</p><div>four five</div></body></html>")
    assert blocks == [("one two three", 3, 0), ("four five", 2, 0)]


def test_anchor_words_counted_per_run():
    # two separate anchors + an unlinked word: 2 link words of 3
    blocks = parse_blocks(
        b'<p><a href="#">one</a> plain <a href="#">two</a></p>')
    assert blocks == [("one plain two", 3, 2)]


def test_word_spanning_anchor_boundary_not_double_counted():
    # "ab" is one word; only its linked half forms an anchor-run token
    blocks = parse_blocks(b"<p>a<a href='#'>b</a> c</p>")
    [(text, n, ln)] = blocks
    assert (text, n) == ("ab c", 2)
    assert ln == 1  # the "b" run


def test_adjacent_anchors_merge_into_one_run():
    blocks = parse_blocks(b'<p><a href="#">a b</a><a href="#">c</a></p>')
    [(text, n, ln)] = blocks
    assert (n, ln) == (2, 2)  # "a" and "bc"


def test_nav_and_footer_text_kept_for_classifier():
    # unlike the word front-end, nav/footer text MUST reach the classifier
    blocks = parse_blocks(
        b"<nav><a href='/'>home</a> <a href='/a'>about</a></nav>"
        b"<p>real body content here</p>")
    assert blocks[0] == ("home about", 2, 2)
    assert blocks[1][0] == "real body content here"


def test_script_style_dropped_entities_decoded():
    blocks = parse_blocks(
        b"<p>AT&amp;T a&lt;b</p><script>var x = 'no words';</script>")
    assert blocks == [("AT&T a<b", 2, 0)]


def test_br_breaks_words_empty_blocks_skipped():
    blocks = parse_blocks(b"<p>x<br>y</p><p>   </p><p></p>")
    assert blocks == [("x y", 2, 0)]


def test_none_and_garbage_are_safe():
    assert parse_blocks(None) == []
    assert parse_blocks(b"") == []
    assert parse_blocks(b"\xff\xfe\x00garbage <<<>>") != None  # noqa: E711


# -- classifier tree -------------------------------------------------------
@pytest.fixture(scope="module")
def classified(spark):
    # one doc exercising the tree's main branches:
    # b0 long content / b1 link farm / b2 short after link farm /
    # b3 long after link farm / b4 short text with short neighbours
    html = (
        "<p>" + " ".join(f"w{i}" for i in range(30)) + "</p>"
        "<nav>" + " ".join(f'<a href="#">n{i}</a>' for i in range(8)) + "</nav>"
        "<p>short tail here</p>"
        "<p>" + " ".join(f"v{i}" for i in range(45)) + "</p>"
        "<p>tiny</p>")
    df = _pages(spark, [("u1", html)])
    rows = classify_blocks(html_to_blocks(df)).orderBy("block_ix").collect()
    return {r.block_ix: r for r in rows}


def test_long_low_density_block_is_content(classified):
    assert classified[0].is_content  # 30 words, ld 0


def test_link_farm_is_boilerplate(classified):
    r = classified[1]
    assert r.link_density == 1.0 and not r.is_content


def test_short_block_after_link_farm_is_boilerplate(classified):
    # prev_ld 1.0 > 0.555556 and 3 words <= 40, next 45 > 17 → content?
    # next_words=45 > 17 makes it content per the tree — verify exact rule
    assert classified[2].is_content == (45 > 17)


def test_long_block_after_short_is_content(classified):
    assert classified[3].is_content  # 45 words > 16


def test_short_isolated_tail_is_boilerplate(classified):
    r = classified[4]
    # 1 word, next 0, prev 45 > 4 → content by the prev>4 leaf
    assert r.is_content == (45 > 4)


def test_prev4_leaf_boilerplate(spark):
    # three tiny blocks: middle has prev 2 words (<=4), next 2 (<=15),
    # own 2 (<=16), all ld 0 → boilerplate
    df = _pages(spark, [("u", "<p>a b</p><p>c d</p><p>e f</p>")])
    rows = classify_blocks(html_to_blocks(df)).orderBy("block_ix").collect()
    assert [r.is_content for r in rows] == [False, False, False]


# -- end-to-end ------------------------------------------------------------
def test_extract_main_content_drops_nav_keeps_article(spark):
    # after a link-dense block the tree demands >40 words (or a long next
    # block) — 45 words survive; a 25-word stub between nav and footer
    # would be judged boilerplate, which is the tree's documented bias
    art = " ".join(f"word{i}" for i in range(45))
    html = ("<nav>" + " ".join(f'<a href="#">m{i}</a>' for i in range(6))
            + "</nav><p>" + art + "</p><footer><a href='#'>c</a> "
            "<a href='#'>p</a></footer>")
    out = extract_main_content(_pages(spark, [("u", html)])).collect()
    [r] = out
    assert r.main_text == art
    assert r.n_blocks == 3 and r.n_content_blocks == 1


def test_no_content_doc_yields_empty_main_text(spark):
    out = extract_main_content(
        _pages(spark, [("u", '<p><a href="#">x</a></p>')])).collect()
    [r] = out
    assert r.main_text == "" and r.n_content_blocks == 0


def test_classify_plan_single_shuffle(spark):
    df = _pages(spark, [("u", "<p>a</p>")])
    plan = classify_blocks(html_to_blocks(df))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1  # one per-doc window shuffle only


# ---------------------------------------------------------------------------
# crawl-policy metadata (robots/canonical/title/refresh)
# ---------------------------------------------------------------------------

def test_parse_meta_pinned_cases():
    from amazon_textract_transformer_pipeline_spark.operators.maincontent import (
        parse_meta,
    )

    m = parse_meta(b"""<html><head>
      <meta name='Robots' content='NOINDEX , noarchive'>
      <meta name=robots content=nofollow>
      <link rel="alternate canonical" href="https://c.example/1">
      <link rel="canonical" href="https://c.example/2">
      <meta http-equiv=refresh content="0;URL=https://r.example/x">
      <meta http-equiv=refresh content="9;url=https://r.example/late">
      <title>One
        Two</title><title>ignored</title>
      </head><body><p>hi</p></body></html>""")
    assert m["robots_noindex"] and m["robots_nofollow"]
    assert m["canonical_href"] == "https://c.example/1"  # first rel match
    assert m["refresh_url"] == "https://r.example/x"     # first refresh
    assert m["title"] == "One Two"                       # collapsed ws
    assert m["n_meta_tags"] == 4


def test_parse_meta_none_and_hostile():
    from amazon_textract_transformer_pipeline_spark.operators.maincontent import (
        parse_meta,
    )

    # 'none' implies both directives (robots spec)
    m = parse_meta(b"<meta name=robots content=none>")
    assert m["robots_noindex"] and m["robots_nofollow"]
    # hostile: None bytes, garbage, unclosed tags, refresh without url=,
    # link without href, empty title — all degrade to clean defaults
    for blob in (None, b"", b"\xff\xfe garbage \x00",
                 b"<meta name=robots>", b"<title></title>",
                 b"<meta http-equiv=refresh content='5'>",
                 b"<link rel=canonical>", b"<head><title>x"):
        m = parse_meta(blob)
        assert m["robots_noindex"] is False
        assert m["robots_nofollow"] is False
        assert m["canonical_href"] is None
        assert m["refresh_url"] is None
    # unclosed title never flushes -> None; meta in body still counts
    m = parse_meta(b"<body><meta name=ROBOTS content=' NoFollow '></body>")
    assert m["robots_nofollow"] and not m["robots_noindex"]


def test_html_meta_flags_zero_shuffle(spark):
    from pyspark.sql import functions as F

    from amazon_textract_transformer_pipeline_spark.operators.maincontent import (
        html_meta_flags,
    )

    pages = spark.range(10).select(
        F.col("id").alias("url"),
        F.encode(F.lit("<title>t</title>"), "UTF-8").alias("html"))
    df = html_meta_flags(pages)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert df.count() == 10  # one row per doc, even meta-less ones
