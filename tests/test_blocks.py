"""O6/S3/S5: block-tree serialization round-trip through Textract JSON."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators.assembly import (
    assemble_text,
    words_view,
)
from amazon_textract_transformer_pipeline_spark.operators.blocks import (
    blocks_to_json,
    blocks_to_words,
    parse_textract_json,
    words_to_blocks,
)


def test_block_tree_shape(spark, doc_words):
    blocks = words_to_blocks(doc_words).cache()
    one = blocks.filter(F.col("DocumentMetadata.Pages") >= 2).limit(1).collect()[0]
    bt = [b.BlockType for b in one.Blocks]
    assert bt[0] == "PAGE"
    assert set(bt) == {"PAGE", "LINE", "WORD"}
    # every LINE's children exist and are WORDs, in order
    by_id = {b.Id: b for b in one.Blocks}
    for b in one.Blocks:
        if b.BlockType == "LINE":
            kids = b.Relationships[0].Ids
            assert all(by_id[k].BlockType == "WORD" for k in kids)
            assert b.Text == " ".join(by_id[k].Text for k in kids)
            confs = [by_id[k].Confidence for k in kids]
            assert abs(b.Confidence - sum(confs) / len(confs)) < 1e-9
        if b.BlockType == "PAGE":
            assert b.Geometry.BoundingBox.Width == 1.0
            for k in b.Relationships[0].Ids:
                assert by_id[k].BlockType == "LINE"
    # geometry polygon is the 4 bbox corners
    w = next(b for b in one.Blocks if b.BlockType == "WORD")
    assert len(w.Geometry.Polygon) == 4
    assert w.Geometry.Polygon[0].X == w.Geometry.BoundingBox.Left


def test_json_roundtrip_byte_identical(spark, pages_df, doc_words):
    """words → blocks → JSON string → parse → words → text == oracle."""
    js = blocks_to_json(words_to_blocks(doc_words))
    back = blocks_to_words(parse_textract_json(js))
    text = assemble_text(back).join(pages_df.select("url", "text"), "url")
    # round 2: empty docs/pages survive the roundtrip too (empty Blocks)
    assert text.count() == pages_df.count()
    assert text.filter("extracted_text <> text").count() == 0


def test_roundtrip_preserves_word_detail(spark, doc_words):
    orig = words_view(doc_words).select(
        "url", "page_num", "line_id", "text", "conf", "word_id")
    back_doc = blocks_to_words(parse_textract_json(
        blocks_to_json(words_to_blocks(doc_words))))
    back = words_view(back_doc).select(
        "url", "page_num", "line_id", "text", "conf",
        F.col("word_id"))
    assert orig.exceptAll(back).count() == 0
    assert back.exceptAll(orig).count() == 0


def test_enriched_blocks_carry_predictions(spark, doc_words):
    from amazon_textract_transformer_pipeline_spark.operators.enrich import (
        stub_predictions,
    )

    enriched = stub_predictions(words_view(doc_words))
    blocks = words_to_blocks(enriched)
    one = blocks.limit(1).collect()[0]
    words = [b for b in one.Blocks if b.BlockType == "WORD"]
    assert all(w.PredictedClass is not None for w in words)
    assert all(0.5 <= w.PredictedClassConfidence < 1.0 for w in words)
    lines = [b for b in one.Blocks if b.BlockType == "LINE"]
    assert all(ln.PredictedClass is None for ln in lines)


def test_roundtrip_preserves_empty_pages_and_docs(spark):
    """A word-less page and a zero-page document must survive
    serialize → JSON → parse → word view (page existence comes from PAGE
    blocks / the page list, not word presence — ocr_engines/base.py:256-271).
    Round-2 regression: both used to vanish."""
    from amazon_textract_transformer_pipeline_spark.operators.blocks import (
        blocks_to_json,
        blocks_to_words,
        parse_textract_json,
        words_to_blocks,
    )
    from amazon_textract_transformer_pipeline_spark.schemas import DOC_WORDS_SCHEMA

    word = {"text": "hi", "conf": 99.0, "id": "w1", "line_id": 0,
            "box": {"left": 0.1, "top": 0.1, "width": 0.1, "height": 0.1}}
    rows = [
        ("doc://full", 2, [{"page_num": 1, "words": [word]},
                           {"page_num": 2, "words": []}]),   # empty page 2
        ("doc://empty", 0, []),                               # zero pages
    ]
    dw = spark.createDataFrame(rows, DOC_WORDS_SCHEMA)
    rt = {r.url: r for r in blocks_to_words(
        parse_textract_json(blocks_to_json(words_to_blocks(dw)))).collect()}
    assert set(rt) == {"doc://full", "doc://empty"}
    assert rt["doc://full"].n_pages == 2
    assert [len(p["words"]) for p in rt["doc://full"].pages] == [1, 0]
    assert rt["doc://empty"].n_pages == 0 and rt["doc://empty"].pages == []


def test_sync_api_json_without_page_numbers(spark):
    """Textract's *sync* API omits the Page attribute on single-page docs
    (async always sets it). Words must land on page 1, not be dropped via a
    NULL-key join."""
    import json

    doc = {
        "JobStatus": "SUCCEEDED",
        "DocumentMetadata": {"Pages": 1},
        "Blocks": [
            {"BlockType": "PAGE", "Id": "p1",
             "Geometry": {"BoundingBox": {"Left": 0.0, "Top": 0.0,
                                          "Width": 1.0, "Height": 1.0}},
             "Relationships": [{"Type": "CHILD", "Ids": ["l1"]}]},
            {"BlockType": "LINE", "Id": "l1", "Text": "hello world",
             "Confidence": 99.0,
             "Geometry": {"BoundingBox": {"Left": 0.1, "Top": 0.1,
                                          "Width": 0.5, "Height": 0.05}},
             "Relationships": [{"Type": "CHILD", "Ids": ["w1", "w2"]}]},
            {"BlockType": "WORD", "Id": "w1", "Text": "hello",
             "Confidence": 99.0,
             "Geometry": {"BoundingBox": {"Left": 0.1, "Top": 0.1,
                                          "Width": 0.2, "Height": 0.05}}},
            {"BlockType": "WORD", "Id": "w2", "Text": "world",
             "Confidence": 98.0,
             "Geometry": {"BoundingBox": {"Left": 0.35, "Top": 0.1,
                                          "Width": 0.2, "Height": 0.05}}},
        ],
    }
    df = spark.createDataFrame([("doc://sync", json.dumps(doc))],
                               ["url", "textract_json"])
    rt = blocks_to_words(parse_textract_json(df)).collect()
    assert len(rt) == 1
    r = rt[0]
    assert r.n_pages == 1
    assert r.pages[0]["page_num"] == 1
    assert [w["text"] for w in r.pages[0]["words"]] == ["hello", "world"]


def test_trp_accessors(spark, doc_words):
    """block_index / get_block_by_id / page_blocks — the relational
    getBlockById + page.blocks conveniences (inference.py:100-130)."""
    from amazon_textract_transformer_pipeline_spark.operators.blocks import (
        block_index,
        get_block_by_id,
        page_blocks,
        words_to_blocks,
    )

    tb = words_to_blocks(doc_words)
    ix = block_index(tb).cache()
    # every block id unique within its doc; types partition the rows
    n = ix.count()
    assert ix.select("url", "block_id").distinct().count() == n
    types = {r.block_type for r in ix.select("block_type").distinct().collect()}
    assert types == {"PAGE", "LINE", "WORD"}

    # point lookup returns the same struct the index row carries
    some = ix.filter("block_type = 'WORD'").limit(1).collect()[0]
    blk = get_block_by_id(tb, some.url, some.block_id)
    assert blk is not None and blk.Id == some.block_id and blk.Text is not None
    assert get_block_by_id(tb, some.url, "no-such-id") is None

    # page_blocks: per (url, page) slice, original block order, PAGE first
    pb = {(r.url, r.page_num): r.Blocks for r in page_blocks(tb).collect()}
    assert all(bs[0].BlockType == "PAGE" for bs in pb.values())
    # reassembling all pages recovers every block of the doc
    total = sum(len(bs) for bs in pb.values())
    assert total == n
