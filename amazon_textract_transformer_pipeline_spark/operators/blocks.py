"""Textract-style block-tree serialization and parsing (SURVEY §2.3 O6, §2.1 S3/S5).

The serialized form is the reference's own emitter schema
(``ocr_engines/base.py:214-295``; FIXTURES.md §2): flat ``Blocks`` list of
PAGE → LINE → WORD with CHILD relationships, geometry as BoundingBox +
4-corner Polygon, ``DocumentMetadata.Pages``, ``JobStatus``. This is the
interchange boundary: a reference user's existing Textract JSON loads via
:func:`parse_textract_json` + :func:`blocks_to_words`, and our word view
serializes back via :func:`words_to_blocks` + ``to_json``.

Derived values per the reference: LINE text = words joined " "
(base.py:221), LINE confidence = mean word confidence
(eng_tesseract.py:134), LINE/PAGE geometry = union of children (O5,
base.py:113-129), PAGE box = full page. Ids are deterministic sha256
(replacing uuid4, base.py:42-44 — SURVEY §2.3 O7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import PAGE_SCHEMA, TEXTRACT_DOC_SCHEMA
from .assembly import words_view

MODEL_VERSION = "custom-html-frontend-1.0"


def _poly(left, top, width, height):
    return F.array(
        F.struct(left.alias("X"), top.alias("Y")),
        F.struct((left + width).alias("X"), top.alias("Y")),
        F.struct((left + width).alias("X"), (top + height).alias("Y")),
        F.struct(left.alias("X"), (top + height).alias("Y")),
    )


def _geom(left, top, width, height):
    return F.struct(
        F.struct(
            width.alias("Width"), height.alias("Height"),
            left.alias("Left"), top.alias("Top"),
        ).alias("BoundingBox"),
        _poly(left, top, width, height).alias("Polygon"),
    )


def _block_id(*parts) -> F.Column:
    return F.substring(F.sha2(F.concat_ws("|", *parts), 256), 1, 32)


def words_to_blocks(doc_words: DataFrame) -> DataFrame:
    """Word view → Textract-style document rows (TEXTRACT_DOC_SCHEMA columns
    + url). Accepts the doc-grain nested view or an (optionally enriched)
    flat word relation — enrichment columns (pred_cls/pcc/probs) serialize
    onto WORD blocks, the I4 JSON re-annotation (inference.py:484-492) in
    relational form. Shuffles on url only (line/page rollups reuse the same
    partitioning).

    When given the doc-grain nested view, empty pages (and fully empty
    documents) still serialize as word-less PAGE blocks — matching the
    reference emitter, where page existence comes from the page list, not
    from word presence (ocr_engines/base.py:256-271)."""
    skel = None
    if "pages" in doc_words.columns:
        skel = doc_words.select(
            "url", F.explode("pages").alias("_p")
        ).select("url", F.col("_p.page_num").alias("page_num"))
    wv = words_view(doc_words) if "pages" in doc_words.columns else doc_words
    wv = wv.withColumn(
        "line_uid", _block_id("url", F.lit("p"), "page_num", F.lit("L"), "line_id")
    )

    word_blocks = wv.select(
        "url", "page_num", "line_id", "word_pos", "line_uid",
        F.struct(
            F.col("word_id").alias("Id"),
            F.lit("WORD").alias("BlockType"),
            F.col("text").alias("Text"),
            F.col("conf").alias("Confidence"),
            F.col("page_num").alias("Page"),
            _geom(F.col("box.left"), F.col("box.top"),
                  F.col("box.width"), F.col("box.height")).alias("Geometry"),
            F.lit(None).cast(
                "array<struct<Type:string,Ids:array<string>>>").alias("Relationships"),
            F.col("pred_cls").alias("PredictedClass") if "pred_cls" in wv.columns
            else F.lit(None).cast("int").alias("PredictedClass"),
            F.col("pcc").alias("PredictedClassConfidence") if "pcc" in wv.columns
            else F.lit(None).cast("double").alias("PredictedClassConfidence"),
            F.col("probs").alias("ClassificationProbabilities") if "probs" in wv.columns
            else F.lit(None).cast("array<double>").alias("ClassificationProbabilities"),
        ).alias("block"),
    )

    lines = (
        word_blocks.groupBy("url", "page_num", "line_id", "line_uid")
        .agg(
            F.array_sort(F.collect_list(F.struct(
                F.col("word_pos").alias("p"), F.col("block").alias("b")))).alias("wbs"),
            F.avg(F.col("block.Confidence")).alias("line_conf"),
            F.min("block.Geometry.BoundingBox.Left").alias("_l"),
            F.min("block.Geometry.BoundingBox.Top").alias("_t"),
            F.max(F.col("block.Geometry.BoundingBox.Left")
                  + F.col("block.Geometry.BoundingBox.Width")).alias("_r"),
            F.max(F.col("block.Geometry.BoundingBox.Top")
                  + F.col("block.Geometry.BoundingBox.Height")).alias("_b"),
        )
        .select(
            "url", "page_num", "line_id",
            F.expr("transform(wbs, x -> x.b)").alias("word_blocks"),
            F.struct(
                F.col("line_uid").alias("Id"),
                F.lit("LINE").alias("BlockType"),
                F.array_join(F.expr("transform(wbs, x -> x.b.Text)"), " ").alias("Text"),
                F.col("line_conf").alias("Confidence"),
                F.col("page_num").alias("Page"),
                _geom(F.col("_l"), F.col("_t"),
                      F.col("_r") - F.col("_l"), F.col("_b") - F.col("_t")).alias("Geometry"),
                F.array(F.struct(
                    F.lit("CHILD").alias("Type"),
                    F.expr("transform(wbs, x -> x.b.Id)").alias("Ids"),
                )).alias("Relationships"),
                F.lit(None).cast("int").alias("PredictedClass"),
                F.lit(None).cast("double").alias("PredictedClassConfidence"),
                F.lit(None).cast("array<double>").alias("ClassificationProbabilities"),
            ).alias("line_block"),
        )
    )

    page_lines = (
        lines.groupBy("url", "page_num")
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("line_id").alias("l"),
            F.col("line_block").alias("lb"),
            F.col("word_blocks").alias("wbs")))).alias("lbs"))
    )
    if skel is not None:
        # keep word-less pages: page rows come from the page skeleton, lbs
        # stays NULL and the expressions below fall back to empty arrays
        page_lines = skel.join(page_lines, ["url", "page_num"], "left")
    pages = (
        page_lines
        .select(
            "url", "page_num",
            F.struct(
                _block_id("url", F.lit("p"), "page_num").alias("Id"),
                F.lit("PAGE").alias("BlockType"),
                F.lit(None).cast("string").alias("Text"),
                F.lit(None).cast("double").alias("Confidence"),
                F.col("page_num").alias("Page"),
                _geom(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0)).alias("Geometry"),
                F.array(F.struct(
                    F.lit("CHILD").alias("Type"),
                    F.expr("coalesce(transform(lbs, x -> x.lb.Id), "
                           "cast(array() as array<string>))").alias("Ids"),
                )).alias("Relationships"),
                F.lit(None).cast("int").alias("PredictedClass"),
                F.lit(None).cast("double").alias("PredictedClassConfidence"),
                F.lit(None).cast("array<double>").alias("ClassificationProbabilities"),
            ).alias("page_block"),
            # page blocks then line+word blocks in order (base.py:278-289);
            # NULL lbs (empty page) → NULL here, defaulted at doc assembly
            F.expr(
                "flatten(transform(lbs, x -> concat(array(x.lb), x.wbs)))"
            ).alias("line_word_blocks"),
        )
    )

    assembled = (
        pages.groupBy("url")
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("page_num").alias("p"),
            F.col("page_block").alias("pb"),
            F.col("line_word_blocks").alias("lw")))).alias("pgs"))
        .select(
            "url",
            F.size("pgs").alias("_n_pages"),
            # filter(array(x.pb), y -> false) = a correctly-typed empty
            # block array for word-less pages (NULL x.lw)
            F.expr(
                "flatten(transform(pgs, x -> concat(array(x.pb), "
                "coalesce(x.lw, filter(array(x.pb), y -> false)))))"
            ).alias("Blocks"),
        )
    )
    # a zero-page document (pages = []) still serializes: Blocks = [] and
    # DocumentMetadata.Pages = 0, so the url survives the roundtrip
    urls = (doc_words if skel is not None else wv).select("url").distinct()
    empty_blocks = F.array().cast(TEXTRACT_DOC_SCHEMA["Blocks"].dataType)
    return (
        urls.join(assembled, "url", "left")
        .select(
            "url",
            F.lit(MODEL_VERSION).alias("DetectDocumentTextModelVersion"),
            F.struct(F.coalesce("_n_pages", F.lit(0)).alias("Pages"))
            .alias("DocumentMetadata"),
            F.lit("SUCCEEDED").alias("JobStatus"),
            F.coalesce("Blocks", empty_blocks).alias("Blocks"),
        )
    )


def blocks_to_json(doc_blocks: DataFrame) -> DataFrame:
    """S5 sink form: one Textract-compatible JSON string per document."""
    return doc_blocks.select(
        "url",
        F.to_json(F.struct(
            "DetectDocumentTextModelVersion", "DocumentMetadata",
            "JobStatus", "Blocks",
        ), {"ignoreNullFields": "true"}).alias("textract_json"),
    )


def parse_textract_json(df: DataFrame, json_col: str = "textract_json") -> DataFrame:
    """S3 source: JSON string/binary column → typed block tree
    (``from_json`` with the fixed schema — never schema inference,
    SURVEY §1.4)."""
    parsed = df.withColumn("_doc", F.from_json(
        F.col(json_col).cast("string"), TEXTRACT_DOC_SCHEMA))
    return parsed.select(
        *[c for c in df.columns if c != json_col],
        F.col("_doc.DetectDocumentTextModelVersion").alias("DetectDocumentTextModelVersion"),
        F.col("_doc.DocumentMetadata").alias("DocumentMetadata"),
        F.col("_doc.JobStatus").alias("JobStatus"),
        F.col("_doc.Blocks").alias("Blocks"),
    )


def blocks_to_words(doc_blocks: DataFrame) -> DataFrame:
    """Inverse of words_to_blocks: block tree → doc-grain word view (§1.2).

    Rebuilds trp-style accessors relationally: LINE CHILD relationships give
    word order and line membership (trp.Document semantics,
    fn-postprocess/main.py:77). All joins are within-document.
    """
    # Textract's *sync* API omits Page on single-page documents (the async
    # API always sets it) — coalesce NULL Page to 1 everywhere so the
    # [url, page_num] equi-joins below still match; a NULL key would
    # silently drop every word of such a document.
    lines = (
        doc_blocks.select("url", F.posexplode("Blocks").alias("bpos", "b"))
        .filter(F.col("b.BlockType") == "LINE")
        .select(
            "url",
            F.coalesce(F.col("b.Page"), F.lit(1)).alias("page_num"),
            F.col("bpos").alias("line_pos"),
            F.explode(F.expr(
                "filter(b.Relationships, r -> r.Type = 'CHILD')[0].Ids"
            )).alias("child_id"),
        )
        .withColumn(
            "line_id",
            F.dense_rank().over(
                Window.partitionBy("url", "page_num").orderBy("line_pos")) - 1,
        )
    )
    words = (
        doc_blocks.select("url", F.posexplode("Blocks").alias("bpos", "b"))
        .filter(F.col("b.BlockType") == "WORD")
        .select(
            "url",
            F.col("b.Id").alias("child_id"),
            F.col("bpos").alias("word_block_pos"),
            F.col("b.Text").alias("text"),
            F.col("b.Confidence").alias("conf"),
            # Polygon fallback: third-party Textract-style JSON may carry
            # only the 4-corner Polygon (the reference serializes both,
            # ocr_engines/base.py:131-141); derive the axis-aligned box from
            # the polygon envelope when BoundingBox is absent.
            F.struct(
                F.coalesce(
                    F.col("b.Geometry.BoundingBox.Left"),
                    F.expr("array_min(transform(b.Geometry.Polygon, p -> p.X))"),
                ).alias("left"),
                F.coalesce(
                    F.col("b.Geometry.BoundingBox.Top"),
                    F.expr("array_min(transform(b.Geometry.Polygon, p -> p.Y))"),
                ).alias("top"),
                F.coalesce(
                    F.col("b.Geometry.BoundingBox.Width"),
                    F.expr("array_max(transform(b.Geometry.Polygon, p -> p.X)) "
                           "- array_min(transform(b.Geometry.Polygon, p -> p.X))"),
                ).alias("width"),
                F.coalesce(
                    F.col("b.Geometry.BoundingBox.Height"),
                    F.expr("array_max(transform(b.Geometry.Polygon, p -> p.Y)) "
                           "- array_min(transform(b.Geometry.Polygon, p -> p.Y))"),
                ).alias("height"),
            ).alias("box"),
            F.col("b.PredictedClass").alias("pred_cls"),
            F.col("b.PredictedClassConfidence").alias("pcc"),
        )
    )
    wv = lines.join(words, ["url", "child_id"])
    page_words = (
        wv.groupBy("url", "page_num")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(word_block_pos as o, "
            "struct(text, conf, child_id as id, line_id, box) as w))), x -> x.w)"
        ).alias("words"))
    )
    # Page skeleton from the PAGE blocks, not from word presence: a page
    # with no words (and a document with none at all) must survive the
    # roundtrip — trp keeps empty pages too (trp_page_has_content is a
    # separate filter, notebooks/util/preproc.py:97-98). Unioned with pages
    # observed on content blocks so malformed third-party JSON lacking PAGE
    # blocks still keeps its words.
    page_skel = (
        doc_blocks.select("url", F.explode("Blocks").alias("b"))
        .filter(F.col("b.BlockType") == "PAGE")
        .select("url", F.coalesce(F.col("b.Page"), F.lit(1)).alias("page_num"))
        .unionByName(page_words.select("url", "page_num"))
        .distinct()
    )
    empty_words = F.expr(
        "cast(array() as array<struct<text:string,conf:double,id:string,"
        "line_id:int,box:struct<left:double,top:double,width:double,"
        "height:double>>>)")
    full = page_skel.join(page_words, ["url", "page_num"], "left") \
        .withColumn("words", F.coalesce("words", empty_words))
    assembled = (
        full.groupBy("url")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(page_num, words))), "
            "x -> struct(x.page_num as page_num, x.words as words))"
        ).alias("pages"))
    )
    # zero-page documents (Blocks = []) keep their row: pages = [] typed
    from pyspark.sql import types as T

    empty_pages = F.array().cast(T.ArrayType(PAGE_SCHEMA))
    return (
        doc_blocks.select("url").distinct()
        .join(assembled, "url", "left")
        .withColumn("pages", F.coalesce("pages", empty_pages))
        .select("url", F.size("pages").alias("n_pages"), "pages")
    )


def block_index(doc_blocks: DataFrame) -> DataFrame:
    """trp-style ``doc.getBlockById`` relationally (reference
    ``notebooks/src/code/inference.py:122,484`` uses trp lookups while
    paging through results): one row per block keyed (url, block_id) with
    its position and parsed struct — the join-side of any by-id lookup.
    Page is coalesced to 1 for sync-API JSON that omits it."""
    return doc_blocks.select(
        "url", F.posexplode("Blocks").alias("block_pos", "block")
    ).select(
        "url",
        F.col("block.Id").alias("block_id"),
        F.col("block.BlockType").alias("block_type"),
        F.coalesce(F.col("block.Page"), F.lit(1)).alias("page_num"),
        "block_pos", "block",
    )


def get_block_by_id(doc_blocks: DataFrame, url: str, block_id: str):
    """Driver-side convenience for porting trp code: fetch ONE block struct
    by (url, id). A point lookup, not a pipeline stage — for bulk joins use
    :func:`block_index` directly."""
    rows = (
        block_index(doc_blocks)
        .filter((F.col("url") == url) & (F.col("block_id") == block_id))
        .select("block").limit(1).collect()
    )
    return rows[0].block if rows else None


def page_blocks(doc_blocks: DataFrame) -> DataFrame:
    """trp ``page.blocks`` / ``extract_textract_page`` analog (reference
    inference.py:100-130): blocks grouped back per page, in original block
    order — the relational form of slicing one page's JSON out of a doc."""
    ix = block_index(doc_blocks)
    return (
        ix.groupBy("url", "page_num")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(block_pos, block))), "
            "x -> x.block)").alias("Blocks"))
    )
