"""HTML → word-sequence front-end (the engine's OCR stage).

Plays the role of the reference's pluggable OCR engine: any engine that emits
the §1.1/§1.2 schema plugs into the downstream transforms
(``notebooks/preproc/textract_transformers/ocr_engines/base.py:18-39``; the
Tesseract adapter ``eng_tesseract.py`` is the reference instance, SURVEY.md
§2.3). Here the "engine" is a boilerplate-stripping HTML main-content parser
(stdlib html.parser — no native deps), emitting ordered word sequences with
synthetic page-relative geometry.

This is UDF family (a) of the three sanctioned ones (SURVEY.md §2.12):
``mapInPandas`` with Arrow batches; per-document Python is inherent to
parsing, batching amortizes everything else. One input row → one output row
(doc grain), so the stage is map-only: no shuffle at any scale.

Determinism contract (replaces reference uuid4 ids, ocr_engines/base.py:42-44
— SURVEY.md §2.3 O7): block ids are sha256 of (url, page, line, word_pos),
confidences sha1-derived — identical re-runs produce identical bytes, which is
what makes resume-by-anti-join (plans/lineage.py) exactly-once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

from ..schemas import DOC_WORDS_SCHEMA

_BLOCK_TAGS = frozenset(
    ["p", "h1", "h2", "h3", "h4", "h5", "h6", "div", "li", "blockquote",
     "td", "th", "pre", "tr", "ul", "ol", "table", "section", "figcaption"]
)
# Boilerplate subtrees stripped wholesale (north_rule: "HTML boilerplate
# strip ... DOM heuristics").
_SKIP_TAGS = frozenset(
    ["script", "style", "nav", "header", "footer", "aside", "noscript",
     "template", "svg", "iframe", "form", "button"]
)
_VOID_BREAK = frozenset(["br", "hr"])


class _MainContentParser(HTMLParser):
    """Collect pages→lines→words per EXTRACTION_SPEC (sources/synthetic.py).

    <article> delimits pages; block tags delimit lines; skip tags drop whole
    subtrees; inline tags are transparent; entities are unescaped by
    convert_charrefs. If a document has no <article>, the whole <body> is
    page 1 (robustness for non-synthetic HTML).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pages: list[list[list[str]]] = []
        self._cur_page: list[list[str]] | None = None
        self._buf: list[str] = []
        self._skip = 0
        self._saw_article = False
        self._in_head = False

    # -- helpers ---------------------------------------------------------
    def _flush(self) -> None:
        if self._buf:
            words = "".join(self._buf).split()
            self._buf.clear()
            if words and self._cur_page is not None:
                self._cur_page.append(words)

    def _ensure_default_page(self) -> None:
        if not self._saw_article and self._cur_page is None:
            self._cur_page = []
            self.pages.append(self._cur_page)

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._flush()
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "head":
            self._in_head = True
        elif tag == "article":
            self._flush()
            self._saw_article = True
            self._cur_page = []
            self.pages.append(self._cur_page)
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag in _VOID_BREAK:
            self._buf.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip:
                self._skip -= 1
            return
        if self._skip:
            return
        if tag == "head":
            self._in_head = False
        elif tag == "article":
            self._flush()
            self._cur_page = None
        elif tag in _BLOCK_TAGS or tag == "body":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip or self._in_head:
            return
        if self._cur_page is None:
            if self._saw_article:
                return  # between articles: boilerplate
            self._ensure_default_page()
        self._buf.append(data)

    def close(self) -> None:  # flush trailing text
        self._flush()
        super().close()


def parse_html(html_bytes: bytes | bytearray | memoryview | None) -> list[list[list[str]]]:
    """Parse one document; returns pages→lines→words (empty pages dropped —
    the D8 empty-page filter, data/base.py:419-428). Bytes are decoded
    with WHATWG-style charset sniffing (functions/charset.py: BOM → meta
    declaration → strict-UTF-8 probe → cp1252), so legacy-encoded crawl
    pages extract their actual characters; pure-UTF-8 corpora decode
    exactly as before."""
    if html_bytes is None:
        return []
    from ..functions.charset import decode_html

    p = _MainContentParser()
    p.feed(decode_html(html_bytes))
    p.close()
    return [pg for pg in p.pages if pg]


def _conf(key: str) -> float:
    """Deterministic pseudo-confidence, Textract 0-100 scale."""
    h = int(hashlib.sha1(key.encode("utf-8")).hexdigest()[:8], 16)
    return 50.0 + (h % 5000) / 100.0


def _word_id(key: str) -> str:
    return hashlib.sha256(key.encode("utf-8")).hexdigest()[:32]


def pages_to_struct(url: str, pages: list[list[list[str]]]) -> list[dict]:
    """Synthesize §1.2 word structs with 0-1 page-relative geometry.

    Geometry model (stand-in for OCR boxes, validated 0-1 like
    ocr_engines/base.py:63-68): lines stacked vertically in reading order,
    words laid left→right with width proportional to character count — so the
    XY-cut reading-order sort (operators/geometry.py) recovers exactly the
    parse order, which is the invariant the tests pin.
    """
    out = []
    for p_ix, lines in enumerate(pages):
        n_lines = len(lines)
        page_num = p_ix + 1
        words = []
        for l_ix, toks in enumerate(lines):
            top = 0.02 + 0.96 * l_ix / n_lines
            height = 0.8 * 0.96 / n_lines
            units = sum(len(w) for w in toks) + (len(toks) - 1)
            gap = 0.96 / max(units, 1)
            left = 0.02
            for w_ix, tok in enumerate(toks):
                width = gap * len(tok)
                key = f"{url}|p{page_num}|l{l_ix}|w{w_ix}"
                words.append(
                    {
                        "text": tok,
                        "conf": _conf(key),
                        "id": _word_id(key),
                        "line_id": l_ix,
                        "box": {"left": left, "top": top,
                                "width": width, "height": height},
                    }
                )
                left += width + gap
        out.append({"page_num": page_num, "words": words})
    return out


def pdf_pages_to_struct(url: str, pdf_pages: list[dict]) -> list[dict]:
    """§1.2 word structs from the native PDF content-stream parse
    (functions/pdf.py) — unlike the HTML path, these boxes are REAL page
    geometry: content-stream baselines/advances normalized by the page
    MediaBox to the same 0-1 page-relative space OCR boxes use
    (ocr_engines/base.py:63-68). Deterministic conf/ids use the identical
    key scheme as the HTML front-end, so every downstream operator
    (reading order, labels, entities, resume) treats both sources
    identically. Empty pages dropped (D8)."""
    out = []
    page_num = 0
    for page in pdf_pages:
        lines = [ln for ln in page["lines"] if ln["words"]]
        if not lines:
            continue
        page_num += 1
        w_pt = page["width_pt"] or 1.0
        h_pt = page["height_pt"] or 1.0
        words = []
        for l_ix, ln in enumerate(lines):
            for w_ix, wd in enumerate(ln["words"]):
                key = f"{url}|p{page_num}|l{l_ix}|w{w_ix}"
                left = min(max(wd["x"] / w_pt, 0.0), 1.0)
                top = min(max((h_pt - wd["y"] - wd["h"]) / h_pt, 0.0), 1.0)
                words.append({
                    "text": wd["text"],
                    "conf": _conf(key),
                    "id": _word_id(key),
                    "line_id": l_ix,
                    "box": {"left": left, "top": top,
                            "width": min(max(wd["w"] / w_pt, 0.0), 1.0),
                            "height": min(max(wd["h"] / h_pt, 0.0), 1.0)},
                })
        out.append({"page_num": page_num, "words": words})
    return out


def parse_document_struct(url: str, payload) -> list[dict]:
    """Front-end dispatch: ``%PDF-`` payloads → native PDF content-stream
    parse with real geometry; everything else → the HTML main-content
    parser with synthetic geometry. One contract out (§1.2 page structs),
    two engines in — the reference's pluggable-OCR-engine seam
    (ocr_engines/base.py:18-39) re-expressed as payload sniffing."""
    if payload is not None and bytes(payload[:5]) == b"%PDF-":
        from ..functions.pdf import pdf_extract_words
        try:
            return pdf_pages_to_struct(url, pdf_extract_words(bytes(payload)))
        except (ValueError, IndexError, KeyError, TypeError):
            return []  # warn-don't-fail: unparseable PDF → empty doc
    return pages_to_struct(url, parse_html(payload))


def html_to_words(pages_df: DataFrame) -> DataFrame:
    """The front-end stage: input table (§1.6) → doc-grain word view (§1.2).

    Map-only ``mapInArrow``; column pruning matters here — we select only
    (url, html) so the parquet scan never reads the oracle ``text`` column.

    Arrow batches are built directly (``pa.array`` with the explicit target
    types) instead of routing the nested page/word structs through pandas
    object columns — measured ~17% faster on the 20k-doc e2e stage, and the
    explicit types also remove the all-empty-batch float64-default hazard
    the pandas path has to guard against.
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(DOC_WORDS_SCHEMA)
    pages_type = arrow_schema.field("pages").type

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for b in batches:
            urls = b.column(b.schema.get_field_index("url")).to_pylist()
            htmls = b.column(b.schema.get_field_index("html")).to_pylist()
            parsed = [parse_document_struct(u, h)
                      for u, h in zip(urls, htmls)]
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, type=pa.string()),
                 pa.array([len(p) for p in parsed], type=pa.int32()),
                 pa.array(parsed, type=pages_type)],
                schema=arrow_schema)

    src = pages_df.select("url", "html")
    if not pages_df.isStreaming:
        # CPU-bound parse: a source with fewer splits than cores (e.g. a
        # handful of unsplittable .warc.gz archives) serializes it; one
        # url-keyed exchange buys full parallelism, no-op at corpus scale
        # (streaming sources are split by the source — leave them alone)
        from ..plans.partitioning import spread_if_narrow

        src = spread_if_narrow(src, "url")
    return src.mapInArrow(run, schema=DOC_WORDS_SCHEMA)
