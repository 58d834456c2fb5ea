"""Densitometric main-content classification (the north rule's "DOM
heuristics" leg, beyond the tag-based strip in operators/frontend.py).

Implements the shallow-text-feature block classifier of Kohlschuetter,
Fankhauser & Nejdl, *Boilerplate Detection Using Shallow Text Features*
(WSDM 2010) — the "NumWordsRulesClassifier" decision tree that classifies
each DOM text block as content or boilerplate from just (word count, link
density) of the block and its neighbours. The reference pipeline never
needs this (its inputs are scans/PDFs, not crawl HTML), but a Common-
Crawl-scale extraction pipeline does: tag-based stripping misses link
farms inside `<div>` soup, and the densitometric tree is the classic
language-agnostic answer.

Spark-first split of the work:

* **Per-doc parsing is Python** — :func:`html_to_blocks` is the same
  sanctioned Arrow family as the word front-end (``mapInArrow``, batch
  amortized, map-only, no shuffle): HTML bytes → one row per text block
  with (n_words, n_link_words).
* **Classification is relational** — the decision tree needs each
  block's *neighbours*, i.e. one ``lag``/``lead`` window per document,
  then a pure CASE projection. That stays JVM-side and oracle-checkable;
  :func:`classifier_case` emits the identical expression for Spark SQL
  and DuckDB (the one-builder-both-dialects pattern of textstats.py).

At 10^12-doc scale the only exchange is the per-document window (same
key profile as the entity-mention windows: doc-grain keys, skew-free by
construction), and it shares a single shuffle with the final per-doc
reassembly because both partition on the id column.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from html.parser import HTMLParser

#: tags whose subtree is dropped wholesale — non-text payloads only; unlike
#: the frontend's _SKIP_TAGS this deliberately KEEPS nav/header/footer/aside
#: so the densitometric classifier (not the tag name) decides their fate.
_NONTEXT_TAGS = frozenset(
    ["script", "style", "noscript", "template", "svg", "iframe"])

#: block-level boundaries (superset match with frontend._BLOCK_TAGS plus the
#: structural tags the classifier treats as separators).
_BLOCK_TAGS = frozenset(
    ["p", "h1", "h2", "h3", "h4", "h5", "h6", "div", "li", "blockquote",
     "td", "th", "pre", "tr", "ul", "ol", "table", "section", "article",
     "figcaption", "nav", "header", "footer", "aside", "main", "body"])

_VOID_BREAK = frozenset(["br", "hr"])

#: the WSDM-2010 NumWordsRules thresholds (verbatim from the paper's tree).
MAX_LINK_DENSITY = 0.333333
PREV_LINK_DENSITY = 0.555556


class _BlockParser(HTMLParser):
    """HTML → ordered text blocks with word / anchor-word counts.

    A block is the text between block-level tag boundaries; anchor depth
    is tracked so words inside ``<a>`` count toward link density. Empty
    blocks are not emitted (they carry no densitometric signal; the
    WSDM-2010 features are defined on non-empty text blocks).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, words, link_w)
        self._segs: list[tuple[str, bool]] = []  # (data, inside_anchor)
        self._a_depth = 0
        self._skip = 0

    def _flush(self) -> None:
        if not self._segs:
            return
        segs, self._segs = self._segs, []
        full = "".join(s for s, _ in segs)
        words = full.split()
        if not words:
            return
        # link words: tokens of each maximal in-anchor run (adjacent
        # same-flag segments merged so split data chunks don't split words)
        link_w = 0
        run: list[str] = []
        run_flag = False
        for s, flag in segs + [("", not segs[-1][1])]:
            if flag == run_flag:
                run.append(s)
            else:
                if run_flag:
                    link_w += len("".join(run).split())
                run = [s]
                run_flag = flag
        self.blocks.append((" ".join(words), len(words), link_w))

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _NONTEXT_TAGS:
            self._flush()
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "a":
            self._a_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag in _VOID_BREAK:
            self._segs.append((" ", self._a_depth > 0))

    def handle_endtag(self, tag: str) -> None:
        if tag in _NONTEXT_TAGS:
            if self._skip:
                self._skip -= 1
            return
        if self._skip:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        self._segs.append((data, self._a_depth > 0))

    def close(self) -> None:
        self._flush()
        super().close()


def parse_blocks(html_bytes) -> list[tuple[str, int, int]]:
    """One document's ordered (text, n_words, n_link_words) blocks."""
    if html_bytes is None:
        return []
    from ..functions.charset import decode_html

    p = _BlockParser()
    p.feed(decode_html(html_bytes))
    p.close()
    return p.blocks


_BLOCKS_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("block_ix", IntegerType(), False),
    StructField("block_text", StringType(), False),
    StructField("n_words", IntegerType(), False),
    StructField("n_link_words", IntegerType(), False),
])


def html_to_blocks(pages_df: DataFrame, id_col: str = "url") -> DataFrame:
    """(id, html) → one row per text block, in document order. Map-only."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = StructType([
        StructField(id_col, pages_df.schema[id_col].dataType, False)]
        + _BLOCKS_SCHEMA.fields[1:])
    arrow_schema = to_arrow_schema(schema)

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for b in batches:
            ids = b.column(b.schema.get_field_index(id_col)).to_pylist()
            htmls = b.column(b.schema.get_field_index("html")).to_pylist()
            out_id, out_ix, out_tx, out_nw, out_lw = [], [], [], [], []
            for i, h in zip(ids, htmls):
                for ix, (text, nw, lw) in enumerate(parse_blocks(h)):
                    out_id.append(i)
                    out_ix.append(ix)
                    out_tx.append(text)
                    out_nw.append(nw)
                    out_lw.append(lw)
            if out_id:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_id, type=arrow_schema.field(0).type),
                     pa.array(out_ix, type=pa.int32()),
                     pa.array(out_tx, type=pa.string()),
                     pa.array(out_nw, type=pa.int32()),
                     pa.array(out_lw, type=pa.int32())],
                    schema=arrow_schema)

    return pages_df.select(id_col, "html").mapInArrow(run, schema=schema)


def link_density_sql(nw: str = "n_words", lw: str = "n_link_words") -> str:
    """Engine-neutral link density (0 when the block has no words)."""
    return (f"CASE WHEN {nw} = 0 THEN 0.0 "
            f"ELSE cast({lw} AS double) / {nw} END")


def classifier_case(cur_w: str = "n_words",
                    cur_ld: str = "link_density",
                    prev_w: str = "prev_words",
                    prev_ld: str = "prev_link_density",
                    next_w: str = "next_words") -> str:
    """The WSDM-2010 NumWordsRules tree as one CASE expression — valid
    verbatim in both Spark SQL and DuckDB (shared-builder oracle pattern).

    Tree (paper/boilerpipe constants 0.333333 / 0.555556 / 16 / 15 / 4 /
    40 / 17, boundary blocks use an empty neighbour = 0 words, 0 density):

    * current link density > 1/3 → boilerplate;
    * low-density neighbourhood: content iff the current block is long
      (>16 words), or the next is (>15), or the previous has >4 words;
    * after a link-dense block (nav/menu context): content only if the
      current block is long (>40) or the next is (>17).
    """
    return f"""CASE
  WHEN {cur_ld} > {MAX_LINK_DENSITY} THEN false
  WHEN {prev_ld} <= {PREV_LINK_DENSITY} THEN
    CASE WHEN {cur_w} > 16 THEN true
         WHEN {next_w} > 15 THEN true
         ELSE {prev_w} > 4 END
  ELSE ({cur_w} > 40 OR {next_w} > 17)
END"""


def classify_blocks(blocks: DataFrame, id_col: str = "url") -> DataFrame:
    """Add (link_density, prev/next features, is_content) to a block table.

    One window shuffle on the document id; everything else is a codegen'd
    projection of :func:`classifier_case`.
    """
    w = Window.partitionBy(id_col).orderBy("block_ix")
    ld = link_density_sql()
    out = (
        blocks
        .withColumn("link_density", F.expr(ld))
        .withColumn("prev_words",
                    F.coalesce(F.lag("n_words").over(w), F.lit(0)))
        .withColumn("prev_link_density",
                    F.coalesce(F.lag("link_density").over(w), F.lit(0.0)))
        .withColumn("next_words",
                    F.coalesce(F.lead("n_words").over(w), F.lit(0)))
        .withColumn("is_content", F.expr(classifier_case()))
    )
    return out


def main_content_text(classified: DataFrame, id_col: str = "url") -> DataFrame:
    """Per-document main text: content blocks joined in document order,
    plus kept/dropped counts. Groups on the same id the classify window
    partitioned by, so Catalyst reuses one exchange for both."""
    kept = F.expr(
        "filter(sort_array(collect_list(struct(block_ix, block_text, "
        "is_content))), x -> x.is_content)")
    return (
        classified
        .groupBy(id_col)
        .agg(
            kept.alias("_kept"),
            F.count("*").alias("n_blocks"),
            F.sum(F.expr("CASE WHEN is_content THEN 1 ELSE 0 END"))
            .cast("int").alias("n_content_blocks"),
        )
        .select(
            id_col, "n_blocks", "n_content_blocks",
            F.expr("concat_ws(' ', transform(_kept, x -> x.block_text))")
            .alias("main_text"),
        )
    )


def extract_main_content(pages_df: DataFrame,
                         id_col: str = "url") -> DataFrame:
    """(id, html) → (id, n_blocks, n_content_blocks, main_text)."""
    return main_content_text(
        classify_blocks(html_to_blocks(pages_df, id_col), id_col), id_col)


# ---------------------------------------------------------------------------
# Crawl-policy metadata: robots directives, canonical link, title, refresh
# ---------------------------------------------------------------------------

class _MetaParser(HTMLParser):
    """HTML → crawl-policy signals a corpus pipeline must respect before
    a page may enter a training set: robots meta directives (noindex
    pages are excluded by every published CC-derived corpus policy),
    the canonical link (the dedup key the SITE declares, stronger than
    URL canonicalization), the title, and a meta-refresh redirect
    target (crawlers treat it as a redirect — the page body is a shell).

    Pinned semantics:

    * robots: every ``<meta name=robots content=...>`` in the document
      contributes (directives union across tags); tokens split on
      commas, trimmed, lowercased; ``none`` implies both noindex and
      nofollow (robots.txt spec).
    * canonical: the FIRST ``<link rel=... href=...>`` whose rel token
      list contains ``canonical`` (case-insensitive); href kept verbatim
      (no base-href resolution — that is a join against the url column,
      not a parser concern).
    * title: first ``<title>`` with non-whitespace text, inner
      whitespace collapsed.
    * refresh: first ``<meta http-equiv=refresh>`` whose content has a
      ``url=`` part (case-insensitive); target kept verbatim.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.directives: set[str] = set()
        self.canonical: str | None = None
        self.title: str | None = None
        self.refresh_url: str | None = None
        self._in_title = False
        self._title_parts: list[str] = []
        self.n_meta = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        a = {k.lower(): (v or "") for k, v in attrs}
        if tag == "meta":
            self.n_meta += 1
            name = a.get("name", "").strip().lower()
            if name == "robots":
                for tok in a.get("content", "").split(","):
                    t = tok.strip().lower()
                    if t:
                        self.directives.add(t)
            elif a.get("http-equiv", "").strip().lower() == "refresh" \
                    and self.refresh_url is None:
                content = a.get("content", "")
                low = content.lower()
                at = low.find("url=")
                if at >= 0:
                    self.refresh_url = content[at + 4:].strip() or None
        elif tag == "link" and self.canonical is None:
            rels = a.get("rel", "").lower().split()
            if "canonical" in rels and a.get("href"):
                self.canonical = a["href"]
        elif tag == "title" and self.title is None:
            self._in_title = True
            self._title_parts = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._in_title:
            self._in_title = False
            t = " ".join("".join(self._title_parts).split())
            if t and self.title is None:
                self.title = t

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_parts.append(data)


def parse_meta(html_bytes) -> dict:
    """One document's crawl-policy signals (dict of the output columns)."""
    from ..functions.charset import decode_html

    p = _MetaParser()
    if html_bytes is not None:
        p.feed(decode_html(html_bytes))
        p.close()
    d = p.directives
    return {
        "title": p.title,
        "robots_noindex": "noindex" in d or "none" in d,
        "robots_nofollow": "nofollow" in d or "none" in d,
        "canonical_href": p.canonical,
        "refresh_url": p.refresh_url,
        "n_meta_tags": p.n_meta,
    }


_META_FIELDS = [
    StructField("title", StringType(), True),
    StructField("robots_noindex", BooleanType(), False),
    StructField("robots_nofollow", BooleanType(), False),
    StructField("canonical_href", StringType(), True),
    StructField("refresh_url", StringType(), True),
    StructField("n_meta_tags", IntegerType(), False),
]


def html_meta_flags(pages_df: DataFrame, id_col: str = "url") -> DataFrame:
    """(id, html) → one row per document with the crawl-policy columns.
    Same sanctioned Arrow family as :func:`html_to_blocks`: map-only,
    batch-amortized, zero shuffle — at corpus scale the noindex/refresh
    filter runs inside the scan stage before anything shuffles."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = StructType(
        [StructField(id_col, pages_df.schema[id_col].dataType, False)]
        + _META_FIELDS)
    arrow_schema = to_arrow_schema(schema)
    names = [f.name for f in _META_FIELDS]

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for b in batches:
            ids = b.column(b.schema.get_field_index(id_col)).to_pylist()
            htmls = b.column(b.schema.get_field_index("html")).to_pylist()
            cols: dict[str, list] = {n: [] for n in names}
            for h in htmls:
                m = parse_meta(h)
                for n in names:
                    cols[n].append(m[n])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=arrow_schema.field(0).type)]
                + [pa.array(cols[n], type=arrow_schema.field(i + 1).type)
                   for i, n in enumerate(names)],
                schema=arrow_schema)

    return pages_df.select(id_col, "html").mapInArrow(run, schema=schema)
