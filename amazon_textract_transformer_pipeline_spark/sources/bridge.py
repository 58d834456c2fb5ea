"""documents-table → pages-table bridge (driver-oracle substrate).

The driver's correctness gate runs over its own parquet tables
(TESTDATA.md); our engine's native input is the pages table (§1.6). This
bridge renders each ``documents.text`` row into a deterministic HTML page
document — same markup family as sources/synthetic.py — so the *full*
front-end + downstream pipeline executes under the DuckDB-oracle gate:
the oracle recomputes the expected extraction from ``documents.text`` with
pure SQL (the layout constants below are mirrored in __spark_entry__.py's
oracle strings).

Layout contract (keep in sync with the oracle SQL):
  words     = whitespace-split of text, empties dropped
  lines     = consecutive chunks of WORDS_PER_LINE words
  pages     = consecutive chunks of LINES_PER_PAGE lines
  url       = 'doc://' || doc_id
  expected  = lines joined by chr(10) over the whole document
"""

from __future__ import annotations

import html as _html
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

WORDS_PER_LINE = 12
LINES_PER_PAGE = 40

_BRIDGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("html", T.BinaryType(), False),
    ]
)


def render_doc_html(doc_id: int, text: str) -> tuple[str, bytes]:
    words = text.split()
    lines = [words[i:i + WORDS_PER_LINE]
             for i in range(0, len(words), WORDS_PER_LINE)]
    pages = [lines[i:i + LINES_PER_PAGE]
             for i in range(0, len(lines), LINES_PER_PAGE)] or [[]]
    out = ["<!DOCTYPE html><html><head><title>d</title></head><body>",
           "<nav><p>Home About</p></nav>"]
    for pg in pages:
        out.append("<article>")
        for ln in pg:
            out.append("<p>" + " ".join(_html.escape(w) for w in ln) + "</p>")
        out.append("</article>")
    out.append("<footer><p>footer text</p></footer></body></html>")
    return f"doc://{doc_id}", "".join(out).encode("utf-8")


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → (url, html) pages rows; map-only Arrow stage."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls, htmls = [], []
            for did, text in zip(b["doc_id"], b["text"]):
                u, h = render_doc_html(int(did), text or "")
                urls.append(u)
                htmls.append(h)
            yield pd.DataFrame({"url": urls, "html": htmls})

    from ..plans.partitioning import spread_if_narrow

    # the bridge + front-end parse are CPU-bound Python: a one-split local
    # parquet scan would serialize them onto one worker (round-7 fix)
    src = spread_if_narrow(documents.select("doc_id", "text"), "doc_id")
    return src.mapInPandas(run, schema=_BRIDGE_SCHEMA)
