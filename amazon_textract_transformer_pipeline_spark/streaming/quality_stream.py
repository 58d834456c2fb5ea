"""Streaming corpus-quality gate — the composed pre-training filter
(UT1 blocklist → language ID → Gopher → C4 → DSIR) applied to a page
STREAM. Mirrors the reference's incremental posture (S6 skip-existing:
new objects flow through the same pipeline as the backfill,
`pipeline/fn-trigger/main.py`): a crawl is an arrival stream, and
because every verdict stage after the blocklist suffix-join is a
stateless map-side projection (see PLANS.md `corpus_filter`), the SAME
builder (`webclean.composed_quality_verdicts`) runs unchanged under
Structured Streaming — the blocklist side is a supported stream-static
join, no watermark or state store involved, so output mode is plain
append and batch/stream verdicts are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.webclean import composed_quality_verdicts

#: the cleaned-page arrival record (doc_id carried for verdict identity)
QUALITY_PAGES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
])


def read_quality_pages_stream(spark: SparkSession, input_dir: str,
                              max_files_per_trigger: int = 8) -> DataFrame:
    """File-arrival stream of (doc_id, url, text) pages."""
    return (
        spark.readStream.schema(QUALITY_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def quality_filter_stream(pages_stream: DataFrame,
                          blocklist: DataFrame) -> DataFrame:
    """Per-arrival quality verdicts: identical semantics to the batch
    `corpus_filter` gate (same builder, `stream_safe` blocklist probe —
    semi/anti stream-static joins instead of the batch aggregation).
    Stateless — safe for `outputMode("append")` with no watermark."""
    return composed_quality_verdicts(pages_stream, blocklist,
                                     stream_safe=True)
