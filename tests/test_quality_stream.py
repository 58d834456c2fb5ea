"""Streaming corpus-quality gate (streaming/quality_stream.py): the
composed UT1→langid→Gopher→C4→DSIR filter applied per arrival must be
BIT-IDENTICAL to the batch builder on the same rows — same
single-sourced `composed_quality_verdicts`, stream-static blocklist
join, no state."""

from __future__ import annotations

from amazon_textract_transformer_pipeline_spark.operators.webclean import (
    composed_quality_verdicts,
)
from amazon_textract_transformer_pipeline_spark.streaming.quality_stream import (
    QUALITY_PAGES_SCHEMA,
    quality_filter_stream,
    read_quality_pages_stream,
)

ROWS = [
    # blocked domain (parent-suffix match)
    (0, "http://sub.evil.org/p", "Plenty of good english text here. " * 20),
    # passes everything (long english with stopwords + terminal punct)
    (1, "https://good.example.com/a",
     "The quick brown fox jumps over the lazy dog and that is fine. " * 20),
    # gopher fail: clearly English (passes langid) but under the word floor
    (2, "https://good.example.com/b",
     "The quick brown fox jumps over the lazy dog and that is fine."),
    # c4 fail (gopher passes): no line ends with terminal punctuation,
    # so C4 retains < 3 sentences while every Gopher signal is healthy
    (3, "https://good.example.com/c",
     "The quick brown fox jumps over the lazy dog and that is fine " * 25),
]
BLOCKLIST = [("evil.org",)]


def _batch(spark):
    docs = spark.createDataFrame(ROWS, QUALITY_PAGES_SCHEMA)
    bl = spark.createDataFrame(BLOCKLIST, "domain string")
    return composed_quality_verdicts(docs, bl)


def test_stream_verdicts_match_batch(spark, tmp_path):
    land, out, ckpt = (str(tmp_path / d) for d in ("land", "out", "ckpt"))
    # two arrivals: rows split across availableNow cycles
    bl = spark.createDataFrame(BLOCKLIST, "domain string")
    for chunk in (ROWS[:2], ROWS[2:]):
        spark.createDataFrame(chunk, QUALITY_PAGES_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(land)
        q = (quality_filter_stream(read_quality_pages_stream(spark, land), bl)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)
    got = {r.doc_id: r.asDict() for r in spark.read.parquet(out).collect()}
    want = {r.doc_id: r.asDict() for r in _batch(spark).collect()}
    assert got == want
    # the fixture exercises distinct first-fail reasons
    reasons = {d: v["drop_reason"] for d, v in want.items()}
    assert reasons[0] == "blocked_domain"
    assert reasons[1] is None and want[1]["kept"] is True
    assert reasons[2] == "gopher_quality"
    assert reasons[3] == "c4_cleaning"


def test_stream_is_stateless_append(spark, tmp_path):
    # no watermark, no state store: the plan must contain no stateful op
    bl = spark.createDataFrame(BLOCKLIST, "domain string")
    land = str(tmp_path / "land2")
    spark.createDataFrame(ROWS[:1], QUALITY_PAGES_SCHEMA) \
        .coalesce(1).write.parquet(land)
    sdf = quality_filter_stream(read_quality_pages_stream(spark, land), bl)
    assert sdf.isStreaming
    plan = sdf._jdf.queryExecution().analyzed().toString()
    for op in ("StateStore", "Deduplicate", "FlatMapGroupsWithState"):
        assert op not in plan
