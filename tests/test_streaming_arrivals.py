"""Watermarked streaming ops (streaming/arrivals.py): event-time windowed
arrival metrics (late data dropped, windows emitted once) and the
applyInPandasWithState first-seen URL dedup with event-time state TTL.

Determinism harness: each "arrival" is one availableNow start/stop cycle
against the same checkpoint — the watermark persists in the checkpoint, so
window emission / late-drop / state-expiry points are exact, not timing-
dependent (same restart pattern as test_streaming.py)."""

from __future__ import annotations

from datetime import datetime

from amazon_textract_transformer_pipeline_spark.schemas import PAGES_INPUT_SCHEMA
from amazon_textract_transformer_pipeline_spark.streaming.arrivals import (
    arrival_metrics_stream,
    first_seen_urls_stream,
)
from amazon_textract_transformer_pipeline_spark.streaming.extract_stream import (
    read_pages_stream,
)


def _ts(h, m, s=0):
    return datetime(2026, 1, 15, h, m, s)


def _land(spark, land_dir, rows):
    """One arrival: (url, warc_ts) rows → one more parquet drop."""
    full = [(u, t, b"<html></html>", "", "en") for u, t in rows]
    spark.createDataFrame(full, PAGES_INPUT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(land_dir)


def _cycle(stream_fn, spark, land, out, ckpt):
    q = (stream_fn(read_pages_stream(spark, land))
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)


def test_windowed_arrival_metrics_watermark(spark, tmp_path):
    land, out, ckpt = (str(tmp_path / d) for d in ("land", "out", "ckpt"))
    run = lambda: _cycle(  # noqa: E731
        lambda s: arrival_metrics_stream(s, "1 minute", "2 minutes"),
        spark, land, out, ckpt)

    # cycle 1: three docs inside the 10:00 window — nothing can emit yet
    _land(spark, land, [("u1", _ts(10, 0, 0)), ("u2", _ts(10, 0, 10)),
                        ("u3", _ts(10, 0, 30))])
    run()
    # cycle 2: advancer at 10:30 pushes the watermark past 10:01
    _land(spark, land, [("u4", _ts(10, 30, 0))])
    run()
    # cycle 3: a LATE event for the already-closed 10:00 window (watermark
    # is now 10:28 — must be dropped) + advancer at 11:00 closing 10:30
    _land(spark, land, [("late", _ts(10, 0, 20)), ("u5", _ts(11, 0, 0))])
    run()
    # cycle 4: final advancer so every earlier window is flushed even if a
    # given Spark version defers the no-data flush batch
    _land(spark, land, [("u6", _ts(12, 0, 0))])
    run()

    got = {r.window_start: r for r in spark.read.parquet(out).collect()}
    w1000, w1030 = _ts(10, 0), _ts(10, 30)
    assert w1000 in got and w1030 in got
    # the late event did NOT land in the closed 10:00 window
    assert got[w1000].n_docs == 3
    assert got[w1000].html_bytes == 3 * len(b"<html></html>")
    assert got[w1000].approx_urls == 3
    assert got[w1030].n_docs == 1
    # each window emitted exactly once (append-mode invariant)
    assert len(spark.read.parquet(out).groupBy("window_start").count()
               .filter("count > 1").collect()) == 0


def test_first_seen_url_dedup_with_state_ttl(spark, tmp_path):
    land, out, ckpt = (str(tmp_path / d) for d in ("land", "out", "ckpt"))
    run = lambda: _cycle(  # noqa: E731
        lambda s: first_seen_urls_stream(s, watermark="10 minutes",
                                         state_ttl_ms=30 * 60 * 1000),
        spark, land, out, ckpt)

    # cycle 1: a twice + b once → emit a (n_seen 2) and b (n_seen 1)
    _land(spark, land, [("a", _ts(10, 0, 0)), ("b", _ts(10, 0, 5)),
                        ("a", _ts(10, 0, 10))])
    run()
    # cycle 2: b again (suppressed — state remembers) + new c
    _land(spark, land, [("b", _ts(10, 5, 0)), ("c", _ts(10, 6, 0))])
    run()
    # cycle 3: advancer far past every TTL (10:30-10:36) → watermark 11:50
    _land(spark, land, [("z", _ts(12, 0, 0))])
    run()
    # cycle 3b: advancer-only batch in which the a/b/c timeouts actually
    # fire (timeout invocations happen for keys with no data in the batch)
    _land(spark, land, [("y", _ts(12, 1, 0))])
    run()
    # cycle 4: a returns after its state expired → emitted AGAIN
    _land(spark, land, [("a", _ts(12, 5, 0))])
    run()

    rows = spark.read.parquet(out).collect()
    by_url: dict[str, list] = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    assert len(by_url["a"]) == 2          # first arrival + post-TTL rearrival
    assert len(by_url["b"]) == 1          # duplicate suppressed across cycles
    assert len(by_url["c"]) == 1
    a_first = sorted(by_url["a"], key=lambda r: r.first_ts)[0]
    assert a_first.n_seen_at_emit == 2    # both cycle-1 occurrences counted
    assert {u for u in by_url} == {"a", "b", "c", "z", "y"}
