"""Watermarked event-time streaming operators (SURVEY §2.12 extension).

Two patterns the batch engine cannot express, built the Structured-
Streaming-native way:

- :func:`arrival_metrics_stream` — event-time windowed arrival metrics
  over ``warc_ts`` with a watermark, so late data is bounded and the
  window state store self-evicts (append mode emits each window exactly
  once, when the watermark passes its end).
- :func:`first_seen_urls_stream` — streaming first-seen URL dedup as an
  ``applyInPandasWithState`` custom stateful operator: one tiny state row
  per distinct url, event-time timeout expiry so state size is bounded by
  the active-url working set, not all urls ever seen.

Scale notes (10^12 docs): the windowed aggregate shuffles on
``window(warc_ts)`` — a bounded number of keys per watermark horizon; the
dedup shuffles on ``url`` (the natural high-cardinality key) and its state
is the dedup memory — the ``state_ttl`` lever is what keeps it from
growing monotonically. Both compose with the ``foreachBatch`` extraction
harness (extract_stream.py) on the same landing stream.

The reference has no streaming engine at all (S3→Lambda→SFn arrivals,
``pipeline/fn-trigger/main.py:97-115``); these are Spark-first additions
on the arrival path, not ports.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def arrival_metrics_stream(pages_stream: DataFrame,
                           window_duration: str = "1 minute",
                           watermark: str = "2 minutes") -> DataFrame:
    """Event-time windowed arrival metrics: docs, html bytes, approx
    distinct urls per ``window_duration`` bucket of ``warc_ts``.

    Append-mode semantics: a window row is emitted exactly once, when the
    watermark (max event time − ``watermark``) passes the window end;
    events arriving later than the watermark are dropped (the late-data
    bound) and the window's state is evicted — state never outgrows the
    watermark horizon regardless of stream length.
    """
    return (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.length("html"), F.lit(0))).alias("html_bytes"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_docs", "html_bytes", "approx_urls",
        )
    )


FIRST_SEEN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("first_ts", T.TimestampType(), True),
    T.StructField("n_seen_at_emit", T.LongType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("first_ts_ms", T.LongType(), True),
    T.StructField("n_seen", T.LongType(), False),
])


def first_seen_urls_stream(pages_stream: DataFrame,
                           watermark: str = "10 minutes",
                           state_ttl_ms: int = 24 * 3600 * 1000) -> DataFrame:
    """Streaming first-seen dedup over ``url``: emits one row per distinct
    url (its first arrival), suppressing every later duplicate, with
    per-url state that expires ``state_ttl_ms`` past the watermark.

    The state store holds one (first_ts_ms, n_seen) row per url currently
    inside the TTL horizon — after expiry the url is forgotten and would
    be emitted again (dedup memory = active working set, the bounded-state
    trade every 10^12-row streaming dedup must make; set the TTL to the
    replay/crawl-revisit horizon). Exact forever-dedup is the batch
    engine's job (operators/dedup.py) over the accumulated output.
    """

    def dedup(key: Any, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        first_ms = None
        for pdf in pdfs:
            n += len(pdf)
            ts = pd.to_datetime(pdf["warc_ts"]).dropna()
            if len(ts):
                batch_min = int(ts.min().value // 1_000_000)
                first_ms = batch_min if first_ms is None else min(first_ms,
                                                                  batch_min)
        is_new = not state.exists
        if is_new:
            state.update((first_ms, n))
        else:
            old_first, old_n = state.get
            keep = old_first if old_first is not None else first_ms
            state.update((keep, old_n + n))
        # bounded state: expire TTL past the watermark (event-time clock);
        # must be strictly beyond the current watermark to be accepted
        wm = state.getCurrentWatermarkMs()
        base = max(wm, first_ms or 0)
        state.setTimeoutTimestamp(base + state_ttl_ms)
        if is_new and n > 0:
            yield pd.DataFrame({
                "url": [key[0]],
                "first_ts": [pd.to_datetime(first_ms, unit="ms")
                             if first_ms is not None else pd.NaT],
                "n_seen_at_emit": [n],
            })

    return (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .groupBy("url")
        .applyInPandasWithState(
            dedup,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
