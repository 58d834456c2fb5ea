"""Sharded training-data export — the release step: deterministic,
size-bounded shards plus an integrity manifest. The reference's S5
consolidated-JSON sink (`pipeline/ocr/fn-call-textract/main.py:221-301`)
writes one object per document; a corpus release instead writes
fixed-budget shards (WebDataset/LLM-loader convention) whose assignment
must be reproducible run-over-run so resumed or re-run exports produce
byte-identical shard membership.

Assignment semantics (pinned, replayed exactly by the DuckDB oracle):

* documents are ordered by (bucket, ord_hash, id) where ``ord_hash`` is
  the portable 64-bit hash of the id and ``bucket = ord_hash %
  n_buckets`` — a deterministic, data-independent shuffle order (the
  `pack_sequences` salted-bucket-stream pattern at shard grain);
* each doc costs ``length(text)`` bytes (its payload proxy); the global
  running byte total in that order is chunked by ``shard_bytes``:
  ``shard_id = floor((running_sum - cost) / shard_bytes)`` — the
  standard concat-and-chunk arithmetic, so a shard overflows its budget
  by at most one document rather than splitting one;
* per-shard stats = (shard_id, n_docs, n_bytes, first/last hash) — the
  manifest rows.

Scale shape (100 TB audit): NO global data window. The running total is
two-pass: per-bucket windows run in parallel (uniform hash buckets),
then each bucket's byte total — an ``n_buckets``-row relation — gets a
cumulative offset via a window over that TINY relation and broadcasts
back. Stats are a map-side-partial aggregate on shard_id. The writer
side is `partitionBy(shard)` parquet — no driver data path; only the
tiny manifest relation is collected to be written as JSON.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable

DEFAULT_SHARD_BYTES = 64 * 1024 * 1024


def assign_shards(docs: DataFrame, shard_bytes: int = DEFAULT_SHARD_BYTES,
                  n_buckets: int = 64, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(input columns…, ord_hash, n_bytes, shard_id) — deterministic
    size-bounded shard assignment (see module docstring). Two-pass
    running sum: per-bucket windows in parallel, bucket offsets via a
    window over the n_buckets-row totals relation, broadcast back."""
    a = (
        docs
        .withColumn("ord_hash", F.expr(
            portable.spark_hash64(f"cast({id_col} as string)")))
        .withColumn("n_bytes",
                    F.expr(f"cast(length({text_col}) as bigint)"))
        .withColumn("_bkt", F.col("ord_hash") % n_buckets)
    )
    wloc = Window.partitionBy("_bkt").orderBy("ord_hash", id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a = a.withColumn("_lrun", F.sum("n_bytes").over(wloc))
    woff = Window.orderBy("_bkt") \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        a.groupBy("_bkt").agg(F.sum("n_bytes").alias("_btot"))
        .withColumn("_boff", F.coalesce(F.sum("_btot").over(woff),
                                        F.lit(0)))
        .select("_bkt", "_boff")
    )
    return (
        a.join(F.broadcast(offsets), "_bkt")
        .withColumn("shard_id", F.expr(
            f"cast(floor((_boff + _lrun - n_bytes) / {shard_bytes}) "
            f"as bigint)"))
        .drop("_bkt", "_lrun", "_boff")
    )


def shard_manifest(assigned: DataFrame) -> DataFrame:
    """Per-shard integrity rows: (shard_id, n_docs, n_bytes, min_hash,
    max_hash). Map-side-partial aggregate on shard_id."""
    return (
        assigned.groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_bytes").alias("n_bytes"),
             F.min("ord_hash").alias("min_hash"),
             F.max("ord_hash").alias("max_hash"))
    )


def write_shards(docs: DataFrame, out_dir: str,
                 shard_bytes: int = DEFAULT_SHARD_BYTES,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> dict:
    """Write size-bounded parquet shards + ``manifest.json``; returns the
    manifest dict. Re-running over the same input reproduces identical
    shard membership (deterministic assignment); ``overwrite`` mode
    makes the export idempotent."""
    assigned = assign_shards(docs, shard_bytes, id_col=id_col,
                             text_col=text_col)
    (assigned.repartition("shard_id")
     .write.mode("overwrite").partitionBy("shard_id")
     .parquet(f"{out_dir}/shards"))
    rows = shard_manifest(assigned).orderBy("shard_id").collect()
    manifest = {
        "shard_bytes": shard_bytes,
        "n_shards": len(rows),
        "n_docs": int(sum(r.n_docs for r in rows)),
        "n_bytes": int(sum(r.n_bytes for r in rows)),
        "shards": [
            {"shard_id": int(r.shard_id), "n_docs": int(r.n_docs),
             "n_bytes": int(r.n_bytes), "min_hash": int(r.min_hash),
             "max_hash": int(r.max_hash)}
            for r in rows
        ],
    }
    Path(out_dir, "manifest.json").write_text(
        json.dumps(manifest, indent=1, sort_keys=True))
    return manifest


def export_oracle_sql(docs_cte: str, shard_bytes: int,
                      n_buckets: int = 64) -> str:
    """DuckDB replay of assign_shards + shard_manifest (single-sourced
    arithmetic, same two-pass bucket-offset running sum). ``docs_cte``
    must yield (doc_id, text)."""
    h = portable.duck_hash64("cast(doc_id as varchar)")
    return f"""
WITH a AS (
  SELECT doc_id, {h} AS ord_hash,
         CAST(length(text) AS BIGINT) AS n_bytes,
         ({h}) % {n_buckets} AS bkt
  FROM ({docs_cte})
),
l AS (
  SELECT *, sum(n_bytes) OVER
      (PARTITION BY bkt ORDER BY ord_hash, doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lrun
  FROM a
),
o AS (
  SELECT bkt, coalesce(sum(btot) OVER
      (ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS boff
  FROM (SELECT bkt, sum(n_bytes) AS btot FROM a GROUP BY bkt)
),
r AS (
  SELECT l.*, CAST(floor((o.boff + l.lrun - l.n_bytes)
                         / {shard_bytes}) AS BIGINT) AS shard_id
  FROM l JOIN o USING (bkt)
)
SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
       min(ord_hash) AS min_hash, max(ord_hash) AS max_hash
FROM r GROUP BY shard_id"""
