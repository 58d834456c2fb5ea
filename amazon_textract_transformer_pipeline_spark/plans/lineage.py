"""Per-partition lineage + resumable checkpointing (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

Reference precedent: skip-existing incremental compute
(``notebooks/util/ocr.py:151-161,207-209``) and sha256 idempotency tokens
(``fn-call-textract/main.py:160-187``) — SURVEY §2.1 S6/S7 and §4. There the
unit of resume is one S3 object; here it is a deterministic url-hash
**bucket** (plans/partitioning.bucket_by_url):

* results are written ``partitionBy(bucket)`` with dynamic partition
  overwrite — re-running a bucket replaces it byte-identically (every stage
  is deterministic, SURVEY §7 "Deterministic IDs"), giving exactly-once
  output without a transactional table format. On a real cluster the same
  layout maps 1:1 onto Iceberg ``MERGE``/``replaceWhere``.
* a lineage table records (bucket, n_docs, n_mentions, wall_ms, status,
  run_id); :func:`remaining_buckets` anti-joins it away so a restarted job
  touches only unfinished buckets.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .partitioning import bucket_by_url

LINEAGE_SUBDIR = "_lineage"


class LineageStore:
    """Filesystem-rooted lineage (parquet results + JSON-lines lineage log)."""

    def __init__(self, root: str, n_buckets: int = 64):
        self.root = root
        self.n_buckets = n_buckets
        self.lineage_dir = os.path.join(root, LINEAGE_SUBDIR)

    # -- lineage log -------------------------------------------------------
    def _records(self) -> list[dict]:
        recs: list[dict] = []
        if not os.path.isdir(self.lineage_dir):
            return recs
        for name in sorted(os.listdir(self.lineage_dir)):
            if name.endswith(".jsonl"):
                with open(os.path.join(self.lineage_dir, name)) as f:
                    recs.extend(json.loads(line) for line in f)
        recs.sort(key=lambda r: r.get("ts", 0))  # last-record-wins ordering
        return recs

    def completed_buckets(self) -> set[int]:
        state: dict[int, str] = {}
        for rec in self._records():
            state[int(rec["bucket"])] = rec.get("status", "")
        return {b for b, s in state.items() if s == "ok"}

    def record(self, run_id: str, rows: list[dict]) -> None:
        os.makedirs(self.lineage_dir, exist_ok=True)
        path = os.path.join(self.lineage_dir, f"run-{run_id}.jsonl")
        ts = time.time_ns()
        with open(path, "a") as f:
            for i, r in enumerate(rows):
                f.write(json.dumps({**r, "ts": ts + i}) + "\n")

    def recorded_counts(self) -> dict[int, int]:
        counts: dict[int, int] = {}
        for rec in self._records():
            if rec.get("status") == "ok":
                counts[int(rec["bucket"])] = int(rec["n_rows"])
            elif rec.get("status") == "invalid":
                counts.pop(int(rec["bucket"]), None)
        return counts

    def validate(self, spark: SparkSession) -> set[int]:
        """Reconcile lineage against the physical store: any completed
        bucket whose on-disk row count diverges from the recorded count is
        demoted (status='invalid') so the next run recomputes it. Guards
        against out-of-band data loss the commit log can't see."""
        recorded = self.recorded_counts()
        if not recorded:
            return set()
        out_dir = os.path.join(self.root, "results")
        try:
            actual = {
                int(r.bucket): int(r.n)
                for r in spark.read.parquet(out_dir)
                .groupBy("bucket").agg(F.count("*").alias("n")).collect()
            }
        except Exception:
            actual = {}
        bad = {b for b, n in recorded.items() if actual.get(b, -1) != n}
        if bad:
            self.record(
                "validate",
                [{"bucket": int(b), "status": "invalid"} for b in sorted(bad)],
            )
        return bad

    # -- planning ----------------------------------------------------------
    def with_buckets(self, pages: DataFrame) -> DataFrame:
        return bucket_by_url(pages, self.n_buckets)

    def remaining(self, pages: DataFrame) -> DataFrame:
        """Anti-join completed work away *before* the expensive UDF stages —
        the filter is on the deterministic bucket column, so Catalyst pushes
        it into the scan when the input is already bucket-partitioned."""
        done = self.completed_buckets()
        bucketed = self.with_buckets(pages)
        if not done:
            return bucketed
        return bucketed.filter(~F.col("bucket").isin(sorted(done)))

    # -- execution ---------------------------------------------------------
    def run(self, spark: SparkSession, pages: DataFrame, stage_fn,
            run_id: str | None = None) -> dict:
        """Execute ``stage_fn(bucketed_pages) -> DataFrame`` over remaining
        buckets; write results partitioned by bucket; log lineage+metrics.

        Returns summary metrics. Safe to re-invoke after any failure: only
        unfinished buckets recompute (per-bucket dynamic overwrite makes a
        partially-written bucket self-heal on retry).
        """
        run_id = run_id or time.strftime("%Y%m%d-%H%M%S")
        todo = self.remaining(pages)
        result = stage_fn(todo)
        # stage protocol: a DataFrame, or (DataFrame, cleanup) where cleanup
        # releases any caches the stage created (run per write, else a
        # long-running resume loop accumulates persisted RDDs).
        cleanup = None
        if isinstance(result, tuple):
            result, cleanup = result
        assert "bucket" in result.columns, "stage_fn must propagate 'bucket'"

        t0 = time.time()
        out_dir = os.path.join(self.root, "results")
        try:
            (result.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("bucket").parquet(out_dir))
        finally:
            if cleanup is not None:
                cleanup()
        wall_ms = int((time.time() - t0) * 1000)

        stats = (
            spark.read.parquet(out_dir)
            .groupBy("bucket").agg(F.count("*").alias("n_rows"))
        )
        done_before = self.completed_buckets()
        rows = [
            {
                "bucket": int(r.bucket),
                "n_rows": int(r.n_rows),
                "status": "ok",
                "run_id": run_id,
                "wall_ms_total_write": wall_ms,
            }
            for r in stats.collect()
            if int(r.bucket) not in done_before
        ]
        self.record(run_id, rows)
        return {"run_id": run_id, "buckets_done": len(rows), "wall_ms": wall_ms}
