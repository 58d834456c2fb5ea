"""Crash-consistency for the lineage layer: SIGKILL a running extract job
mid-write, then prove the anti-join resume completes with byte-identical
output and no double-written bucket — the north rule's exactly-once claim,
crash-tested rather than clean-state unit-tested."""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.plans.lineage import (
    LineageStore,
)
from amazon_textract_transformer_pipeline_spark.plans.pipeline import (
    extraction_stage_for_lineage,
)
from amazon_textract_transformer_pipeline_spark.sources import (
    synthetic_pages_df,
)

REPO = Path(__file__).resolve().parents[1]
N_DOCS = 12000
N_BUCKETS = 16

# Dynamic partition overwrite stages task files under a dot-hidden
# .spark-staging-<jobid>/ tree (NOT the classic _temporary/) — the dot
# prefix also keeps spark.read from listing leftovers after a crash,
# which is what makes the post-kill resume read-safe.
_STAGING_GLOBS = (
    "/.spark-staging-*/**/*.parquet",
    "/_temporary/**/*.parquet",
)


def _staged_files(results_dir: str) -> list[str]:
    return [p for pat in _STAGING_GLOBS
            for p in glob.glob(results_dir + pat, recursive=True)]


def _rows(spark, root):
    """Sorted result rows. extracted_text must be byte-identical (the
    north-rule invariant); doc_confidence is a noisy-OR float *product*
    whose combine order follows the physical partition layout, so runs
    over different input slices legitimately differ in the last ulp —
    pin it to 12 decimals instead of bit-exact."""
    df = spark.read.parquet(os.path.join(root, "results"))
    cols = [F.round(F.col(c), 12).alias(c) if c == "doc_confidence"
            else F.col(c) for c in sorted(df.columns)]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _launch(out_dir: str) -> subprocess.Popen:
    env = dict(os.environ,
               PYTHONPATH=str(REPO),
               PYSPARK_SUBMIT_ARGS="--master local[4] "
                                   "--conf spark.ui.enabled=false "
                                   "--conf spark.sql.shuffle.partitions=8 "
                                   "pyspark-shell")
    return subprocess.Popen(
        [sys.executable, str(REPO / "scripts" / "extract_job.py"),
         "--synthetic", str(N_DOCS), "--output", out_dir,
         "--buckets", str(N_BUCKETS)],
        cwd=str(REPO), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)  # killpg must not leak the JVM grandchild


@pytest.mark.slow
def test_sigkill_mid_write_then_resume_byte_identical(spark, tmp_path):
    # -- golden run, in-process, separate root ----------------------------
    golden_root = str(tmp_path / "golden")
    pages = synthetic_pages_df(spark, N_DOCS, seed=42)
    g = LineageStore(golden_root, n_buckets=N_BUCKETS)
    g.run(spark, pages, extraction_stage_for_lineage(), run_id="golden")
    golden = _rows(spark, golden_root)
    assert golden, "golden run produced no rows"

    # -- victim run: SIGKILL the whole tree mid-write ---------------------
    victim_root = str(tmp_path / "victim")
    # pre-complete some buckets (an earlier successful partial run) so the
    # resume path must SKIP them while healing the crashed remainder
    pre = LineageStore(victim_root, n_buckets=N_BUCKETS)
    pre_pages = pre.with_buckets(pages).filter("bucket < 4").drop("bucket")
    pre.run(spark, pre_pages, extraction_stage_for_lineage(), run_id="pre")
    assert pre.completed_buckets() == {0, 1, 2, 3}

    proc = _launch(victim_root)
    results_dir = os.path.join(victim_root, "results")
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline and proc.poll() is None:
        # kill while the writer is mid-flight: parquet task files exist
        # under the uncommitted staging tree (layout includes the bucket=N
        # partition dirs) but the job has not committed
        if _staged_files(results_dir):
            os.killpg(proc.pid, signal.SIGKILL)
            killed = True
            break
        time.sleep(0.02)
    if not killed:
        proc.wait(timeout=240)
        pytest.skip("job finished before a mid-write kill window appeared")
    proc.wait(timeout=60)
    assert _staged_files(results_dir), \
        "kill landed after commit — not a mid-write crash"

    # -- resume in a fresh session-equivalent: only unfinished buckets ----
    store = LineageStore(victim_root, n_buckets=N_BUCKETS)
    store.validate(spark)
    summary = store.run(spark, pages, extraction_stage_for_lineage(),
                        run_id="resume")
    # the pre-completed buckets were not rewritten by the resume run
    assert summary["buckets_done"] == N_BUCKETS - 4

    # byte-identical output, every bucket exactly once
    assert _rows(spark, victim_root) == golden
    ok_rows = [r for r in store._records() if r.get("status") == "ok"]
    per_bucket = {}
    for r in ok_rows:
        per_bucket.setdefault(int(r["bucket"]), set()).add(r["run_id"])
    assert set(per_bucket) == set(range(N_BUCKETS))
    for b, runs in per_bucket.items():
        assert len(runs) == 1, f"bucket {b} double-written by {runs}"
        assert runs == ({"pre"} if b < 4 else {"resume"})
