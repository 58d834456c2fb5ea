"""Pipeline assembly, salted partitioning, lineage/resume."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.plans.lineage import LineageStore
from amazon_textract_transformer_pipeline_spark.plans.partitioning import (
    bucket_by_url,
    salted_repartition_by_url,
)
from amazon_textract_transformer_pipeline_spark.plans.pipeline import (
    extract_pipeline,
    extraction_stage_for_lineage,
)


def test_full_pipeline_both_models(spark, pages_df):
    for mode in ("sql-stub", "window-stub"):
        res = extract_pipeline(pages_df, model=mode)
        bad = (
            res.extracted_text.join(pages_df.select("url", "text"), "url")
            .filter("extracted_text <> text").count()
        )
        assert bad == 0, mode
        assert res.mentions.count() > 500, mode
        assert res.fields.count() == 300 * 11, mode


def test_salted_repartition_balances_zipf_hosts(spark, pages_df):
    """Zipf host skew: host000 has ~20% of rows. After salting, partition
    sizes are near-uniform."""
    df = salted_repartition_by_url(pages_df, 16)
    sizes = [r.n for r in
             df.groupBy(F.spark_partition_id().alias("p"))
             .agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 16
    assert max(sizes) <= 2.0 * (sum(sizes) / len(sizes))  # no dominant partition


def test_bucket_stability(spark, pages_df):
    a = {(r.url, r.bucket) for r in bucket_by_url(pages_df, 8).select("url", "bucket").collect()}
    b = {(r.url, r.bucket) for r in bucket_by_url(pages_df, 8).select("url", "bucket").collect()}
    assert a == b
    assert len({x[1] for x in a}) == 8


def test_lineage_resume_skips_completed(spark, pages_df, tmp_path):
    root = str(tmp_path / "ckpt")
    store = LineageStore(root, n_buckets=8)
    stage = extraction_stage_for_lineage()

    # First run: complete everything
    s1 = store.run(spark, pages_df, stage, run_id="r1")
    assert s1["buckets_done"] == 8
    n_rows = spark.read.parquet(root + "/results").count()
    assert n_rows == 300

    # Second run: nothing remaining
    assert store.remaining(pages_df).count() == 0
    s2 = store.run(spark, pages_df, stage, run_id="r2")
    assert s2["buckets_done"] == 0
    assert spark.read.parquet(root + "/results").count() == 300

    # Simulate partial failure: forget 3 buckets from lineage
    done = sorted(store.completed_buckets())
    for f in glob.glob(root + "/_lineage/*.jsonl"):
        recs = [json.loads(line) for line in open(f)]
        keep = [r for r in recs if r["bucket"] not in done[:3]]
        with open(f, "w") as fh:
            for r in keep:
                fh.write(json.dumps(r) + "\n")
    remaining = store.remaining(pages_df)
    assert set(r.bucket for r in remaining.select("bucket").distinct().collect()) == set(done[:3])
    s3 = store.run(spark, pages_df, stage, run_id="r3")
    assert s3["buckets_done"] == 3
    # results identical after heal (deterministic recompute)
    assert spark.read.parquet(root + "/results").count() == 300
    assert store.remaining(pages_df).count() == 0


def test_extraction_results_deterministic_across_runs(spark, pages_df, tmp_path):
    stage = extraction_stage_for_lineage()
    a = LineageStore(str(tmp_path / "a"), n_buckets=4)
    b = LineageStore(str(tmp_path / "b"), n_buckets=4)
    a.run(spark, pages_df, stage, run_id="x")
    b.run(spark, pages_df, stage, run_id="y")
    da = spark.read.parquet(str(tmp_path / "a/results")).drop("bucket")
    db = spark.read.parquet(str(tmp_path / "b/results")).drop("bucket")
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0


def test_lineage_validate_heals_disk_damage(spark, pages_df, tmp_path):
    """Out-of-band data loss: validate() demotes damaged buckets, next run
    recomputes them."""
    import os

    root = str(tmp_path / "heal")
    store = LineageStore(root, n_buckets=6)
    stage = extraction_stage_for_lineage()
    store.run(spark, pages_df, stage, run_id="h1")
    n0 = spark.read.parquet(root + "/results").count()

    for f in glob.glob(root + "/results/bucket=3/*"):
        os.remove(f)
    assert spark.read.parquet(root + "/results").count() < n0

    bad = store.validate(spark)
    assert bad == {3}
    assert 3 not in store.completed_buckets()
    store.run(spark, pages_df, stage, run_id="h2")
    assert spark.read.parquet(root + "/results").count() == n0
    assert store.validate(spark) == set()
