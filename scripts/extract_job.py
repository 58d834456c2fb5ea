#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage (see scripts/run_spark_submit.sh for the packaged invocation):

    spark-submit --py-files attp_spark_pkg.zip scripts/extract_job.py \
        --input  <parquet dir of (url, warc_ts, html, text, lang) pages> \
        --output <result root>  [--buckets 64] [--synthetic N]

The job is resume-safe: results land bucket-partitioned under
<output>/results with per-bucket lineage at <output>/_lineage; re-submitting
after a failure anti-joins completed buckets away and recomputes only the
remainder (plans/lineage.py). On a cluster, executor count/cores come from
the usual spark-submit flags — nothing in the job is local-mode specific.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet pages table (url, warc_ts, html, text, lang)")
    ap.add_argument("--input-warc", help="directory of *.warc.gz archives "
                    "(ingested directly via sources/warc.py — no upstream "
                    "ETL step)")
    ap.add_argument("--output", required=True, help="result root directory")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    args = ap.parse_args()

    # Import AFTER spark-submit has placed the --py-files zip on sys.path.
    from pyspark.sql import SparkSession

    from amazon_textract_transformer_pipeline_spark.plans.lineage import LineageStore
    from amazon_textract_transformer_pipeline_spark.plans.pipeline import (
        extraction_stage_for_lineage,
    )

    spark = SparkSession.builder.appName("attp-extract").getOrCreate()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    if args.synthetic:
        from amazon_textract_transformer_pipeline_spark.sources import (
            synthetic_pages_df,
        )

        pages = synthetic_pages_df(spark, args.synthetic, seed=42)
    elif args.input_warc:
        from amazon_textract_transformer_pipeline_spark.sources.warc import (
            read_warc,
        )

        pages = read_warc(spark, args.input_warc)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --input-warc / --synthetic is required")

    store = LineageStore(args.output, n_buckets=args.buckets)
    store.validate(spark)  # demote buckets whose on-disk data diverged
    summary = store.run(spark, pages, extraction_stage_for_lineage())
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
