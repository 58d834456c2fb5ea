"""Iceberg integration seam: pure parts (confs, DDL, state SQL) are real
and tested; runtime calls are classpath-gated (no Iceberg jar here)."""

from __future__ import annotations

import pytest

from amazon_textract_transformer_pipeline_spark.sources.iceberg import (
    commit_buckets,
    iceberg_session_confs,
    lineage_state_sql,
    lineage_table_ddl,
    pages_table_ddl,
    read_pages_iceberg,
)


def test_session_confs_shape():
    c = iceberg_session_confs(catalog="lake", warehouse="/w")
    assert c["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert c["spark.sql.catalog.lake.type"] == "hadoop"
    assert c["spark.sql.catalog.lake.warehouse"] == "/w"
    assert "IcebergSparkSessionExtensions" in c["spark.sql.extensions"]


def test_pages_ddl_buckets_on_url():
    ddl = pages_table_ddl("lake.db.pages", n_buckets=128)
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (bucket(128, url))" in ddl
    for col in ("url STRING", "warc_ts TIMESTAMP", "html BINARY",
                "text STRING", "lang STRING"):
        assert col in ddl


def test_lineage_state_sql_last_record_wins(spark):
    """The state SQL is engine-agnostic SQL — validate semantics by running
    it on an in-memory view standing in for the Iceberg table."""
    rows = [
        (0, "r1", "running", "2024-01-01 00:00:00"),
        (0, "r1", "ok", "2024-01-01 00:01:00"),
        (1, "r1", "failed", "2024-01-01 00:00:30"),
        (1, "r2", "ok", "2024-01-01 00:02:00"),
        (2, "r2", "running", "2024-01-01 00:03:00"),
    ]
    df = spark.createDataFrame(rows, ["bucket", "run_id", "status", "ts_s"]) \
        .selectExpr("bucket", "run_id", "status", "cast(ts_s as timestamp) as ts")
    df.createOrReplaceTempView("lin")
    got = {r.bucket: r.status
           for r in spark.sql(lineage_state_sql("lin")).collect()}
    assert got == {0: "ok", 1: "ok", 2: "running"}
    assert "USING iceberg" in lineage_table_ddl("lake.db.lineage")


def test_runtime_calls_are_gated(spark):
    with pytest.raises(NotImplementedError, match="Iceberg runtime"):
        read_pages_iceberg(spark, "lake.db.pages")
    with pytest.raises(NotImplementedError, match="Iceberg runtime"):
        commit_buckets(spark.range(1), "lake.db.out")
