"""Input connectors S1-S3 (SURVEY §2.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PAGES_INPUT_SCHEMA


def read_document_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S1 (file_utils.py:19-50): recursive binary scan of a raw document
    corpus, dotfiles excluded, sorted. Returns (url, html) shaped like the
    pages table (path as url, bytes as html)."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "[!.]*")  # exclude dotfiles
        .load(path)
    )
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    ).orderBy("url")


def read_manifest_jsonl(spark: SparkSession, path: str,
                        schema=None) -> DataFrame:
    """S2 (data/base.py:480-526): JSON-lines manifest source; hidden files
    filtered like the reference's dir variant. Schema fixed when given —
    inference only at this boundary (SURVEY §1.4)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("pathGlobFilter", "[!.]*").json(path)


def read_pages_table(spark: SparkSession, path: str) -> DataFrame:
    """§1.6 input table from parquet/Iceberg-style storage with the fixed
    schema (column pruning + predicate pushdown apply)."""
    return spark.read.schema(PAGES_INPUT_SCHEMA).parquet(path)
