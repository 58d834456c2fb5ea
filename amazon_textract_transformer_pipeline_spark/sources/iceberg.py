"""Iceberg table integration (north rule: "over Iceberg tables of
Common-Crawl-style web pages … per-partition lineage and metrics
checkpointed to Iceberg").

This sandbox ships no Iceberg runtime jar, so everything runtime-facing is
classpath-gated with a clear error; everything *pure* — session conf
construction, DDL/MERGE statement generation, the bucket-grain commit
protocol — is real and unit-tested. On a cluster, add
``org.apache.iceberg:iceberg-spark-runtime-<spark>_<scala>`` to
``spark.jars.packages`` and the same code runs unchanged.

Design (how the engine's resume layer maps onto Iceberg):

* The input is a plain catalog table read — ``spark.read.table`` — so
  Iceberg hidden-partitioning, split planning, column pruning and predicate
  pushdown all apply without engine code.
* Results commit per url-hash bucket (plans/partitioning.bucket_by_url)
  via ``overwritePartitions()`` — Iceberg's dynamic partition overwrite is
  a snapshot-isolated, atomic replacement of exactly the buckets present
  in the written frame: the same idempotent re-run semantics the
  filesystem LineageStore gets from parquet dynamic overwrite, now with
  readers never seeing a half-written bucket.
* The lineage/metrics relation itself checkpoints to a second Iceberg
  table (append-only; last-record-wins by ts like LineageStore), so resume
  state survives the driver and is queryable like any other table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: canonical input-table columns (BASELINE input_hint)
PAGES_TABLE_COLUMNS = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"


def iceberg_session_confs(catalog: str = "lake",
                          warehouse: str = "/tmp/iceberg-warehouse",
                          catalog_impl: str = "hadoop") -> dict[str, str]:
    """SparkSession confs for an Iceberg catalog (pure — apply with
    ``builder.config(k, v)`` or spark-submit ``--conf``). ``hadoop`` =
    path-based catalog (local/HDFS/S3A); swap ``catalog_impl`` for
    ``hive``/``rest`` deployments."""
    base = f"spark.sql.catalog.{catalog}"
    return {
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        base: "org.apache.iceberg.spark.SparkCatalog",
        f"{base}.type": catalog_impl,
        f"{base}.warehouse": warehouse,
    }


def pages_table_ddl(table: str, n_buckets: int = 64) -> str:
    """DDL for the Common-Crawl-style pages table, hidden-partitioned by
    url-hash bucket — Iceberg's ``bucket(N, url)`` transform is the same
    hash-bucket grain the lineage layer resumes on, so scan pruning and
    resume share one partitioning."""
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({PAGES_TABLE_COLUMNS}) "
        f"USING iceberg PARTITIONED BY (bucket({n_buckets}, url))"
    )


def lineage_table_ddl(table: str) -> str:
    """DDL for the Iceberg lineage/metrics checkpoint table (append-only;
    consumers take last record per bucket by ts, exactly like the
    filesystem LineageStore)."""
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ("
        "bucket INT, run_id STRING, status STRING, n_docs BIGINT, "
        "n_mentions BIGINT, wall_ms BIGINT, ts TIMESTAMP) USING iceberg"
    )


def lineage_state_sql(table: str) -> str:
    """Last-record-wins bucket state over the append-only lineage table —
    the Iceberg twin of ``LineageStore.completed_buckets``."""
    return f"""
SELECT bucket, status FROM (
  SELECT bucket, status,
         row_number() OVER (PARTITION BY bucket ORDER BY ts DESC) AS rn
  FROM {table}
) WHERE rn = 1"""


def _require_iceberg(spark: SparkSession) -> None:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
    except Exception as e:  # pragma: no cover — no Iceberg jar in sandbox
        raise NotImplementedError(
            "Iceberg runtime not on the classpath. Add "
            "org.apache.iceberg:iceberg-spark-runtime-3.5_2.12 (matching "
            "your Spark/Scala) to spark.jars.packages and configure a "
            "catalog via iceberg_session_confs()."
        ) from e


def read_pages_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Catalog-table read of the pages input (classpath-gated). Plain
    ``read.table`` so Iceberg split planning / pruning / pushdown apply."""
    _require_iceberg(spark)
    return spark.read.table(table)


def commit_buckets(df: DataFrame, table: str) -> None:
    """Atomically replace exactly the url-hash buckets present in ``df``
    (classpath-gated): Iceberg dynamic partition overwrite — the
    exactly-once re-run primitive the lineage layer assumes."""
    _require_iceberg(df.sparkSession)
    df.writeTo(table).overwritePartitions()


def append_lineage(df: DataFrame, table: str) -> None:
    """Append lineage/metric records (classpath-gated); state is resolved
    by :func:`lineage_state_sql`."""
    _require_iceberg(df.sparkSession)
    df.writeTo(table).append()
