"""Sharded corpus export (operators/export.py): deterministic
size-bounded shard assignment + parquet shards + integrity manifest."""

from __future__ import annotations

import json
from pathlib import Path

from amazon_textract_transformer_pipeline_spark.operators import export


def _docs(spark, n=50, width=100):
    rows = [(i, "x" * (width + (i * 37) % 200)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_budget_invariant_overflow_by_at_most_one_doc(spark):
    docs = _docs(spark)
    a = export.assign_shards(docs, shard_bytes=500).collect()
    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r.shard_id, []).append(r)
    # shards are contiguous 0..k with no gaps
    assert sorted(by_shard) == list(range(len(by_shard)))
    for sid, rows in by_shard.items():
        total = sum(r.n_bytes for r in rows)
        biggest = max(r.n_bytes for r in rows)
        # concat-and-chunk: a shard exceeds budget only via its last doc
        assert total - biggest < 500 or len(rows) == 1


def test_assignment_is_deterministic_and_partition_independent(spark):
    docs = _docs(spark)
    a1 = {(r.doc_id, r.shard_id)
          for r in export.assign_shards(docs, 500).collect()}
    a2 = {(r.doc_id, r.shard_id)
          for r in export.assign_shards(docs.repartition(7), 500).collect()}
    assert a1 == a2


def test_write_shards_roundtrip_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "release")
    m = export.write_shards(docs, out, shard_bytes=500)
    disk = json.loads(Path(out, "manifest.json").read_text())
    assert disk == m
    assert m["n_docs"] == 50
    back = spark.read.parquet(f"{out}/shards")
    assert back.count() == 50
    # per-shard docs on disk match the manifest exactly
    got = {r.shard_id: r.cnt
           for r in back.groupBy("shard_id")
           .count().withColumnRenamed("count", "cnt").collect()}
    assert got == {s["shard_id"]: s["n_docs"] for s in m["shards"]}
    # idempotent: second run overwrites to the identical manifest
    assert export.write_shards(docs, out, shard_bytes=500) == m
