"""SMGT extended custom-task annotations (entities-with-transcript-reviews).

Rebuilds the reference's custom Ground-Truth task data model and its seq2seq
consumption as pure DataFrame transforms:

* entity record ``{detectionId, ocrStatus, boxIxs, classId, rawText,
  targetText?, label?}`` — producer
  ``annotation/fn-SMGT-Post/data_model.py:284-294``; consumer parse rules
  ``notebooks/src/code/data/smgt.py:200-234``:
  - ``ocrStatus`` must be one of correct/unclear/wrong (enum-by-name lookup;
    unknown status fails the record),
  - missing ``targetText`` defaults to ``rawText`` *unless* the status is
    ``wrong``, which is an error (smgt.py:214-224);
* seq2seq expansion ``map_smgt_data_to_fieldnorm_seq2seq``
  (``seq2seq/task_builder.py:150-199``): one output record per valid entity
  (label, rawText, targetText all present), prompts
  ``"Normalize {label}: {rawText}"`` → ``targetText``; documents with zero
  valid entities disappear. The reference implements this with
  duplicate/remove batch-record surgery; relationally it is exactly an
  inner ``explode`` + filter — no UDF, whole-stage codegen end to end.

Per-record failures land in an ``entity_error`` column (warn-don't-fail,
reference logs-and-skips at data_model.py:270-274).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SMGT_ENTITY_SCHEMA = T.StructType([
    T.StructField("detectionId", T.StringType(), True),
    T.StructField("ocrStatus", T.StringType(), True),
    T.StructField("boxIxs", T.ArrayType(T.IntegerType()), True),
    T.StructField("classId", T.IntegerType(), True),
    T.StructField("rawText", T.StringType(), True),
    T.StructField("targetText", T.StringType(), True),
    T.StructField("label", T.StringType(), True),
])

OCR_STATUSES = ("correct", "unclear", "wrong")


def parse_smgt_entities(df: DataFrame, entities_col: str = "entities",
                        keys: list[str] | None = None) -> DataFrame:
    """Explode + validate extended-task entities → one row per entity with
    snake_case fields, derived ``target_text``, and ``entity_error``.

    ``df[entities_col]``: ARRAY<SMGT_ENTITY_SCHEMA-like struct>.
    """
    keys = keys or [c for c in df.columns if c != entities_col]
    e = df.select(
        *keys, F.posexplode(entities_col).alias("entity_ix", "_e"))
    status_ok = F.col("_e.ocrStatus").isin(*OCR_STATUSES)
    target = F.coalesce(
        F.col("_e.targetText"),
        F.when(F.col("_e.ocrStatus") != "wrong", F.col("_e.rawText")),
    )
    err = (
        F.when(~F.coalesce(status_ok, F.lit(False)),
               F.concat(F.lit("unknown ocrStatus: "),
                        F.coalesce(F.col("_e.ocrStatus"), F.lit("null"))))
        .when(F.col("_e.targetText").isNull()
              & (F.col("_e.ocrStatus") == "wrong"),
              F.lit("missing targetText with ocrStatus 'wrong'"))
    )
    return e.select(
        *keys, "entity_ix",
        F.col("_e.detectionId").alias("detection_id"),
        F.col("_e.ocrStatus").alias("ocr_status"),
        F.col("_e.boxIxs").alias("box_ixs"),
        F.col("_e.classId").alias("class_id"),
        F.col("_e.rawText").alias("raw_text"),
        F.when(err.isNull(), target).alias("target_text"),
        F.col("_e.label").alias("label"),
        err.alias("entity_error"),
    )


def smgt_to_seq2seq_examples(df: DataFrame, entities_col: str = "entities",
                             keys: list[str] | None = None) -> DataFrame:
    """The field-normalization seq2seq training set: one (class_name,
    src_texts, tgt_texts) row per *valid* entity (task_builder.py:176-196).
    Docs with zero valid entities drop out (inner explode semantics =
    remove_batch_records)."""
    parsed = parse_smgt_entities(df, entities_col, keys)
    valid = parsed.filter(
        F.col("entity_error").isNull()
        & F.col("label").isNotNull()
        & F.col("raw_text").isNotNull()
        & F.col("target_text").isNotNull()
    )
    keys = keys or [c for c in df.columns if c != entities_col]
    return valid.select(
        *keys, "entity_ix",
        F.col("label").alias("class_name"),
        F.format_string("Normalize %s: %s", "label", "raw_text")
        .alias("src_texts"),
        F.col("target_text").alias("tgt_texts"),
    )
