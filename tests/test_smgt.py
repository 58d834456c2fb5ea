"""SMGT extended custom-task form: parse rules (smgt.py:200-234) and the
seq2seq expansion (seq2seq/task_builder.py:150-199)."""

from __future__ import annotations

from amazon_textract_transformer_pipeline_spark.operators.smgt import (
    SMGT_ENTITY_SCHEMA,
    parse_smgt_entities,
    smgt_to_seq2seq_examples,
)


def _ent(did, status, raw, target=None, label="date", class_id=0, box_ixs=None):
    return {"detectionId": did, "ocrStatus": status, "boxIxs": box_ixs or [0],
            "classId": class_id, "rawText": raw, "targetText": target,
            "label": label}


def _df(spark, rows):
    import pyspark.sql.types as T

    return spark.createDataFrame(
        rows, T.StructType([
            T.StructField("doc", T.StringType()),
            T.StructField("entities", T.ArrayType(SMGT_ENTITY_SCHEMA)),
        ]))


def test_target_text_defaults_to_raw_unless_wrong(spark):
    df = _df(spark, [
        ("d1", [_ent("a", "correct", "1/2/20"),          # default → raw
                _ent("b", "unclear", "x", None),          # default → raw
                _ent("c", "wrong", "x", "2020-01-02"),    # explicit target
                _ent("d", "wrong", "x", None)]),          # ERROR per reference
    ])
    got = {r.detection_id: r for r in parse_smgt_entities(df).collect()}
    assert got["a"].target_text == "1/2/20" and got["a"].entity_error is None
    assert got["b"].target_text == "x"
    assert got["c"].target_text == "2020-01-02"
    assert got["d"].target_text is None
    assert "missing targetText" in got["d"].entity_error


def test_unknown_status_is_error(spark):
    df = _df(spark, [("d1", [_ent("a", "sideways", "x"),
                             _ent("b", None, "x")])])
    got = {r.detection_id: r for r in parse_smgt_entities(df).collect()}
    assert "unknown ocrStatus: sideways" in got["a"].entity_error
    assert "unknown ocrStatus: null" in got["b"].entity_error


def test_seq2seq_expansion_and_zero_entity_drop(spark):
    df = _df(spark, [
        ("keep", [_ent("a", "correct", "1/2/20", label="date"),
                  _ent("b", "wrong", "x", None),           # invalid → dropped
                  _ent("c", "correct", "y", label=None)]),  # no label → dropped
        ("drop", [_ent("z", "wrong", "x", None)]),          # zero valid → gone
        ("empty", []),                                      # explode removes
    ])
    out = smgt_to_seq2seq_examples(df).collect()
    assert {r.doc for r in out} == {"keep"}
    assert len(out) == 1
    r = out[0]
    assert r.class_name == "date"
    assert r.src_texts == "Normalize date: 1/2/20"
    assert r.tgt_texts == "1/2/20"
