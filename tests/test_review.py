"""Human-review merge-back (fn-review-callback/main.py:102-181 rules)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from amazon_textract_transformer_pipeline_spark.operators.review import (
    apply_review,
    review_doc_confidence,
)

VALUES_T = T.ArrayType(T.StructType([
    T.StructField("Value", T.StringType()),
    T.StructField("Confidence", T.DoubleType()),
]))

FIELDS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("FieldName", T.StringType(), False),
    T.StructField("ClassId", T.IntegerType()),
    T.StructField("NumDetections", T.LongType()),
    T.StructField("Value", T.StringType()),
    T.StructField("Values", VALUES_T),
    T.StructField("Confidence", T.DoubleType()),
])

REVIEWS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("FieldName", T.StringType(), False),
    T.StructField("present", T.BooleanType()),
    T.StructField("review_value", T.StringType()),
    T.StructField("review_values", T.ArrayType(T.StringType())),
])


def _run(spark, fields_rows, review_rows):
    fields = spark.createDataFrame(fields_rows, FIELDS_SCHEMA)
    reviews = spark.createDataFrame(review_rows, REVIEWS_SCHEMA)
    return {(r.url, r.FieldName): r
            for r in apply_review(fields, reviews).collect()}


def test_no_review_passes_through(spark):
    got = _run(spark,
               [("u1", "total", 1, 3, "19.99", None, 0.42)],
               [])
    r = got[("u1", "total")]
    assert (r.Value, r.Confidence, r.NumDetections, r.reviewed) == \
        ("19.99", 0.42, 3, False)


def test_empty_review_value_is_not_found(spark):
    # main.py:116-120 truthiness: '' does not count as an answer
    got = _run(spark,
               [("u1", "total", 1, 3, "19.99", None, 0.42)],
               [("u1", "total", True, "", None)])
    r = got[("u1", "total")]
    assert (r.Value, r.Confidence, r.reviewed) == ("19.99", 0.42, False)


def test_exact_match_confirms_and_keeps_detections(spark):
    got = _run(spark,
               [("u1", "total", 1, 3, "19.99", None, 0.42)],
               [("u1", "total", True, "19.99", None)])
    r = got[("u1", "total")]
    assert (r.Value, r.Confidence, r.NumDetections, r.reviewed) == \
        ("19.99", 1.0, 3, True)


def test_changed_value_drops_detections(spark):
    # main.py:144-147: edited values can't trace back to blocks
    got = _run(spark,
               [("u1", "total", 1, 3, "19.99", None, 0.42)],
               [("u1", "total", True, "21.50", None)])
    r = got[("u1", "total")]
    assert (r.Value, r.Confidence, r.NumDetections, r.reviewed) == \
        ("21.50", 1.0, 0, True)


def test_presence_unchecked_clears_value(spark):
    # present=False alone is a found review; Value <- review_value (None),
    # main.py:104-108 + 148-149
    got = _run(spark,
               [("u1", "total", 1, 3, "19.99", None, 0.42)],
               [("u1", "total", False, None, None)])
    r = got[("u1", "total")]
    assert r.Value is None and r.Confidence == 1.0
    assert r.NumDetections == 0 and r.reviewed


def test_multi_exact_match_raises_confidences(spark):
    vals = [("a", 0.5), ("b", 0.7)]
    got = _run(spark,
               [("u1", "tags", 2, 4, None, vals, 0.6)],
               [("u1", "tags", True, None, ["b", "a"])])  # set equality
    r = got[("u1", "tags")]
    assert r.reviewed and r.Confidence == 1.0 and r.NumDetections == 4
    assert [(v.Value, v.Confidence) for v in r.Values] == \
        [("a", 1.0), ("b", 1.0)]


def test_multi_changed_values_replace_list(spark):
    vals = [("a", 0.5), ("b", 0.7)]
    got = _run(spark,
               [("u1", "tags", 2, 4, None, vals, 0.6)],
               [("u1", "tags", True, None, ["a", "c"])])
    r = got[("u1", "tags")]
    assert r.reviewed and r.Confidence == 1.0 and r.NumDetections == 0
    assert [(v.Value, v.Confidence) for v in r.Values] == \
        [("a", 1.0), ("c", 1.0)]


def test_multi_no_values_given_passes_through(spark):
    vals = [("a", 0.5)]
    got = _run(spark,
               [("u1", "tags", 2, 4, None, vals, 0.6)],
               [("u1", "tags", True, None, [])])
    r = got[("u1", "tags")]
    assert not r.reviewed and r.Confidence == 0.6
    assert [(v.Value, v.Confidence) for v in r.Values] == [("a", 0.5)]


def test_review_doc_confidence_plain_min(spark):
    fields = spark.createDataFrame(
        [("u1", "total", 1, 3, "19.99", None, 0.42),
         ("u1", "date", 3, 1, "2024-01-01", None, 0.9),
         ("u2", "total", 1, 0, "", None, 0.0)],
        FIELDS_SCHEMA)
    reviews = spark.createDataFrame(
        [("u1", "total", True, "19.99", None)], REVIEWS_SCHEMA)
    merged = apply_review(fields, reviews)
    dc = {r.url: r for r in review_doc_confidence(merged).collect()}
    # u1: min(1.0 reviewed, 0.9) = 0.9, was_reviewed
    assert abs(dc["u1"].Confidence - 0.9) < 1e-12 and dc["u1"].was_reviewed
    # u2: untouched zero-confidence field -> 0.0 (plain min, no Optional
    # exclusion -- the callback rule, not E12)
    assert dc["u2"].Confidence == 0.0 and not dc["u2"].was_reviewed
