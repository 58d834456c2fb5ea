"""G1-G4: overlap labeling + smart-merge, incl. FIXTURES.md §6 boundary cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators.labels import (
    merge_annotation_boxes,
    normalize_smgt_boxes,
    word_annotation_matches,
    word_label_matrix,
    word_single_labels,
)

N_CLASSES = 4  # classes 0..2 + other=3


def _words(spark, rows):
    return spark.createDataFrame(
        [(u, p, i, {"x0": float(a), "y0": float(b), "x1": float(c), "y1": float(d)})
         for (u, p, i, a, b, c, d) in rows],
        "url string, page_num int, word_pos int, "
        "wbox struct<x0:double,y0:double,x1:double,y1:double>",
    )


def _anns(spark, rows):
    return spark.createDataFrame(
        [(u, p, i, c, {"x0": float(a), "y0": float(b), "x1": float(x), "y1": float(y)})
         for (u, p, i, c, a, b, x, y) in rows],
        "url string, page_num int, ann_ix int, class_id int, "
        "abox struct<x0:double,y0:double,x1:double,y1:double>",
    )


def test_fifty_percent_boundary(spark):
    """Intersection exactly = half word area → matches (rule is ≥)."""
    words = _words(spark, [("u", 1, 0, 0, 0, 10, 10)])  # area 100
    anns = _anns(spark, [
        ("u", 1, 0, 1, 0, 0, 5, 10),    # isect 50 = 100/2 → match
        ("u", 1, 1, 2, 0, 0, 4.9, 10),  # isect 49 < 50 → no match
    ])
    got = word_annotation_matches(words, anns).select("class_id").collect()
    assert [r.class_id for r in got] == [1]


def test_lowest_class_wins_and_other(spark):
    words = _words(spark, [
        ("u", 1, 0, 0, 0, 10, 10),    # overlapped by class 2 and 1 → label 1
        ("u", 1, 1, 50, 50, 60, 60),  # no overlap → other (3)
    ])
    anns = _anns(spark, [
        ("u", 1, 0, 2, 0, 0, 10, 10),
        ("u", 1, 1, 1, 0, 0, 10, 10),
    ])
    got = {r.word_pos: r.label
           for r in word_single_labels(words, anns, N_CLASSES).collect()}
    assert got == {0: 1, 1: 3}


def test_empty_annotations_all_other(spark):
    words = _words(spark, [("u", 1, 0, 0, 0, 10, 10)])
    anns = _anns(spark, [])
    got = word_single_labels(words, anns, N_CLASSES).collect()
    assert got[0].label == 3
    mat = word_label_matrix(words, anns, N_CLASSES).collect()[0].label_matrix
    assert list(mat) == [0.0, 0.0, 0.0, 1.0]


def test_multilabel_matrix(spark):
    words = _words(spark, [("u", 1, 0, 0, 0, 10, 10)])
    anns = _anns(spark, [
        ("u", 1, 0, 0, 0, 0, 10, 10),
        ("u", 1, 1, 2, 0, 0, 10, 10),
    ])
    mat = word_label_matrix(words, anns, N_CLASSES).collect()[0].label_matrix
    assert list(mat) == [1.0, 0.0, 1.0, 0.0]


def test_zero_area_word_quirk(spark):
    """Reference quirk: zero-area word matches ANY annotation on the page
    (0 >= 0/2) — preserved faithfully (ner.py:98-103)."""
    words = _words(spark, [("u", 1, 0, 5, 5, 5, 5)])
    anns = _anns(spark, [("u", 1, 0, 0, 90, 90, 99, 99)])  # disjoint
    assert word_annotation_matches(words, anns).count() == 1


def test_merge_transitive_chain(spark):
    """A-B overlap, B-C overlap, A-C don't → all one group (transitive);
    touching edges count (closed intervals)."""
    anns = _anns(spark, [
        ("u", 1, 0, 1, 0, 0, 10, 10),
        ("u", 1, 1, 1, 10, 0, 20, 10),   # touches box 0 at x=10
        ("u", 1, 2, 1, 19, 0, 30, 10),   # overlaps box 1 only
        ("u", 1, 3, 1, 50, 50, 60, 60),  # isolated
        ("u", 1, 4, 2, 0, 0, 10, 10),    # same geometry, different class
    ])
    got = {r.group_id: r for r in merge_annotation_boxes(anns).collect()}
    assert sorted(got.keys()) == [0, 3, 4]
    g0 = got[0]
    assert list(g0.ann_ixs) == [0, 1, 2]
    assert (g0.x0, g0.y0, g0.x1, g0.y1) == (0.0, 0.0, 30.0, 10.0)
    assert got[4].class_id == 2


def test_merge_idempotent(spark):
    """Merging already-merged groups changes nothing."""
    anns = _anns(spark, [
        ("u", 1, 0, 1, 0, 0, 10, 10),
        ("u", 1, 1, 1, 5, 5, 20, 20),
        ("u", 2, 0, 1, 0, 0, 10, 10),
    ])
    once = merge_annotation_boxes(anns)
    again = merge_annotation_boxes(
        once.select(
            "url", "page_num", F.col("group_id").alias("ann_ix"), "class_id",
            F.struct("x0", "y0", "x1", "y1").alias("abox"),
        )
    )
    assert sorted((r.url, r.page_num, r.x0, r.y1) for r in once.collect()) == \
        sorted((r.url, r.page_num, r.x0, r.y1) for r in again.collect())


def test_smgt_normalize_truncates(spark):
    anns = spark.createDataFrame(
        [("u", 1, 0, 0, 33.0, 77.0, 100.0, 50.0, 300.0, 300.0)],
        "url string, page_num int, ann_ix int, class_id int, "
        "left double, top double, width double, height double, "
        "img_width double, img_height double",
    )
    b = normalize_smgt_boxes(anns).collect()[0].box1000
    # 33/300*1000 = 110.0; 77/300*1000 = 256.66→256 (truncate, not round)
    assert list(b) == [110, 256, 443, 423]
