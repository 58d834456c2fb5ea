"""Annotation/label geometric operators G1-G4 (SURVEY §2.6) — training side.

* G1/G2: word×annotation overlap labeling — intersection area ≥ word_area/2
  (``notebooks/src/code/data/ner.py:38-152``), multi-label allowed, single
  label = lowest matched class id, unmatched → "other" (n_classes − 1).
  Expressed as an equi-join on (url, page) + area predicate — Catalyst
  plans a hash join on the page key; the per-page pair count is bounded, so
  no crossJoin blowup at any scale. Quirk preserved: a zero-area word
  matches every annotation on its page (0 ≥ 0/2).
* G3: the same ≥50% rule is what the annotation UI uses
  (ocr-bbox-and-validation.liquid.tpl.html:359-395) — one implementation
  serves both.
* G4: smart-merge — same-class boxes that transitively overlap (closed
  intervals: touching edges count, tpl.html:305-356) collapse into one
  group. Connected components per (url, page, class): bounded box count per
  page ⇒ union-find inside applyInPandas is the right physical plan
  (SURVEY §2.6), not an iterative self-join.
* P3: SMGT absolute-pixel → 0-1000 normalization
  (``smgt.py:25-38,161-187``) — truncating, like P2.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_smgt_boxes(anns: DataFrame) -> DataFrame:
    """P3: (top,left,height,width in abs pixels) + image dims → 0-1000 ints
    [x0,y0,x1,y1], truncating (smgt.py:161-187 ``astype('long')``)."""
    return anns.withColumn(
        "box1000",
        F.array(
            (F.col("left") / F.col("img_width") * 1000).cast("long"),
            (F.col("top") / F.col("img_height") * 1000).cast("long"),
            ((F.col("left") + F.col("width")) / F.col("img_width") * 1000).cast("long"),
            ((F.col("top") + F.col("height")) / F.col("img_height") * 1000).cast("long"),
        ),
    )


def _isect_area(w: str, a: str):
    width = F.greatest(
        F.lit(0.0),
        F.least(F.col(f"{w}.x1"), F.col(f"{a}.x1"))
        - F.greatest(F.col(f"{w}.x0"), F.col(f"{a}.x0")),
    )
    height = F.greatest(
        F.lit(0.0),
        F.least(F.col(f"{w}.y1"), F.col(f"{a}.y1"))
        - F.greatest(F.col(f"{w}.y0"), F.col(f"{a}.y0")),
    )
    return width * height


def word_annotation_matches(words: DataFrame, anns: DataFrame) -> DataFrame:
    """G1 core: (word × ann on same url/page) rows passing the ≥50%-area rule.

    ``words``: url, page_num, word_pos, wbox struct<x0,y0,x1,y1>.
    ``anns``:  url, page_num, class_id, abox struct<x0,y0,x1,y1>.
    """
    w_area = (
        (F.col("wbox.x1") - F.col("wbox.x0"))
        * (F.col("wbox.y1") - F.col("wbox.y0"))
    )
    return (
        words.join(anns, ["url", "page_num"])
        .filter(_isect_area("wbox", "abox") >= w_area / 2)
    )


def word_single_labels(words: DataFrame, anns: DataFrame, n_classes: int) -> DataFrame:
    """G2: one class per word — lowest matched class id, else other
    (ner.py:121-152: np.argmax over the 0/1 matrix = first/lowest match)."""
    matched = (
        word_annotation_matches(words, anns)
        .groupBy("url", "page_num", "word_pos")
        .agg(F.min("class_id").alias("matched_cls"))
    )
    return words.join(
        matched, ["url", "page_num", "word_pos"], "left"
    ).withColumn(
        "label",
        F.coalesce("matched_cls", F.lit(n_classes - 1)).cast("int"),
    ).drop("matched_cls")


def word_label_matrix(words: DataFrame, anns: DataFrame, n_classes: int) -> DataFrame:
    """G1 full multi-label form: per word, 0/1 array of n_classes with the
    implicit 'other' column (ner.py:106-118)."""
    matched = (
        word_annotation_matches(words, anns)
        .groupBy("url", "page_num", "word_pos")
        .agg(F.collect_set("class_id").alias("classes"))
    )
    out = words.join(matched, ["url", "page_num", "word_pos"], "left")
    classes = F.coalesce("classes", F.array())
    return out.withColumn(
        "label_matrix",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_classes - 1)),
            lambda c: F.when(
                F.array_contains(classes, c)
                | ((F.size(classes) == 0) & (c == n_classes - 1)),
                1.0,
            ).otherwise(0.0),
        ),
    ).drop("classes")


# ---------------------------------------------------------------------------
# G4 smart-merge
# ---------------------------------------------------------------------------
_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page_num", T.IntegerType(), False),
        T.StructField("class_id", T.IntegerType(), False),
        T.StructField("group_id", T.IntegerType(), False),  # min ann_ix in group
        T.StructField("ann_ixs", T.ArrayType(T.IntegerType()), False),
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
    ]
)


def _overlap_closed(a, b) -> bool:
    return (a[2] >= b[0] and b[2] >= a[0]) and (a[3] >= b[1] and b[3] >= a[1])


def merge_annotation_boxes(anns: DataFrame) -> DataFrame:
    """G4: same-class transitive-overlap merge per page.

    ``anns``: url, page_num, ann_ix, class_id, abox struct<x0,y0,x1,y1>.
    Returns one row per merged group with the union box and member indexes
    (membership = connected components of the overlap graph — the order-
    dependent incremental JS algorithm computes exactly this closure).
    """
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        page = int(pdf["page_num"].iloc[0])
        cls = int(pdf["class_id"].iloc[0])
        pdf = pdf.sort_values("ann_ix")
        boxes = [(b["x0"], b["y0"], b["x1"], b["y1"]) for b in pdf["abox"]]
        ixs = pdf["ann_ix"].tolist()
        parent = list(range(len(boxes)))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(len(boxes)):
            for j in range(i + 1, len(boxes)):
                if _overlap_closed(boxes[i], boxes[j]):
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        groups: dict[int, list[int]] = {}
        for i in range(len(boxes)):
            groups.setdefault(find(i), []).append(i)
        rows = []
        for root, members in groups.items():
            mb = [boxes[m] for m in members]
            rows.append(
                {
                    "url": url,
                    "page_num": page,
                    "class_id": cls,
                    "group_id": min(ixs[m] for m in members),
                    "ann_ixs": sorted(ixs[m] for m in members),
                    "x0": min(b[0] for b in mb),
                    "y0": min(b[1] for b in mb),
                    "x1": max(b[2] for b in mb),
                    "y1": max(b[3] for b in mb),
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in _MERGE_SCHEMA])

    return anns.groupBy("url", "page_num", "class_id").applyInPandas(
        merge, schema=_MERGE_SCHEMA
    )
