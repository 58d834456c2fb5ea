"""Geometry operators: box normalization, unions, reading order (SURVEY §2.4/§2.3).

All pure column arithmetic — whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def box_1000(box: Column) -> Column:
    """P2: 0-1 TLHW box → LayoutLM 0-1000 [x0,y0,x1,y1] ints.

    The reference multiplies by 1000 and **truncates** (``astype("long")``,
    notebooks/src/code/data/geometry.py:50-69) — never round.
    """
    return F.array(
        (box["left"] * 1000).cast("long"),
        (box["top"] * 1000).cast("long"),
        ((box["left"] + box["width"]) * 1000).cast("long"),
        ((box["top"] + box["height"]) * 1000).cast("long"),
    )


def with_boxes_1000(words_df: DataFrame, box_col: str = "box",
                    out_col: str = "box1000") -> DataFrame:
    return words_df.withColumn(out_col, box_1000(F.col(box_col)))


# ---------------------------------------------------------------------------
# Box union (UniversalBox.aggregate, fn-postprocess/util/boxes.py:202-232,
# y-down orientation): min top/left, max bottom/right. Used for line geometry
# (ocr_engines/base.py:113-129) and mention bboxes (util/extract.py:42-44).
# Aggregation expressions to use inside groupBy(...).agg(...).
# ---------------------------------------------------------------------------
def box_union_agg(box: str = "box") -> list[Column]:
    left = F.min(F.col(f"{box}.left"))
    top = F.min(F.col(f"{box}.top"))
    right = F.max(F.col(f"{box}.left") + F.col(f"{box}.width"))
    bottom = F.max(F.col(f"{box}.top") + F.col(f"{box}.height"))
    return [
        F.struct(
            left.alias("left"),
            top.alias("top"),
            (right - left).alias("width"),
            (bottom - top).alias("height"),
        ).alias("bbox")
    ]


def reading_order_key(box: Column, y_quantum: float = 0.01) -> Column:
    """XY-cut-lite reading-order sort key over word/line boxes.

    The reference trusts engine-emitted order (extract.py:104 "TODO: Lines
    InReadingOrder?"); when order must be *reconstructed* from geometry
    (north_star: "XY-cut reading-order reconstruction"), sort lines by
    quantized top then left: lines whose tops fall in the same ``y_quantum``
    band are one visual row, ordered left→right.
    """
    band = F.floor(box["top"] / F.lit(y_quantum))
    return F.struct(band.alias("band"), box["left"].alias("x"))


def sort_words_reading_order(words_array: Column,
                             y_quantum: float = 0.01) -> Column:
    """Reorder a page's word array into XY-cut reading order (array HOF —
    per-page, no shuffle). Ties resolved by original position implicitly via
    stable struct comparison (band, x, line_id)."""
    keyed = F.transform(
        words_array,
        lambda w: F.struct(
            F.floor(w["box"]["top"] / F.lit(y_quantum)).alias("band"),
            w["box"]["left"].alias("x"),
            w["line_id"].alias("line_id"),
            w.alias("w"),
        ),
    )
    return F.transform(F.array_sort(keyed), lambda s: s["w"])
