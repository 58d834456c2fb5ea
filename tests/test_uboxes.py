"""UniversalBox forgiving semantics — consistency cases ported from the
reference's constructor/setter/aggregate rules (fn-postprocess/util/boxes.py:
11-111 reconstruction+EPSILON, 117-155 setters, 157-200 styles, 202-232
aggregate majority vote)."""

from __future__ import annotations

import pytest

from amazon_textract_transformer_pipeline_spark.operators.uboxes import (
    UBox,
    normalize_box_records,
)


def test_reconstruct_any_two_of_three():
    # top+height → bottom (inverted/image style)
    b = UBox(top=0.2, left=0.1, height=0.3, width=0.4)
    assert (b.bottom, b.right) == (0.5, 0.5)
    # top+bottom → height
    b = UBox(top=0.2, bottom=0.5, left=0.1, right=0.5)
    assert (b.height, b.width) == pytest.approx((0.3, 0.4))
    # bottom+height → top; right+width → left
    b = UBox(bottom=0.5, height=0.3, right=0.5, width=0.4)
    assert (b.top, b.left) == pytest.approx((0.2, 0.1))


def test_math_style_y():
    # inverted_y=False: top = bottom + height
    b = UBox(bottom=0.1, height=0.3, left=0.0, width=1.0, inverted_y=False)
    assert b.top == pytest.approx(0.4)
    b2 = UBox(top=0.4, height=0.3, left=0.0, width=1.0, inverted_y=False)
    assert b2.bottom == pytest.approx(0.1)


def test_epsilon_consistency_checks():
    # consistent over-specification passes
    UBox(top=0.2, height=0.3, bottom=0.5, left=0.1, width=0.4, right=0.5)
    # within EPSILON passes
    UBox(top=0.2, height=0.3 + 5e-16, bottom=0.5, left=0.0, width=1.0)
    # beyond EPSILON raises
    with pytest.raises(ValueError, match="height"):
        UBox(top=0.2, height=0.31, bottom=0.5, left=0.0, width=1.0)
    with pytest.raises(ValueError, match="width"):
        UBox(top=0.0, height=1.0, left=0.1, width=0.5, right=0.5)


def test_underspecified_raises():
    with pytest.raises(ValueError, match="top, height, bottom"):
        UBox(top=0.2, left=0.0, width=1.0)
    with pytest.raises(ValueError, match="left, width, right"):
        UBox(top=0.0, bottom=1.0, left=0.1)


def test_box_object_pascal_and_lower():
    b = UBox(box={"Top": 0.1, "Height": 0.2, "left": 0.3, "Width": 0.4})
    assert (b.top, b.bottom, b.left, b.right) == \
        pytest.approx((0.1, 0.3, 0.3, 0.7))

    class Obj:
        top, height, left, width = 0.1, 0.2, 0.3, 0.4

    assert UBox(box=Obj()).bottom == pytest.approx(0.3)


def test_setters_rederive():
    b = UBox(top=0.2, height=0.3, left=0.1, width=0.4)
    b.left = 0.0
    assert b.width == pytest.approx(0.5)  # right stays 0.5
    b.right = 0.6
    assert b.width == pytest.approx(0.6)
    b.top = 0.0
    assert b.height == pytest.approx(0.5)  # bottom stays 0.5


def test_bottom_setter_reference_quirk():
    """boxes.py:146-148 computes height = top + value under inverted_y —
    reproduced faithfully (nonzero top ⇒ height ≠ bottom − top)."""
    b = UBox(top=0.2, height=0.3, left=0.0, width=1.0)
    b.bottom = 0.6
    assert b.height == pytest.approx(0.8)  # top + value, the quirk
    z = UBox(top=0.0, height=0.5, left=0.0, width=1.0)
    z.bottom = 0.6
    assert z.height == pytest.approx(0.6)  # agrees when top == 0


def test_style_string_serialization():
    b = UBox(top=0.2, height=0.3, left=0.1, width=0.4)
    assert b.to_dict("TLbr") == pytest.approx(
        {"Top": 0.2, "Left": 0.1, "bottom": 0.5, "right": 0.5})
    assert set(b.to_dict()) == {"Top", "Left", "Height", "Width"}
    with pytest.raises(ValueError, match="unrecognised"):
        b.to_dict("TLX")
    with pytest.raises(ValueError, match="empty"):
        b.to_dict("")


def test_aggregate_inverted_y_majority_vote():
    inv = [UBox(top=0.1, bottom=0.3, left=0.1, right=0.2),
           UBox(top=0.2, bottom=0.4, left=0.0, right=0.3)]
    math_style = UBox(top=0.9, bottom=0.5, left=0.5, right=0.6,
                      inverted_y=False)
    # 2 inverted vs 1 math → vote = inverted; math box contributes its
    # bottom as "top" and top as "bottom" (boxes.py:224-225)
    agg = UBox.aggregate(inv + [math_style])
    assert agg.inverted_y is True
    assert agg.top == pytest.approx(0.1)
    assert agg.bottom == pytest.approx(0.9)
    assert (agg.left, agg.right) == pytest.approx((0.0, 0.6))
    # explicit override skips the vote
    agg2 = UBox.aggregate(inv + [math_style], inverted_y=False)
    assert agg2.inverted_y is False
    with pytest.raises(ValueError, match="no 'boxes'"):
        UBox.aggregate([])


def test_normalize_box_records_spark(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, {"Top": 0.1, "Height": 0.2, "Left": 0.3, "Width": 0.4}),
        (2, {"top": 0.1, "bottom": 0.3, "left": 0.3, "right": 0.7}),
        (3, {"bottom": 0.3, "height": 0.2, "right": 0.7, "width": 0.4}),
        (4, {"Top": 0.1, "Left": 0.3}),            # underspecified
        (5, {"top": 0.1, "height": 0.2, "bottom": 0.9,
             "left": 0.0, "width": 1.0}),          # inconsistent
    ]
    df = spark.createDataFrame(rows, "id int, box_raw map<string,double>")
    got = {r.id: r for r in normalize_box_records(df).collect()}
    for i in (1, 2, 3):
        assert got[i].box_error is None
        assert got[i].box.left == pytest.approx(0.3)
        assert got[i].box.top == pytest.approx(0.1)
        assert got[i].box.width == pytest.approx(0.4)
        assert got[i].box.height == pytest.approx(0.2)
    assert got[4].box is None and "must be specified" in got[4].box_error
    assert got[5].box is None and "does not match" in got[5].box_error
    # error capture is per-record: good rows unaffected
    assert df.count() == 5
