"""Forgiving bounding-box reconstruction (reference ``UniversalBox``).

Rebuilds the semantics of
``pipeline/postprocessing/fn-postprocess/util/boxes.py:11-232``:

* any-2-of-{top,height,bottom} / any-2-of-{left,width,right} reconstruction
  with ``EPSILON = 1e-15`` consistency checks on over-specified inputs
  (boxes.py:64-111);
* PascalCase-or-lowercase attribute/dict lookup (boxes.py:40-52);
* ``inverted_y`` handling: image-style (bottom = top + height, the default)
  vs math-style (top = bottom + height) (boxes.py:70-79);
* setters that re-derive the dependent dimension (boxes.py:117-155) —
  including the reference's bottom-setter quirk, see :meth:`UBox.bottom`;
* TLHWBR style-string serialization (boxes.py:157-200);
* min/max ``aggregate`` with inverted-y *majority vote* across mixed-style
  inputs (boxes.py:202-232).

The class is the row-level kernel; :func:`normalize_box_records` is the
Spark-facing operator — an Arrow-batched pass that coerces third-party
annotation records of any of these shapes into the engine's canonical
0-1 TLHW struct, with an error column instead of exceptions (warn-don't-fail,
SURVEY §4).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

EPSILON = 1e-15

_Y_KEYS = ("top", "height", "bottom")
_X_KEYS = ("left", "width", "right")


def _get_attr(o: Any, attr_lower: str):
    """Pascal-or-lower lookup on an object or mapping (boxes.py:40-52)."""
    if not o:
        return None
    if hasattr(o, attr_lower):
        return getattr(o, attr_lower)
    attr_pascal = attr_lower[0].upper() + attr_lower[1:]
    if hasattr(o, "get"):
        val = o.get(attr_lower)
        if val is None:
            val = o.get(attr_pascal)
        return val
    if hasattr(o, attr_pascal):
        return getattr(o, attr_pascal)
    return None


class UBox:
    """Box with forgiving constructors; see module docstring for provenance."""

    def __init__(self, top=None, left=None, height=None, width=None,
                 bottom=None, right=None, box: Any = None,
                 inverted_y: bool = True):
        self.inverted_y = inverted_y
        self._top = _get_attr(box, "top") if top is None else top
        self._height = _get_attr(box, "height") if height is None else height
        self._bottom = _get_attr(box, "bottom") if bottom is None else bottom
        self._left = _get_attr(box, "left") if left is None else left
        self._width = _get_attr(box, "width") if width is None else width
        self._right = _get_attr(box, "right") if right is None else right

        if sum(v is None for v in (self._top, self._bottom, self._height)) > 1:
            raise ValueError(
                f"At least 2 of [top, height, bottom] must be specified. "
                f"Got [{self._top}, {self._height}, {self._bottom}]")
        if self._top is None:
            self._top = (self._bottom - self._height if inverted_y
                         else self._bottom + self._height)
        if self._bottom is None:
            self._bottom = (self._top + self._height if inverted_y
                            else self._top - self._height)
        expected_h = (self._bottom - self._top if inverted_y
                      else self._top - self._bottom)
        if self._height is None:
            self._height = expected_h
        elif abs(self._height - expected_h) > EPSILON:
            raise ValueError(
                f"Specified height {self._height} does not match specified "
                f"top {self._top} and bottom {self._bottom}")

        if sum(v is None for v in (self._left, self._width, self._right)) > 1:
            raise ValueError(
                f"At least 2 of [left, width, right] must be specified. "
                f"Got [{self._left}, {self._width}, {self._right}]")
        if self._left is None:
            self._left = self._right - self._width
        if self._right is None:
            self._right = self._left + self._width
        expected_w = self._right - self._left
        if self._width is None:
            self._width = expected_w
        elif abs(self._width - expected_w) > EPSILON:
            raise ValueError(
                f"Specified width {self._width} does not match specified "
                f"right {self._right} - left {self._left} = {expected_w}")

    # -- properties & re-deriving setters (boxes.py:117-155) -----------------
    @property
    def top(self):
        return self._top

    @top.setter
    def top(self, value):
        self._height = (self._bottom - value if self.inverted_y
                        else self._bottom + value)
        self._top = value

    @property
    def bottom(self):
        return self._bottom

    @bottom.setter
    def bottom(self, value):
        # Faithful to boxes.py:146-148 including its quirk: for inverted_y
        # the reference sets height = top + value (not value - top), so a
        # bottom-set with nonzero top yields a height inconsistent with
        # (bottom - top). Reproduced as-is; pinned in tests.
        self._height = (self._top + value if self.inverted_y
                        else self._top - value)
        self._bottom = value

    @property
    def left(self):
        return self._left

    @left.setter
    def left(self, value):
        self._width = self._right - value
        self._left = value

    @property
    def right(self):
        return self._right

    @right.setter
    def right(self, value):
        self._width = self._left + value
        self._right = value

    @property
    def height(self):
        return self._height

    @property
    def width(self):
        return self._width

    # -- serialization (boxes.py:157-200) -------------------------------------
    _STYLE = {"T": ("Top", "_top"), "t": ("top", "_top"),
              "L": ("Left", "_left"), "l": ("left", "_left"),
              "H": ("Height", "_height"), "h": ("height", "_height"),
              "W": ("Width", "_width"), "w": ("width", "_width"),
              "B": ("Bottom", "_bottom"), "b": ("bottom", "_bottom"),
              "R": ("Right", "_right"), "r": ("right", "_right")}

    def to_dict(self, style: str = "TLHW") -> dict:
        if not style:
            raise ValueError(f"Bounding box to_dict got empty style spec {style!r}")
        result = {}
        for prop in style:
            if prop not in self._STYLE:
                raise ValueError(
                    f"Bounding box to_dict style {style!r} contained "
                    f"unrecognised spec {prop!r}")
            key, attr = self._STYLE[prop]
            result[key] = getattr(self, attr)
        return result

    # -- aggregate with inverted-y majority vote (boxes.py:202-232) ----------
    @classmethod
    def aggregate(cls, boxes: Iterable["UBox"],
                  inverted_y: bool | None = None) -> "UBox":
        boxes = list(boxes)
        if not boxes:
            raise ValueError(f"Cannot aggregate with no 'boxes'! Got {boxes}")
        if inverted_y is None:
            n_inv = sum(b.inverted_y for b in boxes)
            inverted_y = n_inv > (len(boxes) / 2)
        tops = [b.top if b.inverted_y == inverted_y else b.bottom for b in boxes]
        bottoms = [b.bottom if b.inverted_y == inverted_y else b.top for b in boxes]
        return cls(
            top=min(tops) if inverted_y else max(tops),
            bottom=max(bottoms) if inverted_y else min(bottoms),
            left=min(b.left for b in boxes),
            right=max(b.right for b in boxes),
            inverted_y=inverted_y,
        )


def normalize_box_records(df, box_col: str = "box_raw",
                          inverted_y: bool = True):
    """Spark operator: coerce third-party annotation boxes (any sufficient
    key combination, Pascal or lowercase) into the canonical 0-1 TLHW struct.

    ``df[box_col]``: MAP<STRING, DOUBLE>. Adds ``box`` (BOX_SCHEMA, NULL on
    failure) and ``box_error`` (STRING, NULL on success) — per-record error
    capture instead of job failure, like the reference's manifest error
    records (``notebooks/util/ocr.py:353-357``).
    """
    import pandas as pd
    from pyspark.sql import types as T

    from ..schemas import BOX_SCHEMA

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("box", BOX_SCHEMA, True),
           T.StructField("box_error", T.StringType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            boxes, errs = [], []
            for raw in b[box_col]:
                try:
                    ub = UBox(box=raw, inverted_y=inverted_y)
                    boxes.append({"left": float(ub.left), "top": float(ub.top),
                                  "width": float(ub.width),
                                  "height": float(ub.height)})
                    errs.append(None)
                except (ValueError, TypeError) as e:
                    boxes.append(None)
                    errs.append(str(e))
            b = b.copy()
            b["box"] = boxes
            b["box_error"] = errs
            yield b

    return df.mapInPandas(run, schema=out_schema)
