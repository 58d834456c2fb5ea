"""Case-convention bridging P4 (util/deser.py:11-38) and URI remapping P5/P6.

The reference round-trips between PascalCase JSON keys and snake_case Python
attributes, with acronym handling (``S3Uri`` → ``s3_uri``); here the same
rules apply to column names (``withColumnsRenamed``) so serialized output
matches the reference's JSON shape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PASCAL_SPLIT = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def pascal_to_snake(name: str) -> str:
    """PascalCase → snake_case with acronym runs kept together
    (``NumDetections`` → ``num_detections``, ``S3Uri`` → ``s3_uri``)."""
    return _PASCAL_SPLIT.sub("_", name).lower()


def snake_to_pascal(name: str) -> str:
    return "".join(p.capitalize() or "_" for p in name.split("_"))


def df_to_snake(df: DataFrame) -> DataFrame:
    return df.withColumnsRenamed({c: pascal_to_snake(c) for c in df.columns})


def df_to_pascal(df: DataFrame) -> DataFrame:
    return df.withColumnsRenamed({c: snake_to_pascal(c) for c in df.columns})


def remap_uri_prefix(df: DataFrame, col: str, old_prefix: str,
                     new_prefix: str) -> DataFrame:
    """P5/P6 (data/base.py:48-106, util/preproc.py:526-545): rewrite
    ``*-ref`` URI prefixes across environments. Pure regexp_replace —
    anchored so only prefixes move."""
    return df.withColumn(
        col, F.regexp_replace(F.col(col), "^" + re.escape(old_prefix),
                              new_prefix.replace("\\", "\\\\").replace("$", "\\$")))
