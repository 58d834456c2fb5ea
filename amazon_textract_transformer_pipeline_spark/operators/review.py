"""Human-review merge-back (the A2I loop's data operation).

Reference: ``pipeline/review/fn-review-callback/main.py:102-181`` — after a
human reviews a low-confidence document, the callback merges the reviewer's
answers over the model's ``{Confidence, Fields}`` result and recomputes the
document confidence. Everything around it (S3 events, task tokens, SFn
signalling) is orchestration with no in-engine analog; the merge itself is
one left join + CASE rules, rebuilt here over the ``consolidate_fields``
relation so the full loop closes relationally:

    fields ──► doc_confidence ──► needs_human_review ──► (humans)
       ▲                                                    │
       └──────────────── apply_review ◄─── reviews ─────────┘

Merge rules (pinned to the reference):

* A field's review is *found* iff the reviewer unchecked presence
  (``present == false``, main.py:104-108/116-120), OR gave ≥1 value for a
  multi-valued field, OR gave a non-empty value for a single-valued field
  (truthiness of ``review_value`` — empty string does NOT count,
  main.py:116-120). No review row / not found → field passes through
  unchanged (main.py:135-137).
* Found → ``Confidence`` becomes 1.0 (human ground truth, main.py:142-143).
* ``exact match``: single-valued — reviewed value equals the model value
  (main.py:132); multi-valued — set equality both directions
  (main.py:121-131, the two ``next()`` containment checks; duplicate
  values don't matter).
* Detections survive only an exact match — an edited value can't be traced
  back to source blocks (main.py:144-147); relationally, ``NumDetections``
  drops to 0.
* Single ``Value`` ← the reviewed value, even when that is NULL because the
  reviewer only unchecked presence (main.py:148-149 assigns
  ``review_value`` unconditionally once found).
* Multi ``Values`` ← model values at confidence 1.0 when exact, else the
  reviewed values at confidence 1.0 with no detections (main.py:150-166).
* Reviewed doc confidence = plain ``min`` over ALL the doc's field
  confidences with missing → 0 (main.py:176-179) — deliberately NOT the
  E12 rule (no zero-confidence-Optional exclusion): a reviewed doc's
  confidence reflects every field the human saw.

Reference deviation (documented, intentional): main.py:113 filters
multi-value inputs with ``inp["FieldName"] == "field_name"`` — the *literal
string*, a bug that makes reviewed multi-values unreachable for any field
not literally named ``field_name``. This operator implements the evident
intent (match the current field's name); the surrounding exact-match /
detection-drop rules are replayed faithfully.

Scale: ``reviews`` is the set of human answers — by construction a small
fraction of the corpus (only sub-threshold docs are routed). The merge is a
single shuffle join on (url, FieldName); with fields already partitioned by
url, AQE broadcasts the review side when it measures small. No collects, no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EMPTY_STR_ARR = "cast(array() as array<string>)"


def apply_review(fields: DataFrame, reviews: DataFrame) -> DataFrame:
    """Merge human review answers over the model's consolidated fields.

    ``fields``: output of :func:`..consolidate.consolidate_fields` (one row
    per (url, configured field); ``Value`` is NULL exactly on multi-valued
    fields — the relational analog of the reference's ``"Values" in
    field_input`` test, main.py:111).

    ``reviews``: one row per reviewed (url, FieldName) with
    ``present`` (nullable bool — the ``field-present-X`` checkbox),
    ``review_value`` (nullable string — the ``field-value-X`` answer) and
    ``review_values`` (nullable array<string>, already in the review form's
    sort order — the pre-sorted multival inputs, main.py:88-100). Docs or
    fields with no review row pass through untouched.

    Returns the fields relation with merged ``Value/Values/Confidence/
    NumDetections`` plus a ``reviewed`` flag.
    """
    r = reviews.select(
        "url", "FieldName",
        F.col("present").alias("_present"),
        F.col("review_value").alias("_rvalue"),
        F.col("review_values").alias("_rvalues"),
        F.lit(True).alias("_has_review"),
    )
    j = fields.join(r, ["url", "FieldName"], "left")

    is_multi = F.col("Value").isNull()
    n_rvals = F.size(F.coalesce(F.col("_rvalues"), F.expr(_EMPTY_STR_ARR)))
    # Outer coalesce: with present=NULL and no value the inner OR is
    # three-valued NULL, which merge-WHENs treat as false but would leak a
    # NULL into the boolean `reviewed` output column — pin it to false.
    found = F.coalesce(
        F.col("_has_review") & (
            (F.col("_present") == F.lit(False))
            | (is_multi & (n_rvals > 0))
            | (~is_multi & (F.coalesce("_rvalue", F.lit("")) != ""))
        ),
        F.lit(False),
    )
    # set equality both directions = sorted distinct arrays equal
    model_vals = F.array_sort(F.array_distinct(
        F.expr("transform(coalesce(Values, array()), v -> v.Value)")))
    review_vals = F.array_sort(F.array_distinct(
        F.coalesce(F.col("_rvalues"), F.expr(_EMPTY_STR_ARR))))
    exact = F.when(is_multi, model_vals.eqNullSafe(review_vals)) \
        .otherwise(F.col("_rvalue").eqNullSafe(F.col("Value")))

    merged_values = F.when(
        found & is_multi,
        F.when(exact, F.expr(
            "transform(Values, v -> struct(v.Value as Value, "
            "cast(1.0 as double) as Confidence))"))
        .otherwise(F.expr(
            "transform(coalesce(_rvalues, array()), v -> "
            "struct(v as Value, cast(1.0 as double) as Confidence))")),
    ).otherwise(F.col("Values"))

    keep = [c for c in fields.columns
            if c not in ("Value", "Values", "Confidence", "NumDetections")]
    return j.select(
        *keep,
        F.when(found & ~exact, F.lit(0).cast("bigint"))
        .otherwise(F.col("NumDetections").cast("bigint"))
        .alias("NumDetections"),
        F.when(found & ~is_multi, F.col("_rvalue"))
        .otherwise(F.col("Value")).alias("Value"),
        merged_values.alias("Values"),
        F.when(found, F.lit(1.0)).otherwise(F.col("Confidence"))
        .alias("Confidence"),
        found.alias("reviewed"),
    )


def review_doc_confidence(merged_fields: DataFrame) -> DataFrame:
    """Post-review document confidence: plain min over the doc's field
    confidences, missing → 0 (``fn-review-callback/main.py:176-179`` —
    deliberately not E12's Optional-exclusion rule, see module docstring).
    Also reports whether any field was human-reviewed."""
    return merged_fields.groupBy("url").agg(
        F.min(F.coalesce("Confidence", F.lit(0.0))).alias("Confidence"),
        F.max(F.coalesce("reviewed", F.lit(False))).alias("was_reviewed"),
    )
