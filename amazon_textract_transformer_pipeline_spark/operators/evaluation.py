"""Evaluation metric computers as relational aggregates.

The reference computes its training-feedback metrics inside HF Trainer
callbacks over numpy batches:

* token-classification accuracy + "focus" accuracy —
  ``notebooks/src/code/data/ner.py:338-417`` (``get_metric_computer``):
  per-example accuracy over non-pad tokens, averaged across examples; focus
  accuracy restricted to tokens where label OR prediction is a real entity
  class (not the trailing "other" class), averaged over examples that have
  ≥1 such token; per-class prediction ratios (ner.py:392-399); and the
  early-stopping helper ``focus_else_acc_minus_one`` (ner.py:406-414).
* seq2seq normalized exact-match — ``notebooks/src/code/data/seq2seq/
  metrics.py:13-57``: generated vs target text, case- and outer-whitespace-
  insensitive.

Here the same numbers are computed over token/text *relations*, so a 100 TB
pipeline can score a model sweep without collecting predictions to a
driver: one map-side projection + two tiny aggregations per metric family.
The argmax/decode steps stay upstream (inference.py emits word probs;
seq2seq.py emits normalized strings) — these operators consume their
outputs.

Semantics pinned to the reference, including the quirks:

* ``acc`` averages *per-example* accuracies (not micro-averaged tokens),
  ner.py:366-371/402.
* An example whose tokens are all pad contributes NULL (reference: NaN
  poisons the mean; we keep the engine-friendly NULL and document it).
* ``focus_acc`` averages only examples with ≥1 focus token
  (ner.py:381-390/404-405).
* ``focus_else_acc_minus_one`` = focus_acc if > 0 else acc − 1
  (ner.py:406-414).
* class ratios divide by total *non-pad* tokens and exclude the pad class
  row (ner.py:392-399).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: CrossEntropyLoss().ignore_index — the label id of pad/CLS/SEP tokens
PAD_TOKEN_LABEL_ID = -100


def token_classification_metrics(
    tokens: DataFrame,
    num_labels: int,
    example_col: str = "example_id",
    label_col: str = "label",
    pred_col: str = "pred",
    pad_token_label_id: int = PAD_TOKEN_LABEL_ID,
) -> DataFrame:
    """ner.py:349-416 over a token relation → ONE summary row.

    ``tokens``: one row per (example, token) with integer ``label`` (pad =
    ``pad_token_label_id``) and argmax ``pred``. The "other" class is
    ``num_labels - 1`` (ner.py:348).
    """
    other = num_labels - 1
    lab, prd = F.col(label_col), F.col(pred_col)
    non_pad = lab != pad_token_label_id
    correct = non_pad & (lab == prd)
    focus = non_pad & ((lab != other) | (prd != other))
    per_ex = (
        tokens.groupBy(example_col)
        .agg(
            F.sum(non_pad.cast("long")).alias("n_tok"),
            F.sum(correct.cast("long")).alias("n_correct"),
            F.sum(focus.cast("long")).alias("n_focus"),
            F.sum((focus & (lab == prd)).cast("long")).alias("n_focus_correct"),
        )
        # NULL when an example is all padding (reference: NaN, ner.py:371)
        .withColumn("acc_ex", F.col("n_correct") / F.nullif(F.col("n_tok"),
                                                            F.lit(0)))
        .withColumn("focus_acc_ex",
                    F.when(F.col("n_focus") > 0,
                           F.col("n_focus_correct") / F.col("n_focus")))
    )
    agg = per_ex.agg(
        F.count("*").cast("bigint").alias("n_examples"),
        (F.sum("acc_ex") / F.count("*")).alias("acc"),
        F.sum((F.col("n_focus") > 0).cast("long")).cast("bigint")
        .alias("n_focus_examples"),
        (F.sum("focus_acc_ex")
         / F.sum((F.col("n_focus") > 0).cast("long"))).alias("focus_acc"),
    )
    return agg.withColumn(
        "focus_else_acc_minus_one",
        F.when(F.col("focus_acc") > 0, F.col("focus_acc"))
        .otherwise(F.col("acc") - 1.0),
    )


def class_prediction_ratios(
    tokens: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
    pad_token_label_id: int = PAD_TOKEN_LABEL_ID,
) -> DataFrame:
    """ner.py:392-399: share of non-pad tokens predicted as each class.

    Predictions on pad positions are overridden to the pad id first
    (ner.py:355-360) and the pad row is excluded from the report."""
    non_pad = F.col(label_col) != pad_token_label_id
    eff_pred = F.when(non_pad, F.col(pred_col)).otherwise(
        F.lit(pad_token_label_id))
    counted = (
        tokens.select(eff_pred.alias("pred_class"))
        .filter(F.col("pred_class") != pad_token_label_id)
        .groupBy("pred_class")
        .agg(F.count("*").cast("bigint").alias("n_tokens"))
    )
    # single-partition window over ≤num_labels rows — the relation is tiny
    total = F.sum("n_tokens").over(Window.partitionBy())
    return counted.withColumn("ratio", F.col("n_tokens") / total)


def seq2seq_exact_match(
    pairs: DataFrame,
    gen_col: str = "gen_text",
    target_col: str = "target_text",
) -> DataFrame:
    """seq2seq/metrics.py:35-56: case/outer-whitespace-insensitive exact
    match → one row (n_examples, acc). Decode-to-text happens upstream
    (seq2seq.py); NULL texts normalize to '' (the decoded-pad case)."""
    norm = lambda c: F.lower(F.trim(F.coalesce(F.col(c), F.lit(""))))  # noqa: E731
    hit = (norm(gen_col) == norm(target_col)).cast("long")
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_examples"),
        (F.sum(hit) / F.count("*")).alias("acc"),
    )
