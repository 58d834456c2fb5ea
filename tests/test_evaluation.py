"""Evaluation metrics vs a numpy replay of the reference computers
(ner.py:338-417, seq2seq/metrics.py:13-57)."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_spark.operators.evaluation import (
    PAD_TOKEN_LABEL_ID,
    class_prediction_ratios,
    seq2seq_exact_match,
    token_classification_metrics,
)

PAD = PAD_TOKEN_LABEL_ID


def _numpy_replay(labels: np.ndarray, preds: np.ndarray, num_labels: int):
    """Line-for-line replay of ner.py:349-416 given argmax'd preds."""
    other = num_labels - 1
    non_pad = labels != PAD
    preds = np.where(non_pad, preds, PAD)
    n_tok = non_pad.sum(axis=1)
    n_correct = np.logical_and(labels == preds, non_pad).sum(axis=1)
    with np.errstate(invalid="ignore"):
        acc_by_ex = np.true_divide(n_correct, n_tok)
    focus = np.logical_and(non_pad, np.logical_or(labels != other,
                                                  preds != other))
    n_focus = focus.sum(axis=1)
    n_focus_correct = np.logical_and(labels == preds, focus).sum(axis=1)
    focus_by_ex = np.true_divide(n_focus_correct[n_focus != 0],
                                 n_focus[n_focus != 0])
    n_examples = labels.shape[0]
    acc = acc_by_ex.sum() / n_examples
    n_focus_examples = (n_focus != 0).sum()
    focus_acc = focus_by_ex.sum() / n_focus_examples
    ratios = {}
    uniq, cnt = np.unique(preds, return_counts=True)
    total = n_tok.sum()
    for u, c in zip(uniq, cnt):
        if u != PAD:
            ratios[int(u)] = c / total
    return {"n_examples": n_examples, "acc": acc,
            "n_focus_examples": int(n_focus_examples),
            "focus_acc": focus_acc,
            "focus_else_acc_minus_one": focus_acc if focus_acc > 0
            else acc - 1, "ratios": ratios}


@pytest.fixture(scope="module")
def token_case():
    rng = np.random.RandomState(7)
    K = 5  # classes incl. 'other' = 4
    B, L = 40, 30
    labels = rng.randint(0, K, size=(B, L))
    labels[rng.rand(B, L) < 0.25] = PAD
    preds = np.where(rng.rand(B, L) < 0.7, labels, rng.randint(0, K, (B, L)))
    preds = np.where(labels == PAD, rng.randint(0, K, (B, L)), preds)
    return labels, preds, K


def _to_rows(labels, preds):
    return [(int(i), int(l), int(p))
            for i, (lr, pr) in enumerate(zip(labels, preds))
            for l, p in zip(lr, pr)]


def test_token_metrics_match_reference_replay(spark, token_case):
    labels, preds, K = token_case
    df = spark.createDataFrame(_to_rows(labels, preds),
                               ["example_id", "label", "pred"])
    got = token_classification_metrics(df, num_labels=K).collect()[0]
    want = _numpy_replay(labels, preds, K)
    assert got.n_examples == want["n_examples"]
    assert got.n_focus_examples == want["n_focus_examples"]
    assert abs(got.acc - want["acc"]) < 1e-12
    assert abs(got.focus_acc - want["focus_acc"]) < 1e-12
    assert abs(got.focus_else_acc_minus_one -
               want["focus_else_acc_minus_one"]) < 1e-12


def test_class_ratios_match_reference_replay(spark, token_case):
    labels, preds, K = token_case
    df = spark.createDataFrame(_to_rows(labels, preds),
                               ["example_id", "label", "pred"])
    got = {r.pred_class: r.ratio
           for r in class_prediction_ratios(df).collect()}
    want = _numpy_replay(labels, preds, K)["ratios"]
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_all_pad_example_yields_null_not_poison(spark):
    # reference NaN-poisons the mean (documented divergence): engine keeps
    # the example in n_examples but its NULL acc drops out of the sum
    rows = [(0, 1, 1), (0, 2, 2), (1, PAD, 3), (1, PAD, 0)]
    df = spark.createDataFrame(rows, ["example_id", "label", "pred"])
    got = token_classification_metrics(df, num_labels=4).collect()[0]
    assert got.n_examples == 2
    assert abs(got.acc - 0.5) < 1e-12  # 1.0 (ex 0) + NULL -> 1.0 / 2


def test_focus_excludes_other_other_tokens(spark):
    # label=other AND pred=other tokens don't count toward focus
    other = 3
    rows = [(0, other, other), (0, other, other), (0, 1, 1), (0, 2, 0)]
    df = spark.createDataFrame(rows, ["example_id", "label", "pred"])
    got = token_classification_metrics(df, num_labels=4).collect()[0]
    assert abs(got.acc - 0.75) < 1e-12
    assert got.n_focus_examples == 1
    assert abs(got.focus_acc - 0.5) < 1e-12  # tokens 3,4: one correct


def test_focus_else_acc_minus_one_fallback(spark):
    # zero focus accuracy -> fall back to acc - 1 (ner.py:406-414)
    other = 2
    rows = [(0, 1, other), (0, other, other)]
    df = spark.createDataFrame(rows, ["example_id", "label", "pred"])
    got = token_classification_metrics(df, num_labels=3).collect()[0]
    assert got.focus_acc == 0.0
    assert abs(got.focus_else_acc_minus_one - (got.acc - 1.0)) < 1e-12


def test_seq2seq_exact_match_normalization(spark):
    rows = [("  JAN 2024 ", "jan 2024"),   # case+whitespace insensitive
            ("feb 2024", "mar 2024"),      # miss
            (None, ""),                    # decoded-pad == empty target
            ("x", None)]                   # vs NULL target -> miss
    df = spark.createDataFrame(rows, ["gen_text", "target_text"])
    got = seq2seq_exact_match(df).collect()[0]
    assert got.n_examples == 4
    assert abs(got.acc - 0.5) < 1e-12
