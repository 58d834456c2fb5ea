"""C4 three-sentence-span dedup (webclean.dedup_text_spans): keeper
selection, within-doc duplicates, sub-span docs untouched, empties."""

from __future__ import annotations

from amazon_textract_transformer_pipeline_spark.operators.webclean import (
    dedup_text_spans,
)

SHARED = "Alpha one. Alpha two. Alpha three."


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_text_spans(df).collect()
    return {r.doc_id: r for r in out}


def test_cross_doc_span_removed_keeper_is_min_doc(spark):
    r = _run(spark, [
        (1, f"Unique lead one. {SHARED} Tail one."),
        (2, f"Other lead two. {SHARED} Tail two."),
    ])
    # doc 1 keeps the span; doc 2 loses its three sentences
    assert "Alpha two." in r[1].kept_text
    assert "Alpha two." not in r[2].kept_text
    assert r[1].n_sent_removed == 0
    assert r[2].n_sent_removed == 3
    assert r[2].kept_text == "Other lead two. Tail two."


def test_within_doc_repeat_removed_once(spark):
    r = _run(spark, [(5, f"{SHARED} Bridge here. {SHARED}")])
    # the second occurrence's three sentences vanish; the first stays
    assert r[5].kept_text == f"{SHARED} Bridge here."
    assert r[5].n_sent_removed == 3


def test_docs_below_span_size_pass_through(spark):
    r = _run(spark, [
        (1, "Only two. Sentences here."),
        (2, "Only two. Sentences here."),
    ])
    for d in (1, 2):
        assert r[d].kept_text == "Only two. Sentences here."
        assert r[d].n_sent_removed == 0


def test_empty_and_unpunctuated_docs_survive(spark):
    r = _run(spark, [(1, ""), (2, "no terminal punctuation at all")])
    assert r[1].kept_text == "" and r[1].n_sent_kept == 0
    assert r[2].kept_text == "no terminal punctuation at all"
    assert r[2].n_sent_kept == 1


def test_overlapping_duplicate_spans_remove_union(spark):
    # four shared sentences → two overlapping dup spans in doc 2; the
    # union of their sentences (all four) is removed exactly once each
    shared4 = "S one. S two. S three. S four."
    r = _run(spark, [
        (1, f"Lead a. {shared4}"),
        (2, f"Lead b. {shared4} Tail b."),
    ])
    assert r[2].kept_text == "Lead b. Tail b."
    assert r[2].n_sent_removed == 4
    assert r[1].n_sent_removed == 0
