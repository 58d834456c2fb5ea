"""ExactSubstr dedup (operators/dedup.py:exact_substring_dedup): Lee et
al. 2022 — corpus-wide first occurrence of every duplicated n-gram
survives, later occurrences lose the covered words. Pinned against a
brute-force Python replica."""

from __future__ import annotations

from amazon_textract_transformer_pipeline_spark.operators import dedup


def _py_exsub(rows, n):
    """Replica: occurrences ordered by (doc_id, pos); masked iff an
    earlier occurrence of the same gram text exists."""
    ws = {d: t.split() for d, t in rows}
    occ: dict[str, tuple[int, int]] = {}
    masked: dict[int, set[int]] = {d: set() for d, _ in rows}
    spans: dict[int, int] = {d: 0 for d, _ in rows}
    for d in sorted(ws):
        w = ws[d]
        for p in range(len(w) - n + 1):
            g = " ".join(w[p:p + n])
            if g in occ:
                masked[d].update(range(p, p + n))
                spans[d] += 1
            else:
                occ[g] = (d, p)
    out = {}
    for d, w in ws.items():
        kept = [x for i, x in enumerate(w) if i not in masked[d]]
        out[d] = (" ".join(kept), len(w), len(w) - len(kept), spans[d])
    return out


def _run(spark, rows, n):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.exact_substring_dedup(df, n=n)
    return {r.doc_id: (r.kept_text, r.n_words, r.n_words_removed,
                       r.n_matched_spans) for r in got.collect()}


def test_cross_doc_first_occurrence_survives(spark):
    blk = "a b c d e"
    rows = [(0, f"intro {blk} outro"),
            (1, f"other words here {blk}"),
            (2, f"{blk} trailing text")]
    got = _run(spark, rows, n=5)
    assert got == _py_exsub(rows, 5)
    assert got[0][0] == f"intro {blk} outro"      # keeper intact
    assert got[1][0] == "other words here"        # dup cut
    assert got[2][0] == "trailing text"


def test_within_doc_repeat_masks_second_copy(spark):
    rows = [(7, "x y z p q x y z p q")]
    got = _run(spark, rows, n=5)
    assert got == _py_exsub(rows, 5)
    assert got[7] == ("x y z p q", 10, 5, 1)


def test_overlapping_dup_spans_union_not_double_count(spark):
    # doc 1 carries four masked occurrences whose covered spans overlap;
    # removed words = the union (here the whole doc), never the sum of
    # span lengths (which would exceed the doc)
    blk = "a b c d e f"
    rows = [(0, blk), (1, f"{blk} {blk}")]
    got = _run(spark, rows, n=5)
    assert got == _py_exsub(rows, 5)
    assert got[1][3] >= 2
    assert got[1][2] <= got[1][1]  # union, not sum-of-spans


def test_short_docs_pass_through(spark):
    rows = [(0, "tiny doc"), (1, "tiny doc"), (2, "")]
    got = _run(spark, rows, n=5)
    assert got[0] == ("tiny doc", 2, 0, 0)
    assert got[1] == ("tiny doc", 2, 0, 0)
    assert got[2] == ("", 0, 0, 0)


def test_random_corpus_matches_replica(spark):
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> natural dups
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(40)))
            for i in range(25)]
    got = _run(spark, rows, n=4)
    assert got == _py_exsub(rows, 4)
