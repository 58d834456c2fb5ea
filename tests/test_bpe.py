"""Distributed BPE merge learning (operators/bpe.py): Sennrich et al.
2016 fitting as relational rounds — pinned against a brute-force Python
replica (same winner rule, same greedy left-to-right application)."""

from __future__ import annotations

from amazon_textract_transformer_pipeline_spark.operators import bpe


def _py_vocab(texts):
    v: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            v[w] = v.get(w, 0) + 1
    return v


def _py_apply(syms, l, r):
    out, prev = [], None
    for x in syms:
        if prev == l and x == r:
            out.append(prev + x)
            prev = None
        else:
            if prev is not None:
                out.append(prev)
            prev = x
    if prev is not None:
        out.append(prev)
    return out


def _py_learn(texts, k):
    vocab = {w: (list(w) + [bpe.EOW], f) for w, f in _py_vocab(texts).items()}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        vocab = {w: (_py_apply(s, l, r), f) for w, (s, f) in vocab.items()}
    return merges


def _learn(spark, texts, k):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    rows = bpe.learn_bpe_merges(df, k).collect()
    return [(r.left, r.right, r.pair_count)
            for r in sorted(rows, key=lambda r: r.rank)]


def test_sennrich_walkthrough(spark):
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    got = _learn(spark, texts, 6)
    assert got == [("e", "s", 9), ("es", "t", 9), ("est", bpe.EOW, 9),
                   ("l", "o", 7), ("lo", "w", 7), ("e", "w", 6)]
    assert got == _py_learn(texts, 6)


def test_symbol_runs_merge_greedy_left(spark):
    # 'aaaa' under (a,a): greedy gives [aa, aa]; 'aaa' gives [aa, a] --
    # pair counting counts overlaps (aaaa contributes 3 pre-merge)
    texts = ["aaaa aaaa aaa"]
    got = _learn(spark, texts, 2)
    assert got == _py_learn(texts, 2)
    assert got[0][:2] == ("a", "a")


def test_tie_break_is_lexicographic(spark):
    # 'ba' and 'cb' both occur twice; (a,</w>) and (b,a)... every pair
    # count ties at 2 -> winner must be the lexicographically smallest
    texts = ["ba ba cb cb"]
    got = _learn(spark, texts, 1)
    assert got == _py_learn(texts, 1)
    (l, r, c) = got[0]
    assert c == 2 and (l, r) == min([("b", "a"), ("a", bpe.EOW),
                                     ("c", "b"), ("b", bpe.EOW)])


def test_checkpointed_long_run_matches_replica(spark):
    texts = ["the cat sat on the mat", "the bat and the rat",
             "that hat is the cat hat"]
    got = _learn(spark, texts, 9)  # crosses checkpoint_every=4 twice
    assert got == _py_learn(texts, 9)


def test_apply_matches_replica_and_chains_ranks(spark):
    merges = [("t", "h"), ("th", "e"), ("the", bpe.EOW)]
    df = spark.createDataFrame([(0, "the theme thee th")],
                               "doc_id long, text string")
    toks = {r.doc_id: r.tokens
            for r in bpe.apply_bpe_merges(df, merges).collect()}
    want = []
    for w in "the theme thee th".split():
        s = list(w) + [bpe.EOW]
        for l, r in merges:
            s = _py_apply(s, l, r)
        want.extend(s)
    assert toks[0] == want
    assert toks[0][:1] == ["the</w>"]  # rank chaining reached the</w>


def test_apply_escapes_quotes(spark):
    df = spark.createDataFrame([(0, "don't o'clock")],
                               "doc_id long, text string")
    toks = bpe.apply_bpe_merges(df, [("'", "t"), ("o", "'")]).collect()
    got = toks[0].tokens
    assert "'t" in got and "o'" in got
