"""Distributed BPE merge learning — tokenizer fitting as relational
rounds (Sennrich et al. 2016, *Neural Machine Translation of Rare Words
with Subword Units*). The reference delegates tokenization to a fitted
HuggingFace tokenizer (``notebooks/src/code/data/splitting.py``); at
10^12-doc scale the *fitting* itself must be distributed, and classic
BPE decomposes cleanly: ONE corpus-scale token-count shuffle builds the
(word, freq) vocabulary (the ``vocab_top_k`` shape), then every merge
round runs over that vocabulary relation — millions of rows, not
trillions — as a pair-count aggregate plus a map-side merge fold.

Model (pinned, replayed exactly by the DuckDB oracle):

* vocabulary = whitespace words of lowercased text with corpus
  frequencies; each word starts as its character symbols plus a final
  ``</w>`` end-of-word marker;
* a round counts adjacent symbol pairs weighted by word frequency
  (overlapping occurrences count: ``aaa`` contributes 2 to ``(a,a)``),
  picks the winner by (count DESC, left ASC, right ASC) — fully
  deterministic — and rewrites every word's symbols by merging winner
  pairs **greedy left-to-right** (in ``aaa``, positions 0-1 merge,
  position 2 survives);
* the learned model is the merge table (rank, left, right, pair_count).

Scale shape (100 TB audit): the corpus is touched ONCE (the word-count
shuffle, map-side partials on the uniform word key). Each round is one
pair-count aggregate on the vocabulary relation + a 1-row winner
aggregate that rides back via broadcast cross join — the winner is
never collected to the driver; the k-round loop builds one unrolled
plan, with ``localCheckpoint`` every ``checkpoint_every`` rounds to
truncate lineage (the k-means-loop pattern). Merge application is a
codegen'd array fold (aggregate HOF), map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textsql as X

#: end-of-word marker symbol (Sennrich's `</w>`)
EOW = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary — the one corpus-scale aggregation."""
    ws = X.words(f"lower({text_col})", "spark")
    return (
        docs.select(F.explode(F.expr(ws)).alias("word"))
        .groupBy("word").agg(F.count("*").alias("freq"))
    )


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    """(word, freq, syms): characters + the end-of-word marker."""
    return vocab.withColumn("syms", F.expr(
        f"concat(transform(sequence(1, length(word)), "
        f"i -> substring(word, i, 1)), array('{EOW}'))"))


def _merge_fold_sql(l_expr: str, r_expr: str) -> str:
    """Greedy left-to-right merge of adjacent ({l},{r}) pairs in `syms`,
    as a codegen-able aggregate fold: the accumulator carries the output
    array plus one pending symbol; a pending {l} followed by {r} emits
    the merged symbol and clears the pending slot (so `aaa` under (a,a)
    becomes [aa, a], never [aa, aa])."""
    return f"""
      aggregate(
        syms,
        struct(cast(array() as array<string>) as out,
               cast(null as string) as prev),
        (acc, x) -> if(acc.prev = {l_expr} AND x = {r_expr},
                       struct(concat(acc.out,
                                     array(concat(acc.prev, x))) as out,
                              cast(null as string) as prev),
                       struct(if(acc.prev is null, acc.out,
                                 concat(acc.out, array(acc.prev))) as out,
                              x as prev)),
        acc -> if(acc.prev is null, acc.out,
                  concat(acc.out, array(acc.prev))))"""


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent symbol pairs weighted by word freq."""
    return (
        symbols.filter(F.expr("size(syms) >= 2"))
        .select("freq", F.explode(F.expr(
            "transform(sequence(0, size(syms) - 2), "
            "i -> struct(element_at(syms, i + 1) as l, "
            "element_at(syms, i + 2) as r))")).alias("p"))
        .groupBy("p.l", "p.r").agg(F.sum("freq").alias("cnt"))
    )


def learn_bpe_merges(docs: DataFrame, n_merges: int,
                     text_col: str = "text",
                     checkpoint_every: int = 1) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (rank, left, right, pair_count), rank 1-based in learning order.

    Collect-free: each round's winner is a 1-row relation folded back
    by broadcast cross join, and the winner's metadata columns RIDE the
    merged symbols relation into its ``localCheckpoint`` — so one
    materialization per round serves both the next round's input and
    the final merge table (a ``limit(1)`` read of constant columns per
    checkpoint). Checkpointing every round (the default) keeps each
    round's subtree hanging off the previous checkpoint — without it
    Spark replays rounds 1..i-1 per winner branch of the final union
    (O(k^2) round evaluations; measured 51 exchanges for k=6 vs 14).
    """
    symbols = _initial_symbols(word_vocab(docs, text_col))
    rounds = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(symbols)
            # (cnt desc, l asc, r asc) as one struct MIN — deterministic,
            # partial-aggregates map-side unlike a global sort
            .agg(F.min(F.struct((-F.col("cnt")).alias("negc"),
                                F.col("l"), F.col("r"))).alias("b"))
            .select(F.lit(rank).alias("_rank"),
                    F.col("b.l").alias("_ml"), F.col("b.r").alias("_mr"),
                    (-F.col("b.negc")).cast("bigint").alias("_mc"))
        )
        merged = (
            symbols.crossJoin(F.broadcast(best))
            .withColumn("syms", F.expr(_merge_fold_sql("_ml", "_mr")))
        )
        if rank % checkpoint_every == 0 and rank < n_merges:
            merged = merged.localCheckpoint(eager=False)
        rounds.append(merged)
        symbols = merged.drop("_rank", "_ml", "_mr", "_mc")
    out = None
    for r in rounds:
        # a round past the learnable-pair supply yields an all-NULL winner
        # (ungrouped agg over an empty pair set); DuckDB's LIMIT 1 over the
        # empty w{i} emits no row — filter the NULL winner so degenerate
        # corpora stay cross-engine identical (round-6 ADVICE)
        w = r.select(F.col("_rank").alias("rank"),
                     F.col("_ml").alias("left"),
                     F.col("_mr").alias("right"),
                     F.col("_mc").alias("pair_count")).limit(1) \
            .filter(F.col("left").isNotNull())
        out = w if out is None else out.unionByName(w)
    return out


def _duck_round(i: int, l_sql: str, r_sql: str) -> str:
    """One DuckDB merge-application round: s{i-1} -> s{i}.

    The greedy left-to-right fold is replayed as run-parity selection:
    candidate positions (sym, next) = (l, r) that are CONSECUTIVE can
    only arise when l = r (a symbol run), and the fold merges the 1st,
    3rd, ... candidate of each run; disjoint candidates all merge. A
    position is dropped when its left neighbour merged (it was
    consumed)."""
    return f"""
b{i} AS (
  SELECT word, freq, u.pos AS pos, u.sym AS sym,
         lead(u.sym) OVER (PARTITION BY word ORDER BY u.pos) AS nxt
  FROM (SELECT word, freq, unnest(list_transform(range(0, len(syms)),
          j -> {{'pos': j, 'sym': syms[j + 1]}})) AS u
        FROM s{i - 1})
),
c{i} AS (
  SELECT *, coalesce(sym = ({l_sql}) AND nxt = ({r_sql}), false) AS is_cand
  FROM b{i}
),
g{i} AS (
  SELECT *, pos - row_number()
      OVER (PARTITION BY word, is_cand ORDER BY pos) AS grp
  FROM c{i}
),
r{i} AS (
  SELECT *, CASE WHEN is_cand THEN
      (row_number() OVER (PARTITION BY word, is_cand, grp
                          ORDER BY pos)) % 2 = 1
      ELSE false END AS sel
  FROM g{i}
),
k{i} AS (
  SELECT *, coalesce(lag(sel) OVER (PARTITION BY word ORDER BY pos),
                     false) AS prev_sel
  FROM r{i}
),
s{i} AS MATERIALIZED (
  SELECT word, freq,
         list(CASE WHEN sel THEN sym || nxt ELSE sym END ORDER BY pos)
           AS syms
  FROM k{i} WHERE NOT prev_sel GROUP BY word, freq
)"""


def _duck_pairs(i: int) -> str:
    """Pair-count + deterministic winner CTEs for round ``i`` over
    s{i-1}."""
    return f"""
p{i} AS (
  SELECT u.l AS l, u.r AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(range(0, len(syms) - 1),
      j -> {{'l': syms[j + 1], 'r': syms[j + 2]}})) AS u
    FROM s{i - 1} WHERE len(syms) >= 2)
  GROUP BY u.l, u.r
),
w{i} AS (SELECT l, r, cnt FROM p{i}
         ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"""


def bpe_oracle_sql(docs_cte: str, n_merges: int) -> str:
    """DuckDB replay of :func:`learn_bpe_merges`: the k rounds unrolled
    as chained CTEs — identical vocabulary, pair counting, (count DESC,
    left ASC, right ASC) winner rule, and greedy merge application.
    ``docs_cte`` must yield (doc_id, text). Produces the merge table
    (rank, left, right, pair_count)."""
    dw = X.words("lower(text)", "duck")
    parts = [f"""
WITH v AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest({dw}) AS word FROM ({docs_cte})) GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT word, freq,
         list_append(list_transform(range(1, length(word) + 1),
                     j -> substr(word, j, 1)), '{EOW}') AS syms
  FROM v
)"""]
    for i in range(1, n_merges + 1):
        parts.append("," + _duck_pairs(i))
        if i < n_merges:
            parts.append("," + _duck_round(
                i, f"SELECT l FROM w{i}", f"SELECT r FROM w{i}"))
    selects = [
        f'SELECT {i} AS rank, l AS "left", r AS "right", cnt AS pair_count '
        f"FROM w{i}" for i in range(1, n_merges + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_apply_oracle_sql(docs_cte: str,
                         merges: list[tuple[str, str]]) -> str:
    """DuckDB replay of :func:`apply_bpe_merges` with a LITERAL merge
    list: per-word symbol init + the same unrolled greedy rounds, then
    doc tokens reassembled in word order. ``docs_cte`` must yield
    (doc_id, text). Produces (doc_id, tokenized, n_tokens) where
    ``tokenized`` is the space-joined token stream."""
    dw = X.words("lower(text)", "duck")
    parts = [f"""
WITH dwords AS MATERIALIZED (
  SELECT doc_id, u.wix AS wix, u.w AS w FROM (
    SELECT doc_id, unnest(list_transform(range(0, len(ws)),
      j -> {{'wix': j, 'w': ws[j + 1]}})) AS u
    FROM (SELECT doc_id, {dw} AS ws FROM ({docs_cte})))
),
s0 AS MATERIALIZED (
  -- (word=unique surface form) is enough: merges depend on the word
  -- text only, so tokenize each distinct form once and join back
  SELECT w AS word, CAST(0 AS BIGINT) AS freq,
         list_append(list_transform(range(1, length(w) + 1),
                     j -> substr(w, j, 1)), '{EOW}') AS syms
  FROM (SELECT DISTINCT w FROM dwords)
)"""]
    for i, (l, r) in enumerate(merges, start=1):
        ls, rs = l.replace("'", "''"), r.replace("'", "''")
        parts.append("," + _duck_round(i, f"'{ls}'", f"'{rs}'"))
    last = f"s{len(merges)}"
    parts.append(f""",
toks AS (
  SELECT d.doc_id, d.wix, s.syms
  FROM dwords d JOIN {last} s ON s.word = d.w
),
flat AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY wix, six) AS tokenized,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM (
    SELECT doc_id, wix, u.six AS six, u.tok AS tok FROM (
      SELECT doc_id, wix, unnest(list_transform(range(0, len(syms)),
        j -> {{'six': j, 'tok': syms[j + 1]}})) AS u
      FROM toks))
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(f.tokenized, '') AS tokenized,
       coalesce(f.n_tokens, CAST(0 AS BIGINT)) AS n_tokens
FROM (SELECT DISTINCT doc_id FROM ({docs_cte}) ) d
LEFT JOIN flat f ON f.doc_id = d.doc_id""")
    return "".join(parts)


def apply_bpe_merges(docs: DataFrame, merges: list[tuple[str, str]],
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Tokenize with a LEARNED merge list (plan-time literals, the LSH
    planes pattern): per word, start from characters + ``</w>`` and
    apply each merge in rank order with the same greedy fold. Returns
    (id, tokens array<string>). Map-only — no shuffle."""
    ws = X.words(f"lower({text_col})", "spark")
    per_word = (
        f"concat(transform(sequence(1, length(w)), "
        f"i -> substring(w, i, 1)), array('{EOW}'))")
    for l, r in merges:
        ls, rs = l.replace("'", "\\'"), r.replace("'", "\\'")
        per_word = (
            f"aggregate({per_word}, "
            f"struct(cast(array() as array<string>) as out, "
            f"cast(null as string) as prev), "
            f"(acc, x) -> if(acc.prev = '{ls}' AND x = '{rs}', "
            f"struct(concat(acc.out, array(concat(acc.prev, x))) as out, "
            f"cast(null as string) as prev), "
            f"struct(if(acc.prev is null, acc.out, "
            f"concat(acc.out, array(acc.prev))) as out, x as prev)), "
            f"acc -> if(acc.prev is null, acc.out, "
            f"concat(acc.out, array(acc.prev))))")
    return docs.select(
        id_col,
        F.expr(f"flatten(transform({ws}, w -> {per_word}))").alias("tokens"),
    )
