"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction end-to-end on sf0.001; ``queries``
exposes one callable per implemented operator family (SURVEY.md §2) over the
driver's parquet tables; ``oracle_sql`` gives the DuckDB recomputation of
each SQL-expressible query (built in
amazon_textract_transformer_pipeline_spark/oracle.py from the same layout
constants and portable-hash stubs as the Spark side). Every query has an exact-value
oracle: G4 box merge (connected components) and the Q2 splitter (greedy
window fill with backfill) via recursive CTEs; multimodal metadata against
the closed-form spec of the deterministic FAKE1 generator.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from amazon_textract_transformer_pipeline_spark import driver_queries as Q  # noqa: E402
from amazon_textract_transformer_pipeline_spark import oracle as O  # noqa: E402
from amazon_textract_transformer_pipeline_spark.functions import textsql as X  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full HTML front-end + byte-identical text assembly over the
    sf0.001 documents table (rendered to pages via the bridge)."""
    return Q.q_extract_text(spark, "/root/testdata/sf0.001")


def _simhash64_duck_ctes(dw: str) -> str:
    """Staged-CTE DuckDB replay of dedup.simhash_sketch (64-bit): one md5
    per word (two 32-bit halves of the same digest), 64 bit-sums, packed
    signed-BIGINT sketch. Materialized stages — the inline HOF form would
    recompute md5 64× per word (DuckDB inlines CTE text)."""
    from amazon_textract_transformer_pipeline_spark.functions import portable

    sums = []
    packs = []
    for b in range(64):
        src, sh = ("lo", b) if b < 32 else ("hi", b - 32)
        sums.append(f"sum((({src} >> {sh}) & 1) * 2 - 1) AS b{b}")
        packs.append(f"CASE WHEN b{b} > 0 THEN "
                     f"CAST({X.simhash_bit_weight(b)} AS BIGINT) "
                     f"ELSE 0::BIGINT END")
    return f"""WITH wx AS MATERIALIZED (
  SELECT doc_id, unnest({dw}) AS w FROM documents
),
hh AS MATERIALIZED (
  SELECT doc_id, {portable.duck_hash32('w', 1)} AS lo,
         {portable.duck_hash32('w', 9)} AS hi
  FROM wx
),
bsums AS (
  SELECT doc_id, {', '.join(sums)} FROM hh GROUP BY doc_id
),
sk AS (
  SELECT doc_id, CAST({' + '.join(packs)} AS BIGINT) AS simhash FROM bsums
)"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict ORDER is load-bearing: the round-6 driver validated exactly the
    # FIRST 50 entries, so (round-6 verdict, "Next round" #1) the entries
    # that most need a fresh driver row come first — the 12 round-6
    # operators that never had one plus the 4 gates whose code changed in
    # round 6, followed by every query whose physical path changed in this
    # optimization round (extraction family, split/main-content,
    # semantic_dedup, ann_bruteforce_topk, corpus filter, dedup kernels).
    # Long-stable gates with green r5/r6 rows on unchanged code rotate to
    # the back; nothing is removed.
    return {
        # --- never-driver-validated round-6 operators + round-6-stale gates
        "pdf_metadata": Q.q_pdf_metadata,
        "pdf_extract": Q.q_pdf_extract,
        "gopher_filters": Q.q_gopher_filters,
        "c4_filters": Q.q_c4_filters,
        "bpe_merges": Q.q_bpe_merges,
        "bpe_tokenize": Q.q_bpe_tokenize,
        "winnow_fingerprints": Q.q_winnow_fingerprints,
        "pagerank": Q.q_pagerank,
        "export_shards": Q.q_export_shards,
        "decontaminate_mask": Q.q_decontaminate_mask,
        "exact_substring_dedup": Q.q_exact_substring_dedup,
        "pack_sequences": Q.q_pack_sequences,
        "url_dedup_latest": Q.q_url_dedup_latest,
        "vocab_top_k": Q.q_vocab_top_k,
        "html_meta": Q.q_html_meta,
        "corpus_report": Q.q_corpus_report,
        # --- extraction path (changed: bridge spread)
        "extract_text": Q.q_extract_text,
        "word_enrichment": Q.q_word_enrichment,
        "entity_mentions": Q.q_entity_mentions,
        "field_values": Q.q_field_values,
        "fields": Q.q_fields,
        "doc_confidence": Q.q_doc_confidence,
        "apply_review": Q.q_apply_review,
        "eval_token_metrics": Q.q_eval_token_metrics,
        "eval_class_ratios": Q.q_eval_class_ratios,
        "eval_seq2seq_acc": Q.q_eval_seq2seq_acc,
        # --- splitter over the spread bridge
        "split_windows": Q.q_split_windows,
        # --- densitometric main content (spread parse)
        "main_content_blocks": Q.q_main_content_blocks,
        "main_content_text": Q.q_main_content_text,
        # --- exact-Arrow assignment kernel (round 7)
        "semantic_dedup": Q.q_semantic_dedup,
        # --- exact-Arrow top-k kernel (round 7)
        "ann_bruteforce_topk": Q.q_ann_bruteforce_topk,
        # --- composed filter
        "corpus_filter": Q.q_corpus_filter,
        # --- dedup / sketch family
        "fingerprint": Q.q_fingerprint,
        "minhash_signature": Q.q_minhash_signature,
        "lsh_buckets": Q.q_lsh_buckets,
        "lsh_candidates": Q.q_lsh_candidates,
        "near_duplicates": Q.q_near_duplicates,
        "dedup_clusters": Q.q_dedup_clusters,
        "decontaminate": Q.q_decontaminate,
        "pii_scrub": Q.q_pii_scrub,
        "ngram_jaccard_consecutive": Q.q_ngram_jaccard_consecutive,
        "simhash": Q.q_simhash,
        "simhash_hamming_consecutive": Q.q_simhash_hamming_consecutive,
        "embedding_cosine_consecutive": Q.q_embedding_cosine_consecutive,
        # --- similarity search
        "ann_lsh_topk": Q.q_ann_lsh_topk,
        "ann_ivf_topk": Q.q_ann_ivf_topk,
        # --- text stats
        "text_stats": Q.q_text_stats,
        "langid_scores": Q.q_langid_scores,
        # --- geometric label join (G1/G2)
        "g1_word_labels": Q.q_g1_word_labels,
        # --- Gopher repetition signals
        "gopher_repetition": Q.q_gopher_repetition,
        # --- r5/r6-green gates on unchanged code (past the 50-window)
        "o1_group_minmax": Q.q_o1_group_minmax,
        "top1_per_group": Q.q_top1_per_group,
        "noisy_or_events": Q.q_noisy_or_events,
        "tumbling_windows": Q.q_tumbling_windows,
        "session_windows": Q.q_session_windows,
        "s4_pagination_merge": Q.q_s4_pagination_merge,
        "train_test_split": Q.q_train_test_split,
        "smgt_seq2seq": Q.q_smgt_seq2seq,
        "canonical_urls": Q.q_canonical_urls,
        "boilerplate_lines": Q.q_boilerplate_lines,
        "c4_span_dedup": Q.q_c4_span_dedup,
        "lm_perplexity": Q.q_lm_perplexity,
        "quality_nb": Q.q_quality_nb,
        "tfidf_top_terms": Q.q_tfidf_top_terms,
        "domain_blocklist": Q.q_domain_blocklist,
        "doc_line_dedup": Q.q_doc_line_dedup,
        "mixture_sample": Q.q_mixture_sample,
        "dsir_importance": Q.q_dsir_importance,
        "g4_box_merge": Q.q_g4_box_merge,
        "multimodal_metadata": Q.q_multimodal_metadata,
        "real_media_metadata": Q.q_real_media_metadata,
        "charset_extract": Q.q_charset_extract,
    }


def oracle_sql() -> dict[str, str]:
    wpl, lpp, wpp = O.WORDS_PER_LINE, O.LINES_PER_PAGE, O.WPP
    dw = X.words("text", "duck")
    sqls: dict[str, str] = {
        "extract_text": O.extract_text_oracle(),
        "word_enrichment": O.word_enrichment_oracle(),
        "entity_mentions": O.mentions_oracle(),
        "field_values": O.field_values_oracle(),
        "fields": O.fields_oracle(),
        "doc_confidence": O.doc_confidence_oracle(),
        "apply_review": O.apply_review_oracle(),
        "eval_token_metrics": O.eval_token_metrics_oracle(),
        "eval_class_ratios": O.eval_class_ratios_oracle(),
        "eval_seq2seq_acc": O.eval_seq2seq_acc_oracle(),
        "fingerprint": f"""
SELECT doc_id, {X.h64(X.norm_text('text', 'duck'), 'duck')} AS fingerprint
FROM documents""",
        "minhash_signature": f"""
SELECT doc_id,
  array_to_string(list_transform(
    {X.minhash_signature(X.shingles(dw, 3, 'duck'), 16, 'duck')},
    x -> cast(x as varchar)), ',') AS minhash_csv
FROM documents""",
        "lsh_buckets": f"""
WITH sig AS MATERIALIZED (
  SELECT doc_id,
    {X.minhash_signature(X.shingles(dw, 3, 'duck'), 16, 'duck')} AS minhash
  FROM documents
),
banded AS (
  SELECT doc_id, {X.band_hashes('minhash', 8, 2, 'duck')} AS bands FROM sig
)
SELECT doc_id, cast(generate_subscripts(bands, 1) - 1 AS int) AS band_ix,
       unnest(bands) AS band_hash
FROM banded""",
        "lsh_candidates": f"""
WITH sig AS MATERIALIZED (
  SELECT doc_id,
    {X.minhash_signature(X.shingles(dw, 3, 'duck'), 16, 'duck')} AS minhash
  FROM documents
),
banded AS (
  SELECT doc_id, {X.band_hashes('minhash', 8, 2, 'duck')} AS bands FROM sig
),
b AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(bands, 1) - 1 AS band_ix,
         unnest(bands) AS band_hash
  FROM banded
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY band_ix, band_hash) AS sz FROM b
),
small AS (SELECT * FROM sized WHERE sz <= 1000)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM small l JOIN small r
  ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  AND l.doc_id < r.doc_id""",
        # LSH candidates verified by exact n-gram Jaccard (threshold 0 so
        # every candidate's value is hash-checked, including 0.0 pairs)
        "near_duplicates": f"""
WITH sig AS MATERIALIZED (
  SELECT doc_id,
    {X.minhash_signature(X.shingles(dw, 3, 'duck'), 16, 'duck')} AS minhash
  FROM documents
),
banded AS (
  SELECT doc_id, {X.band_hashes('minhash', 8, 2, 'duck')} AS bands FROM sig
),
b AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(bands, 1) - 1 AS band_ix,
         unnest(bands) AS band_hash
  FROM banded
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY band_ix, band_hash) AS sz FROM b
),
small AS (SELECT * FROM sized WHERE sz <= 1000),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM small l JOIN small r
    ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
    AND l.doc_id < r.doc_id
),
shd AS MATERIALIZED (
  SELECT doc_id, list_distinct({X.shingles(dw, 3, 'duck')}) AS sh
  FROM documents
),
scored AS (
  SELECT c.a, c.b,
         len(list_intersect(x.sh, y.sh))::DOUBLE /
           (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
           AS jac
  FROM cands c
  JOIN shd x ON x.doc_id = c.a
  JOIN shd y ON y.doc_id = c.b
)
SELECT a, b, round(jac, 6) AS jaccard FROM scored WHERE jac >= 0.0""",
        # benchmark decontamination: planted eval-set blocklist (words 6-26
        # of every 17th doc), distinct 13-gram hash semi-join, per-doc hit
        # counts — the dedup.decontamination_flags replay.
        "decontaminate": f"""
WITH bl AS MATERIALIZED (
  SELECT doc_id, array_to_string(list_slice({dw}, 6, 26), ' ') AS text
  FROM documents WHERE doc_id % 17 = 3
),
bsh AS MATERIALIZED (
  SELECT DISTINCT {X.h64('s', 'duck')} AS gh FROM (
    SELECT unnest({X.shingles(X.words('text', 'duck'), 13, 'duck')}) AS s
    FROM bl)
),
csh AS MATERIALIZED (
  SELECT DISTINCT doc_id, {X.h64('s', 'duck')} AS gh FROM (
    SELECT doc_id, unnest({X.shingles(dw, 13, 'duck')}) AS s
    FROM documents)
),
hits AS (
  SELECT c.doc_id, count(*) AS n
  FROM csh c JOIN bsh b ON b.gh = c.gh GROUP BY c.doc_id
)
SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
       coalesce(h.n, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id""",
        # cluster resolution over the LSH pair graph of the variant-planted
        # corpus: recursive transitive closure (min reachable node = the
        # cluster id), then the quality keeper (max text length, ties to
        # min id) — the DuckDB replay of connected_components +
        # resolve_near_dup_clusters.
        "dedup_clusters": f"""
WITH RECURSIVE corpus AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zq variant tail'
  FROM documents WHERE doc_id % 5 < 3
),
sig AS MATERIALIZED (
  SELECT doc_id,
    {X.minhash_signature(X.shingles(dw, 3, 'duck'), 16, 'duck')} AS minhash
  FROM corpus
),
banded AS (
  SELECT doc_id, {X.band_hashes('minhash', 8, 2, 'duck')} AS bands FROM sig
),
b AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(bands, 1) - 1 AS band_ix,
         unnest(bands) AS band_hash
  FROM banded
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY band_ix, band_hash) AS sz FROM b
),
small AS (SELECT * FROM sized WHERE sz <= 1000),
cands AS MATERIALIZED (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM small l JOIN small r
    ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
    AND l.doc_id < r.doc_id
),
edges AS (
  SELECT a AS u, b AS v FROM cands UNION SELECT b, a FROM cands
),
nodes AS (SELECT DISTINCT u FROM edges),
reach(root, node) AS (
  SELECT u, u FROM nodes
  UNION
  SELECT r.root, e.v FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, min(root) AS component FROM reach GROUP BY node),
membered AS (
  SELECT c.doc_id, coalesce(p.component, c.doc_id) AS cluster_id,
         len(c.text)::DOUBLE AS q
  FROM corpus c LEFT JOIN comp p ON p.node = c.doc_id
),
ranked AS (
  SELECT doc_id, cluster_id, q,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY q DESC, doc_id ASC) AS rn
  FROM membered
),
keepers AS (
  SELECT cluster_id, doc_id AS keeper_id FROM ranked WHERE rn = 1
)
SELECT r.doc_id, r.cluster_id, r.cluster_size, k.keeper_id,
       (r.doc_id = k.keeper_id) AS is_keeper
FROM ranked r JOIN keepers k ON k.cluster_id = r.cluster_id""",
        # MATERIALIZED: DuckDB inlines CTEs textually; without it the
        # shingle expression recomputes 4x inside intersect/union (measured
        # ~20 s at sf0.01; ~4x faster materialized)
        "ngram_jaccard_consecutive": f"""
WITH w AS MATERIALIZED (
  SELECT doc_id, {X.shingles(X.words('text', 'duck'), 3, 'duck')} AS sh
  FROM documents
)
SELECT d1.doc_id AS a, d2.doc_id AS b,
  round(len(list_intersect(d1.sh, d2.sh))::DOUBLE /
        len(list_distinct(list_concat(d1.sh, d2.sh))), 6) AS jaccard
FROM w d1 JOIN w d2 ON d2.doc_id = d1.doc_id + 1""",
        "simhash": f"""
{_simhash64_duck_ctes(dw)}
SELECT d.doc_id, CAST(coalesce(sk.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sk ON sk.doc_id = d.doc_id""",
        "simhash_hamming_consecutive": f"""
{_simhash64_duck_ctes(dw)},
s AS (
  SELECT d.doc_id, CAST(coalesce(sk.simhash, 0) AS BIGINT) AS sh
  FROM documents d LEFT JOIN sk ON sk.doc_id = d.doc_id
)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       {X.hamming('s1.sh', 's2.sh', 'duck', 64)}::BIGINT AS hamming
FROM s s1 JOIN s s2 ON s2.doc_id = s1.doc_id + 1""",
        "embedding_cosine_consecutive": f"""
SELECT e1.vec_id AS a, e2.vec_id AS b,
  round(round({X.cosine('e1.embedding', 'e2.embedding', 'duck')}, 9), 6) AS cos
FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1""",
        # SemDedup (Abbas et al. 2023) over the planted corpus: replay the
        # pinned semantics exactly — seed centroids (id%25==0), nearest-
        # centroid assignment (cos9 desc, cent_id asc; NULL -> -2), rank
        # ASC within cluster (farthest-from-centroid kept first), witness =
        # earliest-ranked earlier member with cos9 >= 0.95.
        "semantic_dedup": f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id % 25 = 1
  UNION ALL
  SELECT vec_id + 20000, embedding FROM embeddings WHERE vec_id % 50 = 1
  UNION ALL
  SELECT 30000::BIGINT AS vec_id,
         list_transform(embedding, v -> 0.0::FLOAT) AS embedding
  FROM embeddings WHERE vec_id = 0
),
cents AS (
  SELECT vec_id AS cent_id, embedding AS centv FROM corpus WHERE vec_id % 25 = 0
),
scored AS (
  SELECT c.vec_id, c.embedding AS v, k.cent_id,
         round({X.cosine('c.embedding', 'k.centv', 'duck')}, 9) AS cos9
  FROM corpus c CROSS JOIN cents k
),
assigned AS (
  SELECT vec_id, v, cent_id AS cluster_id, cos9 AS cent_cos,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY coalesce(cos9, -2.0) DESC, cent_id ASC) AS rn
  FROM scored
),
members AS (
  SELECT vec_id, v, cluster_id, cent_cos,
         row_number() OVER (PARTITION BY cluster_id
           ORDER BY coalesce(cent_cos, -2.0) ASC, vec_id ASC) AS cluster_rank
  FROM assigned WHERE rn = 1
),
dups AS (
  SELECT d.vec_id, min_by(w.vec_id, w.cluster_rank) AS dup_of
  FROM members w JOIN members d USING (cluster_id)
  WHERE w.cluster_rank < d.cluster_rank AND w.cluster_rank <= 10000
    AND round({X.cosine('w.v', 'd.v', 'duck')}, 9) >= 0.95
  GROUP BY d.vec_id
)
SELECT m.vec_id, m.cluster_id, round(m.cent_cos, 6) AS cent_cos,
       CAST(m.cluster_rank AS INT) AS cluster_rank,
       (p.dup_of IS NOT NULL) AS is_dup, p.dup_of,
       (p.dup_of IS NULL) AS kept
FROM members m LEFT JOIN dups p ON p.vec_id = m.vec_id""",
        "ann_bruteforce_topk": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS cand_id,
         round({X.cosine('qv', 'e.embedding', 'duck')}, 9) AS cos9
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, cand_id, cos9,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos9 DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cast(rank AS int) AS rank, cand_id, round(cos9, 6) AS cos
FROM ranked WHERE rank <= 5""",
        "text_stats": None,  # built below
        "g1_word_labels": f"""
WITH d AS (SELECT doc_id, len({dw}) AS nw FROM documents),
words AS (
  SELECT 'doc://' || doc_id AS url, unnest(range(0, nw)) AS word_pos, doc_id
  FROM d
),
anns AS (
  SELECT 'doc://' || doc_id AS url, unnest(range(0, nw // 5)) AS ann_ix
  FROM d WHERE nw >= 5
),
ann2 AS (
  SELECT url, ann_ix, cast(ann_ix % 3 AS int) AS class_id,
         ann_ix * 50 AS ax0, ann_ix * 50 + 34 AS ax1
  FROM anns
),
matched AS (
  SELECT w.url, w.word_pos, min(a.class_id) AS mc
  FROM words w JOIN ann2 a ON a.url = w.url
   AND greatest(0, least(w.word_pos * 10 + 9, a.ax1)
                  - greatest(w.word_pos * 10, a.ax0)) * 9.0
       >= (9.0 * 9.0) / 2
  GROUP BY w.url, w.word_pos
)
SELECT w.url, cast(w.word_pos AS int) AS word_pos,
       cast(coalesce(m.mc, 3) AS int) AS label
FROM words w LEFT JOIN matched m ON m.url = w.url AND m.word_pos = w.word_pos""",
        "o1_group_minmax": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(min(l_extendedprice), 6) AS min_price,
       round(max(l_extendedprice), 6) AS max_price,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "top1_per_group": """
SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS o_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1""",
        "noisy_or_events": """
WITH c AS (
  SELECT user_id, event_type,
         least(1 / (1 + exp(-value)), 0.999999::DOUBLE) AS conf
  FROM events
)
SELECT user_id, event_type,
       round(1 - exp(sum(ln(1 - conf))), 6) AS noisy_or,
       count(*) AS n
FROM c GROUP BY user_id, event_type""",
        "tumbling_windows": """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2""",
        "session_windows": """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_last_us,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid""",
        "s4_pagination_merge": """
SELECT user_id, count(*) AS n_events,
       string_agg(cast(event_id AS varchar), ','
                  ORDER BY ts, event_id) AS event_ids_csv
FROM events GROUP BY user_id""",
        "train_test_split": f"""
SELECT doc_id,
  CASE WHEN {X.h64("concat('split', cast(doc_id as varchar))", 'duck')} % 10 < 9
       THEN 'train' ELSE 'test' END AS split
FROM documents""",
    }

    # text_stats assembled from the same expression builders
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        bpe_token_count_sql,
        langid_sql,
        quality_exprs,
    )

    q = quality_exprs("text", "duck")
    sqls["text_stats"] = f"""
SELECT doc_id,
       {q['n_words']} AS n_words,
       {q['n_chars_actual']} AS n_chars_actual,
       {q['mean_word_len']} AS mean_word_len,
       {q['stopword_ratio']} AS stopword_ratio,
       {bpe_token_count_sql('text', 'duck')} AS n_tokens_est,
       {langid_sql('text', 'duck')} AS lang_guess
FROM documents"""

    # langid_scores oracle: score columns projected once in a CTE, argmax
    # CASE over the column names (inlining scores into the CASE would
    # recompute each k× textually on DuckDB)
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        LANGID2_ORDER,
        langid_argmax_case,
        langid_score_exprs,
    )
    lsel = ", ".join(f"{x} AS {k}"
                     for k, x in langid_score_exprs("text", "duck").items())
    score_cols = ", ".join(f"score_{lg}" for lg in LANGID2_ORDER)
    sqls["langid_scores"] = f"""
WITH s AS MATERIALIZED (
  SELECT doc_id, {lsel} FROM documents
)
SELECT doc_id, {score_cols},
       {langid_argmax_case()} AS lang_pred
FROM s"""

    # webclean oracles: same messy-url construction + the dual-engine
    # canonicalizer; boilerplate removal replayed relationally.
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        messy_url_sql,
    )
    from amazon_textract_transformer_pipeline_spark.operators.webclean import (
        canonical_url_sql,
    )

    sqls["canonical_urls"] = f"""
WITH u AS (SELECT doc_id, {messy_url_sql('duck')} AS url FROM documents)
SELECT doc_id, url, {canonical_url_sql('url', 'duck')} AS url_canon FROM u"""

    sqls["boilerplate_lines"] = f"""
WITH base AS (SELECT doc_id, {dw} AS ws FROM documents),
ll AS (
  SELECT doc_id,
         list_transform(range(0, ((len(ws) - 1) // 12) + 1),
                        i -> array_to_string(list_slice(ws,
                               CAST(i * 12 + 1 AS INT),
                               CAST(i * 12 + 12 AS INT)), ' ')) AS lines
  FROM base WHERE len(ws) > 0
),
l0 AS (
  SELECT doc_id, unnest(lines) AS line,
         generate_subscripts(lines, 1) - 1 AS line_ix
  FROM ll
),
lh AS (
  SELECT doc_id, line_ix, line, {X.h64('line', 'duck')} AS h
  FROM l0 WHERE line != ''
),
common AS (
  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM lh GROUP BY h)
  WHERE nd >= 3
),
flag AS (
  SELECT l.doc_id, l.line_ix, l.line, (c.h IS NOT NULL) AS rm
  FROM lh l LEFT JOIN common c ON c.h = l.h
),
agg AS (
  SELECT doc_id,
         coalesce(string_agg(CASE WHEN NOT rm THEN line END, ' '
                             ORDER BY line_ix), '') AS kept_text,
         CAST(sum(CASE WHEN NOT rm THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
         CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed
  FROM flag GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.kept_text, '') AS kept_text,
       CAST(coalesce(a.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(coalesce(a.n_lines_removed, 0) AS BIGINT) AS n_lines_removed
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"""

    # multimodal_metadata oracle: the FAKE1 generator is a closed-form
    # function of media_id (multimodal.synth_media_df/make_fake_blob:
    # width 64+i%512, height 48+i%384, fmt i%5, payload w*h%4096+64 bytes,
    # 14-byte header) — so the decode-metadata path checks end-to-end
    # against the spec, not against itself.
    sqls["multimodal_metadata"] = """
SELECT i AS media_id,
       cast(64 + i % 512 AS int) AS width,
       cast(48 + i % 384 AS int) AS height,
       (['png','jpeg','tiff','wav','mp4'])[(i % 5)::INT + 1] AS format,
       cast(14 + ((64 + i % 512) * (48 + i % 384)) % 4096 + 64 AS bigint)
         AS n_bytes,
       true AS valid
FROM range(0, 200) t(i)"""

    # real_media_metadata oracle: synth_real_media_df's dims/format are
    # closed-form in media_id (h = 16+i%48, w = 16+(i*7)%48, kind cycle),
    # so the seven real-container header sniffs check against the spec —
    # including lossy VP8, whose dims come from the uncompressed
    # key-frame header (decode stays the declared codec seam).
    sqls["real_media_metadata"] = """
SELECT i AS media_id,
       cast(16 + (i * 7) % 48 AS int) AS width,
       cast(16 + i % 48 AS int) AS height,
       (['png','jpeg','bmp','tiff','gif','webp','webp'])[(i % 7)::INT + 1]
           AS format,
       true AS valid
FROM range(0, 150) t(i)"""

    # pdf oracles: the synthetic PDF corpus (multimodal.synth_pdf_df) is a
    # closed-form function of media_id — dims 300+(i%5)*60 × 400+(i%4)*80,
    # 1+i%4 pages, 1+(i+p)%3 lines of 'doc i page p line j tokK' — so the
    # whole native parser (xref tables/streams/predictors/ObjStm, page
    # tree, content-stream interpreter, assembly) verifies against the
    # spec, not against itself.
    sqls["pdf_metadata"] = """
SELECT i AS media_id,
       cast(300 + (i % 5) * 60 AS int) AS width,
       cast(400 + (i % 4) * 80 AS int) AS height,
       cast(1 + i % 4 AS int) AS n_pages,
       (i % 8) IN (3, 7) AS encrypted,
       true AS valid
FROM range(0, 120) t(i)"""

    sqls["pdf_extract"] = """
WITH pages AS (
  SELECT i, p FROM range(0, 120) t(i), range(0, 4) pr(p)
  WHERE p < 1 + i % 4),
lines AS (
  SELECT i, p, j FROM pages, range(0, 3) lr(j)
  WHERE j < 1 + (i + p) % 3)
SELECT 'pdf://' || i AS url,
       cast(1 + i % 4 AS int) AS n_pages,
       string_agg('doc ' || i || ' page ' || p || ' line ' || j ||
                  ' tok' || ((i*7 + p*3 + j) % 100) || ' café',
                  chr(10) ORDER BY p, j) AS extracted_text
FROM lines GROUP BY i"""

    # gopher_filters oracle: identical rule expressions emitted for the
    # DuckDB dialect by the same expression builder.
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        gopher_exprs,
    )
    gsel = ", ".join(f"{x} AS {k}" for k, x in gopher_exprs("text", "duck").items())
    sqls["gopher_filters"] = f"SELECT doc_id, {gsel} FROM documents"

    # pii_scrub oracle: same builder + same deterministic pii-laden text
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        pii_text_sql,
    )
    from amazon_textract_transformer_pipeline_spark.operators.webclean import (
        pii_exprs,
    )
    psel = ", ".join(f"{x} AS {k}" for k, x in pii_exprs("text", "duck").items())
    sqls["pii_scrub"] = f"""
WITH p AS MATERIALIZED (
  SELECT doc_id, {pii_text_sql('duck')} AS text FROM documents
)
SELECT doc_id, {psel} FROM p"""

    # c4_filters oracle: same one-builder-both-dialects pattern
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        c4_exprs,
    )
    csel = ", ".join(f"{x} AS {k}" for k, x in c4_exprs("text", "duck").items())
    sqls["c4_filters"] = f"SELECT doc_id, {csel} FROM documents"

    # gopher_repetition oracle: duplicate-line HOFs inline; top n-gram char
    # fractions as staged CTEs (explode grams once per n — DuckDB would
    # recompute an inline HOF per reference).
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        repetition_exprs,
    )
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        GOPHER_MAX_DUP_LINE_CHAR_FRAC,
        GOPHER_MAX_DUP_LINE_FRAC,
        GOPHER_MAX_DUP_PARA_CHAR_FRAC,
        GOPHER_MAX_DUP_PARA_FRAC,
        GOPHER_MAX_TOP2_CHAR_FRAC,
        GOPHER_MAX_TOP3_CHAR_FRAC,
    )
    rsel = ", ".join(f"{x} AS {k}"
                     for k, x in repetition_exprs("text", "duck").items())
    dwords = X.words("text", "duck")
    total = ("CAST(coalesce(list_sum(list_transform(" + dwords +
             ", w -> len(w)::BIGINT)), 0) AS BIGINT)")

    def _gram_cte(n):
        sh = X.shingles(dwords, n, "duck")
        return f"""
g{n} AS MATERIALIZED (
  SELECT doc_id, {total} AS total, unnest({sh}) AS gram FROM documents
),
c{n} AS (
  -- winner = most frequent gram (ties: lexicographically greatest via
  -- struct max — byte-identical ordering to Spark's max-of-struct)
  SELECT doc_id, any_value(total) AS total,
         max(struct_pack(c := cnt, g := gram)) AS m
  FROM (SELECT doc_id, total, gram, count(*) AS cnt FROM g{n}
        WHERE len(string_split(gram, ' ')) >= {n}
        GROUP BY doc_id, total, gram)
  GROUP BY doc_id
),
f{n} AS (
  SELECT doc_id, round(CASE WHEN total > 0
         THEN (m.c * len(replace(m.g, ' ', ''))) / total::DOUBLE
         ELSE 0.0 END, 6)
         AS top{n}_char_frac
  FROM c{n}
)"""

    # duplicate-5..10-gram character fractions: covered-position
    # accounting (see textstats._dup_ngram_fracs) as staged CTEs
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        GOPHER_MAX_DUP_NGRAM_CHAR_FRAC,
    )

    def _dupgram_ctes(n):
        return f"""
o{n} AS MATERIALIZED (
  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ws) - {n} + 2),
           i -> {{'pos': i,
                  'gram': array_to_string(list_slice(ws, i, i + {n} - 1),
                                          ' ')}})) AS u
    FROM docw WHERE len(ws) >= {n})
),
dn{n} AS (
  SELECT doc_id, list(pos) AS ps FROM o{n}
  GROUP BY doc_id, gram HAVING count(*) >= 2
),
cv{n} AS (
  SELECT DISTINCT doc_id, wpos FROM (
    SELECT doc_id, unnest(range(p, p + {n})) AS wpos
    FROM (SELECT doc_id, unnest(ps) AS p FROM dn{n}))
),
s{n} AS (
  SELECT cv.doc_id, sum(w.wlen) AS c
  FROM cv{n} cv JOIN wpos w
    ON w.doc_id = cv.doc_id AND w.wpos = cv.wpos
  GROUP BY cv.doc_id
)"""

    def _dupgram_frac(n):
        return (f"round(coalesce(CASE WHEN ({total}) > 0 THEN "
                f"s{n}.c / ({total})::DOUBLE ELSE 0.0 END, 0.0), 6)")

    dup_ns = sorted(GOPHER_MAX_DUP_NGRAM_CHAR_FRAC)
    dup_cols = ",\n       ".join(
        f"{_dupgram_frac(n)} AS dup{n}gram_char_frac" for n in dup_ns)
    dup_conds = "\n       ".join(
        f"AND {_dupgram_frac(n)} <= {GOPHER_MAX_DUP_NGRAM_CHAR_FRAC[n]}"
        for n in dup_ns)
    dup_joins = "\n".join(
        f"LEFT JOIN s{n} ON s{n}.doc_id = d.doc_id" for n in dup_ns)

    sqls["gopher_repetition"] = f"""
WITH docw AS MATERIALIZED (
  SELECT doc_id, {dwords} AS ws FROM documents
),
wpos AS MATERIALIZED (
  SELECT doc_id, u.wpos AS wpos, u.wlen AS wlen FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
           i -> {{'wpos': i, 'wlen': len(ws[i])}})) AS u FROM docw)
),
{_gram_cte(2).strip()},
{_gram_cte(3).strip()},
{",".join(_dupgram_ctes(n).strip() for n in dup_ns)}
SELECT d.doc_id, {rsel},
       coalesce(f2.top2_char_frac, 0.0) AS top2_char_frac,
       coalesce(f3.top3_char_frac, 0.0) AS top3_char_frac,
       {dup_cols},
       ({repetition_exprs("text", "duck")["dup_line_frac"]})
           <= {GOPHER_MAX_DUP_LINE_FRAC}
       AND ({repetition_exprs("text", "duck")["dup_line_char_frac"]})
           <= {GOPHER_MAX_DUP_LINE_CHAR_FRAC}
       AND ({repetition_exprs("text", "duck")["dup_para_frac"]})
           <= {GOPHER_MAX_DUP_PARA_FRAC}
       AND ({repetition_exprs("text", "duck")["dup_para_char_frac"]})
           <= {GOPHER_MAX_DUP_PARA_CHAR_FRAC}
       AND coalesce(f2.top2_char_frac, 0.0) <= {GOPHER_MAX_TOP2_CHAR_FRAC}
       AND coalesce(f3.top3_char_frac, 0.0) <= {GOPHER_MAX_TOP3_CHAR_FRAC}
       {dup_conds}
           AS repetition_pass
FROM documents d
LEFT JOIN f2 ON f2.doc_id = d.doc_id
LEFT JOIN f3 ON f3.doc_id = d.doc_id
{dup_joins}"""

    # charset_extract oracle: the decode ladder is what's under test — all
    # five encoding variants of doc i must yield the identical Unicode
    # text, so the oracle is encoding-independent and closed-form.
    sqls["charset_extract"] = """
SELECT 'cs://' || i AS url,
       'doc ' || i || ' café naïve öl' AS extracted_text
FROM range(0, 120) t(i)"""

    # split_windows oracle: recursive-CTE replay of the greedy splitter
    # (oracle.py::split_windows_oracle) — was rows-only in round 1
    sqls["split_windows"] = O.split_windows_oracle(24)

    # ann_ivf_topk oracle: fixed-k sampled-centroid IVF-flat in plain SQL —
    # centroids = first 64 vectors in portable-hash order of the id, cells =
    # rank-1 centroid per vector (ties toward low cent_id), queries probe
    # their 2 nearest cells, exact cosine within candidates.
    sqls["ann_ivf_topk"] = f"""
WITH cents AS MATERIALIZED (
  SELECT vec_id AS cent_id, embedding AS centv
  FROM embeddings
  ORDER BY {X.h64("cast(vec_id AS VARCHAR)", 'duck')}, vec_id
  LIMIT 64
),
cscore AS MATERIALIZED (
  SELECT e.vec_id AS vid, c.cent_id,
         round({X.cosine('c.centv', 'e.embedding', 'duck')}, 9) AS d
  FROM embeddings e CROSS JOIN cents c
),
ranked_cells AS (
  SELECT vid, cent_id,
         row_number() OVER (PARTITION BY vid ORDER BY d DESC, cent_id ASC) AS r
  FROM cscore
),
cells AS (SELECT vid AS cand_id, cent_id FROM ranked_cells WHERE r = 1),
probes AS (
  SELECT vid AS query_id, cent_id FROM ranked_cells
  WHERE r <= 2 AND vid % 100 = 0
),
cand AS (
  SELECT DISTINCT p.query_id, cl.cand_id
  FROM probes p JOIN cells cl ON cl.cent_id = p.cent_id
  WHERE cl.cand_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.cand_id,
         round({X.cosine('q.embedding', 'e.embedding', 'duck')}, 9) AS cos9
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.cand_id
),
rr AS (
  SELECT query_id, cand_id, cos9,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos9 DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cast(rank AS int) AS rank, cand_id, round(cos9, 6) AS cos
FROM rr WHERE rank <= 5"""

    # smgt_seq2seq oracle: same synthetic annotation construction + the
    # extended-task parse rules (targetText default, wrong-without-target
    # drop, unknown-status drop, null-label drop) in plain SQL.
    sqls["smgt_seq2seq"] = f"""
WITH d AS (SELECT doc_id, {dw} AS ws FROM documents),
e AS (
  SELECT doc_id, ws, unnest(range(0, len(ws) // 8)) AS i
  FROM d WHERE len(ws) >= 8
),
f AS (
  SELECT doc_id, cast(i AS int) AS entity_ix,
    CASE WHEN i % 5 = 4 THEN 'bogus'
         ELSE (['correct','unclear','wrong'])[(i % 3)::INT + 1] END AS status,
    ws[(i * 8)::INT + 1] AS raw_text,
    CASE WHEN i % 2 = 0 THEN upper(ws[(i * 8)::INT + 1]) END AS tgt0,
    CASE WHEN i % 7 = 6 THEN NULL
         ELSE 'field' || (i % 4)::VARCHAR END AS label
  FROM e
),
g AS (
  SELECT doc_id, entity_ix, label, raw_text,
         coalesce(tgt0, CASE WHEN status <> 'wrong' THEN raw_text END)
           AS target_text
  FROM f
  WHERE status IN ('correct', 'unclear', 'wrong')
    AND NOT (tgt0 IS NULL AND status = 'wrong')
)
SELECT doc_id, entity_ix, label AS class_name,
       'Normalize ' || label || ': ' || raw_text AS src_texts,
       target_text AS tgt_texts
FROM g
WHERE label IS NOT NULL AND raw_text IS NOT NULL
  AND target_text IS NOT NULL"""

    # g4_box_merge oracle: connected components of the same-class overlap
    # graph as a recursive label-propagation CTE (bounded per-page box sets
    # keep the closure tiny). Input construction mirrors driver_queries
    # _g1_inputs + the +120 widening in q_g4_box_merge.
    sqls["g4_box_merge"] = f"""
WITH RECURSIVE d AS (SELECT doc_id, len({dw}) AS nw FROM documents),
a2 AS (
  SELECT 'doc://' || doc_id AS url,
         cast(unnest(range(0, nw // 5)) AS int) AS ann_ix
  FROM d WHERE nw >= 5
),
anns AS (
  SELECT url, ann_ix, cast(ann_ix % 3 AS int) AS class_id,
         ann_ix * 50.0 AS x0, 0.0 AS y0,
         ann_ix * 50.0 + 154 AS x1, 9.0 AS y1
  FROM a2
),
edges AS (
  SELECT a.url, a.class_id, a.ann_ix AS src, b.ann_ix AS dst
  FROM anns a JOIN anns b ON a.url = b.url AND a.class_id = b.class_id
  WHERE a.x1 >= b.x0 AND b.x1 >= a.x0 AND a.y1 >= b.y0 AND b.y1 >= a.y0
),
reach(url, class_id, root, node) AS (
  SELECT url, class_id, ann_ix, ann_ix FROM anns
  UNION
  SELECT r.url, r.class_id, r.root, e.dst
  FROM reach r JOIN edges e
    ON e.url = r.url AND e.class_id = r.class_id AND e.src = r.node
),
comp AS (
  SELECT url, class_id, node, min(root) AS group_id
  FROM reach GROUP BY url, class_id, node
)
SELECT c.url, c.class_id, c.group_id,
       cast(count(*) AS int) AS n_members, min(a.x0) AS x0, max(a.x1) AS x1
FROM comp c JOIN anns a
  ON a.url = c.url AND a.class_id = c.class_id AND a.ann_ix = c.node
GROUP BY c.url, c.class_id, c.group_id"""

    # ann_lsh_topk oracle: same sign-LSH construction in DuckDB
    from amazon_textract_transformer_pipeline_spark.operators.similarity import (
        _sign_bucket_expr,
    )

    buckets = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, "
        f"{_sign_bucket_expr('embedding', 6, t, 'duck')} AS bucket FROM embeddings"
        for t in range(2)
    )
    sqls["ann_lsh_topk"] = f"""
WITH b AS ({buckets}),
q AS (SELECT vec_id AS query_id, embedding AS qv, tbl, bucket FROM b
      WHERE vec_id % 100 = 0),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS cand_id, q.qv, c.embedding AS cv
  FROM b c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket
  WHERE c.vec_id <> q.query_id
),
scored AS (
  SELECT query_id, cand_id,
         round({X.cosine('qv', 'cv', 'duck')}, 9) AS cos9
  FROM cand
),
ranked AS (
  SELECT query_id, cand_id, cos9,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos9 DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cast(rank AS int) AS rank, cand_id, round(cos9, 6) AS cos
FROM ranked WHERE rank <= 5"""
    # main_content oracles: planted block features re-derived closed-form
    # (same mc_feature_sql string both engines), then the identical
    # WSDM-2010 window+CASE classifier replayed in DuckDB.
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        MC_N_BLOCKS,
        mc_feature_sql,
    )
    from amazon_textract_transformer_pipeline_spark.operators.maincontent import (
        classifier_case,
        link_density_sql,
    )

    mc_nw, mc_lw = mc_feature_sql()
    mc_ctes = f"""
WITH mcf AS MATERIALIZED (
  SELECT doc_id, {dw} AS ws, len({dw}) AS n FROM documents
  WHERE len({dw}) >= 2 * {MC_N_BLOCKS}
),
mcg AS (
  SELECT doc_id, ws, n, cast(i AS int) AS block_ix,
         {mc_nw} AS n_words, {mc_lw} AS n_link_words
  FROM mcf, (SELECT unnest(range(0, {MC_N_BLOCKS})) AS i) ii
),
mcd AS (
  SELECT *, {link_density_sql()} AS link_density FROM mcg
),
mcw AS (
  SELECT *,
    coalesce(lag(n_words) OVER w, 0) AS prev_words,
    coalesce(lag(link_density) OVER w, 0.0) AS prev_link_density,
    coalesce(lead(n_words) OVER w, 0) AS next_words
  FROM mcd WINDOW w AS (PARTITION BY doc_id ORDER BY block_ix)
),
mcc AS (
  SELECT *, {classifier_case()} AS is_content FROM mcw
)"""
    sqls["main_content_blocks"] = f"""{mc_ctes}
SELECT doc_id, block_ix, n_words, n_link_words, link_density, is_content
FROM mcc"""
    sqls["main_content_text"] = f"""{mc_ctes}
SELECT doc_id,
  count(*) AS n_blocks,
  cast(sum(CASE WHEN is_content THEN 1 ELSE 0 END) AS int)
    AS n_content_blocks,
  coalesce(string_agg(CASE WHEN is_content THEN array_to_string(
      list_slice(ws, cast(floor(block_ix * n / {MC_N_BLOCKS}) AS int) + 1,
                 cast(floor((block_ix + 1) * n / {MC_N_BLOCKS}) AS int)), ' ')
      END, ' ' ORDER BY block_ix), '') AS main_text
FROM mcc GROUP BY doc_id"""

    # c4_span_dedup oracle: the identical span-dedup algorithm replayed
    # as staged DuckDB CTEs over the same planted corpus.
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        c4_span_text_sql,
    )

    span_sent = X.sentences("text", "duck")
    sqls["c4_span_dedup"] = f"""
WITH gsd AS MATERIALIZED (
  SELECT doc_id, {c4_span_text_sql()} AS text FROM documents
),
sdsa AS MATERIALIZED (
  SELECT doc_id, {span_sent} AS ss FROM gsd
),
sdsent AS (
  SELECT doc_id, cast(generate_subscripts(ss, 1) - 1 AS int) AS sent_ix,
         unnest(ss) AS sentence
  FROM sdsa
),
sdspans AS (
  SELECT doc_id, u.span_ix AS span_ix,
         {X.h64("u.span", "duck")} AS sh
  FROM (
    SELECT doc_id, unnest(list_transform(range(0, len(ss) - 2),
      i -> {{'span_ix': i,
             'span': array_to_string(list_slice(ss, i + 1, i + 3),
                                     chr(1))}})) AS u
    FROM sdsa WHERE len(ss) >= 3)
),
sdocc AS (
  SELECT doc_id, span_ix,
    row_number() OVER (PARTITION BY sh ORDER BY doc_id, span_ix) AS rn,
    count(*) OVER (PARTITION BY sh) AS cnt
  FROM sdspans
),
sdrem AS (
  SELECT DISTINCT doc_id, cast(span_ix + j AS int) AS sent_ix
  FROM (SELECT doc_id, span_ix FROM sdocc WHERE cnt >= 2 AND rn > 1),
       (SELECT unnest([0, 1, 2]) AS j) jj
),
sdkept AS (
  SELECT s.doc_id, s.sent_ix, s.sentence
  FROM sdsent s LEFT JOIN sdrem r
    ON r.doc_id = s.doc_id AND r.sent_ix = s.sent_ix
  WHERE r.doc_id IS NULL
),
sdagg AS (
  SELECT doc_id, string_agg(sentence, ' ' ORDER BY sent_ix) AS kept_text,
         count(*) AS n_sent_kept
  FROM sdkept GROUP BY doc_id
),
sdn AS (SELECT doc_id, cast(len(ss) AS bigint) AS n_sent FROM sdsa)
SELECT n.doc_id,
  coalesce(a.kept_text, '') AS kept_text,
  cast(coalesce(a.n_sent_kept, 0) AS bigint) AS n_sent_kept,
  cast(n.n_sent - coalesce(a.n_sent_kept, 0) AS bigint) AS n_sent_removed
FROM sdn n LEFT JOIN sdagg a ON a.doc_id = n.doc_id"""

    # lm_perplexity oracle: the same stupid-backoff bigram model trained
    # and scored in DuckDB (operators/lm.py constants shared).
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        LM_REF_MOD,
    )
    from amazon_textract_transformer_pipeline_spark.operators.lm import (
        BACKOFF,
        UNSEEN_SCALE,
        ppl_bucket_sql,
    )

    dwl = X.words("lower(text)", "duck")

    def lm_pairs(flt: str) -> str:
        return f"""
    SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
      SELECT doc_id, unnest(list_transform(range(1, len(ws)),
             i -> {{'w1': ws[i], 'w2': ws[i + 1]}})) AS u
      FROM (SELECT doc_id, {dwl} AS ws FROM documents{flt})
      WHERE len(ws) >= 2)"""

    ppl = "round(exp(-(a.ll / a.n_pairs)), 6)"
    sqls["lm_perplexity"] = f"""
WITH lmuni AS MATERIALIZED (
  SELECT w, count(*) AS c1 FROM (
    SELECT unnest({dwl}) AS w FROM documents
    WHERE doc_id % {LM_REF_MOD} = 0)
  GROUP BY w
),
lmtot AS (SELECT cast(sum(c1) AS double) AS n_tokens FROM lmuni),
lmbig AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c2
  FROM ({lm_pairs(f' WHERE doc_id % {LM_REF_MOD} = 0')})
  GROUP BY w1, w2
),
lmp AS ({lm_pairs('')}),
lms AS (
  SELECT p.doc_id,
    ln(CASE WHEN b.c2 IS NOT NULL THEN b.c2 / cast(u1.c1 AS double)
        ELSE {BACKOFF} * coalesce(u2.c1 / t.n_tokens,
                                  1.0 / ({UNSEEN_SCALE} * t.n_tokens)) END)
      AS lp
  FROM lmp p
  LEFT JOIN lmbig b ON b.w1 = p.w1 AND b.w2 = p.w2
  LEFT JOIN lmuni u1 ON u1.w = p.w1
  LEFT JOIN lmuni u2 ON u2.w = p.w2
  CROSS JOIN lmtot t
),
lma AS (
  SELECT doc_id, count(*) AS n_pairs, sum(lp) AS ll FROM lms GROUP BY doc_id
)
SELECT d.doc_id,
  cast(coalesce(a.n_pairs, 0) AS bigint) AS n_pairs,
  round(a.ll, 6) AS logprob_sum,
  {ppl} AS perplexity,
  {ppl_bucket_sql(ppl)} AS ppl_bucket
FROM documents d LEFT JOIN lma a ON a.doc_id = d.doc_id"""

    # quality_nb oracle: the same smoothed multinomial NB trained and
    # scored in DuckDB (operators/quality.py builds the SQL so constants
    # and formula stay single-sourced).
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        NB_LABEL_SQL,
    )
    from amazon_textract_transformer_pipeline_spark.operators.quality import (
        nb_oracle_sql,
    )

    sqls["quality_nb"] = nb_oracle_sql(
        labeled_cte=(f"SELECT doc_id, text, {NB_LABEL_SQL} AS is_hq "
                     f"FROM documents WHERE doc_id % 2 = 0"),
        score_cte="SELECT doc_id, text FROM documents",
    )

    # tfidf_top_terms oracle: same tf/df aggregates, same deterministic
    # (score desc, term asc) rank (single-sourced builder).
    from amazon_textract_transformer_pipeline_spark.operators.quality import (
        tfidf_oracle_sql,
    )

    sqls["tfidf_top_terms"] = tfidf_oracle_sql(
        "SELECT doc_id, text FROM documents")

    # doc_line_dedup oracle: same builder + same deterministic line-laden
    # text (indexed-lambda keep-first filter in both dialects).
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        MIXTURE_RATES,
        corpus_text_sql,
        dsir_text_sql,
        line_text_sql,
    )
    from amazon_textract_transformer_pipeline_spark.operators.sampling import (
        PPM,
        _hash_ppm,
        importance_exprs,
        n_copies_sql,
    )
    from amazon_textract_transformer_pipeline_spark.operators.webclean import (
        line_dedup_exprs,
    )
    lsel = ", ".join(f"{x} AS {k}"
                     for k, x in line_dedup_exprs("text", "duck").items())
    sqls["doc_line_dedup"] = f"""
WITH p AS MATERIALIZED (
  SELECT doc_id, {line_text_sql('duck')} AS text FROM documents
)
SELECT doc_id, {lsel} FROM p"""

    # mixture_sample oracle: identical integer ppm arithmetic (DIV↔//,
    # salted portable hash) over the same literal rate catalog.
    rates_values = ", ".join(f"('{s}', {r})" for s, r in MIXTURE_RATES)
    sqls["mixture_sample"] = f"""
WITH d AS (
  SELECT doc_id, 'src' || cast(doc_id % 5 AS varchar) AS source
  FROM documents
),
r(source, rate_ppm) AS (VALUES {rates_values}),
j AS (
  SELECT doc_id, d.source,
         CAST(coalesce(rate_ppm, {PPM}) AS BIGINT) AS rate_ppm,
         {_hash_ppm('doc_id', 'mix', 'duck')} AS h
  FROM d LEFT JOIN r USING (source)
),
c AS (
  SELECT doc_id, source, rate_ppm,
         CAST({n_copies_sql('rate_ppm', 'h', 'duck')} AS BIGINT) AS n_copies
  FROM j
)
SELECT doc_id, source, rate_ppm, n_copies,
       CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_ix
FROM c WHERE n_copies >= 1"""

    # dsir_importance oracle: same builder + same gram-planted text.
    isel = ", ".join(f"{x} AS {k}"
                     for k, x in importance_exprs("text", "duck").items())
    sqls["dsir_importance"] = f"""
WITH p AS MATERIALIZED (
  SELECT doc_id, {dsir_text_sql('duck')} AS text FROM documents
)
SELECT doc_id, {isel} FROM p"""

    # corpus_filter oracle: the composed pipeline — closed-form blocklist
    # verdict (the domain_blocklist construction), langid scores projected
    # once, then every stage verdict from the same dual-dialect builders.
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        langid_argmax_case,
        langid_score_exprs,
    )
    ssel = ", ".join(f"{x} AS {k}"
                     for k, x in langid_score_exprs("text", "duck").items())
    gp = gopher_exprs("text", "duck")["gopher_pass"]
    cp = c4_exprs("text", "duck")["c4_pass"]
    ds = importance_exprs("text", "duck")["dsir_sampled"]
    sqls["corpus_filter"] = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, {corpus_text_sql()} AS text,
    concat(CASE WHEN doc_id % 5 = 0 THEN 'sub.' ELSE '' END,
           'host', cast(doc_id % 7 AS varchar), '.example.com') AS host,
    (doc_id % 7) IN (1, 4) AS blocked
  FROM documents
),
sc AS MATERIALIZED (
  SELECT doc_id, host, blocked, text, {ssel} FROM base
),
v AS (
  SELECT doc_id, host, blocked, {langid_argmax_case()} AS lang_pred,
         {gp} AS gopher_pass, {cp} AS c4_pass, {ds} AS dsir_sampled
  FROM sc
),
w AS (
  SELECT *, CASE WHEN blocked THEN 'blocked_domain'
       WHEN lang_pred <> 'en' THEN 'language'
       WHEN NOT gopher_pass THEN 'gopher_quality'
       WHEN NOT c4_pass THEN 'c4_cleaning'
       WHEN NOT dsir_sampled THEN 'dsir_sampled_out' END AS drop_reason
  FROM v
)
SELECT doc_id, host, blocked, lang_pred, gopher_pass, c4_pass,
       dsir_sampled, drop_reason, (drop_reason IS NULL) AS kept
FROM w"""

    # corpus_report oracle: the release-metrics rollup over the full
    # corpus_filter oracle (nested as a subquery).
    sqls["corpus_report"] = f"""
SELECT lang_pred, drop_reason,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM ({sqls['corpus_filter']}) cf
GROUP BY lang_pred, drop_reason"""

    # url_dedup_latest oracle: canonicalization + a keep-newest window
    # (row_number replays max_by's (ts, id) struct ordering).
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        snapshot_url_sql,
    )
    from amazon_textract_transformer_pipeline_spark.operators.webclean import (
        canonical_url_sql,
    )
    sqls["url_dedup_latest"] = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, {snapshot_url_sql('duck')} AS url,
         CAST(1700000000000000 + (doc_id % 97) * 3600000000 AS BIGINT)
           AS ts_us
  FROM documents
),
c AS MATERIALIZED (
  SELECT doc_id, ts_us, {canonical_url_sql('url', 'duck')} AS url_canon
  FROM d
),
rk AS (
  SELECT *,
    row_number() OVER (PARTITION BY url_canon
                       ORDER BY ts_us DESC, doc_id DESC) AS rn,
    count(*) OVER (PARTITION BY url_canon) AS nv
  FROM c
)
SELECT url_canon, doc_id AS keeper_id, ts_us AS keeper_ts_us,
       CAST(nv AS BIGINT) AS n_versions
FROM rk WHERE rn = 1"""

    # pack_sequences oracle: identical salted-hash bucketing + window
    # running-sum arithmetic from the shared builder.
    from amazon_textract_transformer_pipeline_spark.operators.sampling import (
        packing_oracle_sql,
    )
    from amazon_textract_transformer_pipeline_spark.operators.textstats import (
        token_count_sql,
    )
    sqls["pack_sequences"] = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         CAST({token_count_sql('text', 'duck')} AS BIGINT) AS n_tokens
  FROM documents
)
{packing_oracle_sql(512, 8, docs_cte='toks')}"""

    # decontaminate_mask oracle: positional 13-gram probe against the
    # same planted blocklist, covered-position union, ordered reassembly.
    sqls["decontaminate_mask"] = f"""
WITH docw AS MATERIALIZED (
  SELECT doc_id, {dw} AS ws FROM documents
),
bl AS MATERIALIZED (
  SELECT doc_id, array_to_string(list_slice({dw}, 6, 26), ' ') AS text
  FROM documents WHERE doc_id % 17 = 3
),
bsh AS MATERIALIZED (
  SELECT DISTINCT {X.h64('s', 'duck')} AS gh FROM (
    SELECT unnest({X.shingles(X.words('text', 'duck'), 13, 'duck')}) AS s
    FROM bl)
),
pg AS MATERIALIZED (
  SELECT doc_id, u.pos AS pos, {X.h64('u.gram', 'duck')} AS gh FROM (
    SELECT doc_id, unnest(list_transform(range(0, len(ws) - 12),
      i -> {{'pos': i,
             'gram': array_to_string(list_slice(ws, i + 1, i + 13), ' ')}}))
      AS u
    FROM docw WHERE len(ws) >= 13)
),
m AS MATERIALIZED (
  SELECT doc_id, pos FROM pg JOIN bsh USING (gh)
),
cov AS (
  SELECT DISTINCT doc_id, wpos FROM (
    SELECT doc_id, unnest(range(pos, pos + 13)) AS wpos FROM m)
),
w AS (
  SELECT doc_id, u.wpos AS wpos, u.word AS word FROM (
    SELECT doc_id, unnest(list_transform(range(0, len(ws)),
      i -> {{'wpos': i, 'word': ws[i + 1]}})) AS u
    FROM docw)
),
kept AS (
  SELECT w.doc_id, w.wpos, w.word
  FROM w LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.wpos = w.wpos
  WHERE cov.wpos IS NULL
),
agg AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY wpos) AS kept_text,
         CAST(count(*) AS BIGINT) AS nk
  FROM kept GROUP BY doc_id
),
sp AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched_spans
  FROM m GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.kept_text, '') AS kept_text,
       CAST(len(d.ws) AS BIGINT) AS n_words,
       CAST(len(d.ws) - coalesce(a.nk, 0) AS BIGINT) AS n_words_removed,
       coalesce(s.n_matched_spans, CAST(0 AS BIGINT)) AS n_matched_spans
FROM docw d
LEFT JOIN agg a ON a.doc_id = d.doc_id
LEFT JOIN sp s ON s.doc_id = d.doc_id"""

    # exact_substring_dedup oracle: same planted corpus, same positional
    # 13-grams; first occurrence per gram hash by (doc_id, pos) survives,
    # later ones feed the identical covered-union masking tail.
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        EXSUB_NGRAM,
        exsub_text_sql,
    )

    _xn = EXSUB_NGRAM
    sqls["exact_substring_dedup"] = f"""
WITH docw AS MATERIALIZED (
  SELECT doc_id, {X.words(exsub_text_sql(), 'duck')} AS ws FROM documents
),
pg AS MATERIALIZED (
  SELECT doc_id, u.pos AS pos, {X.h64('u.gram', 'duck')} AS gh FROM (
    SELECT doc_id, unnest(list_transform(range(0, len(ws) - {_xn - 1}),
      i -> {{'pos': i,
             'gram': array_to_string(list_slice(ws, i + 1, i + {_xn}), ' ')}}))
      AS u
    FROM docw WHERE len(ws) >= {_xn})
),
m AS MATERIALIZED (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
    FROM pg)
  WHERE rn >= 2
),
cov AS (
  SELECT DISTINCT doc_id, wpos FROM (
    SELECT doc_id, unnest(range(pos, pos + {_xn})) AS wpos FROM m)
),
w AS (
  SELECT doc_id, u.wpos AS wpos, u.word AS word FROM (
    SELECT doc_id, unnest(list_transform(range(0, len(ws)),
      i -> {{'wpos': i, 'word': ws[i + 1]}})) AS u
    FROM docw)
),
kept AS (
  SELECT w.doc_id, w.wpos, w.word
  FROM w LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.wpos = w.wpos
  WHERE cov.wpos IS NULL
),
agg AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY wpos) AS kept_text,
         CAST(count(*) AS BIGINT) AS nk
  FROM kept GROUP BY doc_id
),
sp AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched_spans
  FROM m GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.kept_text, '') AS kept_text,
       CAST(len(d.ws) AS BIGINT) AS n_words,
       CAST(len(d.ws) - coalesce(a.nk, 0) AS BIGINT) AS n_words_removed,
       coalesce(s.n_matched_spans, CAST(0 AS BIGINT)) AS n_matched_spans
FROM docw d
LEFT JOIN agg a ON a.doc_id = d.doc_id
LEFT JOIN sp s ON s.doc_id = d.doc_id"""

    # export_shards oracle: identical hash-order running-sum chunking
    # (single-sourced builder).
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        EXPORT_SHARD_BYTES,
    )
    from amazon_textract_transformer_pipeline_spark.operators.export import (
        export_oracle_sql,
    )

    sqls["export_shards"] = export_oracle_sql(
        "SELECT doc_id, text FROM documents", EXPORT_SHARD_BYTES)

    # pagerank oracle: unrolled-round replay from the single-sourced
    # builder; final 6-dp round on top of the per-round 9-dp pinning.
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        PAGERANK_EDGES_SQL,
        PAGERANK_ITERS,
    )
    from amazon_textract_transformer_pipeline_spark.operators.graph import (
        pagerank_oracle_sql,
    )

    sqls["pagerank"] = (
        "SELECT node, round(rank, 6) AS rank FROM ("
        + pagerank_oracle_sql(PAGERANK_EDGES_SQL, n_iter=PAGERANK_ITERS)
        + ")")

    # winnow_fingerprints oracle: single-sourced builder (same selection
    # rule, same struct-min window) from operators/dedup.py.
    from amazon_textract_transformer_pipeline_spark.operators.dedup import (
        winnow_oracle_sql,
    )

    sqls["winnow_fingerprints"] = winnow_oracle_sql(
        "SELECT doc_id, text FROM documents", k=5, w=4)

    # BPE oracles: the unrolled-round replay is generated by the same
    # module that defines the Spark semantics (single-sourced greedy
    # fold / winner rule).
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        BPE_APPLY_MERGES,
        BPE_GATE_MERGES,
    )
    from amazon_textract_transformer_pipeline_spark.operators.bpe import (
        bpe_apply_oracle_sql,
        bpe_oracle_sql,
    )

    sqls["bpe_merges"] = bpe_oracle_sql(
        "SELECT doc_id, text FROM documents", BPE_GATE_MERGES)
    sqls["bpe_tokenize"] = bpe_apply_oracle_sql(
        "SELECT doc_id, text FROM documents", BPE_APPLY_MERGES)

    # vocab_top_k oracle: same token aggregate + deterministic
    # (count desc, token asc) rank in DuckDB.
    sqls["vocab_top_k"] = f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id AS _doc, unnest({X.words('text', 'duck')}) AS token
  FROM documents
),
c AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT _doc) AS BIGINT) AS n_docs
  FROM tok GROUP BY token
)
SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC)
            AS BIGINT) AS vocab_rank,
       token, n_occurrences, n_docs
FROM c ORDER BY n_occurrences DESC, token ASC LIMIT 200"""

    # html_meta oracle: fully closed-form — every planted head signal is
    # predictable from doc_id; the gate passes only if the real parser
    # (attr casing/quoting, token trimming, 'none' implication, rel token
    # lists, url= slicing, entity-decoded titles) recovers it exactly.
    sqls["html_meta"] = """
SELECT doc_id,
  concat('Doc ', cast(doc_id AS varchar), ' & friends') AS title,
  (doc_id % 4) IN (1, 2, 3) AS robots_noindex,
  (doc_id % 4) IN (1, 3) AS robots_nofollow,
  CASE WHEN doc_id % 5 = 0
       THEN 'https://canon.example/p/' || cast(doc_id % 50 AS varchar)
  END AS canonical_href,
  CASE WHEN doc_id % 7 = 0
       THEN 'https://next.example/' || cast(doc_id AS varchar)
  END AS refresh_url,
  CAST(CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END +
       CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS n_meta_tags
FROM documents"""

    # domain_blocklist oracle: fully closed-form — the generated host and
    # the blocked verdict are both predictable from doc_id.
    sqls["domain_blocklist"] = """
SELECT doc_id,
  concat(CASE WHEN doc_id % 5 = 0 THEN 'sub.' ELSE '' END,
         'host', cast(doc_id % 7 AS varchar), '.example.com') AS host,
  (doc_id % 7) IN (1, 4) AS blocked,
  CASE WHEN (doc_id % 7) IN (1, 4)
       THEN concat('host', cast(doc_id % 7 AS varchar), '.example.com')
  END AS blocked_domain
FROM documents"""

    return {k: v for k, v in sqls.items() if v is not None}
