"""Spark-side implementations of the driver-gate queries (__spark_entry__).

Each callable takes (spark, sf_dir) and returns a DataFrame whose values are
bit-reproducible by the DuckDB oracle in oracle.py. Column names/aliases are
kept identical on both sides — the driver sorts columns by name before
value-hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .config import DEMO_CONFIG, field_config_df
from .functions import textsql as X
from .operators import dedup, similarity
from .operators.assembly import assemble_text, pages_view, words_view
from .operators.consolidate import (
    consolidate_fields,
    doc_confidence,
    value_consolidation,
)
from .operators.enrich import stub_predictions
from .operators.entities import extract_mentions
from .operators.frontend import html_to_words
from .operators.labels import merge_annotation_boxes, word_single_labels
from .operators.multimodal import (
    decode_metadata,
    pdf_structure_metadata,
    synth_media_df,
    synth_pdf_df,
)
from .operators.smgt import smgt_to_seq2seq_examples
from .operators.webclean import canonical_url_sql, remove_boilerplate_lines
from .operators.splitting import split_pages_to_window_bounds
from .operators.textstats import with_text_stats
from .sources.bridge import pages_from_documents


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _doc_words(spark, sf_dir) -> DataFrame:
    return html_to_words(pages_from_documents(_docs(spark, sf_dir)))


def _enriched_words(spark, sf_dir) -> DataFrame:
    return stub_predictions(words_view(_doc_words(spark, sf_dir)))


def _mentions(spark, sf_dir) -> DataFrame:
    cfg = field_config_df(spark, DEMO_CONFIG)
    return extract_mentions(_enriched_words(spark, sf_dir), cfg)


# ---------------------------------------------------------------------------
# Extraction path (full front-end under the gate)
# ---------------------------------------------------------------------------
def q_extract_text(spark, sf_dir) -> DataFrame:
    return assemble_text(_doc_words(spark, sf_dir)).select(
        "url", "extracted_text", "n_pages")


def q_word_enrichment(spark, sf_dir) -> DataFrame:
    return _enriched_words(spark, sf_dir).select(
        "url", "page_num", "word_pos", "line_id", "text", "pred_cls", "pcc")


def q_entity_mentions(spark, sf_dir) -> DataFrame:
    return _mentions(spark, sf_dir).select(
        "url", F.col("run_id").cast("bigint").alias("run_id"),
        "ClassId", "ClassName", "Text", "PageNum", "Confidence", "ixe")


def q_field_values(spark, sf_dir) -> DataFrame:
    v = value_consolidation(_mentions(spark, sf_dir))
    return v.select(
        "url", "ClassId", "Text",
        F.col("n_detections").cast("bigint").alias("n_detections"),
        "ix_first", "ix_last",
        F.round("value_conf", 6).alias("value_conf"))


def _all_urls(spark, sf_dir) -> DataFrame:
    """Url universe straight from the documents scan (url = 'doc://'||doc_id,
    the bridge contract) — avoids a second consumer of the expensive
    front-end plan, which round 1 papered over with a leaked .persist()."""
    return _docs(spark, sf_dir).select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"))


def q_fields(spark, sf_dir) -> DataFrame:
    cfg = field_config_df(spark, DEMO_CONFIG)
    m = _mentions(spark, sf_dir)
    f = consolidate_fields(m, cfg, _all_urls(spark, sf_dir))
    return f.select(
        "url", "ClassId", "FieldName", "SortOrder",
        F.col("NumDetections").cast("bigint").alias("NumDetections"),
        F.col("NumDetectedValues").cast("bigint").alias("NumDetectedValues"),
        "Value", F.round("Confidence", 6).alias("Confidence"))


def _eval_tokens(spark, sf_dir) -> DataFrame:
    """Deterministic (example, label, pred) token relation for the eval
    gates: labels = the stub classes; preds agree 70% of the time, diverge
    via the portable hash otherwise; ~1/13 positions are pad (-100). Both
    engines construct identical rows (oracle.eval_* replays this)."""
    from .operators.enrich import N_STUB_CLASSES

    we = _enriched_words(spark, sf_dir)
    key = "concat(url, '#', cast(page_num as string), '#', cast(word_pos as string))"
    h1 = X.h64(f"concat('pad', {key})", "spark")
    h2 = X.h64(f"concat('prd', {key})", "spark")
    return we.select(
        F.expr("concat(url, '#', cast(page_num as string))").alias("example_id"),
        F.expr(f"CASE WHEN {h1} % 13 = 0 THEN -100 ELSE pred_cls END")
        .alias("label"),
        F.expr(f"CASE WHEN {h2} % 10 < 7 THEN pred_cls "
               f"ELSE cast({h2} % {N_STUB_CLASSES} as int) END").alias("pred"),
    )


def q_eval_token_metrics(spark, sf_dir) -> DataFrame:
    from .operators.enrich import N_STUB_CLASSES
    from .operators.evaluation import token_classification_metrics

    m = token_classification_metrics(_eval_tokens(spark, sf_dir),
                                     num_labels=N_STUB_CLASSES)
    return m.select(
        "n_examples", F.round("acc", 6).alias("acc"), "n_focus_examples",
        F.round("focus_acc", 6).alias("focus_acc"),
        F.round("focus_else_acc_minus_one", 6)
        .alias("focus_else_acc_minus_one"))


def q_eval_class_ratios(spark, sf_dir) -> DataFrame:
    from .operators.evaluation import class_prediction_ratios

    r = class_prediction_ratios(_eval_tokens(spark, sf_dir))
    return r.select("pred_class", "n_tokens",
                    F.round("ratio", 6).alias("ratio"))


def q_eval_seq2seq_acc(spark, sf_dir) -> DataFrame:
    """Normalized exact-match over deterministic (gen, target) pairs built
    from each doc's first word: h%3 rotates match-after-normalization /
    exact match / miss."""
    from .operators.evaluation import seq2seq_exact_match

    ws = X.words("text", "spark")
    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(f"coalesce({ws}[0], '')").alias("w1"))
    h = X.h64("concat('s2s', cast(doc_id as string))", "spark")
    pairs = d.select(
        F.expr(f"CASE WHEN {h} % 3 = 0 THEN concat('  ', upper(w1), ' ') "
               f"WHEN {h} % 3 = 1 THEN w1 "
               f"ELSE concat(w1, 'x') END").alias("gen_text"),
        F.col("w1").alias("target_text"),
    )
    m = seq2seq_exact_match(pairs)
    return m.select("n_examples", F.round("acc", 6).alias("acc"))


def q_apply_review(spark, sf_dir) -> DataFrame:
    """Human-review merge-back over the consolidated fields with a
    deterministic synthetic review set (same portable-hash construction as
    oracle.apply_review_oracle: h%3==0 rows are reviewed, h%4 picks
    presence-unchecked / exact-confirm / corrected-value / unanswered)."""
    from .operators.review import apply_review

    cfg = field_config_df(spark, DEMO_CONFIG)
    m = _mentions(spark, sf_dir)
    f = consolidate_fields(m, cfg, _all_urls(spark, sf_dir))
    base = f.withColumn(
        "_h", F.expr(X.h64("concat(url, '|', FieldName)", "spark")))
    reviews = base.filter("_h % 3 = 0").select(
        "url", "FieldName",
        F.expr("_h % 4 <> 0").alias("present"),
        F.expr("CASE WHEN _h % 4 = 1 THEN Value "
               "WHEN _h % 4 = 2 THEN concat(Value, ' (corrected)') END")
        .alias("review_value"),
        F.lit(None).cast("array<string>").alias("review_values"),
    )
    merged = apply_review(f, reviews)
    return merged.select(
        "url", "ClassId", "FieldName", "SortOrder",
        F.col("NumDetections").cast("bigint").alias("NumDetections"),
        "Value", F.round("Confidence", 6).alias("Confidence"), "reviewed")


def q_doc_confidence(spark, sf_dir) -> DataFrame:
    cfg = field_config_df(spark, DEMO_CONFIG)
    m = _mentions(spark, sf_dir)
    f = consolidate_fields(m, cfg, _all_urls(spark, sf_dir))
    return doc_confidence(f).select(
        "url", F.round("Confidence", 6).alias("Confidence"))


# ---------------------------------------------------------------------------
# Dedup / sketch family (documents)
# ---------------------------------------------------------------------------
def q_fingerprint(spark, sf_dir) -> DataFrame:
    return dedup.with_fingerprint(_docs(spark, sf_dir)).select(
        "doc_id", "fingerprint")


def q_minhash_signature(spark, sf_dir) -> DataFrame:
    sig = dedup.minhash_signatures(_docs(spark, sf_dir).select("doc_id", "text"))
    return sig.select(
        "doc_id",
        F.expr("concat_ws(',', transform(minhash, x -> cast(x as string)))")
        .alias("minhash_csv"))


def q_lsh_buckets(spark, sf_dir) -> DataFrame:
    return dedup.lsh_band_buckets(
        _docs(spark, sf_dir).select("doc_id", "text"), k=16, n_bands=8)


def q_lsh_candidates(spark, sf_dir) -> DataFrame:
    return dedup.lsh_candidate_pairs(
        _docs(spark, sf_dir).select("doc_id", "text"), k=16, n_bands=8)


def q_near_duplicates(spark, sf_dir) -> DataFrame:
    """LSH candidates verified by exact n-gram Jaccard; threshold 0 keeps
    every candidate pair so the gate hash-checks all Jaccard values."""
    nd = dedup.near_duplicates(
        _docs(spark, sf_dir).select("doc_id", "text"),
        threshold=0.0, k=16, n_bands=8)
    return nd.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def _cluster_corpus(spark, sf_dir) -> DataFrame:
    """Documents + planted near-identical variants (doc_id + 100000, same
    text plus a 3-word tail) — guarantees the LSH pair graph has real
    multi-member components whatever the base corpus looks like. The
    construction is plain SQL replayed verbatim by the DuckDB oracle."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    variants = docs.filter("doc_id % 5 < 3").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("text || ' zq variant tail'").alias("text"))
    return docs.union(variants)


def q_dedup_clusters(spark, sf_dir) -> DataFrame:
    """Near-dup cluster resolution end-to-end: LSH candidate pairs →
    distributed connected components (alternating large-star/small-star)
    → per-cluster canonical keeper (best quality = text length, ties to
    min id). Exact against a DuckDB recursive-CTE transitive closure —
    the corpus-scale twin of the G4 box-merge semantics."""
    corpus = _cluster_corpus(spark, sf_dir) \
        .withColumn("_q", F.length("text").cast("double"))
    pairs = dedup.lsh_candidate_pairs(corpus, k=16, n_bands=8)
    return dedup.resolve_near_dup_clusters(corpus, pairs,
                                           quality_col="_q")


def q_decontaminate(spark, sf_dir) -> DataFrame:
    """Benchmark decontamination over a planted eval set: blocklist =
    every 17th doc's words 6-26 (contiguous → its 13-grams all appear in
    the source doc), flags computed by the bucketed gram-hash semi-join.
    Exact against the same shingle/hash construction in DuckDB."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ws = X.words("text", "spark")
    bl = docs.filter("doc_id % 17 = 3").select(
        "doc_id", F.expr(f"concat_ws(' ', slice({ws}, 6, 21))").alias("text"))
    return dedup.decontamination_flags(docs, bl)


def pii_text_sql(engine: str) -> str:
    """Deterministic PII-laden text from doc_id (both engines): email,
    IPv4, IPv6, phone (every 3rd doc), 9+-digit account id, then the
    real document text as a tail so arbitrary content is exercised."""
    s = "string" if engine == "spark" else "varchar"
    did = f"cast(doc_id as {s})"
    return (
        f"concat('Contact user', {did}, '@mail',"
        f" cast(doc_id % 7 as {s}), '.example.com or 10.',"
        f" cast(doc_id % 200 as {s}), '.0.', cast(doc_id % 250 as {s}),"
        f" ' ping fe80:a:b:', cast(doc_id % 9 as {s}),"
        f" CASE WHEN doc_id % 3 = 0 THEN concat(' call +1 (555) ',"
        f" cast(100 + doc_id % 900 as {s}), '-',"
        f" cast(1000 + doc_id % 9000 as {s})) ELSE ' no phone' END,"
        f" ' acct ', cast(100000000 + doc_id * 37 as {s}), ' :: ', text)"
    )


def q_pii_scrub(spark, sf_dir) -> DataFrame:
    """PII redaction signals + scrubbed text over the deterministically
    PII-laden corpus — per-category counts under the sequential-scrub
    semantics, exact against the same expression builder in DuckDB.
    Map-side projection, zero shuffle."""
    from .operators.webclean import pii_exprs

    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(pii_text_sql("spark")).alias("text"))
    out = d
    for name, e in pii_exprs("text", "spark").items():
        out = out.withColumn(name, F.expr(e))
    return out.drop("text")


def q_ngram_jaccard_consecutive(spark, sf_dir) -> DataFrame:
    d = _docs(spark, sf_dir)
    a = d.select(F.col("doc_id").alias("a"), F.col("text").alias("ta"))
    b = d.select((F.col("doc_id") - 1).alias("a"),
                 F.col("doc_id").alias("b"), F.col("text").alias("tb"))
    wa, wb = X.words("ta", "spark"), X.words("tb", "spark")
    return (
        a.join(b, "a")
        .withColumn("jaccard", F.round(F.expr(X.jaccard(wa, wb, 3, "spark")), 6))
        .select("a", "b", "jaccard")
    )


def q_simhash(spark, sf_dir) -> DataFrame:
    return dedup.simhash_sketch(_docs(spark, sf_dir).select("doc_id", "text")) \
        .select("doc_id", "simhash")


def q_simhash_hamming_consecutive(spark, sf_dir) -> DataFrame:
    s = dedup.simhash_sketch(_docs(spark, sf_dir).select("doc_id", "text"))
    a = s.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    b = s.select((F.col("doc_id") - 1).alias("a"),
                 F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    return (
        a.join(b, "a")
        .withColumn("hamming",
                    F.expr(X.hamming("sa", "sb", "spark", 64)).cast("bigint"))
        .select("a", "b", "hamming")
    )


def q_embedding_cosine_consecutive(spark, sf_dir) -> DataFrame:
    # threshold=None: a NULL cosine (zero-norm vector) must survive to match
    # the filterless oracle; any `cos >= t` predicate would drop it.
    return dedup.embedding_near_duplicates(
        _embs(spark, sf_dir), threshold=None).select(
        "a", "b", F.round("cos", 6).alias("cos"))


def semantic_corpus(embs: DataFrame) -> DataFrame:
    """Gate corpus for SemDedup: the natural embeddings are near-random
    (max pairwise cosine ~0.51 at sf0.01), so duplicate structure is
    planted deterministically — exact copies at +10000 for vec_id%25==1
    (20 pairs) and a second copy at +20000 for vec_id%50==1 (10 triples,
    exercising earliest-witness selection), plus one zero-norm vector at
    id 30000 (NULL-cosine paths; 30000%25==0 also makes it a centroid,
    exercising the unscorable-centroid branch)."""
    base = embs.select("vec_id", "embedding")
    c1 = base.filter("vec_id % 25 = 1").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    c2 = base.filter("vec_id % 50 = 1").select(
        (F.col("vec_id") + 20000).alias("vec_id"), "embedding")
    z = base.filter("vec_id = 0").select(
        F.lit(30000).cast("long").alias("vec_id"),
        F.expr("transform(embedding, v -> cast(0.0 as float))")
        .alias("embedding"))
    return base.unionByName(c1).unionByName(c2).unionByName(z)


def q_semantic_dedup(spark, sf_dir) -> DataFrame:
    """SemDedup over the planted corpus: every +10000/+20000 copy must be
    flagged with its source as the witness (identical vectors share the
    cluster and the source out-ranks them by vec_id tie-break); natural
    vectors all survive at 0.95 (max natural cosine ~0.51); the zero-norm
    vector neither flags nor is flagged. Exact against the identical
    centroid-assignment + rank + witness construction in DuckDB."""
    out = dedup.semantic_dedup(
        semantic_corpus(_embs(spark, sf_dir)),
        threshold=0.95, centroid_every=25)
    return out.select(
        "vec_id", "cluster_id", F.round("cent_cos", 6).alias("cent_cos"),
        F.col("cluster_rank").cast("int").alias("cluster_rank"),
        "is_dup", "dup_of", "kept")


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------
def q_ann_bruteforce_topk(spark, sf_dir) -> DataFrame:
    embs = _embs(spark, sf_dir)
    res = similarity.brute_force_topk(
        embs, embs.filter("vec_id % 100 = 0"), topk=5)
    return res.select("query_id", "rank", "cand_id",
                      F.round("cos", 6).alias("cos"))


def q_ann_lsh_topk(spark, sf_dir) -> DataFrame:
    embs = _embs(spark, sf_dir)
    res = similarity.lsh_topk(
        embs, embs.filter("vec_id % 100 = 0"), topk=5,
        n_planes=6, n_tables=2)
    return res.select("query_id", "rank", "cand_id",
                      F.round("cos", 6).alias("cos"))


def q_ann_ivf_topk(spark, sf_dir) -> DataFrame:
    embs = _embs(spark, sf_dir)
    res = similarity.ivf_topk(
        embs, embs.filter("vec_id % 100 = 0"), topk=5,
        n_centroids=64, nprobe=2)
    return res.select("query_id", "rank", "cand_id",
                      F.round("cos", 6).alias("cos"))


# ---------------------------------------------------------------------------
# Text stats
# ---------------------------------------------------------------------------
def q_text_stats(spark, sf_dir) -> DataFrame:
    return with_text_stats(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "n_chars_actual", "mean_word_len",
        "stopword_ratio", "n_tokens_est", "lang_guess")


def q_langid_scores(spark, sf_dir) -> DataFrame:
    """Scored language ID: per-language literal-gram linear scores +
    the argmax prediction, exact against the same plan-time-literal
    profile table in DuckDB. Map-side projection, zero shuffle."""
    from .operators.textstats import with_langid

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return with_langid(docs).drop("text")


# ---------------------------------------------------------------------------
# G1 overlap labeling on portable synthetic geometry
# ---------------------------------------------------------------------------
def _g1_inputs(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(f"size({X.words('text', 'spark')})").alias("nw"))
    words = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit(1).alias("page_num"),
        F.explode(F.expr("sequence(0, nw - 1)")).alias("word_pos"),
    ).withColumn(
        "wbox",
        F.expr("struct(cast(word_pos * 10 as double) as x0, "
               "cast(0 as double) as y0, "
               "cast(word_pos * 10 + 9 as double) as x1, "
               "cast(9 as double) as y1)"),
    )
    anns = d.filter("nw >= 5").select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit(1).alias("page_num"),
        F.explode(F.expr("sequence(0, cast(nw / 5 as int) - 1)")).alias("ann_ix"),
    ).withColumn("class_id", F.expr("cast(ann_ix % 3 as int)")).withColumn(
        "abox",
        F.expr("struct(cast(ann_ix * 50 as double) as x0, "
               "cast(0 as double) as y0, "
               "cast(ann_ix * 50 + 34 as double) as x1, "
               "cast(9 as double) as y1)"),
    )
    return words, anns


def q_g1_word_labels(spark, sf_dir) -> DataFrame:
    words, anns = _g1_inputs(spark, sf_dir)
    return word_single_labels(words, anns, n_classes=4).select(
        "url", "word_pos", "label")


# ---------------------------------------------------------------------------
# Reference aggregation shapes on TPC-H-ish tables (§2.9/§2.10 analogs)
# ---------------------------------------------------------------------------
def q_o1_group_minmax(spark, sf_dir) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
             F.round(F.min("l_extendedprice"), 6).alias("min_price"),
             F.round(F.max("l_extendedprice"), 6).alias("max_price"),
             F.count("*").alias("n"))
    )


def q_top1_per_group(spark, sf_dir) -> DataFrame:
    """E10 selector shape on orders: top order per customer."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 6).alias("o_totalprice"))
    )


def q_noisy_or_events(spark, sf_dir) -> DataFrame:
    """E8 noisy-OR shape on events: conf = clamp(sigmoid(value))."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    conf = "least(1 / (1 + exp(-value)), cast(0.999999 as double))"
    return (
        e.withColumn("conf", F.expr(conf))
        .groupBy("user_id", "event_type")
        .agg(F.round(1 - F.exp(F.sum(F.log1p(-F.col("conf")))), 6)
             .alias("noisy_or"),
             F.count("*").alias("n"))
    )


def q_s4_pagination_merge(spark, sf_dir) -> DataFrame:
    """S4 paginated-response merge shape: per user, events concatenated in
    (ts, event_id) order."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "concat_ws(',', transform(array_sort(collect_list("
                "struct(ts, event_id))), x -> cast(x.event_id as string)))"
            ).alias("event_ids_csv"),
        )
    )


def q_train_test_split(spark, sf_dir) -> DataFrame:
    """T1/T2 seeded deterministic split (portable hash instead of RNG)."""
    d = _docs(spark, sf_dir)
    h = X.h64("concat('split', cast(doc_id as string))", "spark")
    return d.select(
        "doc_id",
        F.expr(f"CASE WHEN {h} % 10 < 9 THEN 'train' ELSE 'test' END").alias("split"))


def messy_url_sql(engine: str) -> str:
    """Deterministic messy-URL construction from doc_id (both engines):
    mixed-case scheme/host, www + default port, tracking params, fragment."""
    s = "string" if engine == "spark" else "varchar"
    did = f"cast(doc_id as {s})"
    return (
        f"concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Host' "
        f"ELSE 'hTTp://Host' END, cast(doc_id % 7 as {s}), "
        f"'.Example.COM', CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END, "
        f"CASE WHEN doc_id % 5 = 4 THEN '' ELSE concat('/Path/', {did}) END, "
        f"CASE WHEN doc_id % 3 = 0 THEN concat('?b=2&utm_source=x&a=', {did}, '#frag') "
        f"WHEN doc_id % 3 = 1 THEN '?fbclid=zz&gclid=q' "
        f"ELSE '#only-fragment' END)"
    )


def q_canonical_urls(spark, sf_dir) -> DataFrame:
    """URL canonicalization over deterministically-messy urls: lowercase
    scheme/host, strip www + default ports + tracking params + fragment,
    sort surviving params, default path to '/'."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(messy_url_sql("spark")).alias("url"))
    return d.select(
        "doc_id", "url",
        F.expr(canonical_url_sql("url", "spark")).alias("url_canon"))


def q_boilerplate_lines(spark, sf_dir) -> DataFrame:
    """CCNet-style boilerplate removal at the engine's line grain: lines
    repeated across ≥ 3 distinct docs vanish from every doc."""
    out = remove_boilerplate_lines(_docs(spark, sf_dir), min_docs=3)
    return out.select("doc_id", "kept_text", "n_lines_kept", "n_lines_removed")


def q_smgt_seq2seq(spark, sf_dir) -> DataFrame:
    """SMGT extended-task entities → seq2seq examples, over deterministic
    synthetic annotations derived from the documents table. Exercises every
    parse rule: targetText default, wrong-without-target error drop,
    unknown-status drop, null-label drop (smgt.py:200-234,
    task_builder.py:150-199)."""
    ws = X.words("text", "spark")
    ents = f"""transform(sequence(0, cast(size({ws}) / 8 as int) - 1),
      i -> named_struct(
        'detectionId', concat('det-', cast(i as string)),
        'ocrStatus', CASE WHEN i % 5 = 4 THEN 'bogus'
                          ELSE element_at(array('correct','unclear','wrong'),
                                          cast(i % 3 as int) + 1) END,
        'boxIxs', array(cast(i as int)),
        'classId', cast(i % 4 as int),
        'rawText', element_at({ws}, cast(i * 8 as int) + 1),
        'targetText', CASE WHEN i % 2 = 0
                           THEN upper(element_at({ws}, cast(i * 8 as int) + 1))
                           END,
        'label', CASE WHEN i % 7 = 6 THEN NULL
                      ELSE concat('field', cast(i % 4 as string)) END))"""
    ann = (
        _docs(spark, sf_dir)
        .filter(F.expr(f"size({ws}) >= 8"))
        .select("doc_id", F.expr(ents).alias("entities"))
    )
    return smgt_to_seq2seq_examples(ann, keys=["doc_id"]).select(
        "doc_id", "entity_ix", "class_name", "src_texts", "tgt_texts")


# ---------------------------------------------------------------------------
# Rows-only checks (non-SQL-expressible ops: splitter, G4, multimodal)
# ---------------------------------------------------------------------------
def q_split_windows(spark, sf_dir) -> DataFrame:
    pages = pages_view(_doc_words(spark, sf_dir))
    return split_pages_to_window_bounds(pages, max_content_seq_len=24)


def q_g4_box_merge(spark, sf_dir) -> DataFrame:
    _, anns = _g1_inputs(spark, sf_dir)
    # widen anns so consecutive ones touch → multi-box groups exist
    wide = anns.withColumn(
        "abox", F.expr("struct(abox.x0 as x0, abox.y0 as y0, "
                       "abox.x1 + 120 as x1, abox.y1 as y1)"))
    return merge_annotation_boxes(wide).select(
        "url", "class_id", "group_id",
        F.size("ann_ixs").alias("n_members"), "x0", "x1")


def q_multimodal_metadata(spark, sf_dir) -> DataFrame:
    return decode_metadata(synth_media_df(spark, 200)).select(
        "media_id", "width", "height", "format", "n_bytes", "valid")


def q_real_media_metadata(spark, sf_dir) -> DataFrame:
    """D1 over REAL containers: the six-format synthetic corpus
    (png/jpeg/bmp/tiff/gif/webp bytes from the built-in encoders) through
    decode_metadata's header sniff — format and header-only dims checked
    against the generator's closed-form spec. n_bytes is excluded
    (encoded size is not closed-form). Map-only."""
    from .operators.multimodal import synth_real_media_df

    return decode_metadata(synth_real_media_df(spark, 150)).select(
        "media_id", "width", "height", "format", "valid")


def q_pdf_metadata(spark, sf_dir) -> DataFrame:
    """PDF structure metadata over the six-dialect synthetic corpus:
    page-1 MediaBox point dims + page count + encrypted flag via the
    native xref/page-tree walk (functions/pdf.py) — checked against the
    closed-form generator spec, so classic xref, xref streams, PNG
    predictors, and object streams all verify end-to-end. Map-only."""
    return pdf_structure_metadata(synth_pdf_df(spark, 120)).select(
        "media_id", "width", "height", "n_pages", "encrypted", "valid")


def q_gopher_filters(spark, sf_dir) -> DataFrame:
    """Gopher/C4 pre-training quality filters over the documents table:
    per-doc rule signals + the combined verdict, exact-value checked
    against the same expressions in DuckDB. Pure map-side projection —
    at corpus scale this is the filter applied BEFORE any shuffle-bearing
    stage (dedup, similarity) so downstream volumes shrink first."""
    from .operators.textstats import with_gopher_filters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_gopher_filters(docs.select("doc_id", "text")).drop("text")


def q_c4_filters(spark, sf_dir) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) over the
    documents table: per-line retention (terminal punctuation, ≥5 words,
    no 'javascript'), the retained text, sentence count, and the page
    verdict — exact against the same expression builder's DuckDB
    dialect. Map-side projection, zero shuffle."""
    from .operators.textstats import with_c4_filters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_c4_filters(docs.select("doc_id", "text")).drop("text")


def q_gopher_repetition(spark, sf_dir) -> DataFrame:
    """Gopher repetition-removal signals: duplicate-line fractions
    (map-side HOFs) + top-2/3-gram character fractions (one (doc, gram)
    shuffle each with map-side partials) + combined verdict — exact
    against the same definitions replayed as staged DuckDB CTEs."""
    from .operators.textstats import with_repetition_filters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_repetition_filters(docs.select("doc_id", "text")).drop("text")


def q_charset_extract(spark, sf_dir) -> DataFrame:
    """Charset-sniffing front-end over a mixed-encoding corpus: the same
    accented text served as plain UTF-8, BOM'd UTF-8 + meta, cp1252 +
    meta, BOM'd UTF-16-LE, and undeclared latin-1 (strict-UTF-8 probe
    fails → WHATWG cp1252 fallback). Every variant must extract the
    IDENTICAL Unicode text — the oracle is one closed-form string per
    doc, independent of encoding. Map-only, zero shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("html", T.BinaryType(), False),
    ])

    def gen(batches):
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                line = f"doc {i} café naïve öl"
                body = (f"<html><head>{{meta}}</head><body><article>"
                        f"<p>{line}</p></article></body></html>")
                v = i % 5
                if v == 0:
                    blob = body.format(meta="").encode("utf-8")
                elif v == 1:
                    blob = b"\xef\xbb\xbf" + body.format(
                        meta='<meta charset="utf-8">').encode("utf-8")
                elif v == 2:
                    blob = body.format(
                        meta='<meta charset="windows-1252">').encode("cp1252")
                elif v == 3:
                    blob = b"\xff\xfe" + body.format(meta="").encode("utf-16-le")
                else:
                    blob = body.format(meta="").encode("latin-1")
                rows.append({"url": f"cs://{i}", "html": blob})
            yield pd.DataFrame(rows)

    pages = spark.range(0, 120, 1, 8).mapInPandas(gen, schema=schema)
    return assemble_text(html_to_words(pages)).select("url", "extracted_text")


def q_pdf_extract(spark, sf_dir) -> DataFrame:
    """PDF → byte-identical text through the SAME extraction pipeline as
    HTML (frontend dispatch on the %PDF- magic → content-stream
    interpreter → identical assembly): the reference's D2 'PDF is just
    another document container' contract. Map-only, zero shuffle."""
    pdfs = synth_pdf_df(spark, 120).select(
        F.concat(F.lit("pdf://"), F.col("media_id")).alias("url"),
        F.col("blob").alias("html"))
    return assemble_text(html_to_words(pdfs)).select(
        "url", "n_pages", "extracted_text")


def q_domain_blocklist(spark, sf_dir) -> DataFrame:
    """UT1-style domain blocklist filter over deterministically-messy
    urls (mixed case, www repeats, default port, a sub. prefix every
    fifth doc so the parent-domain suffix match is exercised): blocked
    iff host's registrable domain is host1/host4.example.com. Oracle is
    closed-form — host extraction, suffix explosion, and the shuffle
    semi-join must all agree to hit it."""
    from .operators.webclean import filter_blocked_domains

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("concat('HTTP://', CASE WHEN doc_id % 5 = 0 THEN 'Sub.' "
               "ELSE 'WWW.' END, 'Host', cast(doc_id % 7 as string), "
               "'.Example.COM:80/p/', cast(doc_id as string))").alias("url"))
    bl = spark.createDataFrame(
        [("host1.example.com",), ("host4.example.com",), ("evil.org",)],
        "domain string")
    return filter_blocked_domains(docs, bl).select(
        "doc_id", "host", "blocked", "blocked_domain")


LM_REF_MOD = 4  # LM reference corpus = docs with doc_id % LM_REF_MOD == 0


def q_lm_perplexity(spark, sf_dir) -> DataFrame:
    """CCNet-style LM quality scoring: stupid-backoff bigram LM trained
    on the quarter of the corpus with doc_id % 4 == 0, perplexity scored
    for every document, head/middle/tail bucketed on fixed thresholds.
    Training = two count shuffles; scoring = three shuffle hash joins on
    uniform token keys; oracle replays the identical model in DuckDB."""
    from .operators.lm import (
        perplexity_score,
        train_bigram_lm,
        with_ppl_bucket,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ref = docs.filter(f"doc_id % {LM_REF_MOD} = 0")
    uni, big, tot = train_bigram_lm(ref)
    return with_ppl_bucket(perplexity_score(docs, uni, big, tot)).select(
        "doc_id", "n_pairs", "logprob_sum", "perplexity", "ppl_bucket")


#: exact_substring_dedup gate window (13 words keeps the planted blocks
#: short; the operator default is the paper's 50).
EXSUB_NGRAM = 13


def exsub_text_sql() -> str:
    """Gate corpus for ExactSubstr: documents text with planted verbatim
    duplication — every fourth-mod-1 doc appends the same 14-word block
    (cross-doc dup: the lowest doc_id keeps it, every later one is cut)
    and every tenth-mod-2 doc appends a 13-word block TWICE (within-doc
    dup: the second copy is cut even in the corpus-wide first doc).
    Valid verbatim in both Spark SQL and DuckDB."""
    alpha = ("exact dup block alpha one two three four five six "
             "seven eight nine ten")
    beta = ("twice beta gamma one two three four five six seven "
            "eight nine ten")
    return (f"concat(text, "
            f"CASE WHEN doc_id % 4 = 1 THEN ' {alpha}' ELSE '' END, "
            f"CASE WHEN doc_id % 10 = 2 THEN ' {beta} {beta}' "
            f"ELSE '' END)")


def q_exact_substring_dedup(spark, sf_dir) -> DataFrame:
    """ExactSubstr dedup over the planted corpus: corpus-wide first
    occurrence of every duplicated 13-gram survives, later occurrences
    (cross-doc AND within-doc) lose exactly the covered words. Exact
    against the identical first-occurrence + covered-union replay in
    DuckDB."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.expr(exsub_text_sql()).alias("text"))
    return dedup.exact_substring_dedup(docs, n=EXSUB_NGRAM)


#: pagerank gate edges: deterministic sparse host graph with dangling
#: nodes (dst residues 23-28 never appear as src) and self-loops.
PAGERANK_EDGES_SQL = ("SELECT doc_id % 23 AS src, "
                      "(doc_id * doc_id + 1) % 29 AS dst FROM documents")
PAGERANK_ITERS = 8


def q_pagerank(spark, sf_dir) -> DataFrame:
    """Host-graph PageRank over a deterministic synthetic edge set:
    8 relational rounds, dangling mass redistributed uniformly, ranks
    pinned to 9 dp per round in BOTH engines so float wobble cannot
    compound. Output rounded to 6 dp."""
    from .operators.graph import pagerank

    edges = _docs(spark, sf_dir).select(
        F.expr("doc_id % 23").alias("src"),
        F.expr("(doc_id * doc_id + 1) % 29").alias("dst"))
    return pagerank(edges, n_iter=PAGERANK_ITERS).select(
        "node", F.round("rank", 6).alias("rank"))


#: export gate shard budget: small enough that sf0.01 yields many
#: shards with the overflow-by-at-most-one-doc edge exercised.
EXPORT_SHARD_BYTES = 65536


def q_export_shards(spark, sf_dir) -> DataFrame:
    """Deterministic size-bounded shard assignment for corpus release:
    hash-ordered running byte sum chunked by the shard budget, manifest
    stats per shard. The running sum is the bucketed two-pass scheme
    (export.assign_shards: per-bucket partial sums + a bucket-offset
    broadcast — NO global-order window) + one map-side-partial
    aggregate; DuckDB replays the identical arithmetic."""
    from .operators.export import assign_shards, shard_manifest

    return shard_manifest(assign_shards(
        _docs(spark, sf_dir).select("doc_id", "text"),
        shard_bytes=EXPORT_SHARD_BYTES))


def q_winnow_fingerprints(spark, sf_dir) -> DataFrame:
    """Winnowing (MOSS) fingerprints over the documents corpus: char
    5-grams, window 4, rightmost-minimal selection per full window —
    one map-only gram explode + one per-doc window shuffle. DuckDB
    replays the identical struct-min selection."""
    return dedup.winnow_fingerprints(
        _docs(spark, sf_dir).select("doc_id", "text"), k=5, w=4)


#: bpe_merges gate depth (operator takes any k; 6 keeps the unrolled
#: DuckDB oracle readable) and the pinned literal merge list for the
#: apply gate (chained merges: th -> the -> the</w>).
BPE_GATE_MERGES = 6
BPE_APPLY_MERGES = [("t", "h"), ("th", "e"), ("the", "</w>"), ("e", "s")]


def q_bpe_merges(spark, sf_dir) -> DataFrame:
    """Distributed BPE tokenizer fitting: learn the first 6 merges over
    the documents corpus — one corpus-scale word-count shuffle, then 6
    relational rounds over the vocabulary relation (pair-count agg +
    broadcast 1-row winner + greedy merge fold). Winner rule (count
    desc, left asc, right asc) is fully deterministic; DuckDB replays
    the identical unrolled rounds."""
    from .operators.bpe import learn_bpe_merges

    return learn_bpe_merges(_docs(spark, sf_dir), BPE_GATE_MERGES)


def q_bpe_tokenize(spark, sf_dir) -> DataFrame:
    """BPE tokenization with a pinned literal merge list (the LSH-planes
    pattern: the fitted model is plan-time constants), map-only. The
    chained merges exercise rank-order application — 'the</w>' can only
    form after 'th' and 'the'."""
    from .operators.bpe import apply_bpe_merges

    toks = apply_bpe_merges(
        _docs(spark, sf_dir).select("doc_id", "text"), BPE_APPLY_MERGES)
    return toks.select(
        "doc_id",
        F.expr("concat_ws(' ', tokens)").alias("tokenized"),
        F.expr("cast(size(tokens) as bigint)").alias("n_tokens"))


def q_tfidf_top_terms(spark, sf_dir) -> DataFrame:
    """Per-doc top-5 tf-idf terms: two count aggregates on uniform keys
    + one term join + one per-doc window; (score desc, term asc) rank is
    fully deterministic. DuckDB replays the identical model."""
    from .operators.quality import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir).select("doc_id", "text"))


#: quality_nb gate: training set = docs with doc_id % 2 == 0, labeled
#: high-quality when the LOWERCASED text contains ' the ' — a real
#: lexical signal (not a statistically-identical split), expressible
#: verbatim in both engines.
NB_LABEL_SQL = "contains(lower(text), ' the ')"


def q_quality_nb(spark, sf_dir) -> DataFrame:
    """GPT-3-style corpus-selection classifier: multinomial Naive Bayes
    trained on the even-id half (labeled by a lexical property), log-odds
    scored for EVERY document. Training = one token-count shuffle;
    scoring = one shuffle join on the uniform token key + a per-doc agg;
    the scalar stats row rides a broadcast cross join. Oracle replays
    the identical smoothed model in DuckDB."""
    from .operators.quality import nb_quality_score, train_nb

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    labeled = docs.filter("doc_id % 2 = 0").withColumn(
        "is_hq", F.expr(NB_LABEL_SQL))
    wc, stats = train_nb(labeled)
    return nb_quality_score(docs, wc, stats)


def c4_span_text_sql() -> str:
    """Gate corpus for span dedup: documents text with planted duplicate
    three-sentence blocks — every third doc shares one block (cross-doc
    dup) and every seventh-mod-2 doc carries a different block TWICE
    (within-doc dup). 'Endcap.' absorbs unpunctuated doc tails so the
    planted sentences stay byte-identical across docs. Valid verbatim in
    both Spark SQL and DuckDB."""
    shared = (" Endcap. Shared alpha one. Shared alpha two. "
              "Shared alpha three.")
    beta = " Rare beta one. Rare beta two. Rare beta three."
    return (f"concat(text, "
            f"CASE WHEN doc_id % 3 = 0 THEN '{shared}' ELSE '' END, "
            f"CASE WHEN doc_id % 7 = 2 THEN ' Endcap.{beta}{beta}' "
            f"ELSE '' END)")


def q_c4_span_dedup(spark, sf_dir) -> DataFrame:
    """C4 §2.2 three-sentence-span global dedup over the planted corpus:
    first occurrence (min doc_id, span_ix) keeps its sentences, every
    other occurrence — cross-doc or within-doc — loses them; text
    reassembled from survivors. One shuffle on the 64-bit span hash +
    doc-grain reassembly; oracle replays the identical algorithm as
    staged DuckDB CTEs."""
    from .operators.webclean import dedup_text_spans

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.expr(c4_span_text_sql()).alias("text"))
    return dedup_text_spans(docs).select(
        "doc_id", "kept_text", "n_sent_kept", "n_sent_removed")


MC_N_BLOCKS = 5  # blocks planted per doc in the main-content gate corpus


def mc_feature_sql() -> tuple[str, str]:
    """Closed-form planted block features in terms of columns (i, n) —
    the SAME string is valid Spark SQL and DuckDB SQL. Block i of a doc
    with n words holds words [floor(i*n/5), floor((i+1)*n/5)); block 1 is
    fully linked (a nav strip), block 3 half-linked (a related-articles
    strip), the rest unlinked."""
    k = MC_N_BLOCKS
    nw = (f"(cast(floor((i + 1) * n / {k}) as int) - "
          f"cast(floor(i * n / {k}) as int))")
    lw = (f"CASE WHEN i = 1 THEN {nw} "
          f"WHEN i = 3 THEN cast(floor(({nw} + 1) / 2) as int) "
          f"ELSE 0 END")
    return nw, lw


def _mc_classified(spark, sf_dir) -> DataFrame:
    """Synthesize deterministic HTML from the documents table (5 blocks
    per doc, link-wrapping per mc_feature_sql), parse it with the REAL
    block parser, classify with the WSDM-2010 window+CASE plan."""
    from .operators.maincontent import classify_blocks, html_to_blocks

    nw, _ = mc_feature_sql()
    lo = f"cast(floor(i * n / {MC_N_BLOCKS}) as int)"
    half = f"cast(floor(({nw} + 1) / 2) as int)"
    block = (
        f"concat('<p>', concat_ws(' ', transform(slice(esc, {lo} + 1, {nw}), "
        f"(w, j) -> CASE WHEN i = 1 OR (i = 3 AND j < {half}) "
        f"THEN concat('<a href=\"#\">', w, '</a>') ELSE w END)), '</p>')")
    html = (f"concat('<html><body>', concat_ws('', "
            f"transform(sequence(0, {MC_N_BLOCKS - 1}), i -> {block})), "
            f"'</body></html>')")
    pages = (
        _docs(spark, sf_dir)
        .select("doc_id", F.expr(X.words("text", "spark")).alias("ws"))
        .withColumn("n", F.expr("size(ws)"))
        .filter(f"n >= 2 * {MC_N_BLOCKS}")
        .withColumn("esc", F.expr(
            "transform(ws, w -> replace(replace(replace(w, '&', '&amp;'), "
            "'<', '&lt;'), '>', '&gt;'))"))
        .select("doc_id", F.encode(F.expr(html), "UTF-8").alias("html"))
    )
    from .plans.partitioning import spread_if_narrow

    pages = spread_if_narrow(pages, "doc_id")  # python parse: parallelize
    return classify_blocks(html_to_blocks(pages, id_col="doc_id"),
                           id_col="doc_id")


def q_main_content_blocks(spark, sf_dir) -> DataFrame:
    """Densitometric boilerplate classification (Kohlschuetter et al.,
    WSDM 2010 NumWordsRules) over HTML synthesized from the documents
    table: the REAL block parser must recover exactly the planted
    (n_words, n_link_words) per block, and the lag/lead+CASE classifier
    must agree with the identical expressions in DuckDB. Parse is
    map-only; classification adds one per-doc window shuffle."""
    return _mc_classified(spark, sf_dir).select(
        "doc_id", "block_ix", "n_words", "n_link_words",
        "link_density", "is_content")


def q_main_content_text(spark, sf_dir) -> DataFrame:
    """Per-doc main text reassembly: content blocks joined in document
    order — oracle rebuilds it from the planted word slices."""
    from .operators.maincontent import main_content_text

    return main_content_text(_mc_classified(spark, sf_dir),
                             id_col="doc_id").select(
        "doc_id", "n_blocks", "n_content_blocks", "main_text")


def q_tumbling_windows(spark, sf_dir) -> DataFrame:
    """Tumbling-window rollup (1-hour bucket × event_type): the batch twin
    of streaming/arrivals.arrival_metrics_stream and the hypertable-rollup
    shape. One shuffle on (bucket, type); partial aggregation map-side."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"),
             F.countDistinct("user_id").alias("n_users"))
        .select(F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', w.start)")
                .alias("window_start_us"),
                "event_type", "n_events", "sum_value", "n_users")
    )


def q_session_windows(spark, sf_dir) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap per user) via
    ``session_window`` — Spark's native merging-session aggregate; one
    shuffle on user_id. ``session_window.end`` is last_event + gap, so the
    last-event timestamp is recovered by subtracting the gap (keeps the
    DuckDB oracle a pure min/max over lag-derived session ids).
    Timestamps cross the gate as epoch-microsecond BIGINTs via
    timestampdiff on the NTZ value — raw timestamp columns hash
    engine-dependently (ns vs us) and unix_micros/casts would drag the
    driver session's timezone into the result."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select("user_id",
                F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', w.start)")
                .alias("session_start_us"),
                F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
                       "w.end - INTERVAL 30 MINUTES)")
                .alias("session_last_us"),
                "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# Corpus-composition gates: intra-doc line dedup, mixture sampling, DSIR
# importance, and the composed corpus filter (round 6)
# ---------------------------------------------------------------------------

def line_text_sql(engine: str) -> str:
    """Deterministic line-laden text from doc_id (both engines): a nav
    line duplicated verbatim, two blank lines (must BOTH survive), the
    document body, and a tail that duplicates the second line for even
    doc_ids only — so removal counts vary across the corpus."""
    s = "string" if engine == "spark" else "varchar"
    return (
        f"concat('Nav ', cast(doc_id % 3 as {s}), chr(10),"
        f" 'Body ', cast(doc_id as {s}), chr(10),"
        f" chr(10),"
        f" 'Nav ', cast(doc_id % 3 as {s}), chr(10),"
        f" text, chr(10),"
        f" chr(10),"
        f" CASE WHEN doc_id % 2 = 0 THEN concat('Body ', cast(doc_id as {s}))"
        f" ELSE concat('Tail ', cast(doc_id as {s})) END)"
    )


def q_doc_line_dedup(spark, sf_dir) -> DataFrame:
    """Within-document repeated-line removal over deterministically
    line-laden text: the duplicated nav line and (for even ids) the
    duplicated body line vanish, blank lines and first occurrences
    survive in order. Map-side indexed-lambda filter — zero shuffle;
    exact against the same expression builder in DuckDB."""
    from .operators.webclean import with_line_dedup

    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(line_text_sql("spark")).alias("text"))
    return with_line_dedup(d).drop("text")


MIXTURE_RATES: list[tuple[str, int]] = [
    ("src0", 2_300_000),   # 2.3 epochs: upsampled source
    ("src1", 500_000),     # downsampled by half
    ("src2", 0),           # excluded source
    ("src3", 1_000_000),   # exactly one epoch
    # src4 deliberately absent → default rate applies
]


def q_mixture_sample(spark, sf_dir) -> DataFrame:
    """Deterministic mixture/temperature sampling: per-source integer
    ppm rates (upsampling >1e6, exclusion 0, catalog miss → default),
    copies decided by the salted portable hash. One explicit broadcast
    of the rate dim; zero corpus shuffles. Exact against the identical
    integer arithmetic in DuckDB."""
    from .operators.sampling import mixture_sample

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("concat('src', cast(doc_id % 5 as string))").alias("source"))
    rates = spark.createDataFrame(MIXTURE_RATES, "source string, rate_ppm long")
    out = mixture_sample(d, rates)
    return out.select("doc_id", "source", "rate_ppm", "n_copies",
                      F.col("copy_ix").cast("int").alias("copy_ix"))


def dsir_text_sql(engine: str) -> str:
    """Deterministic gram-planted text: every third doc leads with
    target-profile prose, every third-plus-one with raw-web boilerplate,
    the rest with nothing — then the real document text as a tail."""
    lead = ("CASE WHEN doc_id % 3 = 0 THEN "
            "'The university was founded during the century however it was ' "
            "WHEN doc_id % 3 = 1 THEN "
            "'Click here buy now free subscribe login cookie !!! $9 deal ' "
            "ELSE '' END")
    return f"concat({lead}, text)"


def q_dsir_importance(spark, sf_dir) -> DataFrame:
    """DSIR-style importance scoring + deterministic resampling over
    gram-planted text: exact-integer milli-log-ratio scores, calibrated
    ppm acceptance, hash-thresholded verdict. Pure map-side projection,
    zero shuffle; exact against the same builder in DuckDB."""
    from .operators.sampling import with_importance

    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(dsir_text_sql("spark")).alias("text"))
    return with_importance(d).drop("text")


#: a paragraph that passes every Gopher/C4 rule (3 terminal-punctuated
#: ≥5-word lines, ≥50 mostly-alphabetic words, stopword hits, no braces)
_GOOD_LINE = ("The history of the university and the town that have "
              "grown with it was written during the long century by "
              "many careful scholars.")
#: a C4-surviving line loaded with raw-web DSIR evidence — docs carrying
#: it stay clean but score low enough that most get sampled out
_SPAM_LINE = ("Click the free offer and buy now to subscribe with "
              "one more click today.")


def corpus_text_sql() -> str:
    """Gate corpus for the composed filter (engine-neutral SQL): even
    doc_ids carry the clean paragraph (every fourth-mod-2 doc with the
    spammy-but-clean DSIR line appended) so documents reach — and split
    at — every stage; odd doc_ids keep the raw table text and die at
    language/quality/cleaning stages as before."""
    good3 = f"concat('{_GOOD_LINE}', chr(10), '{_GOOD_LINE}', chr(10), '{_GOOD_LINE}')"
    spam3 = f"concat(chr(10), '{_SPAM_LINE}', chr(10), '{_SPAM_LINE}', chr(10), '{_SPAM_LINE}')"
    return (
        f"CASE WHEN doc_id % 2 = 0 THEN concat({good3}, "
        f"CASE WHEN doc_id % 4 = 2 THEN {spam3} "
        f"ELSE '' END) ELSE text END"
    )


def q_corpus_filter(spark, sf_dir) -> DataFrame:
    """The composed pre-training corpus filter — the pipeline a corpus
    release actually runs, as ONE query: UT1 domain blocklist (suffix
    semi-join) → scored language ID → Gopher quality verdict → C4
    cleaning verdict → DSIR importance sampling, with the first failing
    stage recorded per document. The blocklist output passes its input
    columns through, so every verdict is ONE map-side codegen stage on
    top of the suffix-join — no re-join against the scan, no second
    corpus-wide shuffle. Single-sourced with the Structured Streaming
    path via `webclean.composed_quality_verdicts`."""
    from .operators.webclean import composed_quality_verdicts

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.expr(corpus_text_sql()).alias("text"),
        F.expr("concat('HTTP://', CASE WHEN doc_id % 5 = 0 THEN 'Sub.' "
               "ELSE 'WWW.' END, 'Host', cast(doc_id % 7 as string), "
               "'.Example.COM:80/p/', cast(doc_id as string))").alias("url"))
    bl = spark.createDataFrame(
        [("host1.example.com",), ("host4.example.com",), ("evil.org",)],
        "domain string")
    return composed_quality_verdicts(docs, bl)


def snapshot_url_sql(engine: str) -> str:
    """Deterministic colliding-snapshot urls: ~100 distinct canonical
    pages captured by many docs in messy spellings (case, www, default
    port, tracking params) — canon collisions are the point."""
    s = "string" if engine == "spark" else "varchar"
    page = f"cast(doc_id % 100 as {s})"
    return (
        f"concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Site' "
        f"ELSE 'https://site' END, cast(doc_id % 4 as {s}), "
        f"'.Example.ORG', CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END, "
        f"'/page/', {page}, "
        f"CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x' ELSE '' END)"
    )


def q_url_dedup_latest(spark, sf_dir) -> DataFrame:
    """Cross-snapshot URL dedup: canonicalize colliding messy urls, keep
    the newest capture per canonical url (ties to highest doc_id). One
    shuffle with map-side max_by partials; oracle replays via a DuckDB
    window."""
    from .operators.webclean import latest_per_canonical_url

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(snapshot_url_sql("spark")).alias("url"),
        # epoch-us capture time: wraps every 97 docs so max-ts keepers
        # are not simply the max doc_id of the group
        F.expr("cast(1700000000000000 + (doc_id % 97) * 3600000000 "
               "as bigint)").alias("ts_us"))
    return latest_per_canonical_url(d)


def q_pack_sequences(spark, sf_dir) -> DataFrame:
    """GPT-2-style concat-and-chunk sequence packing: whitespace token
    counts, 8 salted packing streams, 512-token budget. One window
    shuffle; pack assignment/offsets/boundary flags exact against the
    identical DuckDB window arithmetic."""
    from .operators.sampling import pack_sequences
    from .operators.textstats import token_count_sql

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(token_count_sql("text", "spark"))
        .cast("bigint").alias("n_tokens"))
    return pack_sequences(d, budget=512, n_buckets=8)


def q_corpus_report(spark, sf_dir) -> DataFrame:
    """Corpus-composition report over the composed filter: documents and
    distinct hosts per (language, drop reason) — the release-metrics
    rollup a corpus publisher ships with the data. One tiny-key agg on
    top of the corpus_filter plan."""
    return (
        q_corpus_filter(spark, sf_dir)
        .groupBy("lang_pred", "drop_reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             F.countDistinct("host").cast("bigint").alias("n_hosts"),
             F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint")
             .alias("n_kept"))
    )


def q_html_meta(spark, sf_dir) -> DataFrame:
    """Crawl-policy metadata over deterministically-planted HTML heads:
    robots directives (quoted/unquoted/cased/padded, 'none' implication),
    rel-token canonical links, meta-refresh targets, entity-bearing
    titles. The REAL head parser must recover the closed-form plant.
    Map-only Arrow stage, zero shuffle."""
    from .operators.maincontent import html_meta_flags

    s = "cast(doc_id as string)"
    robots = (
        "CASE WHEN doc_id % 4 = 1 THEN "
        "'<meta name=\"robots\" content=\"noindex, nofollow\">' "
        "WHEN doc_id % 4 = 2 THEN "
        "'<META NAME=\"ROBOTS\" CONTENT=\" NOINDEX \">' "
        "WHEN doc_id % 4 = 3 THEN '<meta name=robots content=none>' "
        "ELSE '' END")
    canonical = (
        f"CASE WHEN doc_id % 5 = 0 THEN concat("
        f"'<link rel=\"Canonical alternate\" "
        f"href=\"https://canon.example/p/', cast(doc_id % 50 as string), "
        f"'\">') ELSE '' END")
    refresh = (
        f"CASE WHEN doc_id % 7 = 0 THEN concat("
        f"'<meta http-equiv=\"Refresh\" content=\"5; "
        f"URL=https://next.example/', {s}, '\">') ELSE '' END")
    title = f"concat('<title> Doc ', {s}, ' &amp;  friends </title>')"
    html = (f"concat('<html><head>', {robots}, {canonical}, {refresh}, "
            f"{title}, '</head><body><p>x</p></body></html>')")
    from .plans.partitioning import spread_if_narrow

    pages = spread_if_narrow(_docs(spark, sf_dir).select(
        "doc_id", F.encode(F.expr(html), "UTF-8").alias("html")), "doc_id")
    return html_meta_flags(pages, id_col="doc_id")


def q_vocab_top_k(spark, sf_dir) -> DataFrame:
    """Corpus vocabulary head: top-200 whitespace tokens by occurrence
    count with document frequency and a deterministic (count desc,
    token asc) rank. One map-side-partial token aggregate + a k-row
    top-k — exact against the identical window in DuckDB."""
    from .operators.textstats import vocab_top_k

    return vocab_top_k(_docs(spark, sf_dir), k=200)


def q_decontaminate_mask(spark, sf_dir) -> DataFrame:
    """Surgical decontamination over the same planted eval set as
    q_decontaminate: matched 13-gram spans are cut out word-exactly
    (overlap union, original order preserved) instead of dropping the
    document. Exact against the positional replay in DuckDB."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ws = X.words("text", "spark")
    bl = docs.filter("doc_id % 17 = 3").select(
        "doc_id", F.expr(f"concat_ws(' ', slice({ws}, 6, 21))").alias("text"))
    return dedup.decontaminate_mask(docs, bl)
