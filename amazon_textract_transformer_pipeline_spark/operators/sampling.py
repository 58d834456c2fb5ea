"""Corpus-composition operators: deterministic mixture (temperature)
sampling and DSIR-style importance scoring/resampling.

These are the steps that decide WHAT of a cleaned web corpus actually
reaches training — every published LLM data pipeline reweights its
sources (temperature-flattened mixtures a la GPT-3/Gopher) and several
select documents by distributional closeness to a target domain (DSIR,
Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"). The reference repo has no analog (it consumes every
document it is pointed at — `pipeline/ocr/textract_ocr.py` maps the
whole manifest); these operators are the training-data-pipeline layer
this engine adds on top.

Cross-engine exactness: every sampling decision is a comparison between
a portable md5-derived hash (functions/portable.py) and an INTEGER
parts-per-million threshold — no floating point anywhere in the kept/
dropped verdict, so the DuckDB oracle replays decisions bit-identically
and a re-run of the job reproduces the same corpus (the same
determinism contract as the reference's S7 idempotency token,
`fn-call-textract/main.py:160-187`).

Scale shape: :func:`mixture_sample` is one broadcast join against the
source-rate dim (hundreds of rows — genuinely small) plus a map-side
explode; zero shuffles on the corpus. :func:`importance_exprs` is pure
map-side SQL (literal-gram counting via the length-replace trick —
same plan-time-literal pattern as the LSH hyperplanes and the langid
profiles). Neither touches driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable

#: ppm denominator: rates/thresholds are integers in [0, 1_000_000].
PPM = 1_000_000


def _hash_ppm(key_expr: str, salt: str, engine: str) -> str:
    """Deterministic uniform integer in [0, PPM) from a key + salt.

    The portable hash64 is a 60-bit non-negative value on both engines,
    so plain ``%`` (no pmod dance) is safe and identical.
    """
    s = "string" if engine == "spark" else "varchar"
    keyed = f"concat(cast({key_expr} as {s}), ':{salt}')"
    h = (portable.spark_hash64(keyed) if engine == "spark"
         else portable.duck_hash64(keyed))
    return f"({h} % {PPM})"


# ---------------------------------------------------------------------------
# Mixture / temperature sampling
# ---------------------------------------------------------------------------

def n_copies_sql(rate_col: str, hash_ppm: str, engine: str) -> str:
    """Copies of a document under an integer ppm rate.

    ``rate_ppm`` may exceed PPM for upsampling: 2_300_000 ppm = 2.3
    epochs → every doc appears twice, and the deterministic 30% of docs
    whose hash lands under the fractional part appear a third time —
    the standard epoch-mixing arithmetic (GPT-3 Table 2.2 reports
    exactly such fractional epochs per source). Integer division stays
    in BIGINT on both engines (Spark ``DIV``, DuckDB ``//``) — never
    ``/``, which Spark widens to double.
    """
    idiv = (f"({rate_col} DIV {PPM})" if engine == "spark"
            else f"({rate_col} // {PPM})")
    return (f"({idiv} + "
            f"CASE WHEN {hash_ppm} < {rate_col} % {PPM} THEN 1 ELSE 0 END)")


def mixture_sample(docs: DataFrame, rates: DataFrame,
                   source_col: str = "source", id_col: str = "doc_id",
                   default_ppm: int = PPM) -> DataFrame:
    """Deterministic mixture sampling: each document appears
    ``n_copies`` times according to its source's ``rate_ppm``.

    ``rates`` is a (source, rate_ppm:bigint) dim table — a source
    catalog is hundreds of rows at any scale, so it is explicitly
    broadcast (the one join in this operator never shuffles the
    corpus). Sources absent from the catalog fall back to
    ``default_ppm``. Output keeps every surviving copy as its own row
    with a ``copy_ix`` (1-based) so downstream epoch-aware shuffling
    can treat copies independently.
    """
    r = rates.select(F.col(source_col),
                     F.col("rate_ppm").cast("bigint").alias("rate_ppm"))
    hp = _hash_ppm(id_col, "mix", "spark")
    out = (
        docs.join(F.broadcast(r), source_col, "left")
        .withColumn("rate_ppm",
                    F.coalesce("rate_ppm", F.lit(int(default_ppm))))
        .withColumn("_h", F.expr(hp))
        .withColumn("n_copies",
                    F.expr(n_copies_sql("rate_ppm", "_h", "spark")))
        .filter(F.col("n_copies") >= 1)
        .withColumn("copy_ix",
                    F.explode(F.expr("sequence(1, cast(n_copies as int))")))
    )
    return out.drop("_h")


def temperature_rates(docs: DataFrame, source_col: str = "source",
                      tau: float = 2.0) -> DataFrame:
    """Fit a per-source rate table that flattens the source distribution
    with temperature ``tau`` (sampling share ∝ p_s^(1/tau)), scaled so
    the expected output corpus size equals the input size.

    Per-doc acceptance rate r_s = C * p_s^(1/tau - 1) with
    C = N / Σ_s n_s p_s^(1/tau - 1). This helper is driver-side only in
    the sense that its OUTPUT is a small dim table (one row per source);
    the fit itself is one groupBy shuffle over the corpus. Rates are
    rounded to integer ppm — feed the result straight to
    :func:`mixture_sample`. (Floating-point pow lives only here, in the
    rate *fit*; the sampling decisions downstream stay exact-integer.)
    """
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("double").alias("n_s"))
    tot = counts.agg(F.sum("n_s").alias("n")).select("n")
    scored = counts.crossJoin(F.broadcast(tot)).withColumn(
        "w", F.expr(f"pow(n_s / n, 1.0 / {float(tau)} - 1.0)"))
    z = scored.agg(F.sum(F.expr("n_s * w")).alias("z")).select("z")
    return (
        scored.crossJoin(F.broadcast(z))
        .select(
            source_col,
            F.expr(f"cast(round(n / z * w * {PPM}) as bigint)")
            .alias("rate_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance scoring + deterministic resampling
# ---------------------------------------------------------------------------

#: literal evidence grams with fixed-point milli-log-ratio weights:
#: round(1000 * log(p_target(g) / p_raw(g))) for a wiki/book-like target
#: vs a raw-web background. This table is the PLAN-TIME ARTIFACT of an
#: offline fit (count gram frequencies in a target and a raw sample,
#: take log ratios — DSIR §3 with a literal feature set instead of
#: hashed buckets, which would hit the interpreted-lambda md5 trap; see
#: textstats.LANGID_PROFILES for the precedent). Production pipelines
#: regenerate these literals per target domain.
DSIR_PROFILE: list[tuple[str, int]] = [
    # target-ish evidence (formal prose)
    (" which ", 700), (" however ", 1100), (" during ", 800),
    (" century ", 1200), (" was ", 400), (" were ", 500),
    (" university ", 900), (" history ", 700),
    # raw-web evidence (commercial/navigation boilerplate)
    (" click ", -1200), (" buy ", -900), (" free ", -700),
    (" subscribe ", -1000), (" login ", -1100), (" cookie ", -900),
    ("!!!", -1300), (" $", -600),
]

#: acceptance calibration: accept_ppm = clamp(BASE + MUL * score_milli).
#: A piecewise-linear stand-in for DSIR's exp(log-ratio) importance
#: weight — chosen over exp() so the acceptance threshold stays
#: exact-integer across engines (libm exp is not bit-portable).
DSIR_BASE_PPM = 500_000
DSIR_MUL = 100
DSIR_MIN_PPM = 10_000


def importance_exprs(text: str, engine: str,
                     id_expr: str = "doc_id") -> dict[str, str]:
    """DSIR importance signals as portable SQL.

    * ``dsir_score_milli`` — Σ_g count(g) · w_g over the literal
      profile, exact BIGINT on both engines (counts via the
      length-replace trick on whitespace-normalized lowercased text);
    * ``dsir_accept_ppm`` — the calibrated acceptance threshold;
    * ``dsir_sampled`` — deterministic Bernoulli(accept_ppm/1e6) via
      the salted portable hash.

    Pure map-side projection: composes into the same codegen stage as
    the Gopher/C4/langid filters, zero shuffle.
    """
    from .textstats import _char_count, _langid_norm

    s = _langid_norm(text, engine)
    terms = [f"{w} * {_char_count(s, g, engine)}" for g, w in DSIR_PROFILE]
    score = "cast(" + " + ".join(terms) + " as bigint)"
    accept = (f"least(cast({PPM} as bigint), "
              f"greatest(cast({DSIR_MIN_PPM} as bigint), "
              f"cast({DSIR_BASE_PPM} as bigint) + {DSIR_MUL} * ({score})))")
    hp = _hash_ppm(id_expr, "dsir", engine)
    return {
        "dsir_score_milli": score,
        "dsir_accept_ppm": accept,
        "dsir_sampled": f"({hp}) < ({accept})",
    }


def with_importance(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Append the DSIR score, acceptance threshold, and sampling verdict."""
    out = docs
    for name, e in importance_exprs(text_col, "spark", id_col).items():
        out = out.withColumn(name, F.expr(e))
    return out


# ---------------------------------------------------------------------------
# Sequence packing: documents → fixed-token-budget training packs
# ---------------------------------------------------------------------------

def pack_sequences(docs: DataFrame, budget: int = 2048,
                   n_buckets: int = 8, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens") -> DataFrame:
    """Assign documents to fixed-budget training packs (the GPT-2-style
    concat-and-chunk layout: documents laid back-to-back, context
    windows cut every ``budget`` tokens).

    Semantics (pinned, replayed exactly by the DuckDB oracle):

    * documents are salted-hashed into ``n_buckets`` independent
      packing streams (deterministic shuffle of the corpus — adjacent
      crawl order would otherwise put one host's docs in one pack);
    * within a bucket, docs concatenate in (hash, id) order;
      ``pack_offset`` is the running token count before the doc;
    * ``pack_ix`` = the budget-window where the doc STARTS
      (pack_offset DIV budget); ``spans_packs`` flags docs crossing a
      boundary (the loader's truncate/wrap decision is out of scope —
      this operator decides layout, not loss masking);
    * ``pack_id`` = bucket * 2^32 + pack_ix, globally unique.

    Scale shape: ONE shuffle — the per-bucket window (running sum in
    codegen). Each bucket sorts independently, so ``n_buckets`` bounds
    the sort and sets the parallelism: at 10^12 docs pick
    n_buckets ≈ corpus/10^6 so a bucket's pack stream fits an executor
    sort comfortably. No driver state, no Python in the path.
    """
    from pyspark.sql import Window

    h = _hash_ppm(id_col, "packbkt", "spark")
    d = docs.withColumn("bucket",
                        F.expr(f"cast({h} % {int(n_buckets)} as int)"))
    order_h = _hash_ppm(id_col, "packord", "spark")
    d = d.withColumn("_oh", F.expr(order_h))
    w = (Window.partitionBy("bucket").orderBy("_oh", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (
        d.withColumn("pack_offset",
                     F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
                     .cast("bigint"))
        .withColumn("pack_ix",
                    F.expr(f"pack_offset DIV {int(budget)}").cast("bigint"))
        .withColumn("pack_id",
                    F.expr("bucket * cast(4294967296 as bigint) + pack_ix"))
        .withColumn("offset_in_pack",
                    F.expr(f"pack_offset % {int(budget)}").cast("bigint"))
        .withColumn("spans_packs",
                    F.expr(f"(pack_offset + {tokens_col} - 1) DIV {int(budget)} "
                           f"> pack_ix"))
    )
    return out.drop("_oh")


def packing_oracle_sql(budget: int, n_buckets: int,
                       docs_cte: str = "documents",
                       id_col: str = "doc_id",
                       tokens_col: str = "n_tokens") -> str:
    """DuckDB replay of :func:`pack_sequences` over a CTE/view exposing
    (id, n_tokens): same salted hashes, same window arithmetic."""
    hb = _hash_ppm(id_col, "packbkt", "duck")
    ho = _hash_ppm(id_col, "packord", "duck")
    return f"""
SELECT * EXCLUDE (_oh), (pack_offset + {tokens_col} - 1) // {budget} > pack_ix AS spans_packs
FROM (
  SELECT *,
    CAST(coalesce(sum({tokens_col}) OVER (
      PARTITION BY bucket ORDER BY _oh, {id_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS pack_offset,
    CAST(coalesce(sum({tokens_col}) OVER (
      PARTITION BY bucket ORDER BY _oh, {id_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      // {budget} AS pack_ix,
    bucket * CAST(4294967296 AS BIGINT) +
      CAST(coalesce(sum({tokens_col}) OVER (
        PARTITION BY bucket ORDER BY _oh, {id_col}
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      // {budget} AS pack_id,
    CAST(coalesce(sum({tokens_col}) OVER (
      PARTITION BY bucket ORDER BY _oh, {id_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      % {budget} AS offset_in_pack
  FROM (
    SELECT *, CAST(({hb}) % {n_buckets} AS INT) AS bucket, ({ho}) AS _oh
    FROM {docs_cte}
  )
)"""
