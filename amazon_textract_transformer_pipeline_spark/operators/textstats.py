"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. Pure portable SQL expressions (oracle-checkable)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textsql as X

#: tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Membership counting is the operator under test; list size is a knob.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "por", "para", "con", "del"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie precedence


def _arr(items: list[str], engine: str) -> str:
    inner = ", ".join("'" + i.replace("'", "''") + "'" for i in items)
    return f"array({inner})" if engine == "spark" else f"[{inner}]"


def _stop_count(ws: str, lang: str, engine: str) -> str:
    lst = _arr(LANG_STOPWORDS[lang], engine)
    if engine == "spark":
        return f"size(filter({ws}, w -> array_contains({lst}, lower(w))))"
    return f"len(list_filter({ws}, w -> list_contains({lst}, lower(w))))"


def token_count_sql(text: str, engine: str) -> str:
    if engine == "spark":
        return f"size({X.words(text, engine)})"
    return f"len({X.words(text, engine)})"


def bpe_token_count_sql(text: str, engine: str) -> str:
    """BPE-ish token estimate without a tokenizer UDF: per word,
    ceil(len/4) pieces for alnum runs — the SQL twin of
    splitting.stub_tokenize's chunking (upper bound, no symbol splits)."""
    ws = X.words(text, engine)
    if engine == "spark":
        return (f"aggregate(transform({ws}, w -> cast(ceil(length(w) / 4.0) as bigint)), "
                f"cast(0 as bigint), (a, x) -> a + x)")
    # CAST: DuckDB list_sum yields HUGEINT → pandas float64, which would
    # hash-mismatch Spark's int64 in the driver gate. BIGINT keeps dtypes equal.
    return (f"CAST(coalesce(list_sum(list_transform({ws}, "
            f"w -> ceil(len(w) / 4.0)::BIGINT)), 0) AS BIGINT)")


def quality_exprs(text: str, engine: str) -> dict[str, str]:
    """Quality-scoring signals (length, word stats, stopword ratio) —
    the standard web-text filters (C4/Gopher-style rules)."""
    ws = X.words(text, engine)
    size = "size" if engine == "spark" else "len"
    n = f"{size}({ws})"
    mean_len = (
        f"CASE WHEN {n} = 0 THEN 0.0 ELSE "
        + (f"aggregate(transform({ws}, w -> cast(length(w) as bigint)), cast(0 as bigint), (a,x) -> a+x)"
           if engine == "spark"
           else f"list_sum(list_transform({ws}, w -> len(w)::BIGINT))")
        + f" / cast({n} as double) END"
    )
    stop_en = _stop_count(ws, "en", engine)
    return {
        "n_words": f"cast({n} as bigint)",
        "n_chars_actual": f"cast(length({text}) as bigint)",
        "mean_word_len": f"round({mean_len}, 6)",
        "stopword_ratio": (
            f"round(CASE WHEN {n} = 0 THEN 0.0 "
            f"ELSE {stop_en} / cast({n} as double) END, 6)"
        ),
    }


def langid_sql(text: str, engine: str) -> str:
    """Heuristic language ID: argmax of per-language stopword hits, ties by
    LANG_ORDER precedence, zero hits everywhere → 'und'."""
    ws = X.words(f"lower({text})", engine)
    scores = {lg: _stop_count(ws, lg, engine) for lg in LANG_ORDER}
    clauses = []
    for i, lg in enumerate(LANG_ORDER):
        conds = [f"({scores[lg]}) > 0"]
        for j, other in enumerate(LANG_ORDER):
            if j < i:
                conds.append(f"({scores[lg]}) > ({scores[other]})")
            elif j > i:
                conds.append(f"({scores[lg]}) >= ({scores[other]})")
        clauses.append("WHEN " + " AND ".join(conds) + f" THEN '{lg}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    q = quality_exprs(text_col, "spark")
    out = docs
    for name, e in q.items():
        out = out.withColumn(name, F.expr(e))
    return (
        out.withColumn("n_tokens_est", F.expr(bpe_token_count_sql(text_col, "spark")))
        .withColumn("lang_guess", F.expr(langid_sql(text_col, "spark")))
        .withColumn("fingerprint",
                    F.expr(X.h64(X.norm_text(text_col, "spark"), "spark")))
    )
