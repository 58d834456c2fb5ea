"""Training-data preparation operators T1-T7 (SURVEY §2.10)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_first_page_sample(manifest: DataFrame, fraction: float,
                                 seed: int = 1337,
                                 exclude: DataFrame | None = None,
                                 page_col: str = "page_num",
                                 key_col: str = "source_ref") -> DataFrame:
    """T1 (util/preproc.py:426-491): sample a fixed fraction of first-page
    records, seeded, after removing an exclusion set. ``sampleBy`` on the
    is-first stratum keeps non-first pages out entirely (the reference only
    draws page-1 records for annotation)."""
    base = manifest
    if exclude is not None:
        # No broadcast hint: the exclusion set is caller-supplied and its
        # size is input-dependent; AQE picks the build side from measured
        # sizes (same rule as entities.normalize_mentions).
        base = base.join(exclude.select(key_col), key_col, "left_anti")
    strat = base.withColumn("_first", F.col(page_col) == 1)
    return (
        strat.sampleBy("_first", {True: fraction, False: 0.0}, seed=seed)
        .drop("_first")
    )


def train_test_split(df: DataFrame, train_frac: float = 0.9,
                     seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """T2 (notebook 2 cell 9): seeded randomSplit."""
    train, test = df.randomSplit([train_frac, 1.0 - train_frac], seed=seed)
    return train, test


def consolidate_manifests(manifests: list[DataFrame],
                          label_renames: dict[str, str] | None = None) -> DataFrame:
    """T3 (util/preproc.py:494-564): normalize label attribute names then
    union with missing-column tolerance."""
    out = None
    for m in manifests:
        if label_renames:
            m = m.withColumnsRenamed(
                {k: v for k, v in label_renames.items() if k in m.columns})
        out = m if out is None else out.unionByName(m, allowMissingColumns=True)
    return out


def pre_annotated_uris(manifests: list[DataFrame],
                       ref_col: str = "textract_ref") -> DataFrame:
    """T4 (notebooks/util/ocr.py:32-67): union of *-ref URIs, dedup, sorted."""
    out = None
    for m in manifests:
        s = m.select(ref_col)
        out = s if out is None else out.unionByName(s)
    return out.distinct().orderBy(ref_col)


def validate_page_sequences(pages: DataFrame, doc_col: str = "source_ref",
                            page_col: str = "page_num") -> DataFrame:
    """T5 (util/preproc.py:316-352): per doc, page numbers must be exactly
    1..n — returns docs with a ``pages_valid`` flag (warn-and-exclude channel
    instead of raising)."""
    return (
        pages.groupBy(doc_col)
        .agg(F.sort_array(F.collect_list(page_col)).alias("_pages"),
             F.max(page_col).alias("n_pages"))
        .withColumn("pages_valid",
                    F.col("_pages") == F.expr("sequence(1, n_pages)"))
        .drop("_pages")
    )


def flag_empty_pages(pages: DataFrame, words_col: str = "words",
                     mode: str = "flag") -> DataFrame:
    """T7/D8 (util/preproc.py:259-264,355-389): ``no_content='omit'|'flag'``."""
    has = F.size(F.col(words_col)) > 0
    if mode == "omit":
        return pages.filter(has)
    if mode == "flag":
        return pages.withColumn("has_content", has)
    raise ValueError(f"mode must be omit|flag, got {mode!r}")


def synthetic_date_pairs(spark, n: int, seed: int = 42,
                         prompt: str = "Convert dates to YYYY-MM-DD: ") -> DataFrame:
    """T6 (seq2seq/date_normalization.py:98-225): deterministic
    prompt/answer pairs over weighted formats — the seq2seq task fixture.

    Fully distributed: ``spark.range(n)`` + portable-hash-derived date and
    format choices as column expressions (no driver-side row loop — the
    previous form materialized all n rows on the driver, fine for a test
    fixture but driver-bound for a big synthetic corpus). Format weights
    keep the reference's 4:2:2:2:1:1 mix via hash-mod-12 thresholds; day
    formats without leading zeros mirror the reference's lstrip (the month-
    name formats render day-of-month unpadded)."""
    from ..functions import textsql as X

    hd = X.h64(f"concat('d', '{seed}', '#', cast(id as string))", "spark")
    hf = X.h64(f"concat('f', '{seed}', '#', cast(id as string))", "spark")
    fmt = """CASE
      WHEN _w < 4 THEN date_format(_date, 'dd/MM/yyyy')
      WHEN _w < 6 THEN date_format(_date, 'yyyy-MM-dd')
      WHEN _w < 8 THEN date_format(_date, 'd MMMM yyyy')
      WHEN _w < 10 THEN date_format(_date, 'MMMM dd, yyyy')
      WHEN _w < 11 THEN date_format(_date, 'dd.MM.yyyy')
      ELSE date_format(_date, 'd MMM yyyy') END"""
    return (
        spark.range(n)
        .withColumn("_date", F.expr(
            f"date_add(date'1990-01-01', cast({hd} % 15001 as int))"))
        .withColumn("_w", F.expr(f"cast({hf} % 12 as int)"))
        .select(
            F.col("id"),
            F.concat(F.lit(prompt), F.expr(fmt)).alias("src_text"),
            F.expr("date_format(_date, 'yyyy-MM-dd')").alias("tgt_text"),
        )
    )
