"""Local replica of the driver's correctness gate: every queries() entry runs
on Spark AND its oracle_sql() on DuckDB at sf0.01; values must match exactly
(the driver value-hashes after sorting columns by name)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            # errors="ignore" is deprecated; non-object dtypes here are
            # already numeric/bool/datetime — coerce only when numeric-like
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


QUERIES = sorted(entrymod.queries().keys())
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF)
    spdf = sdf.toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, non-empty, stable schema
        assert len(spdf) > 0, f"{name}: rows-only query returned 0 rows"
        return
    dpdf = duck.sql(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns), name
    assert len(spdf) == len(dpdf), f"{name}: rows {len(spdf)} vs {len(dpdf)}"
    # the driver's value-hash is dtype-sensitive (int64 36 != float64 36.0) —
    # round-1 lost two gate queries to DuckDB HUGEINT→float64 promotion that
    # a values-only comparison can't see. Compare dtype *kinds* explicitly.
    for c in spdf.columns:
        ks, kd = spdf[c].dtype.kind, dpdf[c].dtype.kind
        assert ks == kd or {ks, kd} <= {"O", "U", "S"}, (
            f"{name}.{c}: spark dtype {spdf[c].dtype} vs oracle {dpdf[c].dtype}"
        )
    a, b = _normalize(spdf), _normalize(dpdf)
    mism = []
    for i in range(len(a)):
        for c in a.columns:
            if not _values_equal(a.iloc[i][c], b.iloc[i][c]):
                mism.append((i, c, a.iloc[i][c], b.iloc[i][c]))
                if len(mism) > 5:
                    break
        if len(mism) > 5:
            break
    assert not mism, f"{name}: first mismatches {mism}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "extracted_text", "n_pages"}
